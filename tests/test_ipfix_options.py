"""IPFIX options templates (set id 3) + variable-length IEs (RFC 7011
§3.4.2.2, §7): encode → decode round trip, long-form varlen, and
resilience to garbage — the exporter-metadata side channel that sampled
NetFlow needs for rate correction."""

from __future__ import annotations

import os

from nf2pq_spark.sources.ipfix import (_decode_ipfix_options,
                                       _parse_options_templates,
                                       encode_ipfix_options,
                                       read_exporter_options,
                                       write_capture_file)


def test_options_roundtrip_scalar():
    recs = [
        {149: 7, 34: 100, 35: 2, 84: "random-sampler"},
        {149: 8, 34: 1, 35: 0, 84: ""},  # empty varlen
    ]
    msg = encode_ipfix_options(recs)
    cache: dict = {}
    _parse_options_templates(msg, "exp", cache)
    rows = _decode_ipfix_options(msg, "exp", cache)
    assert rows == [
        ("exp", 7, 100, 2, "random-sampler"),
        ("exp", 8, 1, 0, ""),
    ]


def test_options_varlen_long_form():
    name = "s" * 300  # ≥255 bytes → 255-marker + u16 length encoding
    msg = encode_ipfix_options([{149: 1, 34: 10, 35: 1, 84: name}])
    cache: dict = {}
    _parse_options_templates(msg, "exp", cache)
    rows = _decode_ipfix_options(msg, "exp", cache)
    assert rows == [("exp", 1, 10, 1, name)]


def test_options_unknown_template_dropped():
    msg = encode_ipfix_options([{149: 1, 34: 10, 35: 1, 84: "x"}])
    # data set without its template (fresh cache, template set stripped):
    # rebuild a message holding only the data set
    import struct
    off = 16
    sets = []
    while off + 4 <= len(msg):
        set_id, set_len = struct.unpack_from(">HH", msg, off)
        sets.append((set_id, msg[off:off + set_len]))
        off += set_len
    data_only = b"".join(s for sid, s in sets if sid != 3)
    stripped = struct.pack(">HHIII", 10, 16 + len(data_only), 0, 0, 1) + data_only
    assert _decode_ipfix_options(stripped, "exp", {}) == []


def test_read_exporter_options_spark(spark, tmp_path):
    d = tmp_path / "exp0"
    os.makedirs(d)
    msgs = [encode_ipfix_options([{149: 1, 34: 64, 35: 2, 84: "sys-a"}]),
            encode_ipfix_options([{149: 2, 34: 128, 35: 1, 84: "sys-b"}])]
    write_capture_file(str(d / "cap_00000.bin"), msgs)
    got = {tuple(r) for r in
           read_exporter_options(spark, str(tmp_path) + "/*").collect()}
    exp = "file:" + str(d)  # binaryFile paths are URIs
    assert got == {(exp, 1, 64, 2, "sys-a"), (exp, 2, 128, 1, "sys-b")}


def test_v9_options_roundtrip():
    from nf2pq_spark.sources.ipfix import encode_netflow_v9_options

    msg = encode_netflow_v9_options([{1: 42, 34: 1000, 35: 1}])
    cache: dict = {}
    _parse_options_templates(msg, "exp", cache)
    assert cache[("exp", 401)] == [(1, 4), (34, 4), (35, 1)]
    rows = _decode_ipfix_options(msg, "exp", cache)
    # v9 scope "System" isn't IE 149 → scope_domain 0; sampler name n/a
    assert rows == [("exp", 0, 1000, 1, "")]
