"""The nf2pq.conf analog: config parsing + the full config-driven pipeline
(capture files -> decode -> partitioned parquet) run hermetically."""

from __future__ import annotations

import os

from nf2pq_spark.config import load_config, run_collector

CONF_TEMPLATE = """
[collector]
capture_dir = {cap}
listen_port = 9995          ; non-default, with inline comment
rotation_seconds = 30

[parquet]
path = {out}
checkpoint = {ckpt}

[clickhouse]
url = jdbc:clickhouse://ch.example:8123/flows
table = flows
user = ingest
password = hunter2
"""


def test_load_config(tmp_path):
    conf = tmp_path / "nf2pq.conf"
    conf.write_text(CONF_TEMPLATE.format(
        cap=tmp_path / "caps", out=tmp_path / "flows",
        ckpt=tmp_path / "ckpt"))
    cfg = load_config(str(conf))
    assert cfg.listen_port == 9995
    assert cfg.rotation_seconds == 30
    assert cfg.clickhouse is not None
    assert cfg.clickhouse.jdbc_properties == {"user": "ingest",
                                              "password": "hunter2"}


def test_config_driven_pipeline(spark, tmp_path):
    """End-to-end: conf file -> run_collector(availableNow) -> partitioned
    parquet rows equal the encoded flows (no ClickHouse section -> parquet
    only)."""
    from nf2pq_spark.sources.ipfix import (encode_netflow_v5,
                                           write_capture_file)

    cap = tmp_path / "caps"
    os.makedirs(cap)
    # v5 carries uint32 ms on the wire, so stay below 2^32 (1970-01-02T01:00)
    base_ms = 90_000_000
    flows = [{"sa_int": (10 << 24) + i, "da_int": 2, "sp": i, "dp": 80,
              "pr": 6, "flg": 16, "ipkt": 1, "ibyt": 100,
              "ts_ms": base_ms + i * 3_600_000,  # one per hour
              "te_ms": base_ms + i * 3_600_000 + 500, "sas": 0, "das": 0}
             for i in range(4)]
    write_capture_file(str(cap / "cap_0.bin"), encode_netflow_v5(flows))

    conf = tmp_path / "nf2pq.conf"
    conf.write_text("""
[collector]
capture_dir = {cap}

[parquet]
path = {out}
checkpoint = {ckpt}
""".format(cap=cap, out=tmp_path / "flows", ckpt=tmp_path / "ckpt"))

    cfg = load_config(str(conf))
    q = run_collector(spark, cfg, available_now=True)
    q.awaitTermination()

    out = spark.read.parquet(str(tmp_path / "flows"))
    rows = out.orderBy("sp").collect()
    assert len(rows) == 4
    # partitioned layout: hour column carries the rotation partitioning
    assert sorted(r.hour for r in rows) == [1, 2, 3, 4]
    assert {r.date.isoformat() for r in rows} == {"1970-01-02"}
    assert rows[0].sa == "10.0.0.0" and rows[3].sp == 3
    # replay-idempotent layout (r8): each micro-batch owns a batch_id=N
    # dir, date/hour partitioning nested inside it
    flows_dir = str(tmp_path / "flows")
    batch_dirs = [d for d in os.listdir(flows_dir) if d.startswith("batch_id=")]
    assert batch_dirs, "collector output must be batch_id-partitioned"
    # guard the per-batch date dir: with multiple micro-batches each
    # batch holds only a subset of dates, and a bare listdir would
    # crash instead of failing the layout assertion
    hour_dirs = {
        d
        for b in batch_dirs
        if os.path.isdir(os.path.join(flows_dir, b, "date=1970-01-02"))
        for d in os.listdir(os.path.join(flows_dir, b, "date=1970-01-02"))
    }
    assert {"hour=1", "hour=2", "hour=3", "hour=4"} <= hour_dirs


def test_packaging_entry_point_resolves(tmp_path, spark):
    """r7 verdict item 8: the pyproject console entry must resolve to a
    working CLI. The sandbox lacks the `wheel` package (and network), so
    `pip install -e .` cannot run here — this pins the same contract
    directly: the declared target imports, parses args, and a --drain
    invocation against a real capture dir runs the full pipeline.
    (main() reuses the active session via get_spark's getOrCreate.)"""
    import contextlib
    import io
    import tomllib

    from nf2pq_spark.sources.ipfix import encode_netflow_v5, write_capture_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    mod_name, fn_name = meta["project"]["scripts"]["nf2pq-collector"].split(":")
    import importlib

    target = getattr(importlib.import_module(mod_name), fn_name)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            target(["--help"])
        except SystemExit as e:
            assert e.code == 0
    assert "--drain" in buf.getvalue()

    cap = tmp_path / "caps"
    os.makedirs(cap)
    flows = [{"sa_int": (10 << 24) + i, "da_int": 2, "sp": i, "dp": 80,
              "pr": 6, "flg": 16, "ipkt": 1, "ibyt": 100,
              "ts_ms": 90_000_000 + i, "te_ms": 90_000_500 + i,
              "sas": 0, "das": 0} for i in range(3)]
    write_capture_file(str(cap / "cap_0.bin"), encode_netflow_v5(flows))
    conf = tmp_path / "nf2pq.conf"
    conf.write_text(f"""
[collector]
capture_dir = {cap}

[parquet]
path = {tmp_path / 'flows'}
checkpoint = {tmp_path / 'ckpt'}
""")
    assert target([str(conf), "--drain"]) == 0
    out = spark.read.parquet(str(tmp_path / "flows"))
    assert out.count() == 3


def test_config_pipeline_reads_bridge_subdirectory_layout(spark, tmp_path):
    """The UDP bridge writes capture_dir/<exporter-ip>/cap_*.bin and
    Spark's binaryFile source does not recurse — the collector must glob
    one level down or a bridge-fed deployment silently streams zero
    files (r10 review). Also exercises start_bridge, the wiring for the
    [collector] listener fields."""
    import socket
    import time

    from nf2pq_spark.config import start_bridge
    from nf2pq_spark.sources.ipfix import encode_netflow_v5

    cap = tmp_path / "caps"
    os.makedirs(cap)
    conf = tmp_path / "nf2pq.conf"
    conf.write_text("""
[collector]
capture_dir = {cap}
listen_host = 127.0.0.1
listen_port = 0
rotation_seconds = 1

[parquet]
path = {out}
checkpoint = {ckpt}
""".format(cap=cap, out=tmp_path / "flows", ckpt=tmp_path / "ckpt"))
    cfg = load_config(str(conf))

    bridge = start_bridge(cfg)
    try:
        flows = [{"sa_int": (10 << 24) + i, "da_int": 2, "sp": i, "dp": 80,
                  "pr": 6, "flg": 16, "ipkt": 1, "ibyt": 100,
                  "ts_ms": 90_000_000 + i, "te_ms": 90_000_500 + i,
                  "sas": 0, "das": 0} for i in range(6)]
        sender = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for dgram in encode_netflow_v5(flows, per_packet=3):
            sender.sendto(dgram, bridge.addr)
        deadline = time.time() + 10
        while bridge.datagrams_received < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert bridge.datagrams_received == 2
    finally:
        bridge.stop()  # finalizes the open captures under caps/127.0.0.1/

    assert os.path.isdir(cap / "127.0.0.1")  # the layout under test
    q = run_collector(spark, cfg, available_now=True)
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "flows"))
    assert sorted(r.sp for r in out.collect()) == list(range(6))


def test_capture_source_glob_heuristic(tmp_path):
    """The one-level glob append must key on the LAST path segment and
    on whether the path is a real directory — a directory literally
    named with a glob char previously skipped the append and the
    collector silently streamed zero files again (r10 advice)."""
    from nf2pq_spark.config import capture_source_glob

    assert capture_source_glob("/data/caps") == "/data/caps/*"
    assert capture_source_glob("/data/caps/") == "/data/caps/*"
    # explicit glob in the last segment: verbatim (crash_soak passes
    # cap/* and must keep working)
    assert capture_source_glob("/data/caps/*") == "/data/caps/*"
    assert capture_source_glob("/data/caps/exp_??") == "/data/caps/exp_??"
    # Hadoop alternation glob in the last segment: also verbatim — '{'
    # was missing from the detection set while PRESENT in the escape
    # set, so the braces got backslash-escaped and zero files streamed
    # (r11 advice)
    assert capture_source_glob("/data/caps/{e1,e2}") == "/data/caps/{e1,e2}"
    # an EXISTING directory is never "already a glob", whatever its
    # name — and its metachars are ESCAPED so Hadoop's globber reads
    # them literally instead of as a character class (r11 review: the
    # unescaped form was PATH_NOT_FOUND, and "what?/*" matched sibling
    # dirs)
    weird = tmp_path / "cap[1]"
    weird.mkdir()
    assert capture_source_glob(str(weird)) == \
        str(tmp_path) + "/cap\\[1\\]/*"
    # glob chars in a PARENT of a not-yet-created dir don't disable the
    # append either (and get escaped on the way out)
    assert capture_source_glob("/data/cap[1]/sub") == \
        "/data/cap\\[1\\]/sub/*"


def test_capture_source_glob_escaped_dir_streams_files(spark, tmp_path):
    """End-to-end: a capture_dir literally named with glob metachars
    must actually stream its files through Spark's reader — the escaped
    glob is what the binaryFile source receives."""
    import os

    from nf2pq_spark.config import capture_source_glob

    d = tmp_path / "cap[1]" / "10.0.0.1"
    os.makedirs(d)
    (d / "f.bin").write_bytes(b"x" * 10)
    # decoy sibling a naive unescaped glob could match
    d2 = tmp_path / "capX1" / "10.0.0.1"
    os.makedirs(d2)
    (d2 / "g.bin").write_bytes(b"y" * 10)
    path = capture_source_glob(str(tmp_path / "cap[1]"))
    got = spark.read.format("binaryFile").load(path)
    assert [os.path.basename(r.path) for r in got.collect()] == ["f.bin"]


def test_config_decode_strings_pipeline(spark, tmp_path):
    """decode_strings = true (r12): the config-driven collector surfaces
    varlen string and basicList IEs in its parquet output — previously
    the streaming path had no route to the FLOW_STR_SCHEMA columns at
    all. Off (the default) keeps the fixed 13-column frame."""
    import os

    from nf2pq_spark.sources.ipfix import (_VARLEN, encode_basiclist,
                                           encode_ipfix,
                                           write_capture_file)

    cap = tmp_path / "caps"
    os.makedirs(cap)
    fields = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1),
              (96, _VARLEN), (6, 1), (2, 4), (291, _VARLEN),
              (1, 4), (152, 8), (153, 8), (16, 4), (17, 4)]
    flows = [{"sa_int": (10 << 24) + i, "da_int": 2, "sp": i, "dp": 80,
              "pr": 6, "flg": 16, "app": f"svc{i}",
              "blist": encode_basiclist(7, 2, [10 * i, 10 * i + 1]),
              "ipkt": 1, "ibyt": 100,
              "ts_ms": 1_700_000_000_000 + i,
              "te_ms": 1_700_000_000_500 + i, "sas": 0, "das": 0}
             for i in range(3)]
    write_capture_file(str(cap / "cap_0.bin"),
                       encode_ipfix(flows, template_fields=fields,
                                    template_id=350))

    conf = tmp_path / "nf2pq.conf"
    conf.write_text("""
[collector]
capture_dir = {cap}
decode_strings = true

[parquet]
path = {out}
checkpoint = {ckpt}
""".format(cap=cap, out=tmp_path / "flows", ckpt=tmp_path / "ckpt"))

    cfg = load_config(str(conf))
    assert cfg.decode_strings is True
    q = run_collector(spark, cfg, available_now=True)
    q.awaitTermination()

    out = spark.read.parquet(str(tmp_path / "flows"))
    rows = {r.sp: r for r in out.collect()}
    assert len(rows) == 3
    for i in range(3):
        assert rows[i].app_name == f"svc{i}"
        assert rows[i].str_ies == {96: f"svc{i}"}
        assert rows[i].list_ies == {7: [10 * i, 10 * i + 1]}
        assert rows[i].ibyt == 100  # fixed fields around the varlens


def test_clickhouse_leg_ships_pinned_columns(spark, tmp_path, monkeypatch):
    """The ClickHouse insert column set is PINNED configuration (r12
    advice): dropping complex columns by TYPE made `decode_strings`
    toggle the insert list (app_name appeared/disappeared), so inserts
    into a table DDL'd under the other setting failed at runtime. The
    default ships the stable base flow surface regardless of
    decode_strings; `columns = ...` opts into more; the parquet leg
    keeps the full surface."""
    import os

    from nf2pq_spark.sources.ipfix import (_VARLEN, encode_basiclist,
                                           encode_ipfix,
                                           write_capture_file)
    from nf2pq_spark.streaming import sinks as sinks_mod

    delivered = []

    def fake_jdbc_writer(url, table, properties=None,
                         dedup_token_prefix=None):
        def write_batch(batch_df, batch_id):
            delivered.append(batch_df)
        return write_batch

    monkeypatch.setattr(sinks_mod, "jdbc_batch_writer", fake_jdbc_writer)

    cap = tmp_path / "caps"
    os.makedirs(cap)
    fields = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1),
              (96, _VARLEN), (6, 1), (2, 4), (291, _VARLEN),
              (1, 4), (152, 8), (153, 8), (16, 4), (17, 4)]
    flows = [{"sa_int": 10, "da_int": 2, "sp": 1, "dp": 80, "pr": 6,
              "flg": 16, "app": "svc", "blist": encode_basiclist(7, 2, [9]),
              "ipkt": 1, "ibyt": 100, "ts_ms": 1_700_000_000_000,
              "te_ms": 1_700_000_000_500, "sas": 0, "das": 0}]
    write_capture_file(str(cap / "cap_0.bin"),
                       encode_ipfix(flows, template_fields=fields,
                                    template_id=351))
    conf = tmp_path / "nf2pq.conf"
    conf.write_text("""
[collector]
capture_dir = {cap}
decode_strings = true

[parquet]
path = {out}
checkpoint = {ckpt}

[clickhouse]
url = jdbc:clickhouse://nowhere:8123/flows
table = flows
""".format(cap=cap, out=tmp_path / "flows", ckpt=tmp_path / "ckpt"))

    cfg = load_config(str(conf))
    q = run_collector(spark, cfg, available_now=True)
    q.awaitTermination()

    assert delivered, "the ClickHouse leg never ran"
    from nf2pq_spark.sources.ipfix import FLOW_SCHEMA

    # default: the STABLE base surface — identical with decode_strings
    # on or off, so a table DDL'd under either setting keeps working
    assert delivered[0].columns == [f.name for f in FLOW_SCHEMA.fields] + ["ts"]
    # the parquet leg keeps the full surface
    out = spark.read.parquet(str(tmp_path / "flows"))
    assert {"str_ies", "list_ies", "app_name"} <= set(out.columns)


def test_clickhouse_explicit_columns_and_validation(spark, tmp_path,
                                                    monkeypatch):
    """`columns = ...` in [clickhouse] pins the insert list (the
    app_name-after-table-migration path); names outside the decoded
    surface or with JDBC-unmappable map/array types fail at STREAM
    BUILD, not as a runtime insert error batches later."""
    import os

    import pytest

    from nf2pq_spark.sources.ipfix import (_VARLEN, encode_ipfix,
                                           write_capture_file)
    from nf2pq_spark.streaming import sinks as sinks_mod

    delivered = []

    def fake_jdbc_writer(url, table, properties=None,
                        dedup_token_prefix=None):
        def write_batch(batch_df, batch_id):
            delivered.append(batch_df)
        return write_batch

    monkeypatch.setattr(sinks_mod, "jdbc_batch_writer", fake_jdbc_writer)

    cap = tmp_path / "caps"
    os.makedirs(cap)
    fields = [(8, 4), (12, 4), (7, 2), (11, 2), (4, 1),
              (96, _VARLEN), (6, 1), (2, 4),
              (1, 4), (152, 8), (153, 8), (16, 4), (17, 4)]
    flows = [{"sa_int": 10, "da_int": 2, "sp": 1, "dp": 80, "pr": 6,
              "flg": 16, "app": "svc", "ipkt": 1, "ibyt": 100,
              "ts_ms": 1_700_000_000_000, "te_ms": 1_700_000_000_500,
              "sas": 0, "das": 0}]
    write_capture_file(str(cap / "cap_0.bin"),
                       encode_ipfix(flows, template_fields=fields,
                                    template_id=352))
    base = """
[collector]
capture_dir = {cap}
decode_strings = true

[parquet]
path = {out}
checkpoint = {ckpt}

[clickhouse]
url = jdbc:clickhouse://nowhere:8123/flows
table = flows
columns = {cols}
"""

    def cfg_with(cols, tag):
        conf = tmp_path / f"nf2pq_{tag}.conf"
        conf.write_text(base.format(cap=cap, out=tmp_path / f"flows_{tag}",
                                    ckpt=tmp_path / f"ckpt_{tag}",
                                    cols=cols))
        return load_config(str(conf))

    cfg = cfg_with("sa, da, ibyt, app_name, ts", "ok")
    assert cfg.clickhouse.columns == ("sa", "da", "ibyt", "app_name", "ts")
    q = run_collector(spark, cfg, available_now=True)
    q.awaitTermination()
    assert delivered and delivered[0].columns == [
        "sa", "da", "ibyt", "app_name", "ts"]

    with pytest.raises(ValueError, match="not in the decoded surface"):
        run_collector(spark, cfg_with("sa, nonexistent", "bad"),
                      available_now=True)
    with pytest.raises(ValueError, match="map/array"):
        run_collector(spark, cfg_with("sa, str_ies", "cplx"),
                      available_now=True)
    # app_name needs decode_strings: pinned as a build-time error too
    cfg_off = cfg_with("sa, app_name", "off")
    cfg_off = type(cfg_off)(**{**cfg_off.__dict__, "decode_strings": False})
    with pytest.raises(ValueError, match="not in the decoded surface"):
        run_collector(spark, cfg_off, available_now=True)
