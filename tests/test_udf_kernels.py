"""JVM-free differential pins for Python-side UDF kernels whose oracle
mirrors SQL TRY_CAST semantics (r7 advice: x8's arrow kernel raised
ArrowInvalid on int64 overflow instead of degrading to NULL per row).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa


def test_name_suffix_arrow_matches_duckdb_try_cast_on_int64_boundary():
    """The x8 kernel must equal regexp_extract + TRY_CAST row-for-row on
    every cast edge: beyond-int64 digit runs, the exact int64 max and
    max+1 boundary, values hidden behind 20+ leading zeros (a
    length-bounded regex would wrongly NULL these), all-zero digit runs,
    non-format names, empty strings, and NULLs."""
    from nf2pq_spark.plans.udf_surface import _name_suffix_arrow

    names = [
        "Customer#000000001",
        "Customer#0",
        "Customer#000",
        "Customer#00000000000000000000007",   # 23 digits, value 7
        "Customer#9223372036854775807",       # int64 max
        "Customer#9223372036854775808",       # int64 max + 1 → NULL
        "Customer#9999999999999999999",       # 19 digits over max → NULL
        "Customer#99999999999999999999999",   # 23 digits → NULL
        "Customer#1000000000000000000",       # 19 digits in range
        "Customer#", "Customer#12x", "junk", "", None, "Ärna Müller-Ω",
    ]
    got = _name_suffix_arrow(pa.array(names, pa.string())).to_pylist()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in names])
    exp = [r[0] for r in con.execute(
        "SELECT TRY_CAST(regexp_extract(name, '^Customer#([0-9]+)$', 1) "
        "AS BIGINT) FROM t").fetchall()]
    assert got == exp


def test_flow_and_text_helpers_propagate_null(spark):
    """NULL inputs stay NULL instead of falling through when() chains
    into a confident-looking otherwise() value: lang_guess classified a
    null document 'fr', service_class called a null port 'ephemeral',
    and decode_tcp_flags rendered missing flags as '......' (r10
    review)."""
    from pyspark.sql import functions as F

    from nf2pq_spark.functions.flownet import (decode_tcp_flags,
                                               service_class)
    from nf2pq_spark.functions.text import lang_guess

    df = spark.createDataFrame(
        [(None, None, None), ("the and of", 443, 18)],
        "text string, port int, flg int")
    r = df.select(
        lang_guess(F.col("text")).alias("lang"),
        service_class(F.col("port")).alias("svc"),
        decode_tcp_flags(F.col("flg")).alias("flags"),
    ).collect()
    assert (r[0].lang, r[0].svc, r[0].flags) == (None, None, None)
    assert r[1].lang == "en" and r[1].svc == "web"
    assert r[1].flags == ".A..S."


def test_ipv6_normalize_rejects_malformed(spark):
    """Malformed IPv6 text → NULL (matching ipv4_to_long's contract),
    never a wrong-length or garbage key that could spuriously match a
    prefix; valid forms keep their canonical expansion."""
    from pyspark.sql import functions as F

    from nf2pq_spark.functions.flownet import ipv6_normalize

    cases = [
        ("2001:db8::1", "20010db8000000000000000000000001"),
        ("::", "0" * 32),
        ("1:2:3:4:5:6:7:8", "00010002000300040005000600070008"),
        ("1:2:3:4:5:6:7:8:9", None),   # 9 groups
        ("1:2", None),                 # short without ::
        ("1::2::3", None),             # two ::
        ("zzzz::1", None),             # non-hex group
        ("1:22222::3", None),          # >4 nibbles in a group
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "ip string")
    got = [r.n for r in df.select(
        ipv6_normalize(F.col("ip")).alias("n")).collect()]
    assert got == [c[1] for c in cases]


def test_in_cidr_validates_network_driver_side():
    """Malformed CIDR strings raise at plan-build time instead of
    compiling into an always-false predicate."""
    import pytest
    from pyspark.sql import functions as F

    from nf2pq_spark.functions.flownet import in_cidr

    for bad in ("300.0.0.0/8", "10.0.0/8", "10.0.0.0/33"):
        with pytest.raises(ValueError):
            in_cidr(F.col("ip"), bad)


def test_bridge_capture_names_unique_under_clock_stall(tmp_path, monkeypatch):
    """Capture names clamp monotone per bridge: a stalled (or stepped-
    back) wall clock must never reproduce an existing name — the rename
    would silently replace a committed capture (r10 review)."""
    import nf2pq_spark.sources.udp_bridge as ub

    monkeypatch.setattr(ub.time, "time", lambda: 1_700_000_000.0)
    b = ub.UdpCaptureBridge("127.0.0.1", 0, str(tmp_path),
                            rotate_seconds=0.0)
    names = []
    for _ in range(3):
        b._sink_for("10.0.0.1", now=float(_))  # rotate_seconds=0 → new file
        names.append(b._files["10.0.0.1"][2])
    assert len(set(names)) == 3
    assert names == sorted(names)  # lexicographic == arrival preserved
