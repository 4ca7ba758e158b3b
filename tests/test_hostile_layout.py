"""Physical-layout differential regression (r8).

tools/hostile_layout_fixture.py rewrites every fixture table with a
seeded row PERMUTATION, 997-row row groups, zstd, no dictionary, and
v2 data pages — the axes a 100 TB deployment's many writers control
and the clean single-writer fixture never varies. The full 253-query
sweep over that fixture ran green (r8, plus a spill-pressure
composition); this bounded variant re-runs the most order-sensitive
query shapes each suite run so an input-order or decoder dependence
cannot regress silently.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

#: order-risk shapes: window functions over ties, per-group pandas UDFs
#: (pandas sees rows in scan order), top-k under equal scores, float
#: accumulation, array aggregation, session windows, percentile
#: interpolation, and a decode-heavy scan (v2 pages + zstd + no-dict)
ORDER_RISK = [
    "q1_pricing_summary",
    "w2_lag_lead",
    "w5_distribution",
    "a5_percentiles",
    "a17_distribution_shape",
    "f4_arrays",
    "l3_cosine_topk",
    "x2_apply_in_pandas",
    "x3_grouped_agg_udf",
    "t3_session_window",
]


@pytest.fixture(scope="module")
def layout_sf(tmp_path_factory):
    from hostile_layout_fixture import build

    return build(src=os.environ.get("NF2PQ_TEST_SF_DIR",
                                    "/root/testdata/sf0.001"),
                 dst=str(tmp_path_factory.mktemp("layout") / "sfl"))


def test_order_risk_queries_match_oracle_on_permuted_layout(spark, layout_sf):
    import duckdb

    import __spark_entry__ as em
    from driver_sim import register_oracle_views, vhash

    qs, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    register_oracle_views(con, layout_sf)
    bad = []
    for name in ORDER_RISK:
        try:
            s = qs[name](spark, layout_sf).toPandas()
            d = con.execute(oracles[name]).fetchdf()
            if not (len(s) == len(d)
                    and sorted(s.columns) == sorted(d.columns)
                    and vhash(s) == vhash(d)):
                bad.append(name)
        except Exception as ex:  # noqa: BLE001 — census, then fail once
            bad.append(f"{name}: {type(ex).__name__} {str(ex)[:120]}")
    assert not bad, f"layout-permuted divergence regressed: {bad}"


def test_events_stream_reads_directory_tables(spark, tmp_path):
    """r8 multi-file sweep find: read_events_stream symlinked the table
    PATH into a scratch dir — correct for the driver's single-file
    fixture, but a DIRECTORY table (many-writer layout) ended up nested
    one level down where the file source never looks, so 12 streaming
    queries died with an empty-stream schema error. A directory table
    must stream in place and see every part file."""
    from hostile_layout_fixture import build

    from nf2pq_spark.sources.tables import load_table
    from nf2pq_spark.streaming.jobs import read_events_stream, run_available_now

    src = os.environ.get("NF2PQ_TEST_SF_DIR", "/root/testdata/sf0.001")
    mf = build(src=src, dst=str(tmp_path / "mf"), n_files=3)
    assert os.path.isdir(os.path.join(mf, "events.parquet"))
    stream = read_events_stream(spark, mf)
    import pyspark.sql.functions as F

    sp, name = run_available_now(stream.agg(F.count(F.lit(1)).alias("n")))
    got = sp.table(name).collect()[0].n
    assert got == load_table(spark, src, "events").count()


def test_layout_fixture_is_actually_hostile(layout_sf):
    """The builder must deliver what the sweep claims: permuted rows,
    many small row groups, no dictionary, zstd."""
    import pyarrow.parquet as pq

    src = os.environ.get("NF2PQ_TEST_SF_DIR", "/root/testdata/sf0.001")
    pf = pq.ParquetFile(os.path.join(layout_sf, "lineitem.parquet"))
    orig = pq.read_table(os.path.join(src, "lineitem.parquet"))
    assert pf.metadata.num_rows == len(orig)
    assert pf.metadata.num_row_groups > len(orig) // 1000, (
        "row groups not shattered")
    col = pf.metadata.row_group(0).column(0)
    assert col.compression.lower() == "zstd"
    # row order actually permuted (first column differs at the head)
    got = pf.read_row_group(0).column(0).to_pylist()[:50]
    exp = orig.column(0).to_pylist()[:50]
    assert got != exp, "rows not permuted"
