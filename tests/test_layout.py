"""Z-order layout: Morton encoding correctness + multi-column data-skipping
effect on parquet footer stats (SURVEY §4 — file layout is the one
optimization Catalyst does not do for you)."""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from nf2pq_spark.operators.layout import zorder_write, zvalue, zvalue2
from nf2pq_spark.sources.tables import load_table


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z += ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zvalue_matches_python_reference(spark):
    rng = random.Random(42)
    rows = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(1000)]
    df = spark.createDataFrame(rows, "x: long, y: long, w: long")
    got = df.select(
        zvalue2(F.col("x"), F.col("y")).alias("z2"),
        zvalue([F.col("x"), F.col("y"), F.col("w")], bits=8).alias("z3"),
        "x", "y", "w",
    ).collect()
    for r in got:
        assert r.z2 == _py_morton([r.x, r.y], 8)
        assert r.z3 == _py_morton([r.x, r.y, r.w], 8)


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append((min(los), max(his)))
    return spans


def test_zorder_write_on_timestamp_key(spark, sf_dir, tmp_path):
    """The classic layout key is (entity, time); the range collection must
    cast timestamps to long BEFORE collecting — min(raw col) hands int()
    a datetime.datetime on the driver and TypeErrors."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    dst = str(tmp_path / "zts")
    zorder_write(ev, ["user_id", "ts"], dst, n_files=8)
    out = spark.read.parquet(dst)
    assert out.count() == ev.count()


def test_zorder_write_shrinks_minmax_on_both_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity")
    dst = str(tmp_path / "zordered")
    zorder_write(li, ["l_partkey", "l_suppkey"], dst, n_files=16)

    out = spark.read.parquet(dst)
    assert out.count() == li.count()

    glo = li.agg(F.min("l_partkey"), F.max("l_partkey"),
                 F.min("l_suppkey"), F.max("l_suppkey")).first()
    part_range = glo[1] - glo[0]
    supp_range = glo[3] - glo[2]
    for col, full in [("l_partkey", part_range), ("l_suppkey", supp_range)]:
        spans = _file_spans(dst, col)
        assert len(spans) >= 8
        mean_span = sum(hi - lo for lo, hi in spans) / len(spans)
        # a single-column sort leaves the OTHER column at ~100% span per
        # file; Z-order must bound BOTH well below the full range
        assert mean_span < 0.6 * full, (col, mean_span, full)


def test_zorder_write_refuses_in_place_overwrite(spark, sf_dir, tmp_path):
    """Crash-safety audit (r6 verdict item 3): mode("overwrite") deletes
    dst at JOB START while the scan is lazy — zorder_write over the
    frame's own source directory would destroy the only copy before
    reading it. The guard must catch the direct path, a symlink alias,
    and a trailing-slash spelling."""
    import os

    import pytest

    src = str(tmp_path / "zsrc")
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    ev.write.parquet(src)
    df = spark.read.parquet(src)
    with pytest.raises(ValueError, match="overlaps"):
        zorder_write(df, ["user_id", "value"], src, n_files=4)
    with pytest.raises(ValueError, match="overlaps"):
        zorder_write(df, ["user_id", "value"], src + "/", n_files=4)
    link = str(tmp_path / "zlink")
    os.symlink(src, link)
    with pytest.raises(ValueError, match="overlaps"):
        zorder_write(df, ["user_id", "value"], link, n_files=4)
    # the source is untouched and a disjoint dst still works
    assert spark.read.parquet(src).count() == ev.count()
    dst = str(tmp_path / "zok")
    zorder_write(df, ["user_id", "value"], dst, n_files=4)
    assert spark.read.parquet(dst).count() == ev.count()


def test_compact_parquet_refuses_aliased_dst(spark, sf_dir, tmp_path):
    """Same hazard for compact_parquet: dst == src (or nested either
    way, or symlink-aliased) deletes the input at job start."""
    import os

    import pytest

    from nf2pq_spark.operators.compact import compact_parquet

    src = str(tmp_path / "csrc")
    load_table(spark, sf_dir, "events").select("user_id", "value") \
        .write.parquet(src)
    for bad in (src, src + "/", os.path.join(src, "sub"),
                str(tmp_path)):  # tmp_path contains src
        with pytest.raises(ValueError, match="aliases"):
            compact_parquet(spark, src, bad)
    link = str(tmp_path / "clink")
    os.symlink(src, link)
    with pytest.raises(ValueError, match="aliases"):
        compact_parquet(spark, src, link)
    assert spark.read.parquet(src).count() > 0  # input untouched
