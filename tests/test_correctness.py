"""Mirror of the driver's correctness gate: every registered query runs on
Spark and (when it has an oracle) on DuckDB over the same fixtures, compared
by row count + column names/kinds + order-insensitive values.

Stricter than the driver in one way: values are compared cell-exact after
canonical sorting, so anything passing here should hash-match.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from nf2pq_spark import plans


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            # the DRIVER's canonicalizer sort_values the raw frame, so any
            # array/map/struct cell crashes it (unhashable ndarray — see
            # CORRECTNESS_r01 a8_collect). Mirror that strictness: graded
            # queries must serialize complex columns to strings.
            if len(sample) and isinstance(
                sample.iloc[0], (list, tuple, dict, np.ndarray)
            ):
                raise AssertionError(
                    f"column {c!r} holds {type(sample.iloc[0]).__name__} cells"
                    " — the grading driver cannot hash these; serialize with"
                    " array_join/array_to_string on both sides"
                )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    sort_cols = [c for c in df.columns]
    return df.sort_values(
        by=sort_cols, na_position="last",
        key=lambda s: s.map(str) if s.dtype == object else s,
    ).reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    a_na = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_na = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_na or b_na:
        return a_na and b_na
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    for c in s.columns:
        # mirror the driver's schema strictness: int vs float vs object must
        # agree (repr-level hashing distinguishes 1 from 1.0)
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        assert sk == dk or {sk, dk} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind {sk} != oracle {dk}"
        )
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        mism = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not _cells_equal(a, b)
        ]
        assert not mism, f"{name}.{c}: {len(mism)} mismatches, first 3: {mism[:3]}"


ORACLE_SPECS = [s for s in plans.REGISTRY.values() if s.oracle]
ROWS_ONLY_SPECS = [s for s in plans.REGISTRY.values() if not s.oracle]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_match(spec, spark, duck, sf_dir):
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, spec.name)


def test_no_vacuous_oracles_at_graded_sf():
    """An empty result hash-matches an empty result no matter how wrong the
    query is — a vacuous pass (audit found three: thresholds unreachable on
    the fixtures). Every oracle must return rows at the GRADED scale factor
    (sf0.01 — the driver's gate), which is larger than this suite's default
    sf0.001, where a few selective queries (e.g. sql6) are legitimately
    empty. DuckDB-only, so the sweep over all oracles stays cheap."""
    import duckdb

    graded = "/root/testdata/sf0.01"
    if not os.path.isdir(graded):
        pytest.skip("graded-sf fixtures not present")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{graded}/{t}.parquet')"
        )
    empty = []
    for spec in ORACLE_SPECS:
        n = con.execute(f"SELECT COUNT(*) FROM ({spec.oracle})").fetchone()[0]
        if n == 0:
            empty.append(spec.name)
    assert not empty, f"vacuous (0-row) oracles at graded sf: {empty}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spec, spark, sf_dir):
    df = spec.fn(spark, sf_dir)
    # > 0, not >= 0: an empty result proves nothing ran (audited: every
    # rows-only query produces real rows at sf0.01)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
