"""Skew-handling join utilities (SURVEY §4; 100 TB design point).

AQE's skew-join splitting covers sort-merge joins automatically; this module
provides the *manual* salting escape hatch for the cases AQE can't rewrite
(e.g. a hot key joining a non-broadcastable dimension, or aggregations on a
power-law key).

``salted_join``: the skewed (large) side gets a deterministic per-row salt
in [0, buckets); the small side is replicated ``buckets`` times; the join
key becomes (key, salt), splitting each hot key's rows across ``buckets``
tasks. ``two_phase_agg``: pre-aggregate on (key, salt) then finish on key —
the classic partial-combine for skewed group-bys beyond what map-side
partial aggregation already absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, buckets: int):
    """Deterministic per-row salt (stable across task retries — no rand()).

    Salted on the row's POSITION (monotonically_increasing_id: partition
    id << 33 | row index, deterministic for a given scan), not a content
    hash: hashing the columns gave every full-duplicate row of a hot key
    the SAME salt, so exactly the duplicate-heavy skew this module exists
    for (retransmit storms — identical 5-tuples and counters) stayed in
    one bucket and the straggler task survived salting. Position also
    works on frames with Map columns, which xxhash64 rejects. Consecutive
    rows cycle through buckets, so the split is near-uniform per input
    partition."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")


def replicate(df: DataFrame, buckets: int, col: str = "__salt") -> DataFrame:
    """Cross the small side with salt values 0..buckets-1."""
    return df.withColumn(col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))


def salted_join(large: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the large side's hot keys split across ``buckets``.

    Cost model: small side inflates ×buckets (keep it the genuinely small
    side); the large side's per-key row bound drops ×buckets. Use when one
    key holds ≫ 1/partitions of the data and broadcast is impossible.

    ``how`` is restricted to joins where unmatched SMALL-side rows are
    dropped: under right/full outer semantics every unmatched small-side
    key would surface once per replica (×buckets duplicate rows).
    """
    # NOTE: 'cross' is deliberately absent — with (key, salt) join columns
    # it would silently degenerate to an equi-join, not cross semantics.
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "semi", "anti"):
        raise ValueError(
            f"salted_join: how={how!r} would emit one row per salt replica "
            "for unmatched small-side keys; use the plain join (or salt "
            "the other side) for right/full outer semantics")
    lg = large.withColumn("__salt", _row_salt(large, buckets))
    sm = replicate(small, buckets)
    return lg.join(sm, [on, "__salt"], how).drop("__salt")


def two_phase_agg(df: DataFrame, key: str, aggs: list[tuple[str, str, str]],
                  buckets: int = 16) -> DataFrame:
    """Skew-tolerant aggregation: (key,salt) partial → key final.

    ``aggs``: (col, fn, alias) with fn ∈ {sum, count, min, max} — the
    decomposable aggregates. count re-combines via sum.
    """
    salted = df.withColumn("__salt", _row_salt(df, buckets))
    partial_exprs, final_exprs = [], []
    for col, fn, alias in aggs:
        p = f"__p_{alias}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(alias))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(p))
            final_exprs.append((F.sum(p) if fn == "sum" else getattr(F, fn)(p)).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    return (salted.groupBy(key, "__salt").agg(*partial_exprs)
            .groupBy(key).agg(*final_exprs))
