"""Bucketed range join: point-in-interval joins without an equi key.

A pure range join (``p.ts BETWEEN i.lo AND i.hi`` with no shared key) is
the degenerate case for Spark's join planner — it can only pick a
broadcast-nested-loop or cartesian product, both O(|points|·|intervals|).
At 100 TB that is the difference between a job that finishes and one that
doesn't.

The standard fix (used by Databricks' range-join optimization and
KDB-style time joins) is to manufacture an equi key from coarse buckets:

- each point lands in exactly ONE bucket: ``floor(ts / B)``;
- each interval is exploded to EVERY bucket it overlaps via
  ``sequence(floor(lo/B), floor((hi-1)/B))``;
- an ordinary shuffle/broadcast equi-join on the bucket index pairs each
  point with only the intervals overlapping its bucket, and the exact
  range predicate refines post-match.

No duplicates arise (a point is in one bucket), so no dedup pass is
needed. Cost moves from O(n·m) to O(n + m·w + matches) where w is the
mean interval width in buckets — pick ``bucket_seconds`` near the typical
interval length so w stays small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        ts_col: str, lo_col: str, hi_col: str,
                        bucket_seconds: int = 3600,
                        extra_cond: Column | None = None) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` on ``lo <= ts < hi`` via a
    bucket equi key. Column names from both inputs survive in the output
    (callers select/alias as usual); empty intervals (``hi <= lo``) are
    dropped, matching the range predicate's semantics.
    """
    bus = bucket_seconds * _US
    # exact-int64 bucketing (x - pmod(x, bus), the bucket START in
    # micros): floor(micros / bus) ran a DOUBLE division, exact only to
    # 2^53 — points or bounds past ~2255 AD (inside the hostile corpus's
    # 2262 extremes) could round across a bucket boundary, and a
    # mis-bucketed point misses its interval entirely on the equality
    # leg. Same fix as the as-of join's bucket axes (r10 review).
    m_pt = F.unix_micros(F.col(ts_col))
    pb = points.withColumn("__bucket", m_pt - F.pmod(m_pt, F.lit(bus)))
    iv = intervals.filter(F.col(hi_col) > F.col(lo_col))
    m_lo = F.unix_micros(F.col(lo_col))
    m_hi = F.unix_micros(F.col(hi_col)) - 1
    lo_b = m_lo - F.pmod(m_lo, F.lit(bus))
    hi_b = m_hi - F.pmod(m_hi, F.lit(bus))
    # span guard: one sentinel interval (hi = 9999-12-31, the classic
    # "until further notice" row) would otherwise materialize a
    # multi-million-element bucket array for that single row — executor
    # OOM / sequence-length failure taking down the whole join. Fail
    # loudly naming the offender; the fix is a coarser bucket_seconds or
    # clamping open-ended intervals before the join.
    max_span = 100_000
    span_ok = (hi_b - lo_b) < F.lit(max_span * bus)
    ib = iv.withColumn(
        "__bucket",
        F.explode(
            F.when(span_ok,
                   F.sequence(lo_b, hi_b, F.lit(bus))).otherwise(F.raise_error(
                F.concat(
                    F.lit("bucketed_range_join: interval spans over "
                          f"{max_span} buckets at bucket_seconds="
                          f"{bucket_seconds} (lo="),
                    F.col(lo_col).cast("string"), F.lit(", hi="),
                    F.col(hi_col).cast("string"),
                    F.lit("); use a coarser bucket or clamp open-ended "
                          "intervals"))))
        ),
    )
    # side-qualified refs (pb[...]/ib[...]): bare F.col() resolves
    # against the JOINED plan, so a column name shared between the two
    # inputs (intervals derived from the same event table still carrying
    # 'ts') raised AMBIGUOUS_REFERENCE despite the docstring promising
    # both inputs' columns survive (r10 review)
    cond = (
        (pb["__bucket"] == ib["__bucket"])
        & (pb[ts_col] >= ib[lo_col])
        & (pb[ts_col] < ib[hi_col])
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return pb.join(ib, cond, "inner").drop("__bucket")
