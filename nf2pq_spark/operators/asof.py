"""As-of join (SURVEY.md §2.3 J8): for each left row, the latest right row
at-or-before its timestamp, per key.

Spark has no native ASOF JOIN. The robust distributed formulation is the
union-tag trick:

1. tag both sides and union them on (key, ts) with the right side's payload
   columns nulled on left rows,
2. one window per key ordered by (ts, side) — right rows sort *before* left
   rows at equal ts, so an exact-tie match is picked up (>= semantics),
3. ``last(struct(payload...), ignorenulls=True)`` over
   unbounded-preceding..current row carries the most recent right ROW
   forward — the struct is non-null exactly on right rows, so a matching
   right row whose payload VALUE is null still wins (carrying the raw
   payload column instead would skip it and surface a farther row's value,
   diverging from DuckDB/pandas ASOF semantics),
4. keep only left rows; the carried struct's null-ness is the match marker
   ``how='inner'`` filters on.

Scale: exactly ONE shuffle (on the key, for the window) regardless of table
sizes — strictly better than the join-then-filter formulation, which shuffles
both sides *and* explodes matches before pruning to rank 1. Skewed keys are
the usual caveat; AQE handles moderate skew, salting is the escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join per ``on`` key.

    ``direction='backward'`` (default): latest ``right`` row with
    ``right_ts <= left_ts``. ``direction='forward'``: earliest ``right``
    row with ``right_ts >= left_ts`` (the window simply orders descending,
    so the carried payload is the nearest *following* right row).

    Returns all columns of ``left`` plus ``payload`` columns from ``right``.
    ``how='left'`` keeps unmatched left rows (payload → null), matching
    DuckDB's ``ASOF LEFT JOIN``; ``how='inner'`` drops them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be 'backward' or "
                         f"'forward', got {direction!r}")
    lcols = left.columns
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in payload:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))

    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"), *payload
    )
    for c in lcols:
        if c != on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.select(on, "__ts", "__side", *[c for c in lcols if c != on], *payload) \
        .unionByName(r_tag.select(on, "__ts", "__side",
                                  *[c for c in lcols if c != on], *payload))

    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    # at equal ts the right row (side 0) must sort before the left row so
    # exact ties match in both directions (>= / <= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # non-null exactly on right rows → last(ignorenulls) tracks the nearest
    # right ROW, so null payload values are carried faithfully and the
    # struct's own null-ness is a correct unmatched marker
    right_row = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in payload]))
    filled = unioned.select(
        "*", F.last(right_row, ignorenulls=True).over(w).alias("__asof"))
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__asof").isNotNull())
    return out.select(
        *lcols, *[F.col("__asof").getField(c).alias(c) for c in payload])
