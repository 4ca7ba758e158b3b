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
    tie_break: str | None = None,
) -> DataFrame:
    """As-of join per ``on`` key.

    ``direction='backward'`` (default): latest ``right`` row with
    ``right_ts <= left_ts``. ``direction='forward'``: earliest ``right``
    row with ``right_ts >= left_ts`` (the window simply orders descending,
    so the carried payload is the nearest *following* right row).

    ``tie_break``: optional payload column that deterministically picks
    ONE right row when several share the matched timestamp (the smallest
    ``tie_break`` value wins, in both directions). Without it, equal-ts
    right rows are ordered only by (__ts, __side) and the carried row is
    whichever the shuffle happened to place last — nondeterministic across
    runs and potentially divergent from an oracle that tie-breaks by id.

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
    # exact ties match in both directions (>= / <= semantics). The
    # tie-break sorts equal-ts right rows DESCENDING so last() lands on
    # the smallest value; left rows carry a null tie column and desc
    # ordering places nulls last, but __side already separates them.
    order_cols = [ts_order, F.asc("__side")]
    if tie_break is not None:
        order_cols.append(F.desc(tie_break))
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
    bucket: str | int = "1 day",
) -> DataFrame:
    """Skew-resilient as-of join: identical semantics to
    :func:`asof_join` (backward direction), hot-key-safe execution.

    The plain formulation windows over the key alone, so a power-law key
    (one user with 80% of the events) serializes into ONE task — and
    unlike joins, AQE cannot split a skewed *window* partition. This
    variant is the segmented-scan decomposition:

    1. window per ``(key, time_bucket)`` — the hot key's timeline splits
       into ~range/bucket independent tasks;
    2. per-bucket summary (one row per (key, bucket): the last right row
       seen in that bucket) — tiny;
    3. running carry-in across buckets on the SUMMARY table (a window
       over O(buckets) rows per key, trivially cheap even for the
       hottest key);
    4. join the carry-in back on (key, bucket) and coalesce with the
       in-bucket fill.

    The full-width union shuffles ONCE on (key, bucket); the summary and
    bucket-spine side plans shuffle only column-pruned (key, ts[, payload])
    projections — vs the plain version's single shuffle; worth it exactly
    when the key is hot.
    ``bucket`` is any Spark interval literal; pick it so a hot key's
    densest bucket fits one task (~100k-1M rows).
    """
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
    # interval string buckets a timestamp axis; an int buckets a numeric one
    bucket_expr = (
        F.window("__ts", bucket).getField("start") if isinstance(bucket, str)
        else F.floor(F.col("__ts") / F.lit(bucket)).cast("long")
    )
    unioned = (
        l_tag.select(on, "__ts", "__side", *[c for c in lcols if c != on], *payload)
        .unionByName(r_tag.select(on, "__ts", "__side",
                                  *[c for c in lcols if c != on], *payload))
        .withColumn("__b", bucket_expr)
    )

    right_row = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in payload]))
    in_bucket = (
        Window.partitionBy(on, "__b")
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(right_row, ignorenulls=True).over(in_bucket).alias("__fill"))

    # per-(key, bucket) last right row. Derived from the RIGHT input alone
    # (only right rows can ever fill) rather than from `filled`: `filled`
    # is the full-width windowed union, and referencing it twice recomputed
    # the whole scan+union+window subtree (audited: 4 source scans, no
    # exchange reuse). The bucket spine — every (key, bucket) either side
    # touches, needed so left-only buckets still receive carry-in — comes
    # from two column-pruned (key, ts) scans; their shuffle payload is a
    # deduped pair list, a sliver of the full-width exchange this avoids.
    summary_r = (
        right.select(F.col(on), F.col(right_ts).alias("__ts"), *payload)
        .withColumn("__b", bucket_expr)
        .groupBy(on, "__b")
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), F.col("__ts"))
             .alias("__bucket_last"))
    )
    buckets = (
        left.select(F.col(on), F.col(left_ts).alias("__ts"))
        .unionByName(right.select(F.col(on), F.col(right_ts).alias("__ts")))
        .withColumn("__b", bucket_expr)
        .select(on, "__b").distinct()
    )
    across = (
        Window.partitionBy(on).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = buckets.join(summary_r, [on, "__b"], "left").select(
        on, "__b",
        F.last("__bucket_last", ignorenulls=True).over(across).alias("__carry"),
    )

    out = (
        filled.join(carry, [on, "__b"], "left")
        .withColumn("__asof", F.coalesce("__fill", "__carry"))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        out = out.filter(F.col("__asof").isNotNull())
    return out.select(
        *lcols, *[F.col("__asof").getField(c).alias(c) for c in payload])
