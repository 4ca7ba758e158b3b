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


def _validate_and_tag(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str, payload: list[str],
                      how: str, fn: str):
    """Shared front half of both as-of formulations: argument checks,
    the NULL-never-matches right filter, side tagging, and the
    payload/left-column null alignment for the union. One copy — the
    numeric-bucket precision bug existed precisely because this logic
    had drifted into two (r10 review).

    NULL rule: a right row with a null key or null timestamp must never
    be carried (DuckDB ASOF JOIN / pandas merge_asof) —
    Window.partitionBy groups null keys into a real partition, so
    without the filter null-key left rows would "match" null-key right
    rows and diverge from the oracle semantics.

    Clash rule: the union-tag trick nulls payload columns on left rows,
    so a shared name would silently null the left column AND emit two
    same-named output columns — callers must alias the payload first.
    """
    if how not in ("left", "inner"):
        # anything else would silently behave as 'left' (the only check
        # downstream is `how == "inner"`) — reject typos loudly instead
        raise ValueError(f"{fn}: how must be 'left' or 'inner', got {how!r}")
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"{fn}: payload column(s) {sorted(clash)} also "
                         "exist on the left side; alias them on the "
                         "right input first")
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    lcols = left.columns
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts))
    for c in payload:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(rtypes[c]))
    r_tag = right.select(F.col(on), F.col(right_ts).alias("__ts"),
                         F.lit(0).alias("__side"), *payload)
    for c in lcols:
        if c != on:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(ltypes[c]))
    unioned = (
        l_tag.select(on, "__ts", "__side",
                     *[c for c in lcols if c != on], *payload)
        .unionByName(r_tag.select(on, "__ts", "__side",
                                  *[c for c in lcols if c != on], *payload)))
    return right, unioned, lcols, ltypes, rtypes


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
    if tie_break is not None and tie_break not in payload:
        # a tie_break naming a LEFT column compiles fine but orders every
        # equal-ts right row by NULL (r_tag nulls all left columns) —
        # silently restoring the nondeterminism the parameter exists to
        # remove. Only payload columns carry right-side values.
        raise ValueError(f"asof_join: tie_break {tie_break!r} must be one "
                         f"of the payload columns {sorted(payload)}")
    _right, unioned, lcols, _lt, _rt = _validate_and_tag(
        left, right, on, left_ts, right_ts, payload, how, "asof_join")

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
    # the when(): a LEFT row with a null key or null ts is always
    # unmatched (NULL never matches), regardless of what the null-key
    # window partition happened to contain
    asof_col = F.when(
        F.col(on).isNotNull() & F.col("__ts").isNotNull(),
        F.last(right_row, ignorenulls=True).over(w))
    filled = unioned.select("*", asof_col.alias("__asof"))
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__asof").isNotNull())
    return out.select(
        *lcols, *[F.col("__asof").getField(c).alias(c) for c in payload])


#: fixed-width interval units for the bucketed variant's timestamp axis
#: (months/years are NOT fixed-width and are rejected — F.window refuses
#: them for sliding windows for the same reason)
_INTERVAL_UNIT_US = {
    "second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000,
    "day": 86_400_000_000, "week": 604_800_000_000,
}


def _interval_micros(interval: str) -> int:
    """Parse a fixed-width interval literal ('1 day', '30 minutes') to
    microseconds, matching F.window's epoch-aligned bucket widths."""
    parts = interval.strip().lower().split()
    unit = parts[-1].rstrip("s") if parts else ""
    if (len(parts) != 2 or unit not in _INTERVAL_UNIT_US
            or not parts[0].isdigit() or int(parts[0]) <= 0):
        raise ValueError(
            f"asof_join_bucketed: bucket must be '<n> "
            f"<second|minute|hour|day|week>[s]', got {interval!r}")
    return int(parts[0]) * _INTERVAL_UNIT_US[unit]


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
    variant is the segmented-scan decomposition with PHANTOM CARRY ROWS
    (no join after the window — the r2 formulation joined a carry table
    back onto the full-width windowed union, a second full-width
    exchange):

    1. per-bucket summary of the right side (one row per (key, bucket):
       the last right row seen in that bucket) — tiny;
    2. running carry-in across buckets: a window over the summary rows
       interleaved with the left bucket spine, O(buckets) rows per key,
       trivially cheap even for the hottest key;
    3. materialize the carry-in as phantom rows (__side = -1, __ts =
       bucket start) and union them UNDER the real rows;
    4. ONE window per ``(key, time_bucket)`` — the hot key's timeline
       splits into ~range/bucket independent tasks; phantom rows sort
       before everything in their bucket, so the in-bucket
       last(ignorenulls) carry-forward alone produces the final answer.

    The full-width data shuffles ONCE on (key, bucket) — same as the
    plain version's one shuffle on (key); the two side plans shuffle only
    column-pruned (key, ts[, payload]) projections. ``bucket`` is any
    Spark interval literal; pick it so a hot key's densest bucket fits
    one task (~100k-1M rows).
    """
    if not isinstance(bucket, str) and bucket <= 0:
        raise ValueError(f"asof_join_bucketed: numeric bucket must be "
                         f"positive, got {bucket!r}")
    right, unioned_raw, lcols, ltypes, rtypes = _validate_and_tag(
        left, right, on, left_ts, right_ts, payload, how,
        "asof_join_bucketed")
    # interval string buckets a timestamp axis; an int buckets a numeric
    # one. The timestamp form is epoch-aligned floor ARITHMETIC, not
    # F.window(): Catalyst's TimeWindowing rule injects an
    # `isnotnull(ts)` filter under any window() projection, which
    # silently DROPPED null-ts left rows — violating the 'left' contract
    # the plain asof_join keeps (they must surface with null payload;
    # r7 hostile-corpus find). Arithmetic is NULL-transparent: a null ts
    # yields a null bucket, the row rides its own window partition, and
    # the __asof guard below marks it unmatched.
    if isinstance(bucket, str):
        us = _interval_micros(bucket)
        # Integer arithmetic end-to-end: `floor(micros / lit(us))` runs a
        # DOUBLE division first, and doubles are exact only to 2^53 —
        # micros past ~2255 AD (or before ~-2255, both inside the hostile
        # corpus's 1677/2262 extremes) can round UP across a bucket
        # boundary and floor into the wrong bucket. `x - pmod(x, us)` is
        # the same epoch-aligned floor computed exactly in int64, and
        # pmod(NULL, us) = NULL keeps the NULL transparency.
        micros = F.unix_micros(F.col("__ts"))
        bucket_expr = F.timestamp_micros(micros - F.pmod(micros, F.lit(us)))
    else:
        # same exact-int64 floor as the timestamp branch: the previous
        # floor(ts / bucket) ran a DOUBLE division first, so an int64
        # axis past 2^53 could round across a bucket boundary and land a
        # boundary-adjacent row in the wrong (key, bucket) partition —
        # the exact hazard the timestamp branch fixed, left behind in
        # this copy (r10 review). The bucket KEY is the bucket START
        # value (x - pmod(x, bucket)), which also IS the phantom __ts.
        bucket_expr = F.col("__ts") - F.pmod(F.col("__ts"), F.lit(bucket))
    unioned = unioned_raw.withColumn("__b", bucket_expr)

    # per-(key, bucket) summary in ONE pass over the pruned sides: the
    # last right row of the bucket (__v, null when the bucket has no
    # right rows) and whether any left row lives there (__has_left —
    # only those buckets consume a carry). Derived from pruned inputs
    # rather than the windowed union: referencing that twice recomputed
    # the whole scan+union+window subtree (audited: 4 source scans, no
    # exchange reuse). max_by ignores null keys, so the when() guards
    # restrict it to right rows.
    pay_struct = F.struct(*[F.col(c) for c in payload])
    pruned = (
        left.select(F.col(on), F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__side"),
                    *[F.lit(None).cast(rtypes[c]).alias(c) for c in payload])
        .unionByName(right.select(F.col(on), F.col(right_ts).alias("__ts"),
                                  F.lit(0).alias("__side"), *payload))
        .withColumn("__b", bucket_expr)
    )
    summary = (
        pruned.groupBy(on, "__b")
        .agg(
            F.max_by(F.when(F.col("__side") == 0, pay_struct),
                     F.when(F.col("__side") == 0, F.col("__ts"))).alias("__v"),
            F.max(F.col("__side")).alias("__has_left"),
        )
    )
    # carry-in across buckets: one window per key over O(buckets) summary
    # rows — trivially cheap even for the hottest key. The frame ends at
    # -1 so a bucket's own right rows never leak into its carry. Each
    # left-occupied bucket with a non-null carry becomes a phantom row at
    # the bucket start. (Right-only buckets emit no phantom — no left row
    # there consumes a carry — but their __v flows through the window so
    # later buckets inherit it.)
    across = (
        Window.partitionBy(on).orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_type = dict(unioned.dtypes)["__ts"]
    # phantom __ts = the true bucket START so it sorts before every real
    # row of its bucket — which is exactly the bucket key on BOTH axes
    # now (timestamp_micros of the floored micros / x - pmod(x, bucket))
    phantom = (
        summary
        .select(on, "__b", "__has_left",
                F.last("__v", ignorenulls=True).over(across).alias("__carry"))
        .filter((F.col("__has_left") == 1) & F.col("__carry").isNotNull())
        .select(
            F.col(on),
            F.col("__b").cast(ts_type).alias("__ts"),
            F.lit(-1).alias("__side"),
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols if c != on],
            *[F.col("__carry").getField(c).alias(c) for c in payload],
            F.col("__b"),
        )
    )

    # non-null exactly on right + phantom rows; phantoms sort first in
    # their bucket (__ts = bucket start, __side -1 < 0), so any real
    # in-bucket right row overrides the carry for later left rows
    right_row = F.when(
        F.col("__side") <= 0, F.struct(*[F.col(c) for c in payload]))
    in_bucket = (
        Window.partitionBy(on, "__b")
        .orderBy(F.asc("__ts"), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.unionByName(phantom)
        .select("*",
                F.when(F.col(on).isNotNull() & F.col("__ts").isNotNull(),
                       F.last(right_row, ignorenulls=True).over(in_bucket))
                .alias("__asof"))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        out = out.filter(F.col("__asof").isNotNull())
    return out.select(
        *lcols, *[F.col("__asof").getField(c).alias(c) for c in payload])
