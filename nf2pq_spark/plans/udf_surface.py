"""Python UDF surface (SURVEY §2.11): Arrow-vectorized pandas UDFs only —
scalar, grouped-map (applyInPandas), grouped-agg, and mapInPandas. No
row-at-a-time Python UDFs anywhere in the engine.

Scale notes: every entry here crosses the JVM↔Python Arrow channel once
per batch; the numeric work is vectorized numpy. Rounding conventions match
plans.helpers so pandas' pairwise float summation still hash-matches the
oracle.
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator  # noqa: F401 — resolves x11's UDF type hints
import pyarrow

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..sources.tables import load_table
from .registry import register

# NB: return types are DataType objects, not DDL strings — string parsing
# requires an active SparkContext at decoration time.


@pandas_udf(DoubleType())
def _charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # per-row IEEE arithmetic — bit-identical to the SQL expression
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "x1_pandas_scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(18,6))) AS DOUBLE) AS total_charge,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Arrow-vectorized scalar pandas UDF computing the charge "
    "expression, aggregated (X1). The UDF's per-row double is cast to "
    "DECIMAL(18,6) — the true charge has exactly 6 decimals, so the cast is "
    "boundary-free and the sum exact.",
    tags=("X1",),
)
def x1_pandas_scalar(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    charge = _charge(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax"))
    return li.groupBy("l_returnflag").agg(
        F.sum(charge.cast("decimal(18,6)")).cast("double").alias("total_charge"),
        F.count(F.lit(1)).alias("n"),
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    std = pdf["value"].std(ddof=1)  # sample stddev, matches STDDEV_SAMP
    mean = pdf["value"].mean()
    if std and std > 0:
        z = (pdf["value"] - mean) / std
        # symmetric floor(x*1e6+0.5) on BOTH engines (the cents() recipe):
        # pandas .round is half-to-even while DuckDB ROUND is
        # half-away-from-zero, so an exact-half tie would round
        # differently per engine
        z = np.floor(z * 1e6 + 0.5) / 1e6
    else:
        z = pd.Series([None] * len(pdf))
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "znorm": z}
    )


@register(
    "x2_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           CAST(FLOOR((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w
                      * 1000000 + 0.5) / 1000000.0 AS DOUBLE) AS znorm
    FROM events WINDOW w AS (PARTITION BY user_id)
    """,
    description="grouped-map applyInPandas: z-score normalize event values "
    "per user (X2 — the canonical normalize-per-group shape)",
    tags=("X2",),
)
def x2_apply_in_pandas(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _zscore, schema="event_id long, user_id long, znorm double"
    )


@pandas_udf(DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    return float((price * qty).sum() / qty.sum())


@register(
    "x3_grouped_agg_udf",
    oracle="""
    -- isnan CASEs mirror the pandas-UDF surface's NULL/NaN conflation:
    -- Arrow hands the UDF float64 where NULL *is* NaN, and pandas
    -- .sum() skips NaN — so the UDF treats NaN as missing while SQL
    -- SUM would propagate it (r7 hostile-corpus tier-2 find). The
    -- denominator keeps the qty of a NaN-priced row, exactly like the
    -- UDF's independent qty.sum().
    SELECT l_returnflag,
           CAST(ROUND(
             SUM(CASE WHEN NOT isnan(l_extendedprice * l_quantity)
                      THEN l_extendedprice * l_quantity END)
             / SUM(CASE WHEN NOT isnan(l_quantity) THEN l_quantity END), 4)
                AS DOUBLE) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    description="grouped-aggregate pandas UDF: quantity-weighted mean price "
    "(X3). NB the pandas-UDF surface CONFLATES NULL and NaN (Arrow "
    "float64): both arrive as NaN and pandas sum() skips them — the "
    "oracle mirrors that as 'NaN is missing'.",
    tags=("X3",),
)
def x3_grouped_agg_udf(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(_weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4)
        .alias("wavg_price")
    )


def _long_docs(batches):
    for pdf in batches:
        toks = pdf["text"].str.split(" ").str.len()
        out = pdf.loc[toks >= 30, ["doc_id", "lang"]].copy()
        out["n_tokens"] = toks[toks >= 30].astype("int64")
        yield out


@register(
    "x5_map_in_pandas",
    oracle="""
    SELECT lang, COUNT(*) AS n_long, CAST(SUM(len(string_split(text, ' ')))
           AS BIGINT) AS tokens
    FROM documents WHERE len(string_split(text, ' ')) >= 30
    GROUP BY lang
    """,
    description="mapInPandas whole-partition filter+project (X5): keep "
    "long documents, then aggregate",
    tags=("X5",),
)
def x5_map_in_pandas(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    filtered = d.mapInPandas(_long_docs, schema="doc_id long, lang string, n_tokens long")
    return filtered.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_long"), F.sum("n_tokens").alias("tokens")
    )


def _asof_merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    cols = ["event_id", "user_id", "ts", "click_ts"]
    # NULL-ts probes ride around the merge: merge_asof RAISES on NaT in
    # a sorted-key column, and an unknown-time probe can match nothing —
    # a LEFT as-of join still keeps it with a null payload (same policy
    # as operators.asof; r7 hostile-corpus find). NULL-ts right rows can
    # never be matched and are dropped from the candidates.
    nat = left[left["ts"].isna()].copy()
    left = left[left["ts"].notna()].sort_values("ts")
    right = right[right["ts"].notna()]
    if left.empty or right.empty:
        out = pd.concat([left, nat]) if len(nat) else left.copy()
        out["click_ts"] = pd.Series(dtype="datetime64[ns]")
        return out[cols]
    merged = pd.merge_asof(left, right[["ts", "click_ts"]].sort_values("ts"),
                           on="ts", direction="backward")
    if len(nat):
        nat["click_ts"] = pd.Series(dtype="datetime64[ns]")
        merged = pd.concat([merged, nat[cols]])
    return merged[cols]


@register(
    "x6_cogroup_asof",
    oracle="""
    -- NULL-ts probes split out (DuckDB ASOF sorts a NULL probe as +inf
    -- and bogus-matches it — see j8c's oracle comment)
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    UNION ALL
    SELECT event_id, user_id, ts, NULL AS click_ts
    FROM events WHERE event_type = 'purchase' AND ts IS NULL
    """,
    description="cogrouped applyInPandas (X2 cogroup variant): purchases "
    "and clicks cogrouped per user, pandas merge_asof inside each group — "
    "the same as-of semantics as j8_asof_join (identical oracle), cross-"
    "checking the union-tag window implementation against pandas. Scale: "
    "one shuffle per side on the cogroup key; each group crosses the Arrow "
    "channel once — the per-key state never leaves one Python worker.",
    tags=("X2", "J8"),
)
def x6_cogroup_asof(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("ts").alias("click_ts")))
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _asof_merge,
            schema="event_id long, user_id long, ts timestamp, click_ts timestamp",
        )
    )


def _name_suffix_arrow(name: "pyarrow.Array") -> "pyarrow.Array":
    """'Customer#000000001' → 1 via pure Arrow kernels, degrading to NULL
    per row exactly like SQL TRY_CAST. extract_regex, NOT a blind
    slice+cast: a single name outside the format (empty, Unicode,
    free-form) made pc.cast throw and killed the whole job (r7
    hostile-corpus find; the oracle mirrors with regexp_extract +
    TRY_CAST). The cast itself is range-gated too: pc.cast has no try_
    form, so a digit run beyond int64 ('Customer#99999…') raised
    ArrowInvalid and killed the job while the oracle's TRY_CAST degraded
    to NULL (r7 advice). Exact TRY_CAST semantics: strip leading zeros,
    then a digit string is in range iff <19 digits, or ==19 and
    lexicographically ≤ '9223372036854775807' (equal-length digit
    strings compare numerically). Module-level so the int64-boundary
    parity test can drive the same kernels DuckDB-differentially."""
    import pyarrow.compute as pc

    m = pc.extract_regex(name, r"^Customer#(?P<sfx>[0-9]+)$")
    digits = pc.replace_substring_regex(pc.struct_field(m, "sfx"), r"^0+", "")
    digits = pc.if_else(pc.equal(pc.utf8_length(digits), 0),
                        pyarrow.scalar("0", pyarrow.string()), digits)
    n = pc.utf8_length(digits)
    in_range = pc.or_(
        pc.less(n, 19),
        pc.and_(pc.equal(n, 19),
                pc.less_equal(digits, pyarrow.scalar(str(2**63 - 1),
                                                     pyarrow.string()))))
    gated = pc.if_else(in_range, digits,
                       pyarrow.scalar(None, pyarrow.string()))
    return pc.cast(gated, pyarrow.int64())


@register(
    "x8_arrow_native_udf",
    oracle="""
    WITH p AS (
      -- regex-gated TRY_CAST mirrors the Spark UDF's extract_regex: a
      -- name outside the Customer#NNN format parses to NULL instead of
      -- aborting (r7 hostile-corpus find: one free-form name killed the
      -- whole job via pc.cast)
      SELECT c_mktsegment, c_custkey,
             TRY_CAST(regexp_extract(c_name, '^Customer#([0-9]+)$', 1)
                      AS BIGINT) AS sfx
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE sfx = c_custkey)
             AS BIGINT) AS n_consistent,
           CAST(SUM(sfx) AS BIGINT) AS sum_suffix
    FROM p GROUP BY c_mktsegment
    """,
    description="Arrow-native UDF (X1 on the Spark 4.1 arrow_udf API): "
    "pyarrow.compute kernels run directly on Arrow arrays — no "
    "pandas/numpy materialization on the Python side at all. Parses the "
    "numeric suffix out of c_name ('Customer#000000001') and checks it "
    "against c_custkey; integer outputs keep the hash gate exact. Scale: "
    "same single Arrow channel crossing as a pandas UDF, minus the "
    "Arrow→pandas→Arrow copy per batch.",
    tags=("X1",),
)
def x8_arrow_native_udf(spark, sf_dir):
    from pyspark.sql.functions import arrow_udf

    # NB: pyarrow is imported at module level because arrow_udf infers its
    # eval type via get_type_hints — under `from __future__ import
    # annotations` the hints are strings resolved in the module globals
    @arrow_udf("long")
    def name_suffix(name: pyarrow.Array) -> pyarrow.Array:
        return _name_suffix_arrow(name)

    c = load_table(spark, sf_dir, "customer")
    sfx = name_suffix(F.col("c_name"))
    return c.groupBy("c_mktsegment").agg(
        F.count_if(sfx == F.col("c_custkey")).alias("n_consistent"),
        F.sum(sfx).alias("sum_suffix"),
    )


def _doc_len_batches(batches):
    import pyarrow.compute as pc

    for rb in batches:
        n_chars = pc.cast(pc.utf8_length(rb.column("text")), pyarrow.int64())
        n_lines = pc.cast(
            pc.add(pc.count_substring(rb.column("text"), "\n"), 1),
            pyarrow.int64())
        keep = pc.greater_equal(n_chars, 120)
        out = pyarrow.RecordBatch.from_arrays(
            [rb.column("doc_id"), rb.column("lang"), n_chars, n_lines],
            names=["doc_id", "lang", "n_chars", "n_lines"],
        )
        yield out.filter(keep)


@register(
    "x10_map_in_arrow",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS chars,
           CAST(SUM(length(text) - length(replace(text, chr(10), '')) + 1)
             AS BIGINT) AS lines
    FROM documents WHERE length(text) >= 120
    GROUP BY lang
    """,
    description="mapInArrow whole-partition transform (X5's Arrow-native "
    "twin, Spark 4): pyarrow RecordBatches in, RecordBatches out — filter "
    "and length/line-count metrics computed entirely with pyarrow.compute "
    "kernels, no pandas materialization. utf8_length counts codepoints, "
    "matching DuckDB length() on UTF-8 text. Scale: identical plan shape "
    "to mapInPandas (one Arrow channel crossing, pushdown-transparent "
    "column pruning via the explicit select) but saves the Arrow→pandas "
    "copy on wide partitions.",
    tags=("X5",),
)
def x10_map_in_arrow(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    m = d.mapInArrow(
        _doc_len_batches,
        schema="doc_id long, lang string, n_chars long, n_lines long")
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.sum("n_lines").alias("lines"),
    )


@register(
    "x9_udtf_table_arg",
    oracle="""
    WITH f AS (
      SELECT user_id, event_type, value,
             -- ts NULLS FIRST matches Spark's table-arg ORDER BY
             -- (ASC = NULLS FIRST; DuckDB defaults NULLS LAST)
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST, event_id) AS rn
      FROM events)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
    FROM f GROUP BY user_id
    """,
    description="UDTF consuming TABLE(...) with PARTITION BY / ORDER BY "
    "(X4, the Spark 4 table-argument surface): the planner hash-"
    "partitions the input on user_id and sorts each partition by "
    "(ts, event_id) BEFORE the UDTF sees it, so terminate() emits one "
    "summary row per user whose 'first event' is order-correct by "
    "construction — stateful per-partition logic without applyInPandas. "
    "Exactness: integer cents accumulation. Scale: one shuffle on the "
    "partition key; UDTF rows cross the Arrow channel batched.",
    tags=("X4",),
)
def x9_udtf_table_arg(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n bigint, first_type string, "
                     "cents bigint")
    class PerUserSummary:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.first = None
            self.cents = None

        def eval(self, row):
            import math

            self.uid = row["user_id"]
            if self.first is None:
                self.first = row["event_type"]  # rows arrive ORDER BY ts
            self.n += 1
            # math.floor, not int(): int() truncates toward zero, so a
            # NEGATIVE value (e.g. -1.0 → -99 vs FLOOR's -100) silently
            # diverged from the oracle; a NULL value crashed the UDTF
            # outright. NULL skips the accumulation (SUM semantics) and
            # an all-NULL user yields NULL cents, exactly like SUM
            # (r7 hostile-corpus find).
            if row["value"] is not None:
                self.cents = (self.cents or 0) + math.floor(
                    row["value"] * 100 + 0.5)

        def terminate(self):
            if self.uid is not None:
                yield self.uid, self.n, self.first, self.cents

    spark.udtf.register("per_user_summary", PerUserSummary)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql("""
        SELECT * FROM per_user_summary(
            TABLE(SELECT user_id, event_type, ts, event_id, value
                  FROM events_v)
            PARTITION BY user_id ORDER BY (ts, event_id))
    """)


@register(
    "x11_pandas_iter_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice * 1.1 AS DECIMAL(18,4))) AS DOUBLE)
               AS adj_total,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    description="ITERATOR-form scalar pandas UDF (X1 variant, "
    "Iterator[pd.Series] -> Iterator[pd.Series]): the form that amortizes "
    "expensive per-worker initialization (model load, dictionary build) "
    "across every Arrow batch of a partition instead of paying it per "
    "batch — the serving-shaped UDF surface. The 'expensive init' here is "
    "a deterministic factor built once before the loop; the per-row "
    "double is cast to DECIMAL(18,4) (boundary-free: 2-decimal money x "
    "1.1 has <= 3 decimals) so the aggregate is exact.",
    tags=("X1",),
)
def x11_pandas_iter_udf(spark, sf_dir):

    @pandas_udf("double")
    def adjust(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        factor = 1.1  # stands in for per-worker init (built ONCE per task)
        for prices in batches:
            yield prices * factor

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("adj", adjust(F.col("o_totalprice")))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("adj").cast("decimal(18,4)")).cast("double")
            .alias("adj_total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "sql29_sql_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
               AS n_open,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
               AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
    description="SQL PIVOT clause (the declarative wide-format twin of "
    "a13's DataFrame pivot): order counts per priority spread across "
    "status columns, absent combinations coalesced to zero. The oracle "
    "is the dialect-neutral conditional-count form. Scale: Catalyst "
    "rewrites PIVOT into exactly that conditional aggregate — one "
    "shuffle on the grouping key, map-side partials.",
    tags=("A13", "SQL"),
)
def sql29_sql_pivot(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(COALESCE(o, 0) AS BIGINT) AS n_open,
               CAST(COALESCE(f, 0) AS BIGINT) AS n_finished,
               CAST(COALESCE(p, 0) AS BIGINT) AS n_pending
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))
    """)
