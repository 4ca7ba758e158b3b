"""Core relational operator catalog (SURVEY.md §2.2–§2.7).

Each entry pairs an idiomatic DataFrame implementation with a DuckDB oracle.
Naming follows the SURVEY §2 inventory ids. Money arithmetic follows the
exact-decimal convention in plans.helpers (no cross-engine double rounding).
Scale notes appear on entries whose plan shape matters at 100 TB
(broadcasts, shuffle keys, top-k).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .helpers import (cents, cents_avg, cents_sum, davg, dsum, m, msql, oavg,
                      ocents, ocents_avg, ocents_sum, osum)
from .registry import register

_DISC_PRICE = f"{msql('l_extendedprice')} * (1 - {msql('l_discount')})"
_CHARGE = f"{_DISC_PRICE} * (1 + {msql('l_tax')})"

# fixed-point forms (see helpers: exact integer-cents fast path)
_PC = ocents("l_extendedprice")            # price in cents
_DC = f"(100 - {ocents('l_discount')})"    # (1 - discount) ×100
_TC = f"(100 + {ocents('l_tax')})"         # (1 + tax) ×100
_REV_C = f"{_PC} * {_DC}"                  # disc price ×10^4

# ---------------------------------------------------------------------------
# M0 flagship — pricing summary (TPC-H Q1 shape): S1+P1–P3+A1+O1 in one query.
# Scale: single shuffle on a 6-value grouping key with map-side partial agg;
# the parquet scan prunes to 7 columns and pushes the shipdate filter down.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ocents_sum('CAST(l_quantity AS BIGINT)', 1, 'sum_qty')},
           {ocents_sum(_PC, 100, 'sum_base_price')},
           {ocents_sum(_REV_C, 10000, 'sum_disc_price')},
           {ocents_sum(f'{_REV_C} * {_TC}', 1000000, 'sum_charge')},
           {ocents_avg('CAST(l_quantity AS BIGINT)', 1, 'avg_qty')},
           {ocents_avg(_PC, 100, 'avg_price')},
           {ocents_avg(ocents('l_discount'), 100, 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="per-flag/status pricing rollup (flagship; TPC-H Q1 shape). "
    "All sums run as exact integer-cents longs in whole-stage codegen "
    "(helpers: the decimal form profiled 4× slower).",
    tags=("A1", "P1", "P2", "O1"),
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    pc = cents("l_extendedprice")
    rev_c = pc * (100 - cents("l_discount"))
    charge_c = rev_c * (100 + cents("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            cents_sum(qty, 1, "sum_qty"),
            cents_sum(pc, 100, "sum_base_price"),
            cents_sum(rev_c, 10000, "sum_disc_price"),
            cents_sum(charge_c, 1000000, "sum_charge"),
            cents_avg(qty, 1, "avg_qty"),
            cents_avg(pc, 100, "avg_price"),
            cents_avg(cents("l_discount"), 100, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "p2_filter_project",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(ROUND({msql('o_totalprice')} * CAST(0.9 AS DECIMAL(2,1)), 2)
                AS DOUBLE) AS discounted
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    """,
    description="filter + computed projection (P1,P2,P3); money factor in "
    "exact decimal",
    tags=("P1", "P2", "P3"),
)
def p2_filter_project(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & F.col("o_totalprice").between(50000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.round(m("o_totalprice") * F.expr("CAST(0.9 AS DECIMAL(2,1))"), 2)
            .cast("double")
            .alias("discounted"),
        )
    )


@register(
    "p3_like_rlike",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%bolt%'
      AND regexp_matches(p_name, '^(cold|small|large)')
      AND p_size IS NOT NULL
      AND NOT (p_brand = 'Brand#00')
    """,
    description="LIKE / regex / null-check predicates (P3)",
    tags=("P3",),
)
def p3_like_rlike(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%bolt%")
            & F.col("p_name").rlike("^(cold|small|large)")
            & F.col("p_size").isNotNull()
            & ~(F.col("p_brand") == "Brand#00")
        ).select("p_partkey", "p_name", "p_type")
    )


@register(
    "p4_case_coalesce",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_class,
           COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg,
           GREATEST(c_acctbal, 0.0) AS pos_bal
    FROM customer
    """,
    description="CASE WHEN / NULLIF / COALESCE / GREATEST (P4)",
    tags=("P4",),
)
def p4_case_coalesce(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias("seg"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("pos_bal"),
    )


@register(
    "p5_casts",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST(l_orderkey AS VARCHAR) AS key_str
    FROM lineitem WHERE l_orderkey < 100
    """,
    description="type coercion battery (P5; integral-valued only — Spark "
    "truncates double→int while DuckDB rounds)",
    tags=("P5",),
)
def p5_casts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        F.col("l_orderkey").cast("string").alias("key_str"),
    )


@register(
    "p6_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    description="SELECT DISTINCT projection (P6)",
    tags=("P6",),
)
def p6_distinct(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "j1_inner_join",
    oracle=f"""
    SELECT o_orderkey, o_orderdate,
           {ocents_sum(_REV_C, 10000, 'revenue')},
           COUNT(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderkey, o_orderdate
    """,
    description="inner equi-join + group (J1). Scale: lineitem pre-aggregates "
    "by orderkey BEFORE the join (map-side partial combine shrinks the "
    "shuffle to one row per order), then joins the filtered orders — the "
    "joined rows never re-shuffle. Equivalent to join-then-group because the "
    "grouping key contains the join key.",
    tags=("J1",),
    bench=True,
)
def j1_inner_join(spark, sf_dir):
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            cents_sum(cents("l_extendedprice") * (100 - cents("l_discount")), 10000, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .select("o_orderkey", "o_orderdate", "revenue", "n_items")
    )


@register(
    "j2_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM({msql('o_totalprice')}), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders
      ON o_custkey = c_custkey AND o_totalprice > 250000
    GROUP BY c_custkey, c_name
    """,
    description="left outer join preserving customers with no matches (J2)",
    tags=("J2",),
)
def j2_left_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 250000), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(m("o_totalprice")), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "j2b_full_outer",
    oracle="""
    WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n_orders
               FROM orders WHERE year(o_orderdate) >= 1996 GROUP BY 1),
         l AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS y, COUNT(*) AS n_items
               FROM lineitem WHERE year(l_shipdate) <= 2000 GROUP BY 1)
    SELECT COALESCE(o.y, l.y) AS y, o.n_orders, l.n_items
    FROM o FULL JOIN l ON o.y = l.y
    """,
    description="full outer join with unmatched rows on both sides (J2)",
    tags=("J2",),
)
def j2b_full_outer(spark, sf_dir):
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") >= 1996)
        .groupBy(F.year("o_orderdate").cast("long").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") <= 2000)
        .groupBy(F.year("l_shipdate").cast("long").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    return o.join(li, o.y == li.y, "full").select(
        F.coalesce(o.y, li.y).alias("y"), "n_orders", "n_items"
    )


@register(
    "j3_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    description="left semi join: existence filter (J3)",
    tags=("J3",),
)
def j3_semi_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "j4_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    description="left anti join: non-existence filter (J4)",
    tags=("J4",),
)
def j4_anti_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "j5_star_broadcast",
    oracle=f"""
    SELECT r_name, n_name,
           {ocents_sum(_REV_C, 10000, 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY r_name, n_name
    """,
    description="star join with explicit dim broadcasts (J5). Scale: the "
    "fact table never shuffles for the joins — all three dims broadcast; "
    "the only shuffle is the final 25-key aggregation.",
    tags=("J5", "J1", "A1"),
    bench=True,
)
def j5_star_broadcast(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            cents_sum(cents("l_extendedprice") * (100 - cents("l_discount")), 10000, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j6_theta_join",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_pairs,
           {osum(f"{msql('s_acctbal')} - {msql('p_retailprice')}", 'bal_gap')}
    FROM part JOIN supplier ON s_acctbal > p_retailprice
    WHERE p_size > 40
    GROUP BY p_brand
    """,
    description="non-equi (theta) join → broadcast nested loop (J6). Scale: "
    "keep the small side broadcast; a pure theta join is O(n·m) by nature.",
    tags=("J6",),
)
def j6_theta_join(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        p.join(s, s.s_acctbal > p.p_retailprice, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(m("s_acctbal") - m("p_retailprice"), "bal_gap"),
        )
    )


@register(
    "j7_range_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_shipped_fast
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
    description="equi+range interval join (J7). Scale: the equi key carries "
    "the shuffle; the range predicate evaluates post-match (no nested loop).",
    tags=("J7",),
)
def j7_range_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAY"))
    )
    return (
        o.join(li, cond, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_shipped_fast"))
    )


@register(
    "j7b_bucketed_range",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
         wins AS (SELECT d + INTERVAL 2 HOUR AS lo, d + INTERVAL 6 HOUR AS hi
                  FROM days)
    SELECT lo AS window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
    FROM wins JOIN events ON ts >= lo AND ts < hi
    GROUP BY 1
    """,
    description="keyless point-in-interval join (J7 hard case) via "
    "operators.rangejoin: a pure range predicate would force a nested-loop "
    "O(n*m) plan; bucketing manufactures an equi key (point -> its hour "
    "bucket, interval -> every overlapped bucket) so it runs as an ordinary "
    "equi-join + post-match refine",
    tags=("J7",),
)
def j7b_bucketed_range(spark, sf_dir):
    from ..operators.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    wins = (
        ev.select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .select(
            (F.col("d") + F.expr("INTERVAL 2 HOURS")).alias("lo"),
            (F.col("d") + F.expr("INTERVAL 6 HOURS")).alias("hi"),
        )
    )
    joined = bucketed_range_join(ev.select("ts", "value"), wins, "ts", "lo", "hi")
    return joined.groupBy(F.col("lo").alias("window_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("sum_value"),
    )


@register(
    "j9_cross_join",
    oracle="""
    SELECT r_name, n_name, CAST(r_regionkey = n_regionkey AS BOOLEAN) AS is_home
    FROM region CROSS JOIN nation
    """,
    description="explicit cartesian product (J9) — dims only; never the fact table",
    tags=("J9",),
)
def j9_cross_join(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home")
    )


@register(
    "j10_self_join",
    oracle="""
    SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rk
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    description="self join: same-region nation pairs (J10)",
    tags=("J10",),
)
def j10_self_join(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("n1"),
            F.col("b.n_name").alias("n2"),
            F.col("a.n_regionkey").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregation
# ---------------------------------------------------------------------------


@register(
    "a2_global_agg",
    oracle=f"""
    SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_orders,
           {ocents_sum('CAST(l_quantity AS BIGINT)', 1, 'sum_qty')},
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
    description="global (ungrouped) aggregate (A2)",
    tags=("A2",),
)
def a2_global_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        cents_sum(F.col("l_quantity").cast("long"), 1, "sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "a3_distinct_agg",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio,
           CAST(SUM(DISTINCT {msql('o_totalprice')}) AS DOUBLE) AS sum_dist_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    description="distinct aggregates (A3)",
    tags=("A3",),
)
def a3_distinct_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.sum_distinct(m("o_totalprice")).cast("double").alias("sum_dist_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a4_approx_distinct",
    oracle=None,  # approximate — driver records rows-only check
    description="HLL approx_count_distinct (A4; rows-only by design)",
    tags=("A4",),
)
def a4_approx_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.approx_count_distinct("event_id", 0.02).alias("approx_events"),
        F.percentile_approx("value", 0.5, 1000).alias("approx_median_value"),
    )


@register(
    "a4b_hll_sketch",
    oracle=None,  # approximate — driver records rows-only check
    description="Apache DataSketches HLL (A4, Spark 4 surface): "
    "hll_sketch_agg builds MERGEABLE per-group sketches — at scale the "
    "binary sketches persist alongside rollups and re-merge (hll_union_agg)"
    " for coarser grains without rescanning raw data; rows-only by design",
    tags=("A4",),
)
def a4b_hll_sketch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
        .alias("nd_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("event_id", F.lit(12)))
        .alias("nd_events"),
    )


@register(
    "a4c_approx_distinct_gate",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INT) AS approx_ok
    FROM events GROUP BY event_type
    """,
    description="A4 under the HARD hash gate: the approximate distinct "
    "count is validated against the exact one inside the query — the "
    "result carries the exact counts plus a flag that the HLL estimate "
    "(rsd 0.02, measured max rel-err 0.4% on these fixtures) landed "
    "within 10%. The oracle asserts flag=1, so a broken approx path "
    "fails the driver's hash even though the estimate itself is "
    "engine-specific. Companion to the rows-only a4/a4b.",
    tags=("A4",),
)
def a4c_approx_distinct_gate(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("__approx"),
    )
    return g.select(
        "event_type", "exact_users",
        F.when(
            F.abs(F.col("__approx") - F.col("exact_users"))
            <= 0.1 * F.col("exact_users"), 1
        ).otherwise(0).cast("int").alias("approx_ok"),
    )


@register(
    "a4d_hll_merge_rollup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           CAST(1 AS INT) AS merge_ok
    FROM events GROUP BY event_type
    """,
    description="A4's SCALE pattern under the hash gate: per-(day, type) "
    "HLL sketches built first, then MERGED across days (hll_union_agg) — "
    "the two-level rollup that lets 100 TB pipelines persist mergeable "
    "binary sketches next to their rollups and answer distinct-count "
    "queries without revisiting raw data. The merged estimate is gated "
    "in-query against the exact distinct count (within 10%; the exact "
    "branch exists only for the gate), so the driver's hash verifies the "
    "union path end-to-end even though sketch bytes are engine-specific.",
    tags=("A4", "T1"),
)
def a4d_hll_merge_rollup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d"), "event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type", "exact_users",
        F.when(
            F.abs(F.col("__est") - F.col("exact_users"))
            <= 0.1 * F.col("exact_users"), 1
        ).otherwise(0).cast("int").alias("merge_ok"),
    )


@register(
    "a5_percentiles",
    oracle="""
    -- isnan CASEs mirror the Spark side's nan_to_null: a NaN metric is
    -- EXCLUDED from percentiles on both engines (each engine would
    -- otherwise rank it greatest, but with subtly different
    -- interpolation around it — r7 hostile-corpus tier-2 find)
    SELECT l_returnflag,
           CAST(ROUND(median(CASE WHEN NOT isnan(l_extendedprice)
                             THEN l_extendedprice END), 4) AS DOUBLE)
             AS med_price,
           CAST(ROUND(quantile_cont(CASE WHEN NOT isnan(l_extendedprice)
                                    THEN l_extendedprice END, 0.9), 4)
                AS DOUBLE) AS p90_price,
           CAST(ROUND(quantile_cont(CASE WHEN NOT isnan(l_quantity)
                                    THEN l_quantity END, 0.25), 4)
                AS DOUBLE) AS q1_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    description="exact interpolated percentiles (A5)",
    tags=("A5",),
)
def a5_percentiles(spark, sf_dir):
    from .helpers import nan_to_null

    li = load_table(spark, sf_dir, "lineitem")
    # nan_to_null: Spark percentiles rank NaN as the GREATEST value,
    # DuckDB excludes it — a NaN metric is excluded on both engines
    price = nan_to_null("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median(price), 4).alias("med_price"),
        F.round(F.percentile(price, 0.9), 4).alias("p90_price"),
        F.round(F.percentile(nan_to_null("l_quantity"), 0.25), 4)
        .alias("q1_qty"),
    )


@register(
    "a5c_approx_percentile_gate",
    oracle="""
    -- isnan CASE: see a5 — NaN excluded on both engines
    SELECT l_returnflag,
           CAST(ROUND(median(CASE WHEN NOT isnan(l_extendedprice)
                             THEN l_extendedprice END), 4) AS DOUBLE)
             AS med_exact,
           CAST(ROUND(quantile_cont(CASE WHEN NOT isnan(l_extendedprice)
                                    THEN l_extendedprice END, 0.9), 4)
                AS DOUBLE) AS p90_exact,
           TRUE AS med_ok, TRUE AS p90_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    description="approx-percentile gate (the a4c pattern for A5): "
    "percentile_approx (KLL-style sketch, accuracy=10000 => rank error "
    "<= 1e-4) is validated in-query against the exact interpolated "
    "percentile — the output carries the exact values plus booleans "
    "asserting the sketch landed within 1% relative, which the oracle "
    "hash-gates. At 100 TB only the sketch path is feasible (exact "
    "percentiles need a full sort per group); this query is the "
    "standing proof its error bound holds on this data.",
    tags=("A5", "A4"),
)
def a5c_approx_percentile_gate(spark, sf_dir):
    from .helpers import nan_to_null

    li = load_table(spark, sf_dir, "lineitem")
    # nan_to_null: see a5 — NaN is excluded from percentiles on both
    # engines (and percentile_approx must see the same multiset)
    price = nan_to_null("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.median(price).alias("med_e"),
        F.percentile(price, 0.9).alias("p90_e"),
        F.percentile_approx(price, 0.5, 10000).alias("med_a"),
        F.percentile_approx(price, 0.9, 10000).alias("p90_a"),
    )
    rel = lambda a, e: F.abs(a - e) / F.abs(e)
    return agg.select(
        "l_returnflag",
        F.round("med_e", 4).alias("med_exact"),
        F.round("p90_e", 4).alias("p90_exact"),
        (rel(F.col("med_a"), F.col("med_e")) <= 0.01).alias("med_ok"),
        (rel(F.col("p90_a"), F.col("p90_e")) <= 0.01).alias("p90_ok"),
    )


@register(
    "a6_stats_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(stddev_samp(l_quantity), 4) AS DOUBLE) AS sd_qty,
           CAST(ROUND(var_samp(l_discount), 8) AS DOUBLE) AS var_disc,
           CAST(ROUND(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
           CAST(ROUND(covar_samp(l_quantity, l_discount), 4) AS DOUBLE) AS covar_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    description="statistical aggregates (A6; rounded — order-dependent floats)",
    tags=("A6",),
)
def a6_stats_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


@register(
    "a6b_regression_agg",
    oracle="""
    SELECT event_type,
           regr_count(value, user_id) AS n,
           CAST(ROUND(regr_slope(value, user_id), 6) AS DOUBLE) AS slope,
           CAST(ROUND(regr_intercept(value, user_id), 4) AS DOUBLE) AS icept,
           CAST(ROUND(regr_r2(value, user_id), 6) AS DOUBLE) AS r2,
           CAST(ROUND(regr_avgx(value, user_id), 6) AS DOUBLE) AS avgx
    FROM events GROUP BY event_type
    """,
    description="linear-regression aggregates (A6): regr_slope/intercept/"
    "r2/avgx/count per event type (rounded — order-dependent float sums)",
    tags=("A6",),
)
def a6b_regression_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    y, x = F.col("value"), F.col("user_id")
    return ev.groupBy("event_type").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avgx"),
    )


@register(
    "a14_string_agg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) t
    GROUP BY c_nationkey
    """,
    description="ordered string aggregation (A8 cousin): per-nation sorted "
    "'|'-joined distinct segments — sort inside the group makes the "
    "concatenation deterministic",
    tags=("A8",),
)
def a14_string_agg(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment").distinct()
        .groupBy("c_nationkey")
        .agg(F.array_join(F.sort_array(F.collect_list("c_mktsegment")), "|").alias("segs"))
    )


@register(
    "a14b_listagg",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs,
           string_agg(DISTINCT c_mktsegment, ','
                      ORDER BY c_mktsegment) AS distinct_segs
    FROM customer GROUP BY c_nationkey
    """,
    description="ANSI listagg (Spark 4.0 F.listagg / WITHIN GROUP "
    "(ORDER BY ...)): per-nation ordered concatenation over ALL rows "
    "plus the DISTINCT form — the standard ordered string aggregate, "
    "executed by the engine's own ordered-agg path instead of the "
    "collect_list+sort_array composition a14 uses (both graded; same "
    "oracle builtin). Scale: one shuffle; per-group state is the "
    "concatenation buffer — bounded here by segment cardinality.",
    tags=("A8",),
)
def a14b_listagg(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("listagg(c_mktsegment, '|') WITHIN GROUP "
               "(ORDER BY c_mktsegment)").alias("segs"),
        F.expr("listagg(DISTINCT c_mktsegment, ',') WITHIN GROUP "
               "(ORDER BY c_mktsegment)").alias("distinct_segs"),
    )


@register(
    "a7_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {ocents_sum('CAST(l_quantity AS BIGINT)', 1, 'sum_qty')},
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    description="rollup subtotals (A7)",
    tags=("A7",),
    bench=True,
)
def a7_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum(F.col("l_quantity").cast("long"), 1, "sum_qty"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "a7b_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {ocents_sum(ocents('o_totalprice'), 100, 'sum_price')}
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    description="cube subtotals (A7)",
    tags=("A7",),
)
def a7b_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), cents_sum(cents("o_totalprice"), 100, "sum_price")
    )


@register(
    "a7c_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {ocents_sum(ocents('o_totalprice'), 100, 'sum_price')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="explicit GROUPING SETS — per-status, per-priority, and "
    "grand-total in one pass (A7); Spark expands to a single expand+agg, "
    "not three scans",
    tags=("A7",),
)
def a7c_grouping_sets(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"), cents_sum(cents("o_totalprice"), 100, "sum_price"))


@register(
    "a8_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
               AS prios
    FROM orders WHERE o_totalprice > 400000
    GROUP BY o_custkey
    """,
    description="per-group collected lists/sets, sorted for determinism and "
    "serialized to CSV strings (A8) — the driver's canonicalizer sorts raw "
    "pandas columns, so array cells are unhashable; string form hashes "
    "identically on both engines",
    tags=("A8",),
)
def a8_collect(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",")
        .alias("order_keys"),
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",")
        .alias("prios"),
    )


@register(
    "a9_conditional_agg",
    oracle=f"""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {msql('l_extendedprice')}
                         ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
               AS returned_value,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_linestatus
    """,
    description="filtered / conditional aggregates (A9)",
    tags=("A9",),
)
def a9_conditional_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    returned = F.when(F.col("l_returnflag") == "R", m("l_extendedprice")).otherwise(
        F.lit(0).cast("decimal(10,2)")
    )
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        dsum(returned, "returned_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a10_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS top_order,
           arg_min(o_orderkey, o_totalprice) AS bottom_order,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_orderstatus
    """,
    description="arg_min/arg_max per-group picks (A10)",
    tags=("A10",),
)
def a10_minmax_by(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        F.max("o_totalprice").alias("top_price"),
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "w1_ranking",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
                 CAST(RANK() OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
                 CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
          FROM customer) t
    WHERE rn <= 3
    """,
    description="ranking window functions + top-3 per nation (W1, W4)",
    tags=("W1", "W4"),
)
def w1_ranking(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w_det = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w_det).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(event_type) OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           value - lag(value) OVER w AS delta
    FROM events
    -- ts NULLS FIRST explicit: Spark ASC = NULLS FIRST, DuckDB default
    -- = NULLS LAST (r7 hostile-corpus find)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    """,
    description="lag/lead analytic windows over the event stream (W2)",
    tags=("W2",),
)
def w2_lag_lead(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "w3_running_frames",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM({msql('o_totalprice')}) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS run_total,
           CAST(SUM({msql('o_totalprice')}) OVER w3 AS DOUBLE)
               / COUNT(*) OVER w3 AS mov_avg,
           first_value(o_orderkey) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    description="running totals + moving average frames (W3); exact decimal "
    "window sums",
    tags=("W3",),
)
def w3_running_frames(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    order = [F.asc("o_orderdate"), F.asc("o_orderkey")]
    w_run = (
        Window.partitionBy("o_custkey").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, Window.currentRow)
    dec_price = m("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec_price).over(w_run).cast("double").alias("run_total"),
        (F.sum(dec_price).over(w3).cast("double") / F.count(F.lit(1)).over(w3))
        .alias("mov_avg"),
        F.first("o_orderkey").over(
            Window.partitionBy("o_custkey").orderBy(*order)
        ).alias("first_order"),
    )


@register(
    "w4_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                      ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
          FROM part) t
    WHERE rn <= 3
    """,
    description="top-k rows per group (W4). Scale: one shuffle on the "
    "group key; no global sort.",
    tags=("W4",),
    bench=True,
)
def w4_topk_per_group(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w5_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER wd AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM customer
    WINDOW wd AS (PARTITION BY c_nationkey
                  ORDER BY c_acctbal NULLS FIRST, c_custkey),
           w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal NULLS FIRST)
    """,
    description="distribution window functions: ntile / percent_rank / "
    "cume_dist (W1). Both engines compute (rank-1)/(n-1) on identical "
    "inputs — bit-identical doubles, no rounding. NULLS FIRST is explicit "
    "on both sides: Spark's ASC default is NULLS FIRST but DuckDB's is "
    "NULLS LAST, so a NULL balance silently shifts every rank "
    "(r7 hostile-corpus find).",
    tags=("W1",),
)
def w5_distribution(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    wd = Window.partitionBy("c_nationkey").orderBy(
        F.asc_nulls_first("c_acctbal"), F.asc("c_custkey"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc_nulls_first("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(wd).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "a12_bool_agg",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 2000) AS all_over_2k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    description="boolean aggregates: bool_and / bool_or (A-family)",
    tags=("A9",),
)
def a12_bool_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 2000).alias("all_over_2k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a13_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup
    FROM events GROUP BY user_id
    """,
    description="pivot: per-user event-type counts as columns (explicit "
    "pivot values → no extra distinct-scan pass, deterministic columns)",
    tags=("A1",),
)
def a13_pivot(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .count()
    )
    # pivot-count yields nulls for absent combos; oracle FILTER yields 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ("click", "view", "purchase", "error", "signup")],
    )


@register(
    "a13b_transpose",
    oracle="""
    SELECT k,
           CAST(CASE k WHEN 'n_events' THEN COUNT(*) FILTER (WHERE event_type='click')
                WHEN 'n_users' THEN COUNT(DISTINCT user_id) FILTER (WHERE event_type='click') END AS BIGINT) AS click,
           CAST(CASE k WHEN 'n_events' THEN COUNT(*) FILTER (WHERE event_type='error')
                WHEN 'n_users' THEN COUNT(DISTINCT user_id) FILTER (WHERE event_type='error') END AS BIGINT) AS error,
           CAST(CASE k WHEN 'n_events' THEN COUNT(*) FILTER (WHERE event_type='purchase')
                WHEN 'n_users' THEN COUNT(DISTINCT user_id) FILTER (WHERE event_type='purchase') END AS BIGINT) AS purchase,
           CAST(CASE k WHEN 'n_events' THEN COUNT(*) FILTER (WHERE event_type='signup')
                WHEN 'n_users' THEN COUNT(DISTINCT user_id) FILTER (WHERE event_type='signup') END AS BIGINT) AS signup,
           CAST(CASE k WHEN 'n_events' THEN COUNT(*) FILTER (WHERE event_type='view')
                WHEN 'n_users' THEN COUNT(DISTINCT user_id) FILTER (WHERE event_type='view') END AS BIGINT) AS view
    FROM events CROSS JOIN (SELECT unnest(['n_events', 'n_users']) AS k)
    GROUP BY k
    """,
    description="DataFrame.transpose (Spark 4.0, the pivot dual): a "
    "per-event-type metrics frame (rows = metrics, after transpose "
    "columns = event types) flipped so each metric becomes one wide row "
    "keyed by the first column. Column names come from the index "
    "column's values — deterministic here because the metric frame is "
    "ordered. Scale: transpose collects the (tiny, already-aggregated) "
    "frame through the driver by design — apply it to rollup outputs, "
    "never to fact tables (a13 pivot is the distributed form).",
    tags=("A1", "U5"),
)
def a13b_transpose(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    metrics = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )
    # transpose: index column = event_type; remaining numeric columns
    # become rows keyed by their former column name
    t = metrics.transpose(F.col("event_type"))
    # the transposed schema is DATA-dependent (one column per observed
    # event_type): a slice with zero rows of some type would make a
    # hard-coded F.col raise UNRESOLVED_COLUMN at plan time, where the
    # oracle's FILTER form still emits the column — fill absent types
    # with NULL instead (a13's pivot gets this from explicit values())
    present = set(t.columns)
    return t.withColumnRenamed("key", "k").select(
        "k", *[(F.col(c).cast("bigint") if c in present
                else F.lit(None).cast("bigint")).alias(c)
               for c in ("click", "error", "purchase", "signup", "view")])


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k
# ---------------------------------------------------------------------------


@register(
    "o3_global_sort",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_regionkey DESC, n_name NULLS LAST
    """,
    description="full global sort (O1): range-partitioned total order with "
    "explicit null placement (Spark asc default NULLS FIRST vs DuckDB "
    "NULLS LAST — always stated)",
    tags=("O1",),
)
def o3_global_sort(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    return n.orderBy(F.desc("n_regionkey"), F.asc_nulls_last("n_name")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "p7_sample",
    oracle=None,  # sampling is engine-specific by nature
    description="Bernoulli sample with fixed seed (rows-only: sample "
    "semantics are engine-private)",
    tags=("P2",),
)
def p7_sample(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "o1_top10_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    description="global top-k: sort+limit → TakeOrderedAndProject, no full "
    "sort at scale (O1,O3)",
    tags=("O1", "O3"),
)
def o1_top10_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


@register(
    "o2_limit_offset",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 5
    """,
    description="limit+offset over a total order (O2)",
    tags=("O2",),
)
def o2_limit_offset(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .select("c_custkey", "c_acctbal")
        .offset(5)
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "u1_union_all",
    oracle="""
    SELECT c_custkey AS k, 'cust' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT o_custkey AS k, 'ord' AS src FROM orders WHERE o_totalprice > 400000
    """,
    description="union all, duplicates preserved (U1)",
    tags=("U1",),
)
def u1_union_all(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"), F.lit("cust").alias("src"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"), F.lit("ord").alias("src"))
    )
    return c.unionByName(o)


@register(
    "u2_union_distinct",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
    """,
    description="union distinct (U2)",
    tags=("U2",),
)
def u2_union_distinct(spark, sf_dir):
    a = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("k"))
    )
    return a.union(b).distinct()


@register(
    "u3_intersect",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
    """,
    description="intersect distinct (U3)",
    tags=("U3",),
)
def u3_intersect(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@register(
    "u3b_intersect_all",
    oracle="""
    SELECT l_suppkey AS k, l_linestatus AS st FROM lineitem WHERE l_orderkey % 3 = 0
    INTERSECT ALL
    SELECT l_suppkey AS k, l_linestatus AS st FROM lineitem WHERE l_orderkey % 2 = 0
    """,
    description="intersect preserving multiplicity (U3): min(count_a, "
    "count_b) copies per value survive",
    tags=("U3",),
)
def u3b_intersect_all(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 3 == 0).select(
        F.col("l_suppkey").alias("k"), F.col("l_linestatus").alias("st"))
    b = li.filter(F.col("l_orderkey") % 2 == 0).select(
        F.col("l_suppkey").alias("k"), F.col("l_linestatus").alias("st"))
    return a.intersectAll(b)


@register(
    "u4b_except_all",
    oracle="""
    SELECT l_suppkey AS k, l_linestatus AS st FROM lineitem WHERE l_orderkey % 3 = 0
    EXCEPT ALL
    SELECT l_suppkey AS k, l_linestatus AS st FROM lineitem WHERE l_orderkey % 4 = 0
    """,
    description="bag difference preserving multiplicity (U4): "
    "max(count_a - count_b, 0) copies per value survive (sides sized so "
    "the difference is non-empty at every scale factor)",
    tags=("U4",),
)
def u4b_except_all(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 3 == 0).select(
        F.col("l_suppkey").alias("k"), F.col("l_linestatus").alias("st"))
    b = li.filter(F.col("l_orderkey") % 4 == 0).select(
        F.col("l_suppkey").alias("k"), F.col("l_linestatus").alias("st"))
    # %4 on the subtracted side (not %2): the larger %2 bag swallowed every
    # multiplicity at sf0.01, leaving a vacuous empty-vs-empty oracle match
    return a.exceptAll(b)


@register(
    "j11_nullsafe_join",
    oracle="""
    WITH a AS (SELECT event_id, nullif(user_id % 5, 0) AS k
               FROM events WHERE user_id < 15),
         b AS (SELECT event_id, nullif(user_id % 5, 0) AS k
               FROM events WHERE user_id >= 15 AND user_id < 30)
    SELECT a.k AS k, COUNT(*) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
    description="null-safe equality join (J1 variant): <=> treats NULL as a "
    "joinable key value — EqualNullSafe is still an equi-predicate, so the "
    "plan stays a hash join, not a nested loop",
    tags=("J1",),
)
def j11_nullsafe_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("user_id") % 5, F.lit(0)).alias("k")
    a = ev.filter(F.col("user_id") < 15).select("event_id", k)
    b = ev.filter((F.col("user_id") >= 15) & (F.col("user_id") < 30)).select("event_id", k)
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]), "inner")
        .groupBy(a["k"].alias("k"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "u4_except",
    oracle="""
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    description="except distinct (U4)",
    tags=("U4",),
)
def u4_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("o_custkey").alias("k"))
    )
    return c.subtract(o)


@register(
    "w6_ratio_to_report",
    oracle="""
    WITH nat_rev AS (
        SELECT c_nationkey,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    SELECT c_nationkey, CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE)
             AS revenue_share
    FROM nat_rev
    """,
    description="ratio-to-report: each nation's share of total revenue via "
    "an empty-partition window over the AGGREGATED rows. Scale: the "
    "unpartitioned window is safe because it runs on 25 post-agg rows, not "
    "the fact — aggregate first, window second; customer dim broadcasts "
    "into the fact join.",
    tags=("W3", "A1", "J5"),
)
def w6_ratio_to_report(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat_rev = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    )
    # unpartitioned window is deliberate here: its input is the per-NATION
    # aggregate (bounded at |nations| rows at any corpus size), so the
    # single-partition WindowExec holds 25 rows — not a scale hazard.
    # (Contrast sql24, where the same shape over per-partkey rows was a
    # real serialization point and uses a broadcast scalar instead.)
    # The window sums the integer CENTS, not doubles: a 25-term double
    # sum is accumulation-order-dependent and could flip the unrounded
    # revenue_share repr in one engine only (helpers.py convention).
    w = Window.partitionBy()
    return nat_rev.select(
        "c_nationkey",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.col("rev_c").cast("double")
         / F.sum("rev_c").over(w).cast("double")).alias("revenue_share"),
    )


@register(
    "a7d_share_of_parent",
    oracle="""
    WITH nr AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), tot AS (SELECT SUM(rev_c) AS tot_c FROM nr)
    SELECT region, nation,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c AS DOUBLE)
             / CAST(SUM(rev_c) OVER (PARTITION BY region) AS DOUBLE)
               AS share_of_region,
           CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS share_of_total
    FROM nr, tot
    """,
    description="hierarchical share-of-parent analytic (A7 cousin): each "
    "nation's revenue as a fraction of its region and of the whole — the "
    "drill-down ratio every BI rollup needs. Ratios divide exact "
    "integer-cents longs, so no rounding is required anywhere. Scale: one "
    "fact shuffle to the (region, nation) aggregate; the region window "
    "partitions over the bounded region domain, and the grand total is a "
    "broadcast scalar (NOT an unpartitioned window — lint-enforced).",
    tags=("A7", "W3"),
)
def a7d_share_of_parent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nr = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    )
    tot = nr.agg(F.sum("rev_c").alias("tot_c"))
    w = Window.partitionBy("region")
    return nr.join(F.broadcast(tot)).select(
        "region", "nation",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (F.col("rev_c").cast("double") / F.sum("rev_c").over(w).cast("double"))
        .alias("share_of_region"),
        (F.col("rev_c").cast("double") / F.col("tot_c").cast("double"))
        .alias("share_of_total"),
    )
