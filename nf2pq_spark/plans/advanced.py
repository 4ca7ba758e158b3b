"""Extended relational coverage: classic multi-join SQL shapes (TPC-H
Q7/Q14/Q19/Q22 analogues on the fixture star schema) plus function-surface
families not yet exercised elsewhere (unpivot, sequence/explode, date
arithmetic, string distance, bitwise aggregates, width_bucket histograms,
time-range window frames, try_* null-safe expressions).

All entries follow the exactness conventions in plans.helpers (integer-cents
money math, BIGINT casts for computed ints, VARCHAR casts for dates).
Scale notes: each query states its shuffle/broadcast shape for the 100 TB
design point.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .helpers import cents, cents_sum, ocents, ocents_sum
from .registry import register

_REV_C = f"{ocents('l_extendedprice')} * (100 - {ocents('l_discount')})"


# ---------------------------------------------------------------------------
# TPC-H-shape multi-join queries
# ---------------------------------------------------------------------------


@register(
    "sql5_promo_revenue",
    oracle=f"""
    SELECT CAST(100 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_C} ELSE 0 END)
                AS DOUBLE)
           / CAST(SUM({_REV_C}) AS DOUBLE) AS promo_pct,
           {ocents_sum(_REV_C, 10000, 'total_revenue')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    description="promo revenue share (TPC-H Q14 shape): fact⋈dim with a "
    "conditional-aggregate ratio. Scale: part broadcasts (dim ≪ fact), the "
    "shipdate month filter pushes to the parquet scan, and the global agg is "
    "a map-side partial + single-row final — no data shuffle of the fact.",
    tags=("J5", "A9"),
    bench=True,
)
def sql5_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .select(rev.alias("rev_c"), F.col("p_type"))
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(F.lit(0)))
    total = F.sum("rev_c")
    return j.agg(
        (promo.cast("double") * 100 / total.cast("double")).alias("promo_pct"),
        cents_sum(F.col("rev_c"), 10000, "total_revenue"),
    )


@register(
    "sql6_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           {ocents_sum(_REV_C, 10000, 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    description="bilateral shipping volume (TPC-H Q7 shape): 6-table join "
    "with a disjunctive nation-pair filter. Scale: the only real shuffle is "
    "lineitem⋈orders on orderkey; supplier/customer/nation broadcast, and "
    "the nation-pair predicate semi-filters both broadcast sides before the "
    "fact join (Catalyst pushes the OR through the join).",
    tags=("J1", "J5", "A1"),
    bench=True,
)
def sql6_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # the pair-OR implies membership in {NATION_1, NATION_2} on BOTH sides;
    # Catalyst doesn't derive IN-sets from a disjunction across two inputs,
    # so push the implied filter explicitly — it shrinks each broadcast side
    # ~12× and the join output ~25× before the residual pair filter runs
    pair_set = ["NATION_1", "NATION_2"]
    s_nat = supp.join(F.broadcast(nation.filter(F.col("n_name").isin(pair_set))),
                      supp.s_nationkey == nation.n_nationkey) \
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c_nat = cust.join(F.broadcast(nation.filter(F.col("n_name").isin(pair_set))),
                      cust.c_nationkey == nation.n_nationkey) \
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # join order: broadcast-reduce each side to the pair nations FIRST
    # (li→~8%, orders→~8%), so the orderkey equi-join runs on two small
    # inputs and AQE turns it into a broadcast join as well
    return (
        li.join(F.broadcast(s_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.join(F.broadcast(c_nat),
                          F.col("o_custkey") == F.col("c_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(cents_sum(rev, 10000, "revenue"))
    )


@register(
    "sql7_disjunctive_pred",
    oracle=f"""
    SELECT {ocents_sum(_REV_C, 10000, 'revenue')}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    description="OR-of-ANDs predicate join (TPC-H Q19 shape). Scale: part "
    "broadcasts; Catalyst extracts the common l_quantity/p_size bounds from "
    "the disjunction and pushes them below the join, so the fact scan "
    "prunes rows before the hash probe.",
    tags=("J5", "P3"),
    bench=True,
)
def sql7_disjunctive_pred(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & q.between(20, 50))
    )
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(cents_sum(rev, 10000, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "sql8_inactive_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT CAST(SUM({ocents('c_acctbal')}) AS DOUBLE) / 100.0 / COUNT(*)
               AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {ocents_sum(ocents('c_acctbal'), 100, 'totacctbal')}
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_nationkey
    """,
    description="wealthy customers with no finalized orders (TPC-H Q22 "
    "shape): scalar avg subquery + anti-join. Scale: the avg is a tiny "
    "broadcast scalar; the anti-join build side is the distinct custkeys of "
    "filtered orders (≪ orders), so it broadcasts; one shuffle on "
    "c_nationkey for the final agg.",
    tags=("J4", "A2"),
)
def sql8_inactive_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(cents("c_acctbal")).cast("double") / 100.0
              / F.count(F.lit(1))).alias("a"))
    )
    f_custkeys = orders.filter(F.col("o_orderstatus") == "F") \
        .select("o_custkey").distinct()
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(F.broadcast(f_custkeys), F.col("c_custkey") == F.col("o_custkey"),
              "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             cents_sum(cents("c_acctbal"), 100, "totacctbal"))
    )


# ---------------------------------------------------------------------------
# Function-surface families
# ---------------------------------------------------------------------------


@register(
    "u5_unpivot",
    oracle="""
    WITH u AS (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, COUNT(*) AS n, MIN(val) AS min_val, MAX(val) AS max_val
    FROM u GROUP BY measure
    """,
    description="wide→long unpivot (melt) of three measure columns, then a "
    "per-measure profile. Scale: unpivot is a narrow (no-shuffle) 3× row "
    "expansion; min/max aggregate exactly on doubles (order-independent).",
    tags=("U5",),
)
def u5_unpivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    longf = li.unpivot(
        ids=[], values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure", valueColumnName="val",
    )
    return longf.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@register(
    "f9_sequence_explode",
    oracle="""
    SELECT o_orderkey % 10 AS bucket, COUNT(*) AS n,
           CAST(SUM(n_seq) AS BIGINT) AS sum_seq
    FROM orders, unnest(generate_series(1, 3 + o_orderkey % 3)) AS t(n_seq)
    GROUP BY 1
    """,
    description="row-generating sequence + explode (generate_series "
    "equivalent). Scale: generation is per-row and pipelined (no shuffle "
    "until the final 10-key agg); the lateral expansion never materializes "
    "driver-side.",
    tags=("F4", "X4"),
)
def f9_sequence_explode(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            (F.col("o_orderkey") % 10).alias("bucket"),
            F.explode(F.sequence(F.lit(1), (F.lit(3) + F.col("o_orderkey") % 3)
                                 .cast("int"))).alias("n_seq"),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_seq").cast("bigint").alias("sum_seq"))
    )


@register(
    "f2c_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
                AS BIGINT) AS days_to_1999,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
               AS plus_3_months,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
    FROM orders
    """,
    description="date arithmetic family: datediff, add_months (month-end "
    "clamped identically in both engines), last_day, quarter, dayofweek "
    "(Spark 1=Sunday vs DuckDB 0=Sunday — oracle shifts). Dates emit as "
    "VARCHAR (date repr does not round-trip comparably). Scale: pure "
    "narrow projection, whole-stage codegen, no shuffle.",
    tags=("F2",),
)
def f2c_date_arithmetic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.datediff(F.lit("1999-01-01").cast("date"), d)
         .cast("bigint").alias("days_to_1999"),
        F.add_months(d, 3).cast("string").alias("plus_3_months"),
        F.last_day(d).cast("string").alias("month_end"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.dayofweek(d).cast("bigint").alias("dow"),
    )


@register(
    "f1b_string_distance",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS lev,
           split_part(c_name, '#', 2) AS cust_num,
           left(c_name, 8) AS l8,
           right(c_name, 4) AS r4,
           reverse(split_part(c_name, '#', 2)) AS rev_num,
           translate(c_name, '#0', '-x') AS translated,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           repeat(c_mktsegment, 2) AS seg2
    FROM customer
    """,
    description="string family 2: edit distance, split_part, left/right, "
    "reverse, translate, instr/strpos, repeat. Scale: narrow projection in "
    "whole-stage codegen; levenshtein is O(len²) per row but lengths are "
    "bounded — still no shuffle.",
    tags=("F1",),
)
def f1b_string_distance(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    n = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.levenshtein(n, F.lit("Customer#000000000")).cast("bigint").alias("lev"),
        F.split_part(n, F.lit("#"), F.lit(2)).alias("cust_num"),
        F.left(n, F.lit(8)).alias("l8"),
        F.right(n, F.lit(4)).alias("r4"),
        F.reverse(F.split_part(n, F.lit("#"), F.lit(2))).alias("rev_num"),
        F.translate(n, "#0", "-x").alias("translated"),
        F.instr(n, "#").cast("bigint").alias("hash_pos"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg2"),
    )


@register(
    "a15_bitwise_agg",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS band,
           bit_or(user_id) AS bor,
           bit_xor(event_id % 256) AS bxor
    FROM events GROUP BY event_type
    """,
    description="bitwise aggregates (bit_and/bit_or/bit_xor) — flow-mask "
    "style rollups (e.g. TCP-flag OR-accumulation in NetFlow reports). "
    "Scale: commutative/associative → full map-side partial agg.",
    tags=("A1", "F7"),
)
def a15_bitwise_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor(F.col("event_id") % 256).alias("bxor"),
    )


@register(
    "a16_histogram",
    oracle="""
    SELECT CAST(CASE WHEN c_acctbal < -1000.0 THEN 0
                     WHEN c_acctbal >= 10000.0 THEN 12
                     ELSE FLOOR((c_acctbal - (-1000.0)) / 1000.0) + 1
                END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(c_acctbal) AS lo,
           MAX(c_acctbal) AS hi
    FROM customer GROUP BY 1
    """,
    description="equi-width histogram via width_bucket over [-1000, 10000) "
    "in 11 buckets (DuckDB lacks width_bucket → arithmetic oracle; bucket "
    "edges are exact multiples of 1000, exactly representable, and acctbal "
    "is cents-grained, so both formulations agree). Scale: 13-key agg with "
    "map-side partials — histogram of 100 TB costs one tiny shuffle.",
    tags=("A1", "F3"),
)
def a16_histogram(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            F.width_bucket(F.col("c_acctbal"), F.lit(-1000.0), F.lit(10000.0),
                           F.lit(11)).cast("bigint").alias("bucket"),
            "c_acctbal",
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("c_acctbal").alias("lo"),
             F.max("c_acctbal").alias("hi"))
    )


@register(
    "w3b_time_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0 AS rolling_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    description="time-range window frame: per-user rolling 1-hour value sum "
    "ordered by event time (RANGE BETWEEN INTERVAL — peers at equal ts "
    "aggregate identically, so ts ties are deterministic). Scale: one "
    "shuffle on user_id; frame evaluation is a per-partition sorted sweep.",
    tags=("W3",),
)
def w3b_time_range_frame(spark, sf_dir):
    register_views(spark, sf_dir, ["events"])
    return spark.sql("""
        SELECT user_id, event_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
                    AS DOUBLE) / 100.0 AS rolling_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """)


@register(
    "p8_try_exprs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / CAST(o_orderkey % 3 AS DOUBLE)
           END AS safe_ratio,
           TRY_CAST(split_part(o_orderpriority, '-', 2) AS BIGINT) AS prio_num,
           CAST(TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS BIGINT)
               AS prio_rank
    FROM orders
    """,
    description="null-safe expression family: try_divide (NULL on /0, vs "
    "CASE oracle) and try_cast (non-numeric → NULL, '1-URGENT' → 1). "
    "Scale: narrow codegen projection, no shuffle.",
    tags=("P4", "P5"),
)
def p8_try_exprs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"),
                     (F.col("o_orderkey") % 3).cast("double")).alias("safe_ratio"),
        F.expr("TRY_CAST(split_part(o_orderpriority, '-', 2) AS BIGINT)")
         .alias("prio_num"),
        F.expr("CAST(TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT) AS BIGINT)")
         .alias("prio_rank"),
    )


# ---------------------------------------------------------------------------
# Batch 2: existence/decorrelation shapes and remaining agg/array families
# ---------------------------------------------------------------------------


@register(
    "sql9_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    description="order-priority count gated on an EXISTS subquery (TPC-H Q4 "
    "shape): decorrelates to a left-semi join. Scale: the semi-join build "
    "side is lineitem filtered to quantity>45 and projected to orderkey "
    "only; both sides shuffle on orderkey once, then a 5-key agg.",
    tags=("J3", "A1"),
)
def sql9_priority_exists(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "sql10_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {ocents_sum(_REV_C, 10000, 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    description="top supplier by quarterly revenue (TPC-H Q15 shape): "
    "aggregate, take the max as a scalar, keep the argmax rows. Revenue is "
    "an exact integer-cents sum → double, so the equality against MAX is "
    "deterministic cross-engine. Scale: one shuffle on suppkey; the max is "
    "a single-row broadcast; supplier dim broadcasts.",
    tags=("A1", "J5", "A10"),
)
def sql10_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev_c = cents("l_extendedprice") * (100 - cents("l_discount"))
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(cents_sum(rev_c, 10000, "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "sql11_supplier_variety",
    oracle="""
    SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt,
           COUNT(*) AS line_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand
    """,
    description="distinct-supplier variety per brand with a NOT IN "
    "exclusion list (TPC-H Q16 shape): anti-join against a tiny filtered "
    "dim (s_suppkey is non-null, so NOT IN ≡ anti-join). Scale: exclusion "
    "list and part dim both broadcast; count-distinct expands to a "
    "two-phase agg on (brand, suppkey).",
    tags=("J4", "A3"),
)
def sql11_supplier_variety(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    bad = load_table(spark, sf_dir, "supplier") \
        .filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(pt.filter(F.col("p_type") != "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"),
             F.count(F.lit(1)).alias("line_cnt"))
    )


@register(
    "sql12_small_qty_revenue",
    oracle="""
    WITH pavg AS (
        SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS threshold
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < threshold
    """,
    description="small-quantity order revenue (TPC-H Q17 shape): the "
    "correlated per-part AVG decorrelates into a pre-aggregate + join. "
    "Quantities are integral doubles, so AVG = exact_sum/count is "
    "bit-identical cross-engine and the < threshold comparison is "
    "deterministic. Scale: pavg shuffles once on partkey (same key as the "
    "join → AQE reuses the partitioning); part filter broadcasts.",
    tags=("J1", "A2"),
)
def sql12_small_qty_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part") \
        .filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    pavg = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("threshold"))
    )
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(pavg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0 / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "a5b_exact_quantiles",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.75) AS q75,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    description="exact median / interpolated quantiles per group (both "
    "engines use the R-7 linear-interpolation definition; quantities are "
    "integral doubles so the interpolation arithmetic is exact). Scale: "
    "exact quantiles need per-group sorted values — fine on bounded group "
    "counts; unbounded cardinality should switch to percentile_approx "
    "(a4/a5 cover the sketch path).",
    tags=("A5",),
)
def a5b_exact_quantiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "f4c_array_setops",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
               AS types,
           -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
           -- where Spark's array_join is '' — the empty set serializes
           -- as '' on both engines (r7 hostile-corpus find: a user whose
           -- only event type IS 'click')
           COALESCE(array_to_string(
               list_filter(list_sort(list_distinct(list(event_type))),
                           x -> x != 'click'), ','), '') AS minus_click,
           array_to_string(
               list_sort(list_distinct(list(event_type) || ['audit'])), ',')
               AS with_audit,
           CAST(len(list_distinct(list(event_type))) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
    description="array set operations: per-user distinct event-type set, "
    "array_except / array_union / size (sorted on both sides — Spark's "
    "set-op order is first-argument order, normalized by array_sort; "
    "serialized to CSV strings for the driver's array-hostile hasher). "
    "Scale: collect_set is bounded by the type-domain cardinality, not row "
    "count — safe at 100 TB; one shuffle on user_id.",
    tags=("F4", "A8"),
)
def f4c_array_setops(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.array_join(types, ",").alias("types"),
        F.array_join(F.array_except(types, F.array(F.lit("click"))), ",")
        .alias("minus_click"),
        F.array_join(
            F.array_sort(F.array_union(F.collect_set("event_type"),
                                       F.array(F.lit("audit")))), ",")
        .alias("with_audit"),
        F.size(F.collect_set("event_type")).cast("bigint").alias("n_types"),
    )


@register(
    "a19_two_phase_skew_agg",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_sum,
           CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM events GROUP BY user_id
    """,
    description="skew-tolerant two-phase aggregation "
    "(operators/skew.two_phase_agg): a deterministic per-row salt splits "
    "each key across 16 partial (key, salt) groups before the final "
    "combine on key alone — so one power-law key (every flow to one "
    "/24, every event from one bot user) costs 16 bounded tasks instead "
    "of one giant reducer. count/sum/min/max recombine exactly; integer "
    "cents keep the hash gate exact (the oracle is the plain GROUP BY). "
    "Distinct from A11 (Spark's automatic partial agg — same map-side "
    "combine, but its FINAL reducer still lands one task per key).",
    tags=("A1", "A11"),
)
def a19_two_phase_skew_agg(spark, sf_dir):
    from ..operators.skew import two_phase_agg

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    return two_phase_agg(
        ev, "user_id",
        [("cents", "count", "n"), ("cents", "sum", "cents_sum"),
         ("cents", "max", "max_cents")],
        buckets=16,
    )


@register(
    "j14_salted_skew_join",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    description="manually salted equi-join (operators/skew.py): the fact "
    "side gets a deterministic xxhash64 salt, the dim side replicates "
    "x8, and the join key becomes (suppkey, salt) — identical results to "
    "the plain join (the oracle), but each hot key's rows split across 8 "
    "tasks. Scale: the escape hatch for power-law keys joining a "
    "non-broadcastable dim where AQE's skew splitting cannot rewrite "
    "(broadcast disabled here to force the shuffle path under test).",
    tags=("J1", "A1"),
)
def j14_salted_skew_join(spark, sf_dir):
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem") \
        .select(F.col("l_suppkey").alias("k"), "l_quantity")
    supp = load_table(spark, sf_dir, "supplier") \
        .select(F.col("s_suppkey").alias("k"), "s_nationkey")
    joined = salted_join(li, supp, on="k", buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )


@register(
    "mm2_frame_sample",
    oracle="""
    WITH m AS (
        -- LEAST mirrors sample_frames' MAX_FRAMES corrupt-metadata rail
        -- (a no-op at the fixture's nf <= 24, kept for formal parity)
        SELECT doc_id AS media_id,
               CAST(LEAST(doc_id % 24 + 1, 1048576) AS INT) AS nf
        FROM documents
    ),
    sized AS (
        SELECT media_id, nf, GREATEST(16 // nf, 1) AS fsize FROM m
    )
    SELECT media_id, CAST(f AS INT) AS frame_no,
           CAST(GREATEST(LEAST(16, (f + 1) * fsize) - f * fsize, 0) AS BIGINT)
               AS n_bytes
    FROM sized, unnest(generate_series(0, nf - 1, 4)) AS t(f)
    """,
    description="video frame sampling (functions/multimodal.py "
    "sample_frames): every-4th frame of each fake-decoded 16-byte buffer "
    "(content = unhex(md5(text)), n_frames from metadata) emitted as one "
    "row per frame; the oracle reproduces the slicing arithmetic. Scale: "
    "one-to-many mapInPandas with Arrow batching — bytes cross to Python "
    "once per batch, the fan-out never collects, and the real-codec swap "
    "touches only _decode_bytes.",
    tags=("L5", "X5"),
)
def mm2_frame_sample(spark, sf_dir):
    from ..functions.multimodal import sample_frames, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, media_type="video")
    frames = sample_frames(media, every=4, backend="fake")
    return frames.select(
        "media_id", "frame_no",
        F.length("frame").cast("bigint").alias("n_bytes"),
    )


@register(
    "sql13_dominant_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        FROM lineitem GROUP BY 1, 2
    ),
    shares AS (
        SELECT l_suppkey, supp_qty,
               CAST(supp_qty AS DOUBLE)
               / CAST(SUM(supp_qty) OVER (PARTITION BY l_partkey) AS DOUBLE)
                   AS share,
               COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
        FROM ps
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_dominated
    FROM shares JOIN supplier ON s_suppkey = l_suppkey
    WHERE share >= 2.5 / n_supp
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    description="suppliers dominating ≥2.5x the equal split of a part's "
    "shipped quantity on ≥2 parts (TPC-H Q20 flavor): two-level aggregate "
    "+ per-part window share + HAVING. The dominance bar is relative to "
    "the part's supplier count, so it stays non-vacuous at every scale "
    "factor (a fixed 0.3 bar was unreachable at sf0.01 — max share 0.245 "
    "— making the oracle match empty-vs-empty). Share = exact-int/"
    "exact-int in double, compared identically cross-engine. Scale: one shuffle on "
    "(partkey, suppkey), the window reuses the partkey grouping; supplier "
    "dim broadcasts at the end.",
    tags=("A1", "W3", "J5"),
    bench=True,
)
def sql13_dominant_suppliers(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # one shuffle serves both the (partkey, suppkey) aggregate and the
    # partkey window: hashpartitioning(l_partkey) satisfies the clustered
    # distribution of BOTH (partkey ⊆ the group keys), so an explicit
    # repartition on the window key removes the re-shuffle between them
    ps = (
        li.select("l_partkey", "l_suppkey", "l_quantity")
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    shares = ps.select(
        "l_suppkey", "supp_qty",
        (F.col("supp_qty").cast("double")
         / F.sum("supp_qty").over(w).cast("double")).alias("share"),
        F.count(F.lit(1)).over(w).alias("n_supp"))
    return (
        shares.filter(F.col("share") >= 2.5 / F.col("n_supp"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
        .filter(F.col("n_dominated") >= 2)
    )


@register(
    "sql14_strict_latest_supplier",
    oracle="""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
        FROM lineitem GROUP BY 1, 2
    ),
    marked AS (
        SELECT l_orderkey, l_suppkey, supp_last,
               MAX(supp_last) OVER (PARTITION BY l_orderkey) AS order_last,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp
        FROM per_supp
    ),
    counted AS (
        SELECT *,
               SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM marked
    )
    SELECT l_suppkey, COUNT(*) AS n_sole_latest
    FROM counted
    WHERE n_supp >= 2 AND n_at_max = 1 AND supp_last = order_last
    GROUP BY 1
    """,
    description="per supplier: multi-supplier orders where they were "
    "STRICTLY the last to ship (TPC-H Q21 flavor) — pre-aggregate to "
    "(order, supplier), then order-partitioned windows mark the max, its "
    "multiplicity, and the supplier count; strict latest = unique max. "
    "Scale: one shuffle on orderkey serves all three windows (same "
    "partition key); no self-join of the fact (the naive Q21 EXISTS/NOT "
    "EXISTS pair would scan lineitem three times).",
    tags=("W3", "A1", "J10"),
    bench=True,
)
def sql14_strict_latest_supplier(spark, sf_dir):
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    # single orderkey shuffle feeds the (orderkey, suppkey) aggregate AND
    # all three orderkey-partitioned windows (same trick as sql13)
    per_supp = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = per_supp.select(
        "l_orderkey", "l_suppkey", "supp_last",
        F.max("supp_last").over(w).alias("order_last"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1)
              .otherwise(0)).over(w),
    )
    return (
        marked.filter((F.col("n_supp") >= 2) & (F.col("n_at_max") == 1)
                      & (F.col("supp_last") == F.col("order_last")))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_sole_latest"))
    )


@register(
    "f10_bit_manipulation",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 240 AS or_mask,
           xor(event_id, user_id) AS xored,
           (event_id % 1024) << 2 AS shl,
           event_id >> 1 AS shr,
           ~event_id AS inverted,
           bin(user_id) AS user_bits,
           hex(event_id % 4096) AS id_hex
    FROM events
    """,
    description="bit-manipulation family: masks, xor, shifts, complement, "
    "bin/hex formatting — the flag-field toolkit for NetFlow TCP-flag and "
    "mask columns (f7 uses these on real flow semantics). Scale: narrow "
    "codegen projection, no shuffle.",
    tags=("F7", "F3"),
)
def f10_bit_manipulation(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(240)).alias("or_mask"),
        eid.bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(eid % 1024, 2).alias("shl"),
        F.shiftright(eid, 1).alias("shr"),
        F.bitwise_not(eid).alias("inverted"),
        F.bin("user_id").alias("user_bits"),
        F.hex(eid % 4096).alias("id_hex"),
    )


@register(
    "sql15_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {ocents_sum(_REV_C, 10000, 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    description="local-supplier volume (TPC-H Q5 shape): revenue per nation "
    "where customer and supplier share the nation, region- and year-"
    "filtered. Scale: region⋈nation prunes supplier AND customer via "
    "broadcast before the fact join, so the only shuffle is "
    "lineitem⋈orders on orderkey; the c_nationkey = s_nationkey "
    "colocation predicate is a post-join filter on already-small rows.",
    tags=("J1", "J5", "A1"),
)
def sql15_local_supplier_volume(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # nation list for the region: tiny broadcast dim reused on both sides
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nat.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.join(F.broadcast(cust),
                          F.col("o_custkey") == F.col("c_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(cents_sum(rev, 10000, "revenue"))
    )


@register(
    "sql16_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               {_REV_C} AS revc,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN revc ELSE 0 END)
                AS DOUBLE)
           / CAST(SUM(revc) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY 1
    """,
    description="market share (TPC-H Q8 shape): NATION_8's share of PROMO "
    "part revenue sold to EUROPE customers, per order year. Share = exact "
    "cents int / exact cents int, both surfaced as double — bit-identical "
    "division cross-engine. Scale: part/customer-nation/supplier-nation all "
    "broadcast-prune the fact; one orderkey shuffle; the conditional "
    "numerator folds into the same single aggregation pass as the "
    "denominator.",
    tags=("J1", "J5", "A9"),
)
def sql16_market_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("eu_nationkey"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(eu_nat), F.col("c_nationkey") == F.col("eu_nationkey")
    ).select("c_custkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    vol = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.join(F.broadcast(cust),
                          F.col("o_custkey") == F.col("c_custkey")),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_8", rev)
                .otherwise(F.lit(0))).cast("double")
    den = F.sum(rev).cast("double")
    return (
        vol.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((num / den).alias("mkt_share"))
    )


@register(
    "sql17_profit_by_nation",
    oracle=f"""
    SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           {ocents_sum(
               f"{_REV_C} - {ocents('p_retailprice')} "
               "* CAST(l_quantity AS BIGINT) * 90",
               10000, 'profit')}
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    description="profit by supplier nation and year (TPC-H Q9 shape, "
    "adapted: the fixture has no partsupp, so unit cost is modeled as 90% "
    "of p_retailprice). All arithmetic in exact integer cents at scale "
    "10000 — revenue minus cost sums exactly, one double division at the "
    "end. Scale: the p_name LIKE filter prunes part before its broadcast; "
    "supplier+nation broadcast; one orderkey shuffle against orders.",
    tags=("J1", "J5", "A1", "F1"),
)
def sql17_profit_by_nation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        cents("l_extendedprice") * (100 - cents("l_discount"))
        - cents("p_retailprice") * F.col("l_quantity").cast("bigint") * 90
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(cents_sum(profit, 10000, "profit"))
    )


@register(
    "sql18_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY 1
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY 1
    """,
    description="customer order-count distribution (TPC-H Q13 shape): "
    "left join with an ON-clause filter, count per customer including "
    "zeros, then histogram the counts. Scale: pre-aggregate orders by "
    "custkey FIRST (shuffle carries one row per customer, not one per "
    "order), then a single custkey-partitioned join against customer; "
    "the final tiny histogram aggregation is map-side combinable.",
    tags=("J2", "A1"),
)
def sql18_customer_distribution(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0).cast("bigint"))
                .alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "sql19_returned_top_customers",
    oracle=f"""
    SELECT c_custkey, c_name, {ocents_sum(_REV_C, 10000, 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="top-20 customers by returned-item revenue in a year "
    "(TPC-H Q10 shape): join + aggregate + global top-k in one pipeline. "
    "Scale: the returnflag and orderdate filters push to both scans; "
    "revenue is pre-aggregated per custkey BEFORE the customer join "
    "(the join input carries one row per customer, not one per lineitem), "
    "and sort+limit plans as TakeOrderedAndProject — per-partition heaps, "
    "no global sort. Tie-break on c_custkey keeps the LIMIT frontier "
    "deterministic cross-engine.",
    tags=("J1", "A1", "O3"),
)
def sql19_returned_top_customers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(cents_sum(rev, 10000, "revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "w7_cume_dist_nth_value",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           cume_dist() OVER w AS cd,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="cume_dist + nth_value window functions (W1/W2 "
    "completion): cumulative distribution and the customer's second-ever "
    "order price as of each row. Total order via (orderdate, orderkey) "
    "tie-break keeps nth_value deterministic; o_totalprice is picked, not "
    "computed, so values match bit-exactly. Scale: one custkey shuffle "
    "serves both windows (same partition+order spec).",
    tags=("W1", "W2"),
)
def w7_cume_dist_nth_value(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey", "o_custkey",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


@register(
    "sql20_late_shipment_priority",
    oracle="""
    SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
    description="late shipments by order priority (TPC-H Q12 shape, "
    "adapted: the fixture has no l_shipmode, so 'late' = shipped more than "
    "90 days after the order date, split urgent vs non-urgent). Scale: "
    "orders projects just (orderkey, orderdate, priority) into the single "
    "orderkey shuffle; the cross-table lateness predicate filters at the "
    "join before the tiny per-year aggregate, and both conditional counts "
    "fold into one map-side-combinable pass.",
    tags=("J1", "A9"),
)
def sql20_late_shipment_priority(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "t7_funnel_conversion",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'click' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS next_click
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_views,
           CAST(SUM(CASE WHEN next_click <= ts + INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM ordered
    WHERE event_type = 'view'
    GROUP BY 1
    """,
    description="view→click funnel conversion per user: a conditional "
    "forward-looking window (earliest following click per user) marks each "
    "view that converts within 30 minutes — sequence detection without a "
    "self-join. Total order (ts, event_id) keeps the ROWS frame "
    "deterministic under timestamp ties. Scale: ONE user_id shuffle serves "
    "the window and the per-user aggregate (same partitioning); the "
    "self-join formulation would shuffle events twice and explode "
    "view×click pairs before filtering.",
    tags=("W2", "W3", "T6"),
)
def t7_funnel_conversion(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(1, Window.unboundedFollowing))
    next_click = F.min(
        F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    return (
        ev.withColumn("next_click", next_click)
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum(F.when(F.col("next_click")
                         <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"), 1)
                  .otherwise(0)).cast("bigint").alias("n_converted"),
        )
    )


@register(
    "sql22_forecast_revenue",
    oracle=f"""
    SELECT {ocents_sum(f"{ocents('l_extendedprice')} * {ocents('l_discount')}",
                       10000, 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND {ocents('l_discount')} BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    description="forecast-revenue-change (TPC-H Q6 shape): tight multi-"
    "predicate scan with a products-of-money global sum. Completes the "
    "runnable TPC-H analog set (all shapes except Q2/Q11, which need the "
    "absent partsupp table). Discount selector compares integer cents, not "
    "raw doubles, on both engines. Scale: all four predicates push to the "
    "parquet scan (year range prunes row groups via min/max stats); the "
    "global agg is map-side partials into a single-row final — zero data "
    "shuffle.",
    tags=("P2", "A2"),
    bench=True,
)
def sql22_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = cents("l_discount")
    rev = cents("l_extendedprice") * disc_c
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & disc_c.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            cents_sum(rev, 10000, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "sql23_min_cost_supplier",
    oracle=f"""
    WITH pr AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN({ocents('l.l_extendedprice')}) AS cost_c
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size < 20
      GROUP BY 1, 2
    ),
    eur AS (
      SELECT pr.l_partkey, pr.cost_c, s.s_name, n.n_name,
             MIN(pr.cost_c) OVER (PARTITION BY pr.l_partkey) AS mc
      FROM pr
      JOIN supplier s ON pr.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name,
           CAST(e.cost_c AS DOUBLE) / 100 AS min_cost
    FROM eur e JOIN part p ON e.l_partkey = p.p_partkey
    WHERE e.cost_c = e.mc
    """,
    description="min-cost supplier per part (TPC-H Q2 shape, adapted: "
    "lineitem stands in for the absent partsupp as the part-supplier "
    "price relation): region-restricted suppliers, per-part minimum "
    "price via the decorrelated form of Q2's correlated scalar "
    "subquery (window min + filter). Scale: the part filter broadcasts "
    "onto the fact scan BEFORE the big (partkey, suppkey) aggregation, "
    "so only 1/6th of lineitem shuffles; supplier/nation/region fold "
    "into one broadcast; the window runs on the already-aggregated "
    "relation (bounded by |part|x|supplier|, not by fact rows).",
    tags=("J2", "W3", "SQL"),
)
def sql23_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 20))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    eur_sup = (sup.join(F.broadcast(nat),
                        sup.s_nationkey == nat.n_nationkey)
               .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
               .select("s_suppkey", "s_name", "n_name"))
    pr = (li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                  li.l_partkey == F.col("p_partkey"))
          .groupBy("l_partkey", "l_suppkey", "p_brand")
          .agg(F.min(cents("l_extendedprice")).alias("cost_c")))
    eur = pr.join(F.broadcast(eur_sup),
                  pr.l_suppkey == eur_sup.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (eur.withColumn("mc", F.min("cost_c").over(w))
            .filter(F.col("cost_c") == F.col("mc"))
            .select(F.col("l_partkey").alias("p_partkey"), "p_brand",
                    "s_name", "n_name",
                    (F.col("cost_c").cast("double") / 100)
                    .alias("min_cost")))


@register(
    "sql24_important_inventory",
    oracle=f"""
    WITH asia_sup AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    val AS (
      SELECT l.l_partkey,
             SUM({ocents('l.l_extendedprice')}
                 * {ocents('l.l_quantity')}) AS value_c
      FROM lineitem l JOIN asia_sup a ON l.l_suppkey = a.s_suppkey
      GROUP BY 1
    )
    SELECT l_partkey,
           CAST(value_c AS DOUBLE) / 10000 AS part_value
    FROM (SELECT l_partkey, value_c,
                 SUM(value_c) OVER () AS total_c
          FROM val)
    WHERE CAST(value_c AS DOUBLE) > 0.001 * CAST(total_c AS DOUBLE)
    """,
    description="important inventory share (TPC-H Q11 shape, adapted to "
    "the lineitem-as-partsupp relation): per-part value of "
    "region-restricted suppliers' shipments, kept where it exceeds a "
    "fraction of the global total. The Q11 global scalar subquery is a "
    "single-partition window over the ALREADY-aggregated per-part "
    "relation — the fact table is scanned and shuffled exactly once; "
    "exact integer-cents sums make the threshold compare deterministic "
    "cross-engine. Scale: window input is bounded by |part|, and the "
    "supplier filter broadcasts onto the fact scan.",
    tags=("A2", "W3", "SQL"),
)
def sql24_important_inventory(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA")
    asia = (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .select("s_suppkey"))
    val = (li.join(F.broadcast(asia), li.l_suppkey == asia.s_suppkey)
           .groupBy("l_partkey")
           .agg(F.sum(cents("l_extendedprice")
                      * cents("l_quantity")).alias("value_c")))
    # global total as a broadcast scalar, NOT Window.partitionBy(): the
    # unpartitioned window funnels every per-partkey row through ONE task
    # (WindowExec warns exactly this) — a real serialization point when
    # partkeys number in the hundreds of millions. The cents sums are
    # exact longs, so the agg total is order-independent and bit-identical
    # to the windowed form.
    total = val.agg(F.sum("value_c").alias("total_c"))
    return (val.join(F.broadcast(total))
            .filter(F.col("value_c").cast("double")
                    > 0.001 * F.col("total_c").cast("double"))
            .select("l_partkey",
                    (F.col("value_c").cast("double") / 10000)
                    .alias("part_value")))


@register(
    "j16_lateral_topn_df",
    oracle="""
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c_nationkey = 3
    """,
    description="correlated lateral subquery through the Spark 4 "
    "DataFrame API (DataFrame.lateralJoin + Column.outer()) — the same "
    "top-2-orders-per-customer shape as sql4, but declared without SQL "
    "text: the outer() marker builds the correlated reference and "
    "Catalyst decorrelates to the identical ranked-window join. Scale: "
    "same plan as sql4 — no per-row re-execution, one shuffle on the "
    "correlation key.",
    tags=("J10", "W4", "SQL"),
)
def j16_lateral_topn_df(spark, sf_dir):
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_nationkey") == 3).select("c_custkey"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice")
    sub = (o.where(F.col("o_custkey") == F.col("c_custkey").outer())
           .orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(2))
    return c.lateralJoin(sub).select(
        "c_custkey", "o_orderkey", "o_totalprice")
