"""Modern-SQL surface: Spark 4 features and remaining ANSI coverage.

- recursive CTEs (``WITH RECURSIVE`` landed in Spark 4.0) for calendar-spine
  generation — the canonical gap-free reporting scaffold;
- distribution-shape aggregates (skewness / kurtosis / deterministic mode);
- the calendar scalar-function battery (dayofweek/weekofyear/quarter/
  dayofyear/last_day/add_months/datediff);
- the VARIANT semi-structured type (``parse_json`` → ``variant_get``);
- ``regexp_extract_all`` token extraction over the documents corpus.

Cross-engine notes (verified live against DuckDB 1.0.0):
- Spark ``skewness``/``kurtosis`` are *population* moments (g1, excess g2);
  DuckDB's same-named functions are sample-corrected, so the oracles spell
  out the moment arithmetic explicitly.
- Spark ``dayofweek`` is 1-based (Sunday=1); DuckDB's is 0-based → oracle
  adds 1.
- Spark ``mode(expr, true)`` breaks ties by smallest value; the oracle uses
  the equivalent ``ORDER BY cnt DESC, value ASC LIMIT 1`` per group.

Scale notes: the recursive spine materializes O(months) rows on the driver
side of the plan — trivially small — and joins against a pre-aggregated
(already-reduced) monthly rollup, so the recursion never touches fact-table
volume. All other queries are single-scan aggregations with map-side
partials.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .helpers import INT_GATE_RE, ocents
from .registry import register

# ---------------------------------------------------------------------------
# Recursive CTE: gap-free month spine (WITH RECURSIVE — Spark 4.0+)
# ---------------------------------------------------------------------------

_SPINE_SQL = f"""
WITH RECURSIVE spine(m) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
  WHERE m < DATE '2001-08-01'
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
         COUNT(*) AS n_orders,
         SUM({ocents('o_totalprice')}) AS rev_c
  FROM orders
  GROUP BY 1
)
SELECT /*+ BROADCAST(monthly) */ CAST(m AS STRING) AS month,
       COALESCE(n_orders, 0) AS n_orders,
       CAST(COALESCE(rev_c, 0) AS DOUBLE) / 100 AS revenue
FROM spine LEFT JOIN monthly ON om = m
"""


@register(
    "sql21_recursive_spine",
    oracle=_SPINE_SQL,
    description="gap-free monthly revenue via WITH RECURSIVE calendar spine "
    "(Spark 4.0 recursive CTE) left-joined to a pre-aggregated monthly "
    "rollup. Scale: orders aggregates down to O(months) rows *before* the "
    "spine join, so the recursion and join are both tiny regardless of fact "
    "size; the single shuffle is the monthly groupBy.",
    tags=("SQL-recursive", "T1"),
)
def sql21_recursive_spine(spark, sf_dir):
    # Recursion has no DataFrame-API form; the SQL path shares Catalyst's
    # analyzer/optimizer with the DataFrame path (SURVEY.md §3.2), and the
    # oracle string runs verbatim on both engines.
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SPINE_SQL)


# ---------------------------------------------------------------------------
# Distribution-shape aggregates
# ---------------------------------------------------------------------------


@register(
    "a17_distribution_shape",
    oracle="""
    WITH mu AS (
      -- n = COUNT(l_quantity), NOT COUNT(*): Spark's skewness/kurtosis
      -- skip NULL observations, so the moment divisor must too — a
      -- single NULL quantity silently skews every moment otherwise
      -- (r7 hostile-corpus find)
      SELECT l_returnflag, AVG(l_quantity) AS mean_q,
             COUNT(l_quantity) AS n,
             SUM(l_quantity) AS s1, SUM(l_quantity*l_quantity) AS s2,
             SUM(l_quantity*l_quantity*l_quantity) AS s3,
             SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n, mean_q,
             s2/n - mean_q*mean_q AS m2,
             s3/n - 3*mean_q*s2/n + 2*mean_q*mean_q*mean_q AS m3,
             s4/n - 4*mean_q*s3/n + 6*mean_q*mean_q*s2/n
                  - 3*mean_q*mean_q*mean_q*mean_q AS m4
      FROM mu
    ),
    md AS (
      -- NULL excluded: Spark's mode() ignores NULLs; without the WHERE a
      -- frequent-enough NULL group would win the deterministic tie-break
      SELECT l_returnflag, l_quantity AS mode_q,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
      FROM lineitem WHERE l_quantity IS NOT NULL
      GROUP BY l_returnflag, l_quantity
    )
    SELECT m.l_returnflag,
           ROUND(m3 / POWER(m2, 1.5), 6) AS skew_q,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurt_q,
           md.mode_q AS mode_q
    FROM m JOIN md ON m.l_returnflag = md.l_returnflag AND md.rn = 1
    """,
    description="per-group skewness / kurtosis / deterministic mode of "
    "l_quantity. Spark's skewness/kurtosis are population g1/g2 moments; "
    "the oracle derives the same moments from exact power sums (l_quantity "
    "is integral, so s1..s4 are exact in both engines). mode(x, true) "
    "tie-breaks to the smallest value ↔ ORDER BY cnt DESC, value ASC. "
    "Scale: single scan, map-side partial aggregation; the mode needs one "
    "(key,value)-grained shuffle — bounded by distinct-value count, not "
    "row count.",
    tags=("A6", "A17"),
)
def a17_distribution_shape(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    shape = li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew_q"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_q"),
        F.expr("mode(l_quantity, true)").alias("mode_q"),
    )
    return shape


# ---------------------------------------------------------------------------
# Calendar scalar-function battery
# ---------------------------------------------------------------------------


@register(
    "f2d_calendar_functions",
    oracle="""
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
           CAST(weekofyear(d) AS BIGINT) AS iso_week,
           CAST(quarter(d) AS BIGINT) AS qtr,
           CAST(dayofyear(d) AS BIGINT) AS doy,
           CAST(last_day(d) AS VARCHAR) AS month_end,
           CAST(CAST(d + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
           CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    """,
    description="calendar battery over distinct order dates: dayofweek "
    "(Spark 1-based Sunday ↔ DuckDB 0-based, oracle adds 1), ISO "
    "weekofyear, quarter, dayofyear, last_day, add_months (+3, both engines "
    "clamp to month end), datediff from the epoch of the dataset. Scale: "
    "distinct-date projection collapses the fact table to O(days) rows "
    "before any per-row function work.",
    tags=("F2",),
)
def f2d_calendar_functions(spark, sf_dir):
    od = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
    )
    return od.select(
        F.col("d").cast("string").alias("d"),
        F.dayofweek("d").cast("bigint").alias("dow"),
        F.weekofyear("d").cast("bigint").alias("iso_week"),
        F.quarter("d").cast("bigint").alias("qtr"),
        F.dayofyear("d").cast("bigint").alias("doy"),
        F.last_day("d").cast("string").alias("month_end"),
        F.add_months("d", 3).cast("string").alias("plus3m"),
        F.datediff("d", F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured type (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "v1_variant_json",
    oracle=f"""
    WITH j AS (
      -- json_valid + TRY_CAST mirror the Spark side's try_parse_json +
      -- try_variant_get: malformed props or a non-numeric k degrade to
      -- NULL instead of aborting the job (r7 hostile-corpus find).
      -- helpers.INT_GATE_RE (applied on BOTH engines) routes both
      -- through identical string->bigint semantics: DuckDB TRY_CAST
      -- ROUNDS decimal strings ('1.5' -> 2) where Spark try_cast
      -- yields NULL, and the two trim different whitespace (r8)
      SELECT event_type,
             TRY_CAST(CASE WHEN regexp_matches(k_str,
                      '{INT_GATE_RE}') THEN k_str END
                      AS BIGINT) AS k
      FROM (
        -- CASE (not AND) guards the extract: json_extract_string
        -- THROWS on malformed props and AND does not short-circuit
        SELECT event_type,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS k_str
        FROM events
      )
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           AVG(k) AS avg_k
    FROM j
    GROUP BY event_type
    """,
    description="semi-structured path via Spark 4's VARIANT type: "
    "try_parse_json(props) → try_variant_get('$.k', 'bigint'), aggregated "
    "per event_type; the try_ forms because a single malformed or "
    "mistyped props row must degrade to NULL, not abort the pipeline "
    "(plain parse_json/variant_get throw — r7 hostile-corpus find). "
    "Extraction goes through 'string' + try_cast, NOT "
    "try_variant_get(..., 'bigint'): the direct bigint form NUMERICALLY "
    "casts non-integer k ({\"k\":1.5} → 1, true → 1) while the oracle's "
    "json_extract_string + TRY_CAST yields NULL — routing both engines "
    "through string→bigint cast semantics keeps them aligned (r7 advice). "
    "Oracle uses DuckDB json_valid + json_extract_string + TRY_CAST. "
    "Scale: variant parse is a per-row JVM expression inside whole-stage "
    "codegen (no Python boundary); the shuffle carries only (event_type, "
    "partial agg) pairs.",
    tags=("F6", "V1"),
)
def v1_variant_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k_str = F.expr("try_variant_get(try_parse_json(props), '$.k', 'string')")
    # the SAME gate the oracle applies (helpers.INT_GATE_RE): inside it
    # both casts agree; outside it both engines degrade to NULL
    k = F.when(k_str.rlike(INT_GATE_RE), k_str).try_cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.avg("k").alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# regexp_extract_all token extraction
# ---------------------------------------------------------------------------


@register(
    "f11_regexp_tokens",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(regexp_extract_all(text, '[a-z]{6,}')) AS tok
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_long_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
           MIN(tok) AS first_token
    FROM toks
    GROUP BY lang
    """,
    description="regexp_extract_all over the documents corpus: extract all "
    "tokens of ≥6 letters, explode, count total/distinct per language. "
    "Scale: regex runs JVM-side in codegen; explode multiplies rows before "
    "the shuffle, but the per-lang distinct is bounded by vocabulary size — "
    "at 100 TB swap COUNT(DISTINCT) for approx_count_distinct or a "
    "two-level (lang, tok) pre-aggregation, which the l4/l9 queries "
    "demonstrate.",
    tags=("F1", "L4"),
)
def f11_regexp_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(r"[a-z]{6,}"), 0)).alias("tok"),
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_long_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.min("tok").alias("first_token"),
    )


# ---------------------------------------------------------------------------
# from_xml round-trip (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "f12_xml_roundtrip",
    oracle="""
    SELECT event_type AS t,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_u
    FROM events WHERE user_id < 50
    GROUP BY event_type
    """,
    description="XML surface (Spark 4 from_xml): rows serialized to XML "
    "strings in-plan, parsed back with a typed schema, aggregated on the "
    "parsed struct — the oracle computes the same aggregates from the "
    "source columns, so the round-trip itself is under the hash gate. "
    "Scale: both serialize and parse are JVM codegen expressions, "
    "single-scan single-shuffle.",
    tags=("F6", "F12"),
)
def f12_xml_roundtrip(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    xml = F.concat(
        F.lit("<e><u>"), F.col("user_id").cast("string"),
        F.lit("</u><t>"), F.col("event_type"), F.lit("</t></e>"),
    )
    parsed = F.from_xml(xml, "u BIGINT, t STRING")
    return (
        ev.select(parsed.alias("x"))
        .select(F.col("x.t").alias("t"), F.col("x.u").alias("u"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("u").alias("sum_u"))
    )


# ---------------------------------------------------------------------------
# string collations (Spark 4)
# ---------------------------------------------------------------------------


@register(
    "f13_collation",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) FILTER (WHERE lower(c_mktsegment) = 'building')
                AS BIGINT) AS n_building,
           CAST(COUNT(DISTINCT lower(c_mktsegment)) AS BIGINT) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    description="string collations (Spark 4): case-insensitive comparison "
    "and DISTINCT under UNICODE_CI — the oracle lower()s both sides, which "
    "is the same equivalence relation for this ASCII domain. Scale: "
    "collation-aware compare/hash run inside codegen; distinct-per-group "
    "is bounded by segment cardinality.",
    tags=("F1", "F13"),
)
def f13_collation(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer")
    seg_ci = F.expr("collate(c_mktsegment, 'UNICODE_CI')")
    return cu.groupBy("c_nationkey").agg(
        F.count_if(seg_ci == F.lit("building")).alias("n_building"),
        F.countDistinct(seg_ci).alias("n_segments"),
    )


@register(
    "sql26_sql_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(18,6))) AS DOUBLE) AS total_charge,
           COUNT(*) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
    description="SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN): a scalar "
    "function (the charge expression) plus a parameterized TABLE function "
    "(orders after a cutoff) declared in pure SQL and composed in one "
    "query. The declarative bodies inline into the plan at analysis time "
    "— zero Python, zero serialization boundary, full codegen and "
    "pushdown through both functions (the cutoff predicate reaches the "
    "orders parquet scan). This is the preferred UDF form at 100 TB; "
    "pandas/Arrow UDFs (x1/x8) are for logic SQL cannot express. The "
    "decimal(18,6) cast makes the charge sum exact (6-decimal values).",
    tags=("SQL", "X1", "F3"),
)
def sql26_sql_udf(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql26_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql26_lineitem")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION charge(
            p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1.0 - d) * (1.0 + t)""")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION orders_after(cutoff TIMESTAMP)
        RETURNS TABLE(o_orderkey BIGINT, o_orderpriority STRING)
        RETURN SELECT o_orderkey, o_orderpriority
               FROM sql26_orders WHERE o_orderdate >= cutoff""")
    return spark.sql("""
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(charge(l_extendedprice, l_discount, l_tax)
                    AS DECIMAL(18,6))) AS DOUBLE) AS total_charge,
               COUNT(*) AS n
        FROM orders_after(TIMESTAMP '1996-01-01') o
        JOIN sql26_lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority""")


@register(
    "sql27_sql_scripting",
    oracle=f"""
    WITH a AS (
      SELECT CAST(SUM({ocents('o_totalprice')}) AS DOUBLE) / 100.0
             / COUNT(*) AS ap
      FROM orders
    )
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above,
           CAST(ROUND(SUM(o_totalprice / (SELECT ap FROM a)), 2) AS DOUBLE)
             AS sum_ratio
    FROM orders
    WHERE o_totalprice > (SELECT ap FROM a)
    GROUP BY o_orderpriority
    """,
    description="SQL scripting (Spark 4 BEGIN..END blocks): a global "
    "average is computed into a declared variable by one statement, then "
    "the next statement filters and normalizes against it — procedural "
    "two-phase orchestration written entirely in SQL, the scripting "
    "engine sequencing the jobs driver-side. The oracle expresses the "
    "same thing as scalar subqueries (which DuckDB evaluates once). "
    "Scale: phase one is a full-scan aggregate to one scalar; phase two "
    "broadcasts that scalar inside the plan — no per-row subquery.",
    tags=("SQL",),
)
def sql27_sql_scripting(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql27_orders")
    # the script (DECLARE/SET phases included) executes inside spark.sql();
    # only the final SELECT's frame stays lazy and it no longer needs the
    # conf — so restore the session's value instead of leaking it
    # (verified: collect() after restore succeeds)
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        # exact-cents average (the sql8 recipe): a raw AVG(double) differs
        # between engines in the last ulp, and any order priced inside
        # that window would flip across the > threshold in one engine
        # only — integer-cents sum + one division is bit-identical
        return spark.sql(f"""
            BEGIN
              DECLARE avg_price DOUBLE DEFAULT 0;
              SET avg_price = (SELECT CAST(SUM({ocents('o_totalprice')})
                                      AS DOUBLE) / 100.0 / COUNT(*)
                               FROM sql27_orders);
              SELECT o_orderpriority, COUNT(*) AS n_above,
                     CAST(ROUND(SUM(o_totalprice / avg_price), 2) AS DOUBLE)
                       AS sum_ratio
              FROM sql27_orders
              WHERE o_totalprice > avg_price
              GROUP BY o_orderpriority;
            END""")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "sql28_df_scalar_subquery",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(SUM({ocents('o_totalprice')})
                                       AS DOUBLE) / 100.0 / COUNT(*)
                                FROM orders)
    GROUP BY 1
    """,
    description="DataFrame-API scalar subquery (Spark 4 "
    "DataFrame.scalar()): the global average price becomes a scalar "
    "subquery expression usable directly inside filter() — no collect, "
    "no temp view, no SQL string; Catalyst plans it as the same "
    "decorrelated one-row broadcast a SQL scalar subquery gets. "
    "Companion surfaces: sql27 (SQL scripting variable), sql2 "
    "(correlated SQL subquery). exists()/Column.outer() correlation "
    "was probed on this build (4.1.2) and does not resolve for filter "
    "subqueries — EXISTS stays covered by the semi-join forms (j3, "
    "sql9). Scale: one full-scan agg to a scalar, then one scan+agg "
    "with the scalar folded in — two jobs, no per-row subquery.",
    tags=("SQL", "A2", "P2"),
)
def sql28_df_scalar_subquery(spark, sf_dir):
    from .helpers import cents

    o = load_table(spark, sf_dir, "orders")
    # exact-cents average — see sql27's comment on the cross-engine ulp
    avg_price = o.agg(
        F.sum(cents("o_totalprice")).cast("double") / 100.0
        / F.count(F.lit(1))).scalar()
    return (
        o.filter(F.col("o_totalprice") > 1.5 * avg_price)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double").alias("revenue"),
        )
    )
