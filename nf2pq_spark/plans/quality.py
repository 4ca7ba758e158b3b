"""Data-quality / profiling operators — the audit pass a 100 TB training
pipeline runs before (and after) every transform stage.

All are single-scan designs: the profile/audit aggregates compute every
statistic in one pass over the fact table (map-side partials, tiny final
row set), never one scan per column. Oracles are plain ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .helpers import khash, okhash
from .registry import register


@register(
    "dq1_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount) FROM lineitem
    """,
    description="per-column profile (count / distinct / min / max) emitted "
    "long-form. Scale: ONE scan computes all twelve statistics (the oracle's "
    "three scans are the naive form); the wide agg row explodes to long "
    "driver-free. Distinct counts shuffle once; min/max/count are pure "
    "map-side partials.",
    tags=("A2", "U5"),
)
def dq1_column_profile(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_quantity").alias("d_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.countDistinct("l_extendedprice").alias("d_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_discount").alias("d_disc"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )
    profile = F.array(
        F.struct(F.lit("l_quantity").alias("col"), F.col("n"),
                 F.col("d_qty").alias("n_distinct"),
                 F.col("min_qty").alias("min_v"), F.col("max_qty").alias("max_v")),
        F.struct(F.lit("l_extendedprice").alias("col"), F.col("n"),
                 F.col("d_price").alias("n_distinct"),
                 F.col("min_price").alias("min_v"),
                 F.col("max_price").alias("max_v")),
        F.struct(F.lit("l_discount").alias("col"), F.col("n"),
                 F.col("d_disc").alias("n_distinct"),
                 F.col("min_disc").alias("min_v"), F.col("max_disc").alias("max_v")),
    )
    return wide.select(F.explode(profile).alias("p")).select("p.*")


@register(
    "dq2_referential_audit",
    oracle="""
    SELECT 'lineitem->orders' AS edge,
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
    """,
    description="foreign-key orphan audit over four star-schema edges, each "
    "an anti-join count (keys are non-null, so NOT IN ≡ anti-join). Scale: "
    "every build side is either a broadcastable dim or the distinct "
    "orderkeys of orders; counts are map-side partials, the union is four "
    "single-row plans.",
    tags=("J4", "A2"),
)
def dq2_referential_audit(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def orphan_count(fact, fk, dim_keys, edge):
        return (
            fact.join(dim_keys, F.col(fk) == F.col(dim_keys.columns[0]),
                      "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(edge).alias("edge"), "orphans")
        )

    edges = [
        orphan_count(li, "l_orderkey", orders.select("o_orderkey"),
                     "lineitem->orders"),
        orphan_count(li, "l_partkey", part.select("p_partkey"),
                     "lineitem->part"),
        orphan_count(orders, "o_custkey", cust.select("c_custkey"),
                     "orders->customer"),
        orphan_count(cust, "c_nationkey", nation.select("n_nationkey"),
                     "customer->nation"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


@register(
    "dq3_domain_violations",
    oracle="""
    SELECT COUNT(*) AS n,
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
               AS bad_qty,
           COUNT(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 0.5)
               AS bad_discount,
           COUNT(*) FILTER (WHERE l_extendedprice <= 0.0) AS bad_price,
           COUNT(*) FILTER (WHERE l_quantity > 45) AS outlier_qty,
           COUNT(*) FILTER (WHERE l_shipdate < TIMESTAMP '1995-01-01'
                               OR l_shipdate > TIMESTAMP '2002-01-01')
               AS bad_shipdate
    FROM lineitem
    """,
    description="single-pass domain-rule audit: every rule is a conditional "
    "count over one scan (FILTER ↔ count_if). Scale: pure map-side "
    "partials, one final row — the audit of 100 TB shuffles six longs per "
    "partition.",
    tags=("A9", "A2"),
)
def dq3_domain_violations(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q, d, p, s = (F.col("l_quantity"), F.col("l_discount"),
                  F.col("l_extendedprice"), F.col("l_shipdate"))
    lo = F.lit("1995-01-01").cast("timestamp_ntz")
    hi = F.lit("2002-01-01").cast("timestamp_ntz")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if((q < 1) | (q > 50)).alias("bad_qty"),
        F.count_if((d < 0.0) | (d > 0.5)).alias("bad_discount"),
        F.count_if(p <= 0.0).alias("bad_price"),
        F.count_if(q > 45).alias("outlier_qty"),
        F.count_if((s < lo) | (s > hi)).alias("bad_shipdate"),
    )


@register(
    "l9_bigram_profile",
    oracle="""
    WITH grams AS (
        SELECT lang, substr(text, i, 2) AS bg
        FROM documents, unnest(generate_series(1, len(text) - 1)) AS t(i)
    ),
    counts AS (
        SELECT lang, bg, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
    )
    SELECT lang, bg, cnt FROM counts
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bg) <= 5
    """,
    description="character-bigram frequency profile per language — the "
    "feature table behind n-gram language ID (l4c). Bigrams come from a "
    "higher-order transform over sequence(1, len-1) (no UDF); top-5 per "
    "lang via window with a deterministic (cnt, bg) tie-break. Scale: "
    "bigram explosion is pipelined (no shuffle until the (lang,bg) agg); "
    "the top-k window partitions by lang only after counts shrink the data.",
    tags=("L4", "F4", "W4"),
)
def l9_bigram_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # the length >= 2 guard matches the oracle's generate_series(1, n-1),
    # which is EMPTY for degenerate docs — Spark's sequence(1, n-1) would
    # instead generate a DESCENDING [1, 0(, -1)] for 0/1-char text and
    # emit spurious bigrams (latent: fixture texts are 100+ chars)
    grams = docs.select(
        "lang",
        F.explode(F.expr(
            "CASE WHEN length(text) >= 2 THEN "
            "transform(sequence(1, length(text) - 1), "
            "          i -> substring(text, i, 2)) "
            "ELSE CAST(array() AS array<string>) END"
        )).alias("bg"),
    )
    counts = grams.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("bg"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "bg", "cnt")
    )


@register(
    "a18_cms_top_talkers",
    oracle=None,  # CMS estimates depend on the sketch's hash family — the
    # driver records the rows-only check; exact bounds are asserted in
    # tests/test_operators.py::test_cms_top_talkers_planted_skew
    description="count-min-sketch top talkers as a graded (rows-only) "
    "query: approximate top-10 user_ids by event count via "
    "operators.sketch — a bounded-memory heavy-hitter pass (the flow "
    "'top talkers' report at cardinalities where exact per-key state "
    "won't fit). Deterministic for a fixed seed. Scale: one CMS "
    "aggregate pass + per-partition local top-m candidates; driver "
    "memory is O(sketch + candidates), never O(distinct keys).",
    tags=("A4", "A1"),
)
def a18_cms_top_talkers(spark, sf_dir):
    from ..operators.sketch import top_talkers_cms

    ev = load_table(spark, sf_dir, "events").select("user_id")
    top = top_talkers_cms(ev, "user_id", k=10)
    return spark.createDataFrame(top, schema="user_id long, est_count long")


@register(
    "a18b_cms_error_gate",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n,
           CAST(1 AS INT) AS bounds_ok
    FROM events WHERE user_id < 10 GROUP BY user_id
    """,
    description="count-min sketch under the HARD hash gate: per fixed key "
    "set (user_id < 10) the query returns the exact count plus a flag "
    "that the CMS estimate respects its guarantees — never undercounts, "
    "overcounts by at most eps*N (eps=0.001, fixed seed, fully "
    "deterministic). The oracle asserts flag=1, so a sketch regression "
    "fails the driver's hash even though estimates are engine-specific. "
    "Companion to rows-only a18. Scale: the sketch is a fixed grid "
    "merged via partial aggregation; the per-key probe table is O(10).",
    tags=("A4", "A1"),
)
def a18b_cms_error_gate(spark, sf_dir):
    from ..operators.sketch import _read_sketch, count_min_sketch_bytes

    eps = 0.001
    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = _read_sketch(
        spark, count_min_sketch_bytes(ev, "user_id", eps=eps))
    est_df = spark.createDataFrame(
        [(k, int(sketch.estimateCount(k))) for k in range(10)],
        "user_id long, __est long")
    exact = (ev.filter(F.col("user_id") < 10)
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n")))
    # the CMS error bound eps*N as a broadcast 1-row aggregate folded into
    # the plan (no separate eager count job); floor(eps*N)+1 == the
    # previous int(eps*n_total)+1 for non-negative N
    nt = ev.agg(F.count(F.lit(1)).alias("__n_total"))
    slack = F.floor(F.lit(eps) * F.col("__n_total")).cast("long") + 1
    return exact.join(F.broadcast(est_df), "user_id").join(
        F.broadcast(nt)).select(
        "user_id", "exact_n",
        F.when((F.col("__est") >= F.col("exact_n"))
               & (F.col("__est") <= F.col("exact_n") + slack), 1)
        .otherwise(0).cast("int").alias("bounds_ok"),
    )


@register(
    "l20_quality_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             LEAST(95, GREATEST(5, len(string_split(text, ' ')))) AS w
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (
                WHERE {okhash('doc_id')} % 100 < w) AS BIGINT) AS n_kept,
           CAST(SUM(w) AS BIGINT) AS weight_sum,
           CAST(MIN(doc_id) FILTER (
                WHERE {okhash('doc_id')} % 100 < w) AS BIGINT)
             AS first_kept
    FROM scored GROUP BY source
    """,
    description="quality-weighted deterministic sampling (corpus "
    "curation): each doc's keep-probability is its clamped token count "
    "(5..95%), realized by comparing a Knuth-multiplicative doc_id hash "
    "mod 100 against the weight — higher-quality docs survive "
    "proportionally more often, reproducibly on any engine or cluster "
    "size (no rand()). Complements l18 (flat per-domain cap) and l12 "
    "(uniform split). Scale: one scan, per-row codegen arithmetic, one "
    "map-side-combined rollup on source.",
    tags=("L1", "L4", "P7"),
)
def l20_quality_weighted_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")
    w = F.least(F.lit(95), F.greatest(
        F.lit(5), F.size(F.split(F.col("text"), " "))))
    scored = docs.select("doc_id", "source", w.cast("long").alias("w"))
    kept = (khash("doc_id") % 100) < F.col("w")
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(kept).alias("n_kept"),
        F.sum("w").alias("weight_sum"),
        F.min(F.when(kept, F.col("doc_id"))).cast("bigint")
         .alias("first_kept"),
    )


@register(
    "dq4_order_reconciliation",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
                 * (100 + CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT))) AS amt_s
      FROM lineitem GROUP BY l_orderkey
    ), j AS (
      SELECT o.o_orderstatus,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) * 10000
                 AS total_s,
             l.amt_s
      FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE amt_s IS NULL) AS BIGINT)
               AS n_no_lines,
           CAST(COUNT(*) FILTER (WHERE amt_s IS NOT NULL
                AND ABS(total_s - amt_s) * 100 > total_s) AS BIGINT)
               AS n_mismatch,
           CAST(MAX(CASE WHEN amt_s IS NOT NULL
                    THEN ABS(total_s - amt_s) END) AS DOUBLE) / 1000000.0
               AS max_delta_dollars
    FROM j GROUP BY o_orderstatus
    """,
    description="cross-table financial reconciliation (the double-entry "
    "audit a warehouse runs per load): order headers vs the sum of their "
    "line amounts (price x (1-disc) x (1+tax)), classified per status into "
    "no-lines / mismatched-beyond-1%. All arithmetic in exact scaled "
    "integers (cents x 100 x 100), so classification and the max delta "
    "are engine-exact with no float tolerance anywhere. Scale: one "
    "lineitem shuffle on orderkey + one header join on the same key.",
    tags=("DQ", "J2"),
)
def dq4_order_reconciliation(spark, sf_dir):
    from .helpers import cents

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (cents("o_totalprice") * 10000).alias("total_s"),
    )
    l_amt = li.groupBy("l_orderkey").agg(
        F.sum(
            cents("l_extendedprice")
            * (100 - cents("l_discount", 100))
            * (100 + cents("l_tax", 100))
        ).alias("amt_s")
    )
    j = o.join(l_amt, o.o_orderkey == l_amt.l_orderkey, "left")
    has = F.col("amt_s").isNotNull()
    delta = F.abs(F.col("total_s") - F.col("amt_s"))
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).cast("bigint").alias("n_no_lines"),
        F.sum(F.when(has & (delta * 100 > F.col("total_s")), 1).otherwise(0))
        .cast("bigint").alias("n_mismatch"),
        (F.max(F.when(has, delta)).cast("double") / 1000000.0)
        .alias("max_delta_dollars"),
    )


@register(
    "dq5_freshness",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events)
    SELECT event_type,
           CAST((epoch_us(g.gmax) - epoch_us(MAX(ts))) // 1000000 AS BIGINT)
               AS staleness_s,
           CAST(COUNT(*) FILTER (
                WHERE ts >= g.gmax - INTERVAL 1 HOUR) AS BIGINT)
               AS n_last_hour,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events, g GROUP BY event_type, g.gmax
    """,
    description="data-freshness audit (the staleness monitor every "
    "ingest pipeline pages on): per slice, the lag of its newest row "
    "behind the table's newest row, plus last-hour arrival volume — "
    "exact integer epoch arithmetic throughout. Scale: one aggregate "
    "pass; the 1-row global max broadcasts.",
    tags=("DQ", "F2"),
)
def dq5_freshness(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("gmax"))
    j = ev.join(F.broadcast(g))
    return j.groupBy("event_type").agg(
        ((F.unix_micros(F.max("gmax")) - F.unix_micros(F.max("ts")))
         / F.lit(1000000)).cast("bigint").alias("staleness_s"),
        F.sum(
            F.when(F.col("ts") >= F.col("gmax") - F.expr("INTERVAL 1 HOUR"), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_last_hour"),
        F.count(F.lit(1)).alias("n_total"),
    )
