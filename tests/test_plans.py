"""Physical-plan quality assertions (SURVEY §4): the optimizations the
engine relies on must actually appear in the executed plans — pushdown,
pruning, broadcast selection, top-k physical op, no stray shuffles."""

from __future__ import annotations

import pytest

from nf2pq_spark import plans


def _plan(spark, sf_dir, name: str) -> str:
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: the 11-column table scans only the 7 needed columns
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_j5_all_broadcast_no_smj(spark, sf_dir):
    p = _plan(spark, sf_dir, "j5_star_broadcast")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_j6_broadcast_nested_loop(spark, sf_dir):
    p = _plan(spark, sf_dir, "j6_theta_join")
    assert "BroadcastNestedLoopJoin" in p


def test_o1_take_ordered(spark, sf_dir):
    p = _plan(spark, sf_dir, "o1_top10_orders")
    assert "TakeOrderedAndProject" in p  # no global sort for sort+limit


def test_l3_broadcasts_queries(spark, sf_dir):
    p = _plan(spark, sf_dir, "l3_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_f1_projection_no_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "f1_strings")
    assert "Exchange" not in p  # pure projection stays shuffle-free


def test_semi_anti_join_physical(spark, sf_dir):
    for name in ("j3_semi_join", "j4_anti_join"):
        p = _plan(spark, sf_dir, name)
        assert "LeftSemi" in p or "LeftAnti" in p


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE hides WSCG until the final plan; the codegen explain mode shows
    # the fused subtrees regardless
    df = plans.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    p = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen" in p


def test_dynamic_partition_pruning_on_rollup(spark, sf_dir, tmp_path):
    """Joining the date-partitioned rollup table on its partition column
    against a filtered dim triggers dynamic partition pruning — at 100 TB
    this is what keeps a dim-filtered fact query from scanning every
    partition."""
    from pyspark.sql import functions as F

    from nf2pq_spark.operators.rollup import build_rollup
    from nf2pq_spark.sources.tables import load_table

    path = str(tmp_path / "rollup")
    build_rollup(load_table(spark, sf_dir, "events"), path)
    fact = spark.read.parquet(path)
    # independent dim with a *selective* predicate — DPP's precondition
    days = [r.date for r in fact.select("date").distinct().limit(3).collect()]
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(d, "wanted" if i == 0 else "other") for i, d in enumerate(days)],
        "date date, tag string",
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "wanted")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    joined = fact.join(dim.hint("broadcast"), "date").groupBy("tag").agg(
        F.sum("n").alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With a selective build side, Spark injects a bloom-filter runtime
    row filter (might_contain) on the probe scan of a shuffle join — the
    row-level sibling of DPP that prunes shuffle input at 100 TB. The
    size thresholds exist so it only fires where it pays; zeroing them
    here just makes the small fixture eligible."""
    import pyspark.sql.functions as F

    from nf2pq_spark.sources.tables import load_table

    saved = {k: spark.conf.get(k, None) for k in [
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold"]}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = (load_table(spark, sf_dir, "orders")
             .filter(F.col("o_totalprice") > 400000).select("o_orderkey"))
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_bucketed_range_join_avoids_nested_loop(spark, sf_dir):
    """The keyless range join runs as a bucket equi-join, never a
    broadcast-nested-loop / cartesian plan."""
    from nf2pq_spark.plans.registry import REGISTRY

    df = REGISTRY["j7b_bucketed_range"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # it IS a real join, on the manufactured key


def test_join_strategy_hints(spark, sf_dir):
    """Join strategy is controllable per-query via hints when the optimizer
    default isn't what an operator wants at scale."""
    import pyspark.sql.functions as F

    from nf2pq_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    shj = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in shj._jdf.queryExecution().executedPlan().toString()
    smj = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()


def test_sql5_broadcast_and_month_pushdown(spark, sf_dir):
    p = _plan(spark, sf_dir, "sql5_promo_revenue")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "PushedFilters" in p and "GreaterThanOrEqual(l_shipdate" in p


def test_sql7_disjunction_bounds_pushed_to_scan(spark, sf_dir):
    # the OR-of-ANDs implies l_quantity ∈ [1,50]; Catalyst must extract the
    # common bounds and push them into the parquet scan, not evaluate the
    # whole disjunction only above the join
    p = _plan(spark, sf_dir, "sql7_disjunctive_pred")
    scan = [seg for seg in p.split("FileScan")[1:] if "lineitem" in seg][0]
    assert "l_quantity" in scan.split("PushedFilters:")[1].splitlines()[0]


def test_sql6_fact_reduced_before_orderkey_join(spark, sf_dir):
    # both fact inputs must be broadcast-filtered to the nation pair before
    # the orderkey equi-join (which AQE converts to broadcast at runtime —
    # not visible in the static plan), and the nation scans must carry the
    # pushed IN filter
    p = _plan(spark, sf_dir, "sql6_volume_shipping")
    assert p.count("BroadcastHashJoin") >= 3
    nation_scans = [seg for seg in p.split("FileScan")[1:] if "nation" in seg]
    assert any("In(n_name" in seg.split("PushedFilters:")[1].splitlines()[0]
               for seg in nation_scans if "PushedFilters:" in seg)


def test_t6_gap_fill_aggregates_before_join(spark, sf_dir):
    # the fact must aggregate to (user, day) BEFORE joining the calendar
    # scaffold — a join-then-aggregate plan would shuffle raw events twice
    df = plans.REGISTRY["t6_gap_fill"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = opt.find("Aggregate")
    join_pos = opt.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # optimizedPlan prints top-down: the window/join must appear above
    # (before) the fact aggregate in the tree dump
    assert join_pos < opt.rfind("Aggregate")


def test_dq1_single_scan_profile(spark, sf_dir):
    # one scan computes all twelve statistics: exactly one lineitem FileScan
    p = _plan(spark, sf_dir, "dq1_column_profile")
    assert sum("lineitem" in seg.splitlines()[0]
               for seg in p.split("FileScan")[1:]) == 1


def test_l10_quantize_no_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "l10_vec_quantize")
    assert "Exchange" not in p  # pure narrow per-row transform


def test_sql13_single_shuffle_feeds_agg_and_window(spark, sf_dir):
    # the explicit repartition(l_partkey) must serve BOTH the
    # (partkey, suppkey) aggregate and the partkey window — no re-shuffle
    # between them; the only other hash exchange is the tiny final
    # (s_suppkey, s_name) aggregate
    p = _plan(spark, sf_dir, "sql13_dominant_suppliers")
    assert p.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in p  # supplier joins via broadcast


def test_sql14_single_shuffle_feeds_agg_and_windows(spark, sf_dir):
    # one orderkey exchange for aggregate + all three windows, one tiny
    # final l_suppkey aggregate exchange
    p = _plan(spark, sf_dir, "sql14_strict_latest_supplier")
    assert p.count("Exchange hashpartitioning") == 2


def test_sql15_broadcast_star_single_fact_shuffle(spark, sf_dir):
    # the orderkey fact join stays SMJ in the static plan (AQE converts it
    # at runtime once both inputs shrink — same caveat as the sql6 test);
    # every dimension join must already be broadcast statically
    p = _plan(spark, sf_dir, "sql15_local_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 4
    # region filter pushed into its scan
    region_scan = [s for s in p.split("FileScan")[1:]
                   if "region.parquet" in s.splitlines()[0]][0]
    assert "EqualTo(r_name,ASIA)" in region_scan.split("PushedFilters:")[1].splitlines()[0]


def test_sql17_like_filter_pushed_to_part_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "sql17_profit_by_nation")
    part_scan = [s for s in p.split("FileScan")[1:]
                 if "/part.parquet" in s.splitlines()[0]][0]
    assert "StringContains(p_name,red)" in part_scan.split("PushedFilters:")[1].splitlines()[0]


def test_sql18_aggregates_orders_before_customer_join(spark, sf_dir):
    # orders must collapse to one row per custkey BEFORE joining customer;
    # the ON-clause priority filter must reach the orders scan
    df = plans.REGISTRY["sql18_customer_distribution"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    join_pos = opt.find("Join")
    assert join_pos != -1 and join_pos < opt.rfind("Aggregate")
    p = _plan(spark, sf_dir, "sql18_customer_distribution")
    orders_scan = [s for s in p.split("FileScan")[1:]
                   if "orders.parquet" in s.splitlines()[0]][0]
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in \
        orders_scan.split("PushedFilters:")[1].splitlines()[0]


def test_sql19_topk_physical_and_preagg(spark, sf_dir):
    p = _plan(spark, sf_dir, "sql19_returned_top_customers")
    assert "TakeOrderedAndProject" in p  # heap top-k, not global sort
    li_scan = [s for s in p.split("FileScan")[1:] if "lineitem" in s][0]
    assert "EqualTo(l_returnflag,R)" in li_scan.split("PushedFilters:")[1].splitlines()[0]


def test_sql21_spine_join_is_broadcast(spark, sf_dir):
    """The recursive spine (O(months) rows) must never shuffle the monthly
    rollup via sort-merge: the join is broadcast, and orders aggregates down
    before joining the spine."""
    p = _plan(spark, sf_dir, "sql21_recursive_spine")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_a17_single_scan_shape_aggs(spark, sf_dir):
    """skewness/kurtosis/mode compute per-group in one scan of lineitem
    (one scan; no join materializes the fact twice)."""
    p = _plan(spark, sf_dir, "a17_distribution_shape")
    assert p.count("FileScan parquet") == 1


def test_v1_variant_stays_in_codegen(spark, sf_dir):
    """VARIANT parse/extract is a JVM expression — no Python (Arrow) eval
    node in the plan, and only the single agg exchange."""
    p = _plan(spark, sf_dir, "v1_variant_json")
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert p.count("Exchange") == 1


def test_f2d_distinct_before_function_battery(spark, sf_dir):
    """Calendar functions run after the distinct collapses the scan: one
    scan reading only o_orderdate, one distinct exchange, and the function
    battery folded into the final aggregate's output projection."""
    p = _plan(spark, sf_dir, "f2d_calendar_functions")
    assert p.count("FileScan parquet") == 1
    assert p.count("Exchange") == 1
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" in read_schema and "o_custkey" not in read_schema


def test_j15_lpm_is_broadcast_equijoin(spark, sf_dir):
    # LPM must run as the prefix-length-expansion equi-join, never a
    # nested-loop theta join against the prefix table
    p = _plan(spark, sf_dir, "j15_lpm_enrich")
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    # longest-match selection is a hash agg (map-side partials on the
    # exploded candidates), not a window sort
    assert "max_by" in p and "Window" not in p


def test_t9_window_runs_on_preaggregated_buckets(spark, sf_dir):
    # the trailing-baseline window must consume the aggregated bucket
    # relation: partial count -> exchange -> final -> (small) window
    p = _plan(spark, sf_dir, "t9_traffic_anomaly")
    assert "Window" in p
    assert p.count("HashAggregate") >= 2  # partial+final bucket counts
    # exactly one exchange feeds the agg; the window reuses/repartitions
    # the tiny bucket relation, never the raw events
    agg_section = p.split("Window")[1]
    assert "events.parquet" not in agg_section.split("Scan")[0]


def test_l19_shuffle_shares_one_exchange(spark, sf_dir):
    # the shard repartition must serve BOTH the window and the rollup:
    # exactly one exchange in the whole plan, and no global sort
    p = _plan(spark, sf_dir, "l19_global_shuffle")
    assert "Window" in p
    assert p.count("Exchange") == 1
    assert "TakeOrderedAndProject" not in p and "Sort [kh" not in p.split(
        "Window")[0]


def test_x6_cogroup_is_arrow_batched(spark, sf_dir):
    # cogrouped applyInPandas must plan as FlatMapCoGroupsInPandas (Arrow
    # channel), one shuffle per side on the cogroup key
    p = _plan(spark, sf_dir, "x6_cogroup_asof")
    assert "FlatMapCoGroupsInPandas" in p
    assert "BatchEvalPython" not in p


def test_j8c_bucketed_asof_windows_on_key_and_bucket(spark, sf_dir):
    """The skew-resilient as-of must window per (key, time-bucket), not per
    key alone — that split is the whole point (one hot key → ~30 day
    tasks). Assert the physical Window partition specs: the in-bucket fill
    runs over [su, __b]; only the tiny per-bucket summary windows over the
    bare key."""
    from nf2pq_spark import plans

    df = plans.REGISTRY["j8c_asof_hot_key"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window" in ln and
               "partitionBy" not in ln]
    # at least one Window partitioned by both the key and the bucket col
    assert any("su" in ln and "__b" in ln for ln in windows), plan[:4000]
    # and no row-level Window over the bare key: every Window mentioning su
    # without __b must be the cross-bucket carry (operates on the summary,
    # marked by the __bucket_last column)
    for ln in windows:
        if "su" in ln and "__b#" not in ln and "__b" not in ln:
            assert "__bucket_last" in ln or "__carry" in ln, ln


def test_sql26_pushdown_through_sql_udf(spark, sf_dir):
    # the declarative CREATE FUNCTION bodies must inline: the table
    # function's cutoff predicate reaches the orders parquet scan, the
    # scalar function stays in codegen (no Python eval anywhere)
    p = _plan(spark, sf_dir, "sql26_sql_udf")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the cutoff must land in the parquet scan's pushed filters, not a
    # post-scan Filter node
    scan_lines = [ln for ln in p.splitlines()
                  if "FileScan" in ln and "o_orderdate" in ln]
    assert any("GreaterThanOrEqual(o_orderdate" in ln for ln in scan_lines), (
        "cutoff predicate not pushed into the orders scan")


def test_parquet_aggregate_pushdown_metadata_only(spark, sf_dir):
    """Filterless MIN/MAX/COUNT can resolve from parquet footer statistics
    alone (v2 source + aggregatePushdown) — at 100 TB that's a metadata
    read instead of a full scan. Runs in a newSession so the v2-source
    conf doesn't leak into the shared session."""
    import pyspark.sql.functions as F

    ns = spark.newSession()
    ns.conf.set("spark.sql.sources.useV1SourceList", "")
    ns.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    li = ns.read.parquet(f"{sf_dir}/lineitem.parquet")
    # bigint min/max pushes down; timestamp min/max does NOT (probed:
    # PushedAggregation stays [] for l_shipdate on this build) — so the
    # test pins the supported-type behavior
    agg = li.agg(F.count(F.lit(1)).alias("n"),
                 F.min("l_orderkey").alias("mn"),
                 F.max("l_orderkey").alias("mx"))
    p = agg._jdf.queryExecution().executedPlan().toString()
    # NB: the v2 scan prints `PushedAggregation: []` even when nothing is
    # pushed — assert the actual aggregate entries, not the label
    pushed = [ln for ln in p.splitlines() if "PushedAggregation" in ln]
    assert pushed and "COUNT(*)" in pushed[0] \
        and "MIN(l_orderkey)" in pushed[0] \
        and "MAX(l_orderkey)" in pushed[0], pushed
    row = agg.collect()[0]
    # cross-check against the default-session scan
    base = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.count(F.lit(1)), F.min("l_orderkey"), F.max("l_orderkey"))
            .collect()[0])
    assert (row.n, row.mn, row.mx) == (base[0], base[1], base[2])


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Catalyst injects a bloom-filter runtime filter on the fact side of a
    shuffle join whose other side is selectively filtered — at 100 TB this
    prunes fact rows BEFORE the shuffle instead of after the join. The
    size thresholds exist so small scans skip it; lower them here (in a
    newSession, so nothing leaks) to pin the mechanism on fixture data."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
    li = ns.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = (ns.read.parquet(f"{sf_dir}/orders.parquet")
         .filter("o_orderpriority = '1-URGENT'"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .groupBy("o_orderpriority").count())
    p = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in p and "bloom_filter_agg" in p, (
        "runtime bloom filter not injected")
    # and it's on the FACT side: the might_contain filter references the
    # lineitem join key
    assert any("might_contain" in ln and "l_orderkey" in ln
               for ln in p.splitlines())
