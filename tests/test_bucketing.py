"""Bucketed co-located join (SURVEY §4): pre-bucketing both join sides on
the key eliminates the per-query shuffle — the 100 TB pattern for repeated
fact⋈fact joins that can't broadcast."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nf2pq_spark.sources.tables import load_table


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("li_bkt"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("o_bkt"))
    # disable auto-broadcast so the (tiny, local) tables take the same
    # shuffle-join path a fact⋈fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lb, ob = spark.table("li_bkt"), spark.table("o_bkt")
        joined = (lb.join(ob, lb.l_orderkey == ob.o_orderkey)
                  .groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located buckets: the whole query plans ZERO shuffles — the join
        # reads matching buckets and the groupBy key inherits the bucketing
        assert "Exchange hashpartitioning" not in plan
        plain = (li.join(o, li.l_orderkey == o.o_orderkey)
                 .groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q")))
        assert {(r.o_orderkey, r.q) for r in joined.collect()} == \
               {(r.o_orderkey, r.q) for r in plain.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")
