"""Graded streaming queries (SURVEY §2.9): real Structured Streaming
executions whose final state is a batch DataFrame, so they get full SQL
oracles. Each runs the events fixture through a file-source stream with
Trigger.AvailableNow into a memory sink.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.jobs import (read_events_stream, run_available_now,
                              streaming_dedup, stream_static_join,
                              windowed_rollup)
from .helpers import msql, osum
from .registry import register


@register(
    "st1_stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n, {osum(msql('value'), 'sum_value')}
    FROM events GROUP BY 1, 2
    """,
    description="Structured Streaming tumbling-window rollup (T1/T4/T8): "
    "file-source stream, watermark, availableNow trigger, memory sink — "
    "stream-batch equivalence makes the batch SQL the oracle",
    tags=("T1", "T4", "T8", "S8"),
)
def st1_stream_tumbling(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    rolled = windowed_rollup(stream, "1 hour", "10 minutes")
    _, name = run_available_now(rolled, output_mode="complete")
    return spark.table(name).select(
        F.col("window.start").alias("bucket"), "event_type", "n", "sum_value"
    )


@register(
    "st2_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    description="streaming stateful dedup (T5): dropDuplicates over the "
    "stream, key projection compared against batch DISTINCT",
    tags=("T5",),
)
def st2_stream_dedup(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    deduped = streaming_dedup(stream, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    _, name = run_available_now(deduped, output_mode="append")
    return spark.table(name)


@register(
    "st3_stream_static_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
    description="stream-static enrichment join (T7): event stream joined "
    "to the broadcast customer dim, aggregated per segment",
    tags=("T7",),
)
def st3_stream_static_join(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream_static_join(stream, dim, stream.user_id == dim.c_custkey)
    # exact COUNT(DISTINCT) isn't streamable directly; keep per-(segment,user)
    # counts as the streaming state and finish the rollup on the final table
    per_key = joined.groupBy("c_mktsegment", "user_id").agg(F.count(F.lit(1)).alias("n"))
    _, name = run_available_now(per_key, output_mode="complete")
    per_user = spark.table(name)
    return per_user.groupBy("c_mktsegment").agg(
        F.sum("n").alias("n"), F.count(F.lit(1)).alias("n_users")
    )
