"""Continuous aggregate ("hypertable rollup") maintenance.

The time-series-database pattern the reference's domain lives on: raw flow
rows are rolled into a persistent per-interval aggregate table, and coarse
queries read the small rollup instead of the raw data. Spark-native
restatement:

- the rollup table is partitioned parquet keyed by the bucket date —
  re-materialization replaces only the affected date partitions
  (``partitionOverwriteMode=dynamic``), which is the incremental-refresh
  path at 100 TB;
- a streaming variant maintains the same table via ``foreachBatch`` from
  the collector stream;
- ``query_rollup`` answers coarser-grained aggregates (day/week) from the
  hourly rollup — decomposable aggregates only (sum/count/min/max), which
  re-aggregate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _aggs():
    """Decomposable aggregate set maintained in the rollup (built lazily —
    Column construction needs an active SparkContext)."""
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(10,2)")).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def build_rollup(events: DataFrame, path: str, bucket: str = "1 hour") -> None:
    """(Re)materialize the per-bucket rollup table, overwriting only the
    date partitions present in the input."""
    spark = events.sparkSession
    # save/restore the overwrite mode: leaking 'dynamic' onto the shared
    # session silently changes every later partitioned overwrite in the
    # same session (stale partitions would survive a full rewrite)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rolled = (
            events.groupBy(F.window("ts", bucket).start.alias("bucket"),
                           "event_type")
            .agg(*_aggs())
            .withColumn("date", F.to_date("bucket"))
        )
        # one file per date partition: the rollup is tiny relative to raw
        # data, and a small-file-per-shuffle-task layout would dominate
        # read cost
        (rolled.repartition("date")
               .write.mode("overwrite").partitionBy("date").parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def stream_maintain_rollup(stream: DataFrame, path: str, checkpoint: str,
                           bucket: str = "1 hour"):
    """Maintain the rollup from the live collector stream.

    Each micro-batch writes its PARTIAL per-bucket aggregates under a
    ``(date, batch_id)`` partition. The maintained aggregates are
    decomposable (sum/count/min/max), so readers (:func:`query_rollup`)
    re-aggregate the per-batch rows exactly — unlike the previous
    overwrite-the-date-partition-from-this-batch's-rows refresh, which
    silently DESTROYED earlier batches' contributions whenever a date
    spanned micro-batches (every multi-trigger stream). Dynamic
    overwrite scoped by the batch id keeps replays exactly-once: a
    retried batch rewrites ONLY its own partitions (a read-merge-write
    against the table would double-count its rows on replay). When
    per-batch rows accumulate, a periodic :func:`build_rollup` over the
    raw table (or a compaction pass over the partials — they re-roll
    exactly) collapses them.
    """

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            rolled = (
                batch_df.groupBy(F.window("ts", bucket).start.alias("bucket"),
                                 "event_type")
                .agg(*_aggs())
                .withColumn("date", F.to_date("bucket"))
                .withColumn("batch_id", F.lit(int(batch_id)))
            )
            (rolled.repartition("date")
                   .write.mode("overwrite").partitionBy("date", "batch_id")
                   .parquet(path))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (stream.writeStream.foreachBatch(refresh)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def query_rollup(spark: SparkSession, path: str, grain: str = "day") -> DataFrame:
    """Answer a coarser-grain aggregate from the rollup table (partition-
    pruned scan of the small aggregate, never the raw events)."""
    r = spark.read.parquet(path)
    coarse = F.date_trunc(grain, "bucket").alias("bucket")
    return (
        r.groupBy(coarse, "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
