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

import os

from pyspark.errors import AnalysisException
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


def _is_stream_layout(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` already holds a stream-maintained rollup (its
    partition tree carries the per-batch ``batch_id`` level)."""
    try:
        return "batch_id" in spark.read.parquet(path).schema.names
    except AnalysisException:  # path absent / not yet a table
        return False
    # anything else (permissions, corrupt footer) propagates: a transiently
    # unreadable stream-maintained table must fail build_rollup loudly, not
    # be mistaken for "not a stream layout" and get the mixed-depth tree
    # this guard exists to prevent


def build_rollup(events: DataFrame, path: str, bucket: str = "1 hour") -> None:
    """(Re)materialize the per-bucket rollup table, overwriting only the
    date partitions present in the input.

    Refuses a stream-maintained target: this writer's partitions are
    ``date=``-deep while :func:`stream_maintain_rollup` writes
    ``(date, batch_id)`` — a date-level dynamic overwrite that does not
    cover every date leaves a mixed-depth tree and the next
    ``spark.read.parquet(path)`` fails with "Conflicting directory
    structures" (the maintenance path would brick the table). Collapse
    stream partials with :func:`compact_rollup` instead."""
    spark = events.sparkSession
    if _is_stream_layout(spark, path):
        raise ValueError(
            f"build_rollup: {path} is stream-maintained ((date, batch_id) "
            "partitions); a date-level overwrite would leave a mixed-depth "
            "partition tree. Use compact_rollup(spark, path) to collapse "
            "the per-batch partials.")
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
    per-batch rows accumulate, a periodic :func:`compact_rollup` (with
    the stream stopped) collapses them in place; :func:`build_rollup`
    refuses this path — its date-deep partitions would leave a
    mixed-depth tree next to the (date, batch_id) partials.
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


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Collapse a stream-maintained rollup's per-batch partials into one
    row per (bucket, event_type), kept under a constant ``batch_id=-1``
    partition so the stream can keep appending fresh batch partitions to
    the same tree afterwards.

    The rewrite replaces the WHOLE table on purpose: a dynamic
    (per-partition) overwrite writing only ``batch_id=-1`` rows would
    leave the superseded ``(date, batch_id=N)`` partials in place and
    every later read would double-count them. The rollup is tiny by
    design (aggregates, not raw data), so a full rewrite is cheap.

    Crash-safe via a THREE-step sibling-dir swap, never an in-place
    overwrite: a ``mode("overwrite")`` of ``path`` deletes the existing
    files at JOB START, so a failure anywhere in the (arbitrarily long)
    write job would destroy the only on-disk copy of the table — the
    folded rows' sole other home being session memory. Instead the
    collapsed table is fully written to ``<path>__compact_tmp`` while
    the source files remain intact, then swapped in with two atomic
    same-fs renames before anything is destructively walked:
    ``rename(path, path__compact_old)`` → ``rename(tmp, path)`` →
    ``rmtree(old)``. A directory is rmtree'd ONLY while a complete
    replacement is already live at ``path``, so no crash point — not
    even one INSIDE an rmtree, which leaves a partially-deleted dir
    still present — ever orphans the sole surviving copy. Recovery on
    entry reads the surviving dirs: ``old`` present + ``path`` present
    → the swap finished, ``old`` is superseded (possibly mid-rmtree),
    delete it; ``old`` + ``tmp`` present, ``path`` absent → crashed
    between the renames, roll FORWARD (``rename(tmp, path)``, drop
    ``old``); ``old`` alone → restore it. A ``tmp`` with no ``old``
    is a write-phase orphan when ``path`` exists (delete it), else the
    legacy two-step crash state (rename it into place). Run only while
    the maintaining stream is stopped at a committed checkpoint —
    compacting mid-stream races the sink, and a replayed batch re-adds
    rows the compaction already folded in."""
    import shutil

    # normalize before ANY rename: os.rename to a trailing-slash target
    # that does not exist fails on POSIX (ENOENT/ENOTDIR), which would
    # break both the final swap and — worse — the crash-recovery rename
    # where the tmp is the only surviving copy
    path = path.rstrip("/") or path
    tmp = path + "__compact_tmp"
    old = path + "__compact_old"
    if os.path.exists(old):
        if os.path.exists(path):
            # Swap completed at least through rename(tmp, path): `old` is
            # the superseded copy — possibly partially deleted if the
            # crash hit mid-rmtree, but `path` is complete either way.
            shutil.rmtree(old)
            if os.path.exists(tmp):  # defensive: stray partial write
                shutil.rmtree(tmp)
        elif os.path.exists(tmp):
            # Crashed between rename(path, old) and rename(tmp, path):
            # both copies are complete; roll the swap FORWARD so the
            # finished compaction wins, then drop the superseded copy.
            os.rename(tmp, path)
            shutil.rmtree(old)
        else:
            # `old` alone — unreachable via this code's crash points
            # (tmp only disappears by becoming path), but if external
            # cleanup removed the tmp, restore the surviving copy.
            os.rename(old, path)
    elif os.path.exists(tmp):
        if not os.path.exists(path):
            # Legacy two-step crash state (pre-r8 builds rmtree'd the
            # live path before renaming): the tmp holds the ONLY complete
            # copy — finish the interrupted swap, then fall through and
            # compact normally (idempotent fold).
            os.rename(tmp, path)
        else:
            shutil.rmtree(tmp)  # partial-write orphan; table is intact
    r = spark.read.parquet(path)
    collapsed = (
        r.groupBy("bucket", "event_type", "date")
        .agg(
            F.sum("n").alias("n"),
            # decimal(20,2), NOT (10,2): the stream partials store
            # sum-of-decimal(10,2) = decimal(20,2) on disk (_aggs()), and a
            # narrower compacted file next to later stream partials makes
            # every read fail with PARQUET_COLUMN_DATA_TYPE_MISMATCH
            # (INT64 vs FIXED_LEN_BYTE_ARRAY); the narrowing cast also
            # aborts under ANSI once the folded total exceeds 1e8-1.
            F.sum("sum_value_dec").cast("decimal(20,2)")
             .alias("sum_value_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("batch_id", F.lit(-1))
        .select("bucket", "event_type", "n", "sum_value_dec",
                "min_value", "max_value", "date", "batch_id")
    )
    (collapsed.repartition("date")
              .write.partitionBy("date", "batch_id").parquet(tmp))
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


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
