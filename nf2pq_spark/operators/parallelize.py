"""Partition-parallelism guard for CPU-heavy per-row stages.

A single small parquet file scans as ONE split, so a hash/shingle/dot-
product stage over it serializes on one task while the other cores idle
— a local-mode artifact that also bites real clusters on small dimension-
sized inputs. At 100 TB the big inputs arrive with thousands of splits
and the guard is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Ensure at least ~one partition per core before a CPU-heavy stage.
    AQE never coalesces an explicit repartition(n), so the parallelism
    survives small data sizes.

    Split-count probe: ``inputFiles()`` (analysis only) instead of
    ``df.rdd.getNumPartitions()`` — the RDD conversion materialized a
    second physical plan per call (r1 verdict). File count understates
    splits for large multi-rowgroup files, which only makes the guard
    fire less often — and those inputs already parallelize.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    # non-file sources: createDataFrame/shuffle outputs already carry
    # defaultParallelism / spark.sql.shuffle.partitions splits
    return df
