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
    survives small data sizes."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
