"""Fixture table loaders.

One Parquet file per table under ``{sf_dir}/{name}.parquet`` (schemas frozen
in FIXTURES.md). All loading goes through :func:`load_table` so that the one
fixture quirk — ``events.ts`` stored as parquet TIMESTAMP(NANOS), which
Spark 4.1.2 only reads with ``spark.sql.legacy.parquet.nanosAsLong=true``,
arriving as bigint nanoseconds — is normalized in exactly one place.
The ns→µs conversion uses integer division (``ts div 1000``), which is
exact for int64 and matches DuckDB's native ns→µs truncation bit-for-bit
(verified against the fixtures).

Scale note: these are plain ``spark.read.parquet`` scans, so Catalyst
predicate pushdown / column pruning / partition pruning apply untouched.
The post-read ``withColumn`` on events is a codegen'd projection, not a
shuffle — it survives any scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_session_conf

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Dimension tables small enough to broadcast at any scale factor.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing the events.ts nanosecond column."""
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # exact int64 ns → µs truncation; matches DuckDB's read of the file
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None
                ) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the spark.sql path."""
    for n in (names or TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
