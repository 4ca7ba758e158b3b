"""Fixture table loaders.

One Parquet file per table under ``{sf_dir}/{name}.parquet`` (schemas frozen
in FIXTURES.md). All loading goes through :func:`load_table` so that the one
fixture quirk — the type of ``events.ts`` — is normalized in exactly one
place. Fixture generations have stored it either as parquet TIMESTAMP(NANOS)
(readable only with ``spark.sql.legacy.parquet.nanosAsLong=true``, arriving
as bigint nanoseconds) or as TIMESTAMP(MICROS, isAdjustedToUTC=false)
(arriving as ``timestamp_ntz``). Both are normalized to a session-TZ
``TimestampType`` — exact, since the session is pinned to UTC and the ns→µs
integer division matches DuckDB's truncation bit-for-bit.

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events.ts fixture quirk to session-TZ TimestampType.

    THE one place handling both fixture generations (the module-docstring
    invariant) — the batch loader and the streaming reader
    (streaming.jobs.read_events_stream) both call this, so a third ts
    encoding added here covers every path at once.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # exact int64 ns → µs truncation; matches DuckDB's read of the file
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # MICROS/isAdjustedToUTC=false fixture generation: arrives NTZ;
        # cast to session-TZ TimestampType (session pinned UTC → exact)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing the events.ts nanosecond column."""
    ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None
                ) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the spark.sql path."""
    for n in (names or TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
