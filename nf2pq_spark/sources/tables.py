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

import os
import stat as _stat

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

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


#: (path, file signature) -> inferred StructType. Pure METADATA memo:
#: schema inference reads parquet footers on the driver (~92 ms/table
#: measured, r13) and every query invocation was re-paying it per
#: load_table call — inside bench.py's timed region. The signature
#: (mtime_ns, size; per-entry for directories) invalidates the memo
#: whenever the file set changes, so a rewritten test fixture re-infers.
#: Spark writes are immutable (new part files per write — never in-place
#: edits), so the one-level signature is sound for directory tables too.
#: This caches NO data and NO results: each action still scans parquet.
_SCHEMA_CACHE: dict[tuple, StructType] = {}


def _path_signature(path: str):
    """Cheap change-detection signature for a parquet file or directory;
    None (→ no caching) when the path cannot be stat'ed."""
    try:
        st = os.stat(path)
        if _stat.S_ISDIR(st.st_mode):
            with os.scandir(path) as it:
                return tuple(sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in it))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the inferred schema memoized per path
    signature — skips the per-call driver-side footer read/inference
    (the dominant cost of building these frames; see _SCHEMA_CACHE)."""
    sig = _path_signature(path)
    if sig is None:
        return spark.read.parquet(path)
    key = (path, sig)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


#: session -> {(path, signature) -> DataFrame}. A DataFrame is an
#: immutable LOGICAL PLAN — reusing the object across queries caches no
#: data (every action still scans parquet); it only skips re-building
#: the identical relation through py4j (~20 ms/call measured after the
#: schema memo). WeakKeyDictionary: entries die with the session.
import weakref

_FRAME_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary())


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing the events.ts nanosecond column."""
    ensure_session_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    sig = _path_signature(path)
    per_session = _FRAME_CACHE.setdefault(spark, {})
    if sig is not None:
        cached = per_session.get((path, sig))
        if cached is not None:
            return cached
    df = read_parquet_cached_schema(spark, path)
    if name == "events":
        df = normalize_events_ts(df)
    if sig is not None:
        per_session[(path, sig)] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None
                ) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for the spark.sql path."""
    for n in (names or TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
