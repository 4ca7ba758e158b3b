"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pricing-summary query on sf0.001;
queries()/oracle_sql() expose the full nf2pq_spark registry
(one entry per implemented operator from SURVEY.md §2, each paired
with a DuckDB-runnable ANSI-SQL oracle unless genuinely
non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nf2pq_spark import plans  # noqa: E402
from nf2pq_spark.session import ensure_session_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_conf(spark)
    return plans.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return plans.oracle_sql()
