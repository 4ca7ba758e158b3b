"""The graded query registry.

Every operator from SURVEY.md §2 ships as one registered entry pairing

- a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` (DataFrame-API
  first; Catalyst does the optimizing), and
- an equivalent ANSI-SQL oracle string DuckDB runs over the same parquet
  views (``oracle=None`` → non-SQL-expressible, driver runs a weaker
  rows-only check).

Contract (driver: /root/repo/__spark_entry__.py): results are compared by
row-count + schema + order-insensitive value hash, with columns sorted by
name — so every computed column is aliased identically on both sides, float
aggregates are rounded on both sides, and integer-typed computed columns are
cast to BIGINT on both sides (DuckDB's sum(int) is HUGEINT, len()/year()
are BIGINT, Spark's size()/year() are int).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: queries worth timing in bench.py
    bench: bool = False
    #: plan-lint stand-in for queries whose fn EXECUTES work when called
    #: (streaming runs, sink round-trips): builds the same transformation
    #: core on BATCH inputs so tests/test_plan_lint.py can inspect a
    #: physical plan without running the stream. Streaming transforms are
    #: shared builders (streaming/jobs.py) applied identically in both
    #: modes — stream-batch equivalence is the module's design — so the
    #: probe plans the same operator composition the stream executes.
    lint_probe: QueryFn | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = "",
             tags: tuple[str, ...] = (), bench: bool = False,
             lint_probe: QueryFn | None = None):
    """Decorator: add a query implementation to the graded registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, tags,
                                   bench, lint_probe)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
