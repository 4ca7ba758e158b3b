"""Vector/embedding column functions (JVM-side, no Python UDFs).

All of these compose built-in higher-order functions (``zip_with`` /
``aggregate`` / ``transform``), so they run inside whole-stage codegen and
scale linearly with no Python worker round-trip. Folds are left-to-right,
matching DuckDB's sequential list aggregation, which keeps float results
bit-identical between query and oracle when elements are cast to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> so arithmetic matches the oracle."""
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (left-to-right fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; components fold sequentially like DuckDB's
    list_cosine_similarity.

    Zero-norm guard: the denominator is NULLIF'd so a zero (or all-null)
    vector yields NULL instead of killing the job under Spark 4's
    default ANSI mode (DIVIDE_BY_ZERO) — one zero embedding anywhere in
    a corpus would otherwise fail every top-k query. NULL sorts last
    under the descending rank the top-k operators use, which selects
    the same neighbors as DuckDB's -1.0 clamp for degenerate vectors
    (fixtures contain none, so the cross-engine hash is unaffected)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def vec_sum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def vec_scale(a: Column, k: float) -> Column:
    return F.transform(a, lambda x: x * F.lit(k))
