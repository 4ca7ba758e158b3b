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


#: Magnitude cap for the embedding validity contract. Real embedding
#: spaces are unit-normalized (components in [-1, 1]); 1e6 is orders of
#: magnitude beyond any legitimate component while keeping every exact-
#: decimal accumulation path safe: the widest per-element cast in the
#: registry is decimal(18,6) over a 64-dim sum (|sum| <= 64 * cap =
#: 6.4e7, against a 1e12 ceiling).
EMBEDDING_ABS_CAP = 1e6

#: DuckDB spelling of :func:`embedding_is_valid` for oracle WHERE
#: clauses — semantically identical to the Spark predicate BY
#: CONSTRUCTION (NULL component, NaN, or |x| > cap excludes the row on
#: both engines): the cap is interpolated from the same
#: :data:`EMBEDDING_ABS_CAP` the Spark lambda closes over, so editing
#: the constant can never desynchronize the two filters (r7 advice —
#: a hardcoded 1000000.0 literal previously sat here). ``!r`` renders
#: the full float repr (1e6 → '1000000.0'), which DuckDB parses as
#: DOUBLE exactly like Spark's F.lit(float).
EMBEDDING_VALID_SQL = (f"len(list_filter({{col}}, x -> x IS NULL OR "
                       f"isnan(x) OR abs(x) > {EMBEDDING_ABS_CAP!r})) = 0")


def embedding_is_valid(col: Column | str) -> Column:
    """Validity contract for embedding analytics: every component
    present, finite (no NaN/Inf), and |x| <= :data:`EMBEDDING_ABS_CAP`.

    Degenerate vectors are EXCLUDED from vector analytics rather than
    poisoned into them — the behavior of any production validation
    stage. Without this, a single hostile vector silently corrupts
    results or kills jobs: NaN ranks FIRST under Spark's descending
    NaN-greatest sort (wrong top-k neighbors, no error), Spark ML's
    KMeans raises on non-finite input, 1e30-magnitude components
    overflow the exact-decimal accumulation casts under ANSI, and
    DuckDB refuses NaN→int casts in the quantization oracle — all found
    by the hostile-corpus differential sweep (r7,
    tools/hostile_corpus_fixture.py). A NULL component reads as
    invalid on both engines (Spark: isNotNull in the lambda; DuckDB:
    ``x IS NULL`` in the filter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.forall(c, lambda x: x.isNotNull() & ~F.isnan(x)
                    & (F.abs(x) <= F.lit(EMBEDDING_ABS_CAP)))


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


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the per-row norms HOISTED out of the pair
    expression (r14, guide §1.2 per-task work): in a pairwise join,
    ``cosine(a, b)`` re-folds both vectors' norms once PER PAIR — three
    64-element folds where one suffices. Callers compute
    ``l2_norm(v)`` once per ROW in the pre-join projection (on a
    broadcast build side: once per vector, period) and pass the norm
    columns here; only the dot fold remains per pair. BIT-IDENTICAL to
    :func:`cosine` by construction: the same ``l2_norm(a) * l2_norm(b)``
    product in the same order, the same NULLIF zero-norm guard —
    relocating where a deterministic float expression is evaluated
    cannot change its value, so every oracle hash is unaffected."""
    return dot(a, b) / F.nullif(na * nb, F.lit(0.0))


def vec_sum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def vec_scale(a: Column, k: float) -> Column:
    return F.transform(a, lambda x: x * F.lit(k))
