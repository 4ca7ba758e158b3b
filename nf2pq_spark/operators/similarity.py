"""Vector similarity search (SURVEY §2.10 L3).

Two paths:

- ``brute_force_topk`` — exact top-k cosine neighbors. The query set is
  broadcast against the candidate scan, the dot product runs as codegen'd
  higher-order functions, and ranking is a per-query-key window. At scale
  this is the *correct* baseline when |queries| is modest: the candidate
  table streams once, no shuffle of the big side, one shuffle for ranking
  keyed by query id.

- ``lsh_topk`` — sign-random-projection (SimHash-for-vectors) bucketing:
  candidates that share a hyperplane-sign prefix with the query are ranked
  exactly. The hyperplanes are deterministic pseudo-random vectors derived
  from sin(), so runs are reproducible without an RNG. This is the 100 TB
  path: bucket cardinality ~n/2^bits, shuffle keyed on bucket id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_from_norms, dot, l2_norm


def _ranked(joined: DataFrame, k: int, round_to: int = 6) -> DataFrame:
    # rank on the ROUNDED cosine (ties to the smaller candidate id): the
    # oracle engine's cosine can differ from Spark's fold in the last ulp,
    # so an unrounded ordering could flip near-tied neighbors at the
    # rank-k boundary in one engine only (cross-engine float rule — same
    # as the l25/l3c threshold comparisons)
    w = Window.partitionBy("q_id").orderBy(
        F.desc(F.round("__cos", round_to)), F.asc("c_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "rn",
                F.round("__cos", round_to).alias("cos_sim"))
    )


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors.

    ``queries``: (q_id, qv: array<double>); ``candidates``: (c_id, cv).
    Self-pairs (q_id == c_id) are excluded.
    """
    from .parallelize import spread_for_compute

    # norms hoisted to once-per-row projections (broadcast side: once per
    # vector, period) — see cosine_from_norms for the bit-identity note
    j = (
        spread_for_compute(candidates)
        .withColumn("__nc", l2_norm(F.col("cv")))
        .join(F.broadcast(queries.withColumn("__nq", l2_norm(F.col("qv")))),
              F.col("q_id") != F.col("c_id"))
        .withColumn("__cos", cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("__nq"), F.col("__nc")))
    )
    return _ranked(j, k)


def hyperplanes(dim: int, bits: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (sin-hash grid)."""
    return [
        [math.sin(0.7 + 13.37 * b + 0.61803 * d) for d in range(dim)]
        for b in range(bits)
    ]


def srp_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id (long) for a vector column.

    A NULL projection (vector length != plane dimension — zip_with pads
    the shorter array with nulls and the dot fold propagates) must NOT
    silently fall into the negative-side branch: every vector would land
    in bucket 0 and the "approximate" path would quietly degrade to a
    full cross join. A wholly NULL vector — or a vector CONTAINING a
    NULL element, whose dot fold propagates NULL exactly like a length
    mismatch — buckets to NULL (the row drops from the bucket join,
    consistent with cosine's null-degradation; one bad record must not
    kill the job). Only a dimension mismatch on clean vectors raises."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(x) for x in p]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).when(
            proj <= 0, F.lit(0))  # NULL proj -> NULL bit -> NULL bucket
    has_null_elem = F.exists(vec_col, lambda x: x.isNull())
    return F.when(vec_col.isNull() | has_null_elem,
                  F.lit(None).cast("long")).when(
        bucket.isNotNull(), bucket).otherwise(
        F.raise_error(F.lit(
            "srp_bucket: vector length does not match the hyperplane "
            "dimension (check the dim= argument / embedding width)")))


def ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 2, seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer.

    Candidates are assigned to their nearest of ``n_cells`` centroids
    (built with MLlib KMeans, fixed seed); each query exactly ranks only
    the candidates in its ``n_probe`` nearest cells. The classic ANN
    recall/cost dial: probe more cells → higher recall.

    Scale: the index build is one KMeans pass; search shuffles candidates
    once on cell id and broadcasts the (tiny) query set per probed cell —
    ~n_probe/n_cells of the corpus scanned per query.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    cand_vec = candidates.withColumn("__v", array_to_vector(F.col("cv")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="__cell")
    model = km.fit(cand_vec)
    c_assigned = (model.transform(cand_vec).select("c_id", "cv", "__cell")
                  .withColumn("__nc", l2_norm(F.col("cv"))))

    centers = [list(c) for c in model.clusterCenters()]
    centers_df = queries.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, centroid array<double>",
    )
    # probe cells by the SAME metric KMeans used for assignment (squared
    # Euclidean distance) — ranking probes by cosine while candidates were
    # binned by Euclidean mixes metrics: an unnormalized query can rank
    # the cells in a different order than the assignment that placed its
    # true neighbors, systematically missing the right cell (r3 review)
    sq_dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("centroid"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    q_cells = (
        queries.crossJoin(F.broadcast(centers_df))
        .withColumn("__d", sq_dist)
        # a NULL distance (null-element or dimension-mismatched query:
        # zip_with null-pads, so every cell's __d is NULL) sorted NULLS
        # FIRST and silently probed cells 0..n_probe-1 — arbitrary
        # "neighbors" with NULL cosine (r10 review). Degrade such
        # queries to NO probes instead, the module's null-degradation
        # contract (one bad record must not kill the job).
        .filter(F.col("__d").isNotNull())
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("q_id").orderBy(F.asc("__d"), F.asc("cell"))))
        .filter(F.col("__rk") <= n_probe)
        .select("q_id", "qv", F.col("cell").alias("__cell"),
                l2_norm(F.col("qv")).alias("__nq"))
    )
    j = (
        c_assigned.join(F.broadcast(q_cells), on="__cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("__cos", cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("__nq"), F.col("__nc")))
    )
    return _ranked(j, k)


def lsh_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
             bits: int = 4, dim: int = 64) -> DataFrame:
    """Approximate top-k: exact ranking within the query's SRP bucket.

    Scale: candidates shuffle once on bucket id; each query only scans
    ~n/2^bits candidates. Recall is tunable via ``bits`` (fewer bits →
    bigger buckets → higher recall).
    """
    planes = hyperplanes(dim, bits)
    q = (queries.withColumn("__bkt", srp_bucket(F.col("qv"), planes))
         .withColumn("__nq", l2_norm(F.col("qv"))))
    c = (candidates.withColumn("__bkt", srp_bucket(F.col("cv"), planes))
         .withColumn("__nc", l2_norm(F.col("cv"))))
    j = (
        c.join(F.broadcast(q), on="__bkt")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("__cos", cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("__nq"), F.col("__nc")))
    )
    return _ranked(j, k)
