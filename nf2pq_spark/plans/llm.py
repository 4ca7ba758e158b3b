"""LLM-data-pipeline operator catalog (SURVEY §2.10; north star surface).

Dedup (exact + MinHash/LSH), vector similarity search, text analysis,
multimodal doc⋈embedding joins. Everything hash-based uses md5 so the
DuckDB oracle can reproduce it exactly; only genuinely approximate /
engine-hash-specific variants (SimHash, xxhash LSH) are rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (LANG_MARKERS, STOPWORDS, fingerprint, lang_guess,
                              lang_score, tokens)
from ..functions.vectors import (EMBEDDING_VALID_SQL, as_double_array,
                                 embedding_is_valid)
from ..operators.dedup import (exact_dedup, jaccard_pairs, lsh_candidate_pairs,
                               minhash_signature, simhash64)
from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.tables import load_table
from .helpers import khash, okhash
from .registry import register

#: DuckDB spelling of the embedding validity contract (see
#: functions.vectors.embedding_is_valid) — every embedding-analytics
#: oracle filters through this so both engines exclude the same
#: degenerate vectors (NULL/NaN/Inf/|x|>1e6 components).
_EMB_WHERE = EMBEDDING_VALID_SQL.format(col="embedding")


@register(
    "l1_exact_dedup_stats",
    oracle="""
    SELECT source,
           COUNT(DISTINCT md5(lower(text))) AS n_unique,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
    description="exact dedup stats per source: distinct normalized-text "
    "fingerprints (L1). Scale: one shuffle; fingerprint map-side.",
    tags=("L1",),
    bench=True,
)
def l1_exact_dedup_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "l1b_exact_dedup_keep",
    oracle="""
    SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(lower(text))
    """,
    description="exact dedup keeping min-id doc per fingerprint (L1)",
    tags=("L1",),
)
def l1b_exact_dedup_keep(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "l2_minhash_bands",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                       i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [] END AS hashes
      FROM toks
    )
    SELECT list_min(list_transform(hashes, h -> substr(h, 1, 8))) AS band_0,
           list_min(list_transform(hashes, h -> substr(h, 9, 8))) AS band_1,
           MIN(doc_id) AS min_doc, COUNT(*) AS n_docs
    FROM sh
    GROUP BY 1, 2
    """,
    description="MinHash band buckets (L2): md5-based per-band signatures, "
    "grouped — docs sharing a bucket are near-dup candidates. Fully "
    "deterministic, oracle-checkable.",
    tags=("L2",),
    bench=True,
)
def l2_minhash_bands(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signature(d, "text", n_bands=2)
    return sig.groupBy("band_0", "band_1").agg(
        F.min("doc_id").alias("min_doc"), F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "l2b_neardup_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                       i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [] END AS h
      FROM toks
    ), bands AS (
      SELECT doc_id,
             list_min(list_transform(h, x -> substr(x, 1, 8))) AS b0,
             list_min(list_transform(h, x -> substr(x, 9, 8))) AS b1,
             list_min(list_transform(h, x -> substr(x, 17, 8))) AS b2,
             list_min(list_transform(h, x -> substr(x, 25, 8))) AS b3
      FROM sh WHERE len(h) > 0
    ), bexp AS (
      SELECT doc_id, 0 AS band, b0 AS h FROM bands
      UNION ALL SELECT doc_id, 1 AS band, b1 AS h FROM bands
      UNION ALL SELECT doc_id, 2 AS band, b2 AS h FROM bands
      UNION ALL SELECT doc_id, 3 AS band, b3 AS h FROM bands
    ), bok AS (
      SELECT doc_id, band, h FROM (
        SELECT doc_id, band, h,
               COUNT(*) OVER (PARTITION BY band, h) AS bn FROM bexp)
      WHERE bn <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bok a JOIN bok b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ), tt AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
      FROM documents
    )
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE)
                 / (len(ta.tk) + len(tb.tk)
                    - len(list_intersect(ta.tk, tb.tk))), 6) AS jaccard
    FROM cand JOIN tt ta ON ta.doc_id = id_a JOIN tt tb ON tb.doc_id = id_b
    WHERE ROUND(CAST(len(list_intersect(ta.tk, tb.tk)) AS DOUBLE)
                / (len(ta.tk) + len(tb.tk)
                   - len(list_intersect(ta.tk, tb.tk))), 6) >= 0.5
    """,
    description="near-dup pairs via MinHash LSH + exact Jaccard >= 0.5 (L2). "
    "Was rows-only in r1; the md5 banding (4 x 8-hex slices) and the "
    "Jaccard verify are both deterministic, so the full two-stage pipeline "
    "now carries a hash oracle. The hot-bucket cap (1000) is MIRRORED in "
    "the oracle's windowed band-population filter (r6 — the l25 "
    "standard), so both engines agree on ANY corpus, not just fixtures "
    "whose buckets stay under cap; the filter compares the ROUNDED "
    "jaccard on both sides, matching the Spark column.",
    tags=("L2",),
)
def l2b_neardup_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cands = lsh_candidate_pairs(d, n_bands=4)
    return jaccard_pairs(d, cands, threshold=0.5)


@register(
    "l2c_simhash",
    oracle=None,  # xxhash64-based — no oracle equivalent
    description="64-bit SimHash signatures + per-prefix population (L2; "
    "rows-only: Spark-native xxhash64)",
    tags=("L2",),
)
def l2c_simhash(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = simhash64(d)
    return sig.groupBy((F.col("simhash") % 256).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "l2f_simhash_gate",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_query_docs,
           CAST(1 AS INT) AS precision_ok, CAST(1 AS INT) AS recall_ok
    FROM documents WHERE doc_id < 50
    """,
    description="SimHash under the HARD hash gate (companion to rows-only "
    "l2c, same pattern as a4c/l3e/l3f): among doc pairs with simhash "
    "hamming distance <= 12, the fraction with exact token Jaccard >= 0.4 "
    "(precision) and the fraction of true near-dups the hamming cutoff "
    "finds (recall) are computed in-query and flagged >= 0.9 / >= 0.25 — "
    "measured precision ~0.995 and recall 0.44-0.50 across all three "
    "fixture scales (base dup rate 0.84, so precision shows real lift). "
    "xxhash64 is deterministic in Spark, so the flags are stable and a "
    "broken bit-vote fails the driver's hash. Query side bounded to 50 "
    "docs so the verify pair set stays linear in corpus size.",
    tags=("L2",),
)
def l2f_simhash_gate(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = simhash64(d)
    a = sig.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("ia"), F.col("simhash").alias("ha"),
        F.array_distinct(F.split("text", " ")).alias("ta"))
    b = sig.select(
        F.col("doc_id").alias("ib"), F.col("simhash").alias("hb"),
        F.array_distinct(F.split("text", " ")).alias("tb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    jac = (F.size(F.array_intersect("ta", "tb")).cast("double")
           / F.size(F.array_union("ta", "tb")))
    st = pairs.select(ham.alias("h"), jac.alias("j")).agg(
        F.count_if(F.col("h") <= 12).alias("__close"),
        F.count_if((F.col("h") <= 12) & (F.col("j") >= 0.4)).alias("__cd"),
        F.count_if(F.col("j") >= 0.4).alias("__dup"),
    )
    # 1-row x 1-row cross join keeps the query-doc count inside the single
    # plan (an eager .count() here would run a second driver job per
    # invocation of a graded query function)
    n_q = d.filter(F.col("doc_id") < 50).agg(
        F.count(F.lit(1)).alias("__n_q"))
    return st.crossJoin(n_q).select(
        F.col("__n_q").cast("bigint").alias("n_query_docs"),
        F.when(F.col("__cd") >= 0.9 * F.col("__close"), 1)
        .otherwise(0).cast("int").alias("precision_ok"),
        F.when(F.col("__cd") >= 0.25 * F.col("__dup"), 1)
        .otherwise(0).cast("int").alias("recall_ok"),
    )


@register(
    "l2d_neardup_components",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                       i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [] END AS h
      FROM toks
    ), bands AS (
      SELECT doc_id,
             list_min(list_transform(h, x -> substr(x, 1, 8))) AS b0,
             list_min(list_transform(h, x -> substr(x, 9, 8))) AS b1
      FROM sh
    ), bexp AS (
      SELECT doc_id, 0 AS band, b0 AS h FROM bands WHERE b0 IS NOT NULL
      UNION ALL
      SELECT doc_id, 1 AS band, b1 AS h FROM bands WHERE b1 IS NOT NULL
    ), bok AS (
      SELECT doc_id, band, h FROM (
        SELECT doc_id, band, h,
               COUNT(*) OVER (PARTITION BY band, h) AS bn FROM bexp)
      WHERE bn <= 1000
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM bok a JOIN bok b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), walk(n, l) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.n
    )
    SELECT component, COUNT(*) AS n_docs, MAX(n) AS max_doc FROM (
      SELECT n, MIN(l) AS component FROM walk GROUP BY n
    ) GROUP BY component
    """,
    description="transitive near-dup clusters (L2): LSH candidate pairs -> "
    "connected components via min-label propagation "
    "(operators.dedup.connected_components) — dedup keeps one doc per "
    "TRANSITIVE cluster, not per pair. Oracle recomputes the same graph "
    "with a recursive CTE, INCLUDING the hot-bucket cap as a windowed "
    "band-population filter (r6 — mirrored like l25's guard, so both "
    "engines agree even on a boilerplate-heavy corpus); singleton docs "
    "(no candidate edge) are not clusters and don't appear",
    tags=("L2",),
    bench=True,
)
def l2d_neardup_components(spark, sf_dir):
    from ..operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = lsh_candidate_pairs(d, n_bands=2)
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    comp = connected_components(edges)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"), F.max("n").alias("max_doc")
    )


@register(
    "l2e_neardup_dedup_keep",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                       i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                  ELSE [] END AS h
      FROM toks
    ), bands AS (
      SELECT doc_id,
             list_min(list_transform(h, x -> substr(x, 1, 8))) AS b0,
             list_min(list_transform(h, x -> substr(x, 9, 8))) AS b1
      FROM sh
    ), bexp AS (
      SELECT doc_id, 0 AS band, b0 AS h FROM bands WHERE b0 IS NOT NULL
      UNION ALL
      SELECT doc_id, 1 AS band, b1 AS h FROM bands WHERE b1 IS NOT NULL
    ), bok AS (
      SELECT doc_id, band, h FROM (
        SELECT doc_id, band, h,
               COUNT(*) OVER (PARTITION BY band, h) AS bn FROM bexp)
      WHERE bn <= 1000
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM bok a JOIN bok b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ), walk(n, l) AS (
      SELECT DISTINCT u, u FROM edges
      UNION
      SELECT e.v, w.l FROM walk w JOIN edges e ON e.u = w.n
    ), drop_set AS (
      SELECT n FROM (SELECT n, MIN(l) AS component FROM walk GROUP BY n)
      WHERE n <> component
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_kept
    FROM documents WHERE doc_id NOT IN (SELECT n FROM drop_set)
    GROUP BY source
    """,
    description="end-to-end near-dup dedup (L2): LSH pairs -> connected "
    "components -> keep the min-id doc per cluster, anti-join the rest "
    "out of the corpus — the actual training-data dedup deliverable "
    "(singletons survive untouched; hot-bucket cap mirrored in the "
    "oracle r6, like l25's guard)",
    tags=("L2", "J4"),
)
def l2e_neardup_dedup_keep(spark, sf_dir):
    from ..operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(d.select("doc_id", "text"), n_bands=2)
    comp = connected_components(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )
    drop = comp.filter(F.col("n") != F.col("component")).select(
        F.col("n").alias("doc_id")
    )
    kept = d.join(drop, "doc_id", "left_anti")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_kept")
    )


@register(
    "l3_cosine_topk",
    oracle=f"""
    WITH emb AS (SELECT * FROM embeddings WHERE {_EMB_WHERE})
    SELECT q_id, c_id, rn, cos_sim FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             CAST(ROW_NUMBER() OVER (
                  PARTITION BY q.vec_id
                  ORDER BY ROUND(list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])), 6) DESC,
                           c.vec_id) AS BIGINT) AS rn,
             CAST(ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[])), 6)
                  AS DOUBLE) AS cos_sim
      FROM emb q JOIN emb c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10) t
    WHERE rn <= 5
    """,
    description="brute-force exact top-5 cosine neighbors for 10 query "
    "vectors (L3); both engines rank on the 6dp-rounded cosine so a "
    "last-ulp cross-engine divergence can't flip near-tied neighbors at "
    "the rank-k boundary. Scale: queries broadcast, candidates stream "
    "once, ranking shuffles on q_id only.",
    tags=("L3",),
    bench=True,
)
def l3_cosine_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("cv"))
    return brute_force_topk(q, c, k=5)


@register(
    "l3b_lsh_topk",
    oracle=None,  # approximate by construction
    description="LSH-bucketed approximate top-k cosine (L3 scale path; "
    "rows-only: recall<1 by design)",
    tags=("L3",),
)
def l3b_lsh_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("cv"))
    return lsh_topk(q, c, k=5, bits=2)


@register(
    "l3f_ivf_recall_gate",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
           CAST(1 AS INT) AS recall_ok
    FROM embeddings WHERE vec_id < 10 AND {_EMB_WHERE}
    """,
    description="IVF-KMeans search under the HARD hash gate (companion to "
    "rows-only l3d, same pattern as l3e): recall of IVF top-5 (16 cells, "
    "2 probed, KMeans seed fixed) against exact brute-force top-5 is "
    "computed in-query and flagged >= 0.25 — measured 0.38-0.46 across "
    "all three fixture scales, vs ~0.125 for random cell assignment at "
    "the same probe budget, so the flag is stable with wide margin and a "
    "broken coarse quantizer fails the driver's hash.",
    tags=("L3",),
)
def l3f_ivf_recall_gate(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("long").alias("q_id"),
        as_double_array("embedding").alias("qv"))
    c = e.select(F.col("vec_id").cast("long").alias("c_id"),
                 as_double_array("embedding").alias("cv"))
    exact = brute_force_topk(q, c, k=5).select("q_id", "c_id")
    approx = ivf_topk(q, c, k=5).select(
        F.col("q_id").alias("aq"), F.col("c_id").alias("ac"))
    per = exact.join(
        approx, (exact.q_id == approx.aq) & (exact.c_id == approx.ac), "left"
    ).agg(
        F.countDistinct("q_id").alias("n_queries"),
        F.count("ac").alias("__n_match"),
    )
    return per.select(
        "n_queries",
        F.when(F.col("__n_match") >= 0.25 * 5 * F.col("n_queries"), 1)
        .otherwise(0).cast("int").alias("recall_ok"),
    )


@register(
    "l3e_lsh_recall_gate",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries,
           CAST(1 AS INT) AS recall_ok
    FROM embeddings WHERE vec_id < 10 AND {_EMB_WHERE}
    """,
    description="L3 approximate search under the HARD hash gate: recall "
    "of SRP-LSH top-5 against the exact brute-force top-5 is computed "
    "inside the query and flagged >= 0.3 (measured 0.44-0.56 across "
    "fixtures; random 4-bucket assignment would give ~0.25). Both paths "
    "are deterministic (sin-derived hyperplanes, no RNG), so the flag is "
    "stable and the driver's hash catches an LSH regression even though "
    "per-neighbor results are approximate. Companion to rows-only l3b.",
    tags=("L3",),
)
def l3e_lsh_recall_gate(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("long").alias("q_id"),
        as_double_array("embedding").alias("qv"))
    c = e.select(F.col("vec_id").cast("long").alias("c_id"),
                 as_double_array("embedding").alias("cv"))
    exact = brute_force_topk(q, c, k=5).select("q_id", "c_id")
    approx = lsh_topk(q, c, k=5, bits=2).select(
        F.col("q_id").alias("aq"), F.col("c_id").alias("ac"))
    # one aggregate over the left join — no 1x1 cross join in the plan
    per = exact.join(
        approx, (exact.q_id == approx.aq) & (exact.c_id == approx.ac), "left"
    ).agg(
        F.countDistinct("q_id").alias("n_queries"),
        F.count("ac").alias("__n_match"),
    )
    return per.select(
        "n_queries",
        F.when(F.col("__n_match") >= 0.3 * 5 * F.col("n_queries"), 1)
        .otherwise(0).cast("int").alias("recall_ok"),
    )


@register(
    "l3d_ivf_topk",
    oracle=None,  # approximate by construction (KMeans coarse quantizer)
    description="IVF approximate top-k cosine: KMeans(16) coarse cells, "
    "2-probe exact rank within probed cells (L3 scale path; rows-only)",
    tags=("L3",),
)
def l3d_ivf_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("cv"))
    return ivf_topk(q, c, k=5, n_cells=16, n_probe=2)


@register(
    "l3c_cosine_neardup",
    oracle=f"""
    WITH emb AS (SELECT * FROM embeddings WHERE {_EMB_WHERE})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])), 6)
                AS DOUBLE) AS cos_sim
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) > 0.35
    """,
    description="embedding-cosine near-duplicate pairs above threshold (L2/"
    "L3). Scale path is the SRP-LSH bucketing in operators.similarity; this "
    "exact pair join is the verification stage.",
    tags=("L2", "L3"),
)
def l3c_cosine_neardup(spark, sf_dir):
    from ..functions.vectors import cosine_from_norms, l2_norm

    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    # per-ROW norms hoisted out of the per-PAIR cosine (r14, guide §1.2):
    # bit-identical values (see cosine_from_norms), one fold per pair
    # instead of three — this is the module's O(n²) verification stage,
    # so the per-pair constant is the whole cost
    a = e.select(F.col("vec_id").alias("id_a"),
                 as_double_array("embedding").alias("va"))
    a = a.withColumn("__na", l2_norm(F.col("va")))
    b = e.select(F.col("vec_id").alias("id_b"),
                 as_double_array("embedding").alias("vb"))
    b = b.withColumn("__nb", l2_norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cosine_from_norms(F.col("va"), F.col("vb"),
                                               F.col("__na"), F.col("__nb")))
        # 0.35: the fixture's random 64-dim vectors peak at cos ~0.51, so
        # the conventional 0.8 bar returned zero pairs at every sf — a
        # vacuous empty-vs-empty oracle match (~0.1% of pairs pass 0.35).
        # Threshold compares the ROUNDED cosine on both engines: Spark's
        # fold-based dot product and DuckDB's list_cosine_similarity can
        # differ in the last ulp, so an unrounded comparison could admit a
        # pair sitting exactly at the bar in one engine only.
        .filter(F.round(F.col("__cos"), 6) > 0.35)
        .select("id_a", "id_b", F.round("__cos", 6).alias("cos_sim"))
    )


@register(
    "l8_jaccard_pairs",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.2
    """,
    description="exact token-set Jaccard pairs (L2 n-gram dedup verify "
    "stage): integer set sizes divide to bit-identical doubles — no "
    "rounding. Scale path pairs this with LSH candidates, never all-pairs.",
    tags=("L2",),
)
def l8_jaccard_pairs(spark, sf_dir):
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.array_distinct(tokens(F.col("text"))).alias("toks"))
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", "jaccard")
    )


@register(
    "l7_tfidf_top_term",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term,
           CAST(ROUND(score, 6) AS DOUBLE) AS tfidf
    FROM (SELECT doc_id, term, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term) AS rn
          FROM scored) t
    WHERE rn = 1
    """,
    description="tf-idf: most characteristic term per document (L4). "
    "Scale: two shuffles (term-count, df) + a broadcast-able df dimension; "
    "no cross join of documents.",
    tags=("L4",),
)
def l7_tfidf_top_term(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate (metadata-only count),
    # folded into the single plan — no separate eager driver job
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    terms = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # one corpus pass: DF derives from the materialized TF table ((doc,term)
    # rows are unique there, so df = row count per term) instead of a second
    # explode over the corpus (audited: 2x documents scan, no reuse)
    tf = (terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
          .localCheckpoint(eager=True))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(nd))
        .select(
            "doc_id", "term",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df")))
            .alias("score"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"),
                F.round("score", 6).alias("tfidf"))
    )


@register(
    "x4_udtf_shingles",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    SELECT doc_id, COUNT(*) AS n_shingles, COUNT(DISTINCT s) AS n_distinct
    FROM sh GROUP BY doc_id
    """,
    description="Python UDTF (X4): one-to-many shingle exploder via LATERAL "
    "table function, aggregated per doc",
    tags=("X4",),
)
def x4_udtf_shingles(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class ShingleUDTF:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield doc_id, " ".join(toks[i:i + 3])

    spark.udtf.register("shingle_udtf", ShingleUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               COUNT(DISTINCT s.shingle) AS n_distinct
        FROM documents d, LATERAL shingle_udtf(d.doc_id, d.text) s
        GROUP BY s.doc_id
    """)


@register(
    "mm1_media_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             list_transform(range(16), i ->
                 (strpos('0123456789abcdef', substr(md5(text), 2*i + 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(text), 2*i + 2, 1)) - 1)
             ) AS bytes
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_items,
           CAST(SUM(CAST(list_aggregate(bytes, 'sum') AS BIGINT)) AS BIGINT)
               AS total_bytes_sum,
           CAST(MAX(list_aggregate(bytes, 'max')) AS BIGINT) AS max_byte,
           CAST(SUM(CAST(list_aggregate(bytes, 'sum') AS BIGINT) // 16) AS BIGINT)
               AS sum_mean_byte
    FROM b GROUP BY lang
    """,
    description="multimodal binary pipeline (north star): opaque media "
    "blobs (unhex(md5(text)) stands in for image bytes) + typed metadata, "
    "decoded and feature-extracted by an Arrow-batched mapInPandas UDF — "
    "the oracle recomputes the byte features from hex arithmetic. Real "
    "codec backends are stubbed (functions.multimodal).",
    tags=("MM", "X5"),
    bench=True,
)
def mm1_media_features(spark, sf_dir):
    from ..functions.multimodal import extract_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    feats = extract_features(media, backend="fake")
    langs = docs.select(F.col("doc_id").alias("media_id"), "lang")
    return (
        feats.join(langs, "media_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("sum_bytes").alias("total_bytes_sum"),
            F.max("max_byte").alias("max_byte"),
            F.sum("mean_byte").alias("sum_mean_byte"),
        )
    )


@register(
    "l4_text_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)
               AS avg_chars,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens
    FROM documents GROUP BY lang
    """,
    description="per-language corpus statistics (L4)",
    tags=("L4",),
)
def l4_text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens(F.col("text")))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("long")).alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.max(n_tokens.cast("long")).alias("max_tokens"),
    )


@register(
    "l4b_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 4)
                AS DOUBLE) AS chars_per_token,
           CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({','.join(repr(w) for w in STOPWORDS)}))) AS BIGINT)
               AS n_stop,
           CAST(ROUND(CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({','.join(repr(w) for w in STOPWORDS)}))) AS DOUBLE)
                / len(string_split(text, ' ')), 4) AS DOUBLE) AS stop_ratio
    FROM documents
    """,
    description="per-document quality features: token count, chars/token, "
    "stopword ratio (L4)",
    tags=("L4",),
)
def l4b_quality_score(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).cast("long")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / F.size(toks), 4).alias("chars_per_token"),
        n_stop.alias("n_stop"),
        F.round(n_stop.cast("double") / F.size(toks), 4).alias("stop_ratio"),
    )


def _marker_sql(lang: str) -> str:
    return (f"len(list_filter(string_split(text, ' '), "
            f"w -> w IN ({','.join(repr(w) for w in LANG_MARKERS[lang])})))")


@register(
    "l4c_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_marker_sql('en')} AS s_en,
             {_marker_sql('de')} AS s_de,
             {_marker_sql('fr')} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en IS NULL THEN NULL  -- NULL text stays NULL,
                                             -- mirroring lang_guess
                WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS guessed,
           CAST(s_en AS BIGINT) AS s_en
    FROM s
    """,
    description="marker-word language-ID heuristic (L4): deterministic "
    "argmax over per-language stopword hit counts",
    tags=("L4",),
)
def l4c_lang_id(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        lang_guess(F.col("text")).alias("guessed"),
        lang_score(F.col("text"), "en").alias("s_en"),
    )


@register(
    "l4d_token_fingerprints",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
               AS n_bpe_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              w -> CAST(length(w) * 256 + ascii(w) AS BIGINT))),
             (a, b) -> (a * 131 + b) % 1000000007) AS rolling_fp
    FROM documents
    """,
    description="BPE-ish regex token counting + Karp-Rabin rolling-hash "
    "document fingerprint (L4): integer fold, fully oracle-exact",
    tags=("L4",),
)
def l4d_token_fingerprints(spark, sf_dir):
    from ..functions.text import bpe_token_count, rolling_fingerprint

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        rolling_fingerprint(F.col("text")).alias("rolling_fp"),
    )


@register(
    "l5_multimodal_join",
    oracle=f"""
    WITH emb AS (SELECT * FROM embeddings WHERE {_EMB_WHERE})
    SELECT d.lang, e.label, COUNT(*) AS n,
           CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS tokens,
           CAST(SUM(CAST(list_aggregate(CAST(e.embedding AS DOUBLE[]), 'sum')
                AS DECIMAL(18,6))) AS DOUBLE) AS sum_vec_sums
    FROM documents d JOIN emb e ON e.vec_id = d.doc_id
    GROUP BY 1, 2
    """,
    description="multimodal doc⋈embedding join: text + vector columns "
    "side-by-side (L5)",
    tags=("L5",),
)
def l5_multimodal_join(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    vec_sum = F.aggregate(as_double_array("embedding"), F.lit(0.0), lambda a, x: a + x)
    return (
        d.join(e, e.vec_id == d.doc_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("tokens"),
            F.sum(vec_sum.cast("decimal(18,6)")).cast("double").alias("sum_vec_sums"),
        )
    )


@register(
    "l6_label_centroids",
    oracle=f"""
    WITH emb AS (SELECT * FROM embeddings WHERE {_EMB_WHERE})
    SELECT label, CAST(d + 1 AS BIGINT) AS dim,
           CAST(SUM(CAST(CAST(embedding[d + 1] AS DOUBLE)
                AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS centroid
    FROM emb CROSS JOIN (SELECT CAST(range AS INT) AS d FROM range(64)) dims
    GROUP BY label, d
    """,
    description="per-label centroid, dimension-wise (L6): posexplode + "
    "group. Scale: shuffle keyed (label, dim) → 640 cells; partial agg "
    "map-side keeps the explode local.",
    tags=("L6",),
)
def l6_label_centroids(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    return (
        e.select("label", F.posexplode(as_double_array("embedding")).alias("d", "val"))
        .groupBy("label", (F.col("d") + 1).cast("long").alias("dim"))
        .agg(
            (F.sum(F.col("val").cast("decimal(18,8)")).cast("double") / F.count(F.lit(1)))
            .alias("centroid")
        )
    )


@register(
    "l10_vec_quantize",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        WHERE {_EMB_WHERE}
    )
    SELECT vec_id,
           sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
                            (acc, x) -> acc + x)) AS l2_norm,
           array_to_string(list_transform(e, x -> CAST(FLOOR(
               x / sqrt(list_reduce(list_prepend(0.0,
                            list_transform(e, x2 -> x2 * x2)),
                        (acc, x2) -> acc + x2)) * 127 + 0.5) AS BIGINT)), ',')
               AS q8,
           CAST(len(e) AS BIGINT) AS n_dims
    FROM v
    """,
    description="vector L2-normalize + int8 quantization (the storage-"
    "shrink step before ANN indexing). Exactness: both engines fold the "
    "squares sequentially in double (F.aggregate ↔ list_reduce), so norms "
    "are bit-identical and the floor(x*127+0.5) grid never sits on a "
    "boundary. Scale: pure per-row narrow transform — no shuffle, no UDF, "
    "4x memory reduction for the index build stage.",
    tags=("L3", "F4"),
)
def l10_vec_quantize(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(
        embedding_is_valid("embedding"))
    v = as_double_array("embedding")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    # nullif: a zero vector must quantize to NULL, not kill the job with
    # ANSI DIVIDE_BY_ZERO. DuckDB's x/0.0 is NULL and its array_to_string
    # over an ALL-null list is NULL (probed live), while Spark's
    # array_join drops nulls and would emit '' — so the zero-norm case is
    # pinned to NULL q8 on both engines explicitly (hostile-corpus
    # differential find, r7).
    safe_norm = F.nullif(norm, F.lit(0.0))
    return e.select(
        "vec_id",
        norm.alias("l2_norm"),
        F.when(safe_norm.isNull(), F.lit(None).cast("string")).otherwise(
            F.array_join(
                F.transform(v, lambda x: F.floor(x / safe_norm * 127
                                                 + F.lit(0.5))
                            .cast("bigint")), ",")).alias("q8"),
        F.size(v).cast("bigint").alias("n_dims"),
    )


@register(
    "l11_pii_redaction",
    oracle="""
    WITH enriched AS (
      SELECT lang,
             text || ' contact user' || doc_id ||
             '@example.com from 10.' || (doc_id % 256) || '.0.' ||
             (doc_id % 100) AS raw
      FROM documents
    ),
    red AS (
      SELECT lang, raw,
             regexp_replace(
               regexp_replace(raw, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>',
               'g') AS redacted,
             len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9.]+')) AS n_email,
             len(regexp_extract_all(
               raw,
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ip
      FROM enriched
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_ip) AS BIGINT) AS n_ips,
           CAST(SUM(length(redacted)) AS BIGINT) AS total_len
    FROM red GROUP BY lang
    """,
    description="PII scrubbing (training-data hygiene): e-mail and IPv4 "
    "literals replaced by placeholder tokens via chained regexp_replace, "
    "with per-language redaction counts — PII is synthesized onto the "
    "corpus deterministically from doc_id so the oracle sees identical "
    "input. Scale: pure per-row regex in JVM codegen, no shuffle before "
    "the per-lang rollup; the same shape handles SSNs/phones/keys by "
    "extending the pattern list.",
    tags=("L4", "F1"),
)
def l11_pii_redaction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
    )
    email_pat = r"[a-z0-9]+@[a-z0-9.]+"
    ip_pat = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
    d = docs.select(
        "lang",
        raw.alias("raw"),
        F.size(F.regexp_extract_all(raw, F.lit(email_pat), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(raw, F.lit(ip_pat), 0)).alias("n_ip"),
    ).withColumn(
        "redacted",
        F.regexp_replace(
            F.regexp_replace("raw", email_pat, "<EMAIL>"), ip_pat, "<IP>"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_ip").cast("bigint").alias("n_ips"),
        F.sum(F.length("redacted")).cast("bigint").alias("total_len"),
    )


@register(
    "l12_train_val_split",
    oracle=f"""
    SELECT lang,
           CASE WHEN {okhash('doc_id')} % 100 < 90
                THEN 'train' ELSE 'val' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    description="reproducible train/val split (90/10): assignment by "
    "Knuth multiplicative hash of the stable doc id — deterministic, "
    "data-independent, and identical on any engine or cluster size (no "
    "rand(), no partition sensitivity). Scale: the split is a pure "
    "projection; downstream writers partitionBy('split') to materialize "
    "the two corpora in one pass.",
    tags=("L1", "P7"),
)
def l12_train_val_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(khash("doc_id") % 100 < 90, "train").otherwise("val")
    return docs.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "l13_sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tok,
             CAST(FLOOR(
               (SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tok)
               / 512.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM packed GROUP BY lang, bin
    """,
    description="sequence packing for pretraining batches: concatenate the "
    "per-language token stream in stable doc_id order and chunk it into "
    "512-token context windows — each doc lands in the window holding its "
    "start offset (running-sum window minus own length, floor-divided by "
    "the budget). Scale: one shuffle on lang for the ordered cumsum; at "
    "100 TB the partition key becomes (lang, shard) with per-shard "
    "offsets, same plan shape.",
    tags=("L4", "W3"),
)
def l13_sequence_packing(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    packed = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512.0)
        .cast("bigint"),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@register(
    "l14_corpus_curation",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, text, n_chars,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE n_chars >= 50 AND n_tok >= 8
        AND n_uniq * 1.0 / n_tok > 0.3
    ),
    dedup AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(lower(text))
                                   ORDER BY doc_id) AS rn
      FROM kept
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM dedup WHERE rn = 1
    GROUP BY lang
    """,
    description="end-to-end corpus curation (the L-pipeline composed): "
    "length + token-count + lexical-diversity quality gates, exact "
    "dedup on md5(lower(text)) keeping the lowest doc_id, per-language "
    "kept-corpus stats — one declarative plan, fully oracle-checked. "
    "Scale: the quality gates are per-row codegen (run before any "
    "shuffle), dedup shuffles on the 128-bit hash (uniform, skew-free), "
    "and the final rollup is map-side partial. This is the one-query "
    "skeleton a 100 TB curation run extends with the MinHash (l2*) and "
    "PII (l11) stages.",
    tags=("L1", "L4"),
    bench=True,
)
def l14_corpus_curation(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id", "lang", "text", "n_chars",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    kept = scored.filter(
        (F.col("n_chars") >= 50) & (F.col("n_tok") >= 8)
        & (F.col("n_uniq") * 1.0 / F.col("n_tok") > 0.3)
    )
    w = Window.partitionBy(F.md5(F.lower("text"))).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1)
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@register(
    "l15_bpe_pretokenize",
    oracle="""
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all(text,
                 ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+')) AS n_bpe,
             len(string_split(text, ' ')) AS n_ws
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(n_bpe) AS DOUBLE) / COUNT(*) AS avg_bpe_per_doc
    FROM t GROUP BY lang
    """,
    description="BPE-style pre-tokenization (the GPT-2 pre-tokenizer regex "
    "shape, simplified to this corpus's alphabet): leading-space word/"
    "number/punctuation chunks via regexp_extract_all, counted against the "
    "whitespace tokenization — the token-budget estimator a training "
    "pipeline runs before packing (l13). Identical RE2/Java regex "
    "semantics verified cross-engine. Scale: per-row regex in codegen, "
    "map-side partial rollup.",
    tags=("L4",),
)
def l15_bpe_pretokenize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pat = r" ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+"
    t = docs.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias("n_bpe"),
        F.size(F.split("text", " ")).alias("n_ws"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
        (F.sum("n_bpe").cast("double") / F.count(F.lit(1)))
        .alias("avg_bpe_per_doc"),
    )


@register(
    "l16_decontamination",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, source,
             CASE WHEN len(t) >= 5
                  THEN list_transform(range(1, len(t) - 3),
                       i -> array_to_string(t[i:i+4], ' '))
                  ELSE [] END AS gs
      FROM g
    ),
    eval_g AS (
      SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE source = 'src0'
    ),
    train_g AS (
      SELECT doc_id, lang, unnest(gs) AS gram FROM grams
      WHERE source <> 'src0'
    )
    SELECT t.doc_id, t.lang,
           CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_shared
    FROM train_g t JOIN eval_g e USING (gram)
    GROUP BY t.doc_id, t.lang
    """,
    description="train/test decontamination: flag training docs sharing "
    "any word 5-gram with the held-out benchmark set (source src0), with "
    "the count of distinct shared 5-grams per contaminated doc — the "
    "standard pre-training contamination sweep. Scale: the eval 5-gram "
    "set is tiny relative to the corpus and is broadcast, so the 100 TB "
    "training side is scanned once with a map-side hash probe; only "
    "contaminated (doc, gram) survivors reach the one aggregation "
    "shuffle.",
    tags=("L2", "L4"),
    bench=True,
)
def l16_decontamination(spark, sf_dir):
    from ..functions.text import shingles

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text")
    g = shingles(F.col("text"), 5)
    eval_grams = (docs.filter(F.col("source") == "src0")
                  .select(F.explode(g).alias("gram")).distinct())
    train = docs.filter(F.col("source") != "src0").select(
        "doc_id", "lang", F.explode(g).alias("gram"))
    return (train.join(F.broadcast(eval_grams), "gram")
            .groupBy("doc_id", "lang")
            .agg(F.countDistinct("gram").cast("bigint").alias("n_shared")))


@register(
    "l17_repetition_filter",
    oracle="""
    WITH t AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT lang, w,
             CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i+1]) ELSE [] END AS g2,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [] END AS g3
      FROM t
    ),
    m AS (
      SELECT lang,
             len(w)  AS n_w, len(list_distinct(w))  AS u_w,
             len(g2) AS n_2, len(list_distinct(g2)) AS u_2,
             len(g3) AS n_3, len(list_distinct(g3)) AS u_3
      FROM grams
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE
                (n_w - u_w) / greatest(n_w, 1) > 0.30
             OR (n_2 - u_2) / greatest(n_2, 1) > 0.20
             OR (n_3 - u_3) / greatest(n_3, 1) > 0.15) AS BIGINT)
             AS n_flagged,
           CAST(SUM(n_w - u_w) AS DOUBLE) / SUM(n_w) AS dup_word_ratio,
           CAST(SUM(n_2 - u_2) AS DOUBLE) / SUM(n_2) AS dup_2gram_ratio,
           CAST(SUM(n_3 - u_3) AS DOUBLE) / SUM(n_3) AS dup_3gram_ratio
    FROM m GROUP BY lang
    """,
    description="Gopher-style within-document repetition filter: per doc, "
    "duplicate-word / duplicate-2-gram / duplicate-3-gram fractions; docs "
    "over threshold on any signal are flagged, rolled up per language "
    "with exact integer sums (one double division at the end — "
    "order-independent). Scale: all signals are per-row array ops in "
    "codegen, one map-side-combined shuffle on lang.",
    tags=("L4",),
)
def l17_repetition_filter(spark, sf_dir):
    from ..functions.text import shingles, tokens

    docs = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    g2 = shingles(F.col("text"), 2)
    g3 = shingles(F.col("text"), 3)
    m = docs.select(
        "lang",
        F.size(w).alias("n_w"), F.size(F.array_distinct(w)).alias("u_w"),
        F.size(g2).alias("n_2"), F.size(F.array_distinct(g2)).alias("u_2"),
        F.size(g3).alias("n_3"), F.size(F.array_distinct(g3)).alias("u_3"),
    )
    flagged = (
        ((F.col("n_w") - F.col("u_w")) / F.greatest("n_w", F.lit(1)) > 0.30)
        | ((F.col("n_2") - F.col("u_2")) / F.greatest("n_2", F.lit(1)) > 0.20)
        | ((F.col("n_3") - F.col("u_3")) / F.greatest("n_3", F.lit(1)) > 0.15)
    )
    # nullif on the group denominators: a lang whose docs are all shorter
    # than 2 (resp. 3) tokens sums n_2/n_3 to 0 — an ANSI DIVIDE_BY_ZERO
    # abort unguarded; NULL matches the oracle (DuckDB x/0 is NULL). The
    # per-doc ratios above use greatest(n,1) instead because they feed a
    # boolean flag where NULL would silently unflag.
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(flagged).alias("n_flagged"),
        (F.sum(F.col("n_w") - F.col("u_w")).cast("double")
         / F.nullif(F.sum("n_w"), F.lit(0))).alias("dup_word_ratio"),
        (F.sum(F.col("n_2") - F.col("u_2")).cast("double")
         / F.nullif(F.sum("n_2"), F.lit(0))).alias("dup_2gram_ratio"),
        (F.sum(F.col("n_3") - F.col("u_3")).cast("double")
         / F.nullif(F.sum("n_3"), F.lit(0))).alias("dup_3gram_ratio"),
    )


@register(
    "l18_domain_reweight",
    oracle=f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    )
    SELECT d.source,
           CAST(MAX(c.n_total) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (
                WHERE {okhash('d.doc_id')} % c.n_total < 20) AS BIGINT)
             AS n_kept,
           CAST(MIN(d.doc_id) FILTER (
                WHERE {okhash('d.doc_id')} % c.n_total < 20) AS BIGINT)
             AS first_kept
    FROM documents d JOIN c USING (source)
    GROUP BY d.source
    """,
    description="deterministic domain rebalancing: cap every source at "
    "~20 docs by keeping rows whose Knuth-multiplicative doc_id hash mod "
    "the domain size lands under the cap — reproducible on any engine or "
    "cluster size (no rand()). Scale: per-domain counts are a tiny "
    "aggregate broadcast back onto the corpus scan, so rebalancing 100 TB "
    "is one pass + one 20-row broadcast; the final per-source rollup is "
    "map-side combined.",
    tags=("L1", "P7"),
)
def l18_domain_reweight(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"))
    j = docs.join(F.broadcast(counts), "source")
    kept = (khash("doc_id") % F.col("n_total")) < 20
    return j.groupBy("source").agg(
        F.max("n_total").cast("bigint").alias("n_total"),
        F.count_if(kept).alias("n_kept"),
        F.min(F.when(kept, F.col("doc_id"))).cast("bigint")
         .alias("first_kept"),
    )


@register(
    "l19_global_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             {okhash('doc_id')} % 4294967296 AS kh,
             {okhash('doc_id')} % 64 AS shard
      FROM documents
    ), p AS (
      SELECT shard, doc_id,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY kh, doc_id) AS pos
      FROM k
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
    FROM p GROUP BY shard
    """,
    description="deterministic global corpus shuffle (the pretraining "
    "data-ordering step): every doc gets a Knuth-multiplicative hash of "
    "its id, is routed to one of 64 shards by the hash, and is ordered "
    "within its shard by (hash, id) — a reproducible permutation with no "
    "rand() and NO total order. The order_checksum (sum of position*id) "
    "proves the within-shard ordering exactly. Scale: sharding replaces "
    "the global sort a naive ORDER BY random() would need — one hash "
    "shuffle on the shard key, then the window and the rollup reuse that "
    "same partitioning (single exchange at any corpus size).",
    tags=("L1", "O1", "W1"),
)
def l19_global_shuffle(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = khash("doc_id")
    keyed = docs.select(
        "doc_id",
        (h % F.lit(4294967296)).alias("kh"),
        (h % F.lit(64)).alias("shard"),
    )
    # explicit repartition on shard: the window and the final rollup then
    # share one exchange (same pattern as the sql13-20 agg+window plans)
    keyed = keyed.repartition("shard")
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("kh", "doc_id"))
    return (
        keyed.withColumn("pos", pos)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        )
        .select(F.col("shard").cast("bigint").alias("shard"),
                "n_docs", "first_doc", "order_checksum")
    )


@register(
    "x7_udtf_polymorphic",
    oracle="""
    WITH g AS (
      SELECT lang,
             unnest(CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> t[i])
                    ELSE [] END) AS w0
      FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
    )
    SELECT lang, COUNT(*) AS n_grams, COUNT(DISTINCT w0) AS n_first
    FROM g GROUP BY lang
    """,
    description="polymorphic Python UDTF (X4, Spark 4 analyze() API): the "
    "word-n-gram exploder's OUTPUT SCHEMA is computed at plan time from "
    "the constant n argument (n=2 here → columns w0,w1) — the "
    "table-function equivalent of a generic operator. Rows flow through "
    "the Arrow-batched UDTF channel; aggregated per language.",
    tags=("X4",),
)
def x7_udtf_polymorphic(spark, sf_dir):
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class WordNGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not n.isConstantExpression or not isinstance(n.value, int):
                raise ValueError("word_ngrams: n must be a constant int")
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i:i + n])

    spark.udtf.register("word_ngrams", udtf(WordNGrams))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT d.lang, COUNT(*) AS n_grams, COUNT(DISTINCT t.w0) AS n_first
        FROM documents d, LATERAL word_ngrams(d.text, 2) t
        GROUP BY d.lang
    """)


@register(
    "l21_substring_dup_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, unnest(
               CASE WHEN len(t) >= 9
                    THEN list_transform(range(1, len(t) - 7),
                         i -> md5(array_to_string(t[i:i+8], ' ')))
                    ELSE [] END) AS h
      FROM toks
    ),
    dup_spans AS (
      SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd
                     FROM spans GROUP BY h) WHERE nd > 1
    ),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_spans,
             COUNT(*) FILTER (WHERE d.h IS NOT NULL) AS n_dup
      FROM spans s LEFT JOIN dup_spans d USING (h)
      GROUP BY s.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_with_spans,
           CAST(SUM(n_dup) AS BIGINT) AS total_dup_spans,
           CAST(COUNT(*) FILTER (WHERE n_dup * 2 > n_spans) AS BIGINT)
             AS n_docs_majority_dup
    FROM per_doc
    """,
    description="exact duplicated-span detection (the Lee et al. "
    "'Deduplicating Training Data' substring-dedup shape, L2): every "
    "9-token span is hashed; spans appearing in MORE THAN ONE document "
    "mark cross-document boilerplate, and documents where duplicated "
    "spans are the majority are removal candidates. Corpus-level "
    "summary: docs with spans, total duplicated spans, majority-dup "
    "docs. Scale: one explode + one map-side-combined shuffle on the "
    "span hash (state = distinct spans, like a wordcount); the span→doc "
    "join stays on the same key. The hash is md5, so the DuckDB oracle "
    "recomputes it exactly.",
    tags=("L2", "L4"),
)
def l21_substring_dup_spans(spark, sf_dir):
    from ..functions.text import shingles

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # materialized: referenced twice (the dup aggregate and the join back)
    # — the recompute pitfall; countDistinct's (h, doc_id) partial-agg
    # exchange defeats ReuseExchange, so without the cut the 9-token
    # shingle + per-span md5 explode over the whole corpus ran twice
    # (the l29/l24 pattern)
    spans = d.select(
        "doc_id",
        F.explode(F.transform(shingles(F.col("text"), 9),
                              lambda s: F.md5(s))).alias("h"),
    ).localCheckpoint(eager=True)
    dup = (spans.groupBy("h")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") > 1)
           .select("h", F.lit(1).alias("__dup")))
    per_doc = (
        spans.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.count("__dup").alias("n_dup"))
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs_with_spans"),
        F.sum("n_dup").alias("total_dup_spans"),
        F.count_if(F.col("n_dup") * 2 > F.col("n_spans"))
        .alias("n_docs_majority_dup"),
    )


@register(
    "l22_stratified_sample_gate",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS total_n,
           CAST(CASE event_type
                WHEN 'view' THEN 0.5 WHEN 'click' THEN 0.3
                WHEN 'purchase' THEN 0.8 WHEN 'signup' THEN 0.2
                WHEN 'error' THEN 0.1
                ELSE 0.0 END AS DOUBLE) AS target_frac,
           TRUE AS in_tol
    FROM events GROUP BY event_type
    """,
    description="stratified sampling gate (the class-rebalance step of a "
    "training-data pipeline, on the sampleBy API): each event_type "
    "stratum is Bernoulli-sampled at its own target fraction, and the "
    "query validates the realized per-stratum rate against the target "
    "inside the query (|rate - target| <= 0.15, ~4 sigma at the smallest "
    "fixture stratum), returning exact totals + the in-tolerance flag "
    "the oracle asserts — the a4c gate pattern for sampling. sampleBy is "
    "seeded, so the outcome is deterministic per fixture. Scale: "
    "Bernoulli filter per partition, no shuffle before the rollup; the "
    "alternative deterministic-hash form is l20/l12. Strata outside the "
    "preset are sampled at 0 (sampleBy's missing-key semantic) and "
    "reported with target_frac 0.0 — visible in the output, not "
    "silently NULL.",
    tags=("L6", "P7"),
)
def l22_stratified_sample_gate(spark, sf_dir):
    fractions = {"view": 0.5, "click": 0.3, "purchase": 0.8,
                 "signup": 0.2, "error": 0.1}
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    sampled = (ev.sampleBy("event_type", fractions, seed=42)
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("sampled_n")))
    # coalesce 0.0: sampleBy's DOCUMENTED semantic for a stratum missing
    # from the fractions dict is "sample nothing" — target_frac must say
    # 0.0 for such strata (not NULL), so the gate reads true for a novel
    # event_type instead of NULL-poisoning in_tol (r7 hostile-corpus
    # find: a corpus with an event_type outside the preset)
    frac_expr = F.coalesce(
        F.create_map(
            *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(v))]
        )[F.col("event_type")].cast("double"),
        F.lit(0.0),
    )
    return (
        ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("total_n"))
        .join(sampled, "event_type", "left")
        .select(
            "event_type", "total_n",
            frac_expr.alias("target_frac"),
            (F.abs(F.coalesce("sampled_n", F.lit(0)) / F.col("total_n")
                   - frac_expr) <= 0.15).alias("in_tol"),
        )
    )
