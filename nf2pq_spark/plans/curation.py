"""Advanced training-data curation operators (round-2 continuation).

Capabilities a 100 TB pretraining pipeline needs beyond the core
L1–L6 surface in ``plans/llm.py`` (inventory: SURVEY.md §2.10b):

- RAG-style overlapping chunking (``l23``) — the corpus→context-window
  transform; pure higher-order column ops, one narrow stage, no shuffle.
- DSIR-style importance weighting (``l24``) — Data Selection via
  Importance Resampling (Xie et al., public method): hashed-bigram
  log-likelihood-ratio scores of every document against a target
  domain. The bucket table is tiny (256 rows) and broadcast; the corpus
  is touched by exactly two shuffles regardless of scale.
- SemDeDup-shaped semantic dedup (``l25``) — SRP-LSH bucketed
  embedding dedup with *deterministic md5-derived hyperplanes*, so the
  whole pipeline (bucketing included) is reproduced exactly by the SQL
  oracle — unlike the xxhash-based SRP variant (``l3b``) which is
  rows-only. Pairwise cosine runs only within buckets, never all-pairs.
- Nation-flow PageRank (``g1``) — iterative graph rank over an edge
  list aggregated from the fact table; the authority-weighting shape
  (domain trust scores for crawl curation). The expensive part — edge
  aggregation — is one fact-table shuffle + broadcast dim joins; the
  iteration then runs on the aggregated graph, which is orders of
  magnitude smaller (nations² here; domains² in a crawl).

Later additions in the same vein: market-basket co-occurrence mining
(``g2``, map-side pair generation with a quadratic-blowup cap),
incremental dedup of an ingest batch against the corpus fingerprint
catalog (``l26``), lexicon sentiment scoring (``l27``), and time-series
similarity search via exact-integer Pearson decomposition (``ts1``).

All md5-derived pseudo-randomness (SRP hyperplane signs, feature
buckets) is computed from public strings, so DuckDB reproduces it
bit-for-bit and every query here carries a full-hash oracle.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from ..functions.vectors import (as_double_array, cosine_from_norms,
                                 embedding_is_valid, l2_norm)
from ..sources.tables import load_table
from .registry import register

from ..functions.vectors import EMBEDDING_VALID_SQL

#: DuckDB spelling of the embedding validity contract (kept in one
#: place: functions.vectors) — the l25 oracle filters through it so
#: both engines exclude the same degenerate vectors.
_EMB_WHERE = EMBEDDING_VALID_SQL.format(col="embedding")

# --- l23: overlapping chunking ----------------------------------------------

_CHUNK_W, _CHUNK_S = 32, 24  # window / stride (tokens); 8-token overlap


@register(
    "l23_chunk_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    off AS (
      SELECT doc_id, t, UNNEST(range(0, len(t), {_CHUNK_S})) AS off FROM t
    )
    SELECT doc_id,
           CAST(off // {_CHUNK_S} AS BIGINT) AS chunk_idx,
           CAST(len(t[off + 1 : off + {_CHUNK_W}]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[off + 1 : off + {_CHUNK_W}], ' ')) AS chunk_fp
    FROM off
    """,
    description="RAG-style overlapping chunking: every document split into "
    f"{_CHUNK_W}-token windows at stride {_CHUNK_S} (8-token overlap), one "
    "output row per chunk with its token count and content fingerprint. "
    "Scale: sequence+explode+slice are all codegen'd column ops — a single "
    "narrow stage, no shuffle, no Python; 100 TB of documents chunk at "
    "scan speed.",
    tags=("L4", "F4"),
)
def l23_chunk_overlap(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    chunk = F.slice(F.col("t"), F.col("off") + 1, F.lit(_CHUNK_W))
    return (
        d.select("doc_id", toks.alias("t"), F.size(toks).alias("n"))
        .select(
            "doc_id", "t",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_S))
            ).alias("off"),
        )
        .select(
            "doc_id",
            (F.col("off") / _CHUNK_S).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
        )
    )


# --- l24: DSIR importance weighting -----------------------------------------

_DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


@register(
    "l24_dsir_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, lang, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, source, lang,
             UNNEST(CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])
                    ELSE [] END) AS g
      FROM toks
    ), ex AS (
      SELECT doc_id, source, lang, substr(md5(g), 1, 2) AS b FROM bg
    ), bs AS (
      SELECT b, COUNT(*) AS all_cnt,
             COUNT(*) FILTER (WHERE lang = 'en' AND
               source IN ('src0','src1','src2','src3')) AS tgt_cnt
      FROM ex GROUP BY b
    ), w AS (
      SELECT b, ln((tgt_cnt + 1.0) / (all_cnt + 1.0)) AS w FROM bs
    ), db AS (
      SELECT doc_id, source, b, COUNT(*) AS c FROM ex GROUP BY doc_id, source, b
    ), sc AS (
      SELECT doc_id, source, SUM(c * w) AS score
      FROM db JOIN w USING (b) GROUP BY doc_id, source
    )
    SELECT source, COUNT(*) AS n_docs, ROUND(AVG(score), 4) AS avg_importance
    FROM sc GROUP BY source
    """,
    description="DSIR-style importance weights (Xie et al., public method): "
    "hashed-bigram (256 md5 buckets) smoothed log-likelihood ratio of the "
    "target domain (en docs from src0-src3) vs the raw corpus, summed per "
    "document, averaged per source. Scale: ONE corpus pass — the "
    "materialized (doc,bucket) count table serves both the global bucket "
    "stats and the per-doc scores; the 256-row weight table broadcasts "
    "back onto it.",
    tags=("L4", "L7"),
)
def l24_dsir_weights(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    ex = d.select(
        "doc_id", "source", "lang",
        F.explode(shingles(F.col("text"), 2)).alias("g"),
    ).withColumn("b", F.substring(F.md5("g"), 1, 2))
    # ONE corpus pass: per-(doc, bucket) counts carry the target flag, so
    # both the global bucket stats and the per-doc scores derive from this
    # table. It is materialized (eager checkpoint) because it feeds two
    # downstream plans — without the cut each would re-scan and re-shingle
    # the corpus (audited: 2x documents FileScan, zero ReusedExchange).
    # The table is ~|docs|·|distinct buckets per doc| rows of ids+counts —
    # a small fraction of corpus bytes at any scale.
    doc_b = (
        ex.groupBy("doc_id", "source", "lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    is_tgt = (F.col("lang") == "en") & F.col("source").isin(*_DSIR_TARGET_SOURCES)
    weights = (
        doc_b.groupBy("b")
        .agg(
            F.sum("c").alias("all_cnt"),
            F.sum(F.when(is_tgt, F.col("c")).otherwise(0)).alias("tgt_cnt"),
        )
        .select(
            "b",
            F.log((F.col("tgt_cnt") + 1.0) / (F.col("all_cnt") + 1.0)).alias("w"),
        )
    )
    scores = (
        doc_b.join(F.broadcast(weights), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("c") * F.col("w")).alias("score"))
    )
    return scores.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("score"), 4).alias("avg_importance"),
    )


# --- l25: SemDeDup-shaped SRP semantic dedup --------------------------------

_SRP_PLANES, _SRP_DIMS, _SRP_THRESHOLD = 6, 64, 0.85
# adaptive plane count (r5 verdict): a FIXED plane count zero-recalls at
# scale — at 200k vectors the old 6-plane default put 100% of the corpus
# in over-cap buckets, so the guard kept cost bounded but pairing never
# ran and semantic dedup silently found nothing. The default now derives
# the plane count from a cheap corpus count (one distributed COUNT job,
# O(parquet metadata + row-group stats), negligible next to the
# signature pass): planes = clamp(ceil(log2(N / target_bucket)), 6, 32),
# the rule SCALE_STRESS measured (12 planes at 200k → 2% exclusion,
# exponent 0.66). target_bucket=32 keeps the EXPECTED bucket population
# ≤32 — 6x headroom under the 200-member pairing cap absorbs the skew
# tail. The cap of 32 planes supports N ≈ 32·2³² ≈ 1.4e11 vectors before
# expected buckets exceed the target again. At every fixture scale
# (500–2000 vectors) the formula floors at the historical 6, so graded
# results and bench plans are unchanged; the oracle mirrors the formula
# in SQL (count → LOG2 → same clamp), so the query stays hash-checkable
# at any corpus size.
_SRP_PLANES_CAP, _SRP_TARGET_BUCKET = 32, 32


def _srp_adaptive_planes(n_vectors: int) -> int:
    """planes = clamp(ceil(log2(N / target_bucket)), floor=6, cap=32).

    Exact-mirrorable in SQL: N/32 is an exact double for any realistic N,
    log2 of a power of two is exact in IEEE, and non-power-of-two log2
    values sit far (≥~1e-4 at N≤1e11) from integers, so ceil can never
    disagree across engines over a last-ulp libm difference."""
    frac = max(float(n_vectors), 1.0) / _SRP_TARGET_BUCKET
    return max(_SRP_PLANES, min(_SRP_PLANES_CAP, math.ceil(math.log2(frac))))
# hot-bucket guard (mirrors operators.dedup.lsh_candidate_pairs): a bucket
# with b members feeds a b² within-bucket join, so one degenerate bucket
# (e.g. a corpus of near-identical template embeddings) can go quadratic.
# Buckets above the cap are excluded from PAIRING (their members count as
# kept in the final accounting — semantic dedup of a giant identical
# cluster belongs to exact dedup upstream). Fixture buckets peak well
# under 200 (sf0.1: 2000 vecs / 64 buckets ≈ 31 avg), so oracles are
# unaffected; the guard is mirrored in the oracle SQL regardless so both
# engines agree even on a degenerate corpus.
_SRP_MAX_BUCKET = 200


def _srp_sign(p: int, i: int) -> float:
    """±1 hyperplane component from md5 of the public string ``"{p}_{i}"``.

    hex digit '0'-'7' → +1, '8'-'f' → -1 (balanced). DuckDB's md5 of the
    same string reproduces this exactly, which is what makes the whole
    bucketing oracle-checkable (unlike the xxhash SRP in ``l3b``).
    """
    return 1.0 if int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0], 16) < 8 else -1.0


@register(
    "l25_semdedup_srp",
    oracle=f"""
    WITH emb AS (
      SELECT * FROM embeddings WHERE {_EMB_WHERE}
    ), np AS (
      -- sizing counts the UNFILTERED table, mirroring the Spark side's
      -- metadata-cheap raw.count() (invalid rows only round planes up)
      SELECT GREATEST({_SRP_PLANES}, LEAST({_SRP_PLANES_CAP},
               CAST(CEIL(LOG2(GREATEST(CAST(COUNT(*) AS DOUBLE), 1.0)
                               / {_SRP_TARGET_BUCKET})) AS BIGINT))) AS n
      FROM embeddings
    ), planes AS (
      SELECT p, i,
             CASE WHEN substr(md5(p || '_' || i), 1, 1) BETWEEN '0' AND '7'
                  THEN 1.0 ELSE -1.0 END AS s
      FROM range({_SRP_PLANES_CAP}) tp(p), range({_SRP_DIMS}) ti(i), np
      WHERE p < np.n
    ), dots AS (
      SELECT e.vec_id, p.p,
             SUM(CAST(e.embedding[CAST(p.i + 1 AS INT)] AS DOUBLE) * p.s) AS d
      FROM emb e, planes p
      GROUP BY e.vec_id, p.p
    ), sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM dots GROUP BY vec_id
    ), sigc AS (
      SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
      FROM sig
    ), pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM (SELECT e.vec_id, e.embedding, s.bucket
            FROM emb e JOIN sigc s USING (vec_id)
            WHERE s.bn <= {_SRP_MAX_BUCKET}) a
      JOIN (SELECT e.vec_id, e.embedding, s.bucket
            FROM emb e JOIN sigc s USING (vec_id)
            WHERE s.bn <= {_SRP_MAX_BUCKET}) b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6)
            >= {_SRP_THRESHOLD}
    ), drops AS (SELECT DISTINCT ib AS vec_id FROM pairs)
    SELECT e.label, COUNT(*) AS n_total, COUNT(d.vec_id) AS n_dropped,
           COUNT(*) - COUNT(d.vec_id) AS n_kept
    FROM emb e LEFT JOIN drops d USING (vec_id)
    GROUP BY e.label
    """,
    description="SemDeDup-shaped semantic dedup (L2/L3): n-plane SRP-LSH "
    "signatures from deterministic md5-derived ±1 hyperplanes bucket the "
    "embeddings; exact cosine (rounded to 6dp on BOTH engines before the "
    "threshold — cross-engine float folds can differ in the last ulp) "
    "runs only WITHIN buckets; any vector with a smaller-id "
    "near-duplicate (cos ≥ 0.85) in its bucket is dropped. Fully "
    "oracle-checked including the bucketing — the hyperplanes are md5 of "
    "public strings, reproduced in SQL. Scale: bucket equi-join bounds "
    "candidate pairs (no all-pairs); hot buckets above max_bucket are "
    "excluded from pairing (guard mirrored in the oracle), and the plane "
    "count DEFAULTS ADAPTIVE — clamp(ceil(log2(N/32)), 6, 32) from a "
    "cheap corpus count, mirrored in the oracle's np CTE — so expected "
    "bucket loads stay under the cap as the corpus grows (the fixed "
    "6-plane default zero-recalled at 200k vectors: 100% of buckets over "
    "cap, pairing never ran); signatures are one codegen'd fold per "
    "plane, no shuffle before the bucket join.",
    tags=("L2", "L3"),
    bench=True,
)
def l25_semdedup_srp(spark, sf_dir, n_planes=None,
                     max_bucket=_SRP_MAX_BUCKET):
    raw = load_table(spark, sf_dir, "embeddings")
    e = raw.filter(embedding_is_valid("embedding")).select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    if n_planes is None:
        # adaptive default (see _srp_adaptive_planes): one scalar COUNT
        # job sizes the signature so expected bucket loads stay under the
        # pairing cap at any corpus size — the fixed old default silently
        # zero-recalled past ~13k vectors (every bucket over cap).
        # Deliberately counts the UNFILTERED table: on parquet that
        # resolves from row-group metadata (no data read), while counting
        # through the validity filter would scan the widest column per
        # invocation. Plane sizing is a heuristic — invalid rows inflate
        # N and can only round the plane count UP (smaller buckets),
        # never break correctness; the oracle's np CTE counts the same
        # unfiltered table so the signature width matches exactly.
        # COST CAVEAT (r6 verdict): still an EAGER driver-side job per
        # invocation; on a non-parquet/derived input it is a real pass —
        # callers who know their corpus size should pass n_planes=
        # (the escape hatch) rather than pay the extra scan.
        n_planes = _srp_adaptive_planes(raw.count())
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(_srp_sign(p, i)) for i in range(_SRP_DIMS)])
        dot_p = F.aggregate(
            F.zip_with(F.col("v"), signs, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        # when/when, no otherwise: a NULL dot (NULL vector, or a
        # dimension-mismatched one — zip_with null-pads) must yield a
        # NULL bucket, NOT silently collide every malformed vector into
        # the all-zeros bucket (the srp_bucket bug class). NULL buckets
        # never equi-join, so such vectors skip pairing and stay
        # "kept" in the accounting. (On degenerate vectors the oracle's
        # per-dim join computes a partial-sum sign instead — cross-engine
        # parity holds only for well-formed corpora, which the fixtures
        # and the n_dims gate guarantee.)
        bits.append(F.when(dot_p >= 0, "1").when(dot_p < 0, "0"))
    # materialize the signature table: it feeds the bucket counts, the
    # self-join (both sides) AND the final keep/drop accounting —
    # unmaterialized, the embeddings scan + signature folds ran three
    # times (audited). Signatures add one small column to the embedding
    # rows, so this is the "write the sketch once" pattern, not a corpus
    # copy.
    sig = e.withColumn("bucket", F.concat(*bits)).localCheckpoint(eager=True)
    # hot-bucket guard: members of buckets above the cap skip pairing
    # (kept in accounting) — without it one degenerate bucket is a b²
    # join; same policy as operators.dedup.lsh_candidate_pairs. The
    # population comes from a groupBy on the checkpointed signatures
    # (map-side partial -> tiny (bucket, count) shuffle) broadcast back
    # as a semi-join filter — NOT a count window over the corpus, which
    # would full-width-shuffle every vector on bucket and serialize the
    # exact hot bucket the guard defends against into one unsplittable
    # window task.
    # NOTE (r14, measured and deliberately NOT "fixed"): the guard
    # aggregate below is built once PER PAIRING SIDE — checkpoint-backed
    # (ExistingRDD) subtrees never canonicalize equal, so exchange reuse
    # cannot fire. Two candidate dedups were A/B'd at the 10x corpus
    # (plans/r14): an aliased identical-subplan self-join (old 2.57s →
    # 3.62s) and a lazy localCheckpoint of ok_buckets (→ 3.39s; both →
    # 4.78s). Both REGRESS: the duplicated aggregate runs inside the two
    # broadcast-build threads IN PARALLEL — redundant CPU but zero wall
    # — while either dedup serializes a materialization onto the
    # critical path. The duplicate is kept on purpose.
    ok_buckets = (
        sig.groupBy("bucket").agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= max_bucket).select("bucket")
    )
    paired = sig.join(F.broadcast(ok_buckets), "bucket")
    # per-ROW norms hoisted out of the per-PAIR cosine (r14, guide §1.2):
    # see cosine_from_norms — bit-identical values, one fold per pair
    # instead of three
    a = paired.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"),
                      "bucket", l2_norm(F.col("v")).alias("na"))
    b = paired.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"),
                      "bucket", l2_norm(F.col("v")).alias("nb"))
    drops = (
        a.join(b, "bucket")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(cosine_from_norms(F.col("va"), F.col("vb"),
                                          F.col("na"), F.col("nb")), 6)
                >= _SRP_THRESHOLD)
        .select(F.col("ib").alias("vec_id"))
        .distinct()
        .withColumn("d", F.lit(1))
    )
    return (
        sig.join(drops, "vec_id", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("d").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("d")).alias("n_kept"),
        )
    )


# --- g1: iterative PageRank over an aggregated flow graph -------------------

_PR_DAMP, _PR_ITERS = 0.85, 3
# teleport term as an EXPLICIT literal, not 1 - _PR_DAMP: in IEEE double
# (1 - 0.85) = 0.15000000000000002 while the oracle's literal 0.15 parses
# to 0.1499999999999999944 — a deterministic cross-engine mismatch in
# every pr value, masked only by the 6dp rounding (r3 review)
_PR_TELEPORT = 0.15


@register(
    "g1_nation_pagerank",
    oracle="""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), norm AS (
      SELECT src, dst,
             CAST(w AS DOUBLE) / SUM(w) OVER (PARTITION BY src) AS p
      FROM e
    ), nd AS (SELECT n_nationkey AS n FROM nation),
    r0 AS (SELECT n, 1.0 / (SELECT COUNT(*) FROM nation) AS pr FROM nd),
    r1 AS (
      SELECT nd.n, 0.15 / (SELECT COUNT(*) FROM nation)
             + 0.85 * COALESCE(SUM(r.pr * m.p), 0.0) AS pr
      FROM nd LEFT JOIN norm m ON m.dst = nd.n
              LEFT JOIN r0 r ON m.src = r.n
      GROUP BY nd.n
    ), r2 AS (
      SELECT nd.n, 0.15 / (SELECT COUNT(*) FROM nation)
             + 0.85 * COALESCE(SUM(r.pr * m.p), 0.0) AS pr
      FROM nd LEFT JOIN norm m ON m.dst = nd.n
              LEFT JOIN r1 r ON m.src = r.n
      GROUP BY nd.n
    ), r3 AS (
      SELECT nd.n, 0.15 / (SELECT COUNT(*) FROM nation)
             + 0.85 * COALESCE(SUM(r.pr * m.p), 0.0) AS pr
      FROM nd LEFT JOIN norm m ON m.dst = nd.n
              LEFT JOIN r2 r ON m.src = r.n
      GROUP BY nd.n
    )
    SELECT nn.n_name AS nation, ROUND(r3.pr, 6) AS pr
    FROM r3 JOIN nation nn ON nn.n_nationkey = r3.n
    """,
    description="weighted PageRank (3 iterations, d=0.85, leaky-dangling "
    "formulation) over the customer-nation → supplier-nation trade graph "
    "aggregated from lineitem⋈orders — the authority-weighting shape used "
    "for domain trust scores in crawl curation. Scale: the only large "
    "shuffle is the fact-table edge aggregation (customer/supplier dims "
    "broadcast); each PageRank iteration then joins the aggregated "
    "edge list (|domains|², tiny relative to the corpus), so iteration "
    "cost is independent of fact-table size.",
    tags=("G1",),
    bench=True,
)
def g1_nation_pagerank(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # materialize the aggregated edge list ONCE: it is referenced by every
    # iteration, and without the cut each of the 3 contrib joins re-scans
    # the fact tables from scratch (audited: 3x lineitem FileScan, zero
    # ReusedExchange). The checkpointed frame is |nations|² rows — trivial
    # — while the subtree it replaces is the whole fact aggregation.
    norm = edges.select(
        "src", "dst",
        (F.col("w").cast("double") / F.sum("w").over(Window.partitionBy("src")))
        .alias("p"),
    ).localCheckpoint(eager=True)
    # N via a broadcast 1-row aggregate (no literal row-count assumption)
    n_df = nat.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    nodes = nat.select(F.col("n_nationkey").alias("n")).join(F.broadcast(n_df))
    r = nodes.select("n", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("pr"))
    # the scalable PageRank shape: the EDGE LIST stays distributed, the
    # RANK VECTOR (|nodes| rows) broadcasts — without the hints Catalyst
    # planned every iteration join as a SortMergeJoin, shuffling the
    # 625-row relations three times per iteration (audited r3: 5 SMJ /
    # 12 exchanges → 0 SMJ with the hints)
    for _ in range(_PR_ITERS):
        contrib = (
            norm.join(F.broadcast(r.select(F.col("n").alias("src"), "pr")),
                      "src")
            .groupBy(F.col("dst").alias("n"))
            .agg(F.sum(F.col("pr") * F.col("p")).alias("inflow"))
        )
        r = nodes.join(F.broadcast(contrib), "n", "left").select(
            "n", "n_nodes",
            (
                F.lit(_PR_TELEPORT) / F.col("n_nodes")
                + F.lit(_PR_DAMP) * F.coalesce("inflow", F.lit(0.0))
            ).alias("pr"),
        )
    return r.join(F.broadcast(nat), r.n == nat.n_nationkey).select(
        F.col("n_name").alias("nation"), F.round("pr", 6).alias("pr")
    )


# --- g2: co-occurrence mining -----------------------------------------------

_COOC_CAP = 10  # max distinct parts per order before pair blowup guard


def _baskets(li):
    """Capped per-order distinct-part baskets: one shuffle groups each
    order's distinct parts into a sorted array; the _COOC_CAP size filter
    bounds the quadratic pair term (mirrored in the g2/g3 oracles)."""
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= _COOC_CAP)
    )


def _pairs_from_baskets(baskets, a: str = "pa", b: str = "pb"):
    """Ordered co-purchase pairs, MAP-SIDE from basket arrays: element i
    pairs with every later element (sorted + distinct, so a < b by
    construction). No shuffle — a pure generator over the basket rows."""
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda y: F.struct(x.alias(a), y.alias(b)),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("pr"))
        .select(F.col(f"pr.{a}").alias(a), F.col(f"pr.{b}").alias(b))
    )


def _basket_pairs(li, a: str = "pa", b: str = "pb"):
    """Ordered co-purchase pairs from lineitem (baskets + map-side
    expansion). Shared by g2 (pair counts) and g3 (triangle edges) so the
    cap policy and the i+2 slice arithmetic — mirrored in BOTH oracles —
    cannot drift between them."""
    return _pairs_from_baskets(_baskets(li), a, b)


@register(
    "g2_copurchase_pairs",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    sized AS (
      SELECT l_orderkey FROM p GROUP BY l_orderkey
      HAVING COUNT(*) <= {_COOC_CAP}
    ), pr AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM p a JOIN p b USING (l_orderkey) JOIN sized USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
    )
    SELECT pa, pb, COUNT(*) AS n FROM pr GROUP BY pa, pb
    ORDER BY n DESC, pa, pb LIMIT 20
    """,
    description="co-occurrence (market-basket) pair mining: top part pairs "
    "bought in the same order. Spark side avoids the quadratic self-join: "
    "one shuffle groups each order's distinct parts into a sorted array, "
    "pairs are generated MAP-SIDE from the array (indexed transform over "
    "tail slices), and a per-order size cap bounds the quadratic term — "
    f"an order with more than {_COOC_CAP} distinct parts is excluded "
    "(mirrored in the oracle), because one pathological 10k-line order "
    "would otherwise emit 50M pairs into the count shuffle. Deterministic "
    "top-20 via (count desc, pa, pb) total order.",
    tags=("G2", "A8"),
)
def g2_copurchase_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        _basket_pairs(li, "pa", "pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pa"), F.asc("pb"))
        .limit(20)
    )


# --- l26: incremental dedup of a delta batch against the corpus catalog -----


@register(
    "l26_incremental_dedup",
    oracle="""
    WITH batch AS (
      SELECT doc_id, source, md5(lower(text)) AS fp
      FROM documents WHERE doc_id % 5 = 0
    ), catalog AS (
      SELECT DISTINCT md5(lower(text)) AS fp
      FROM documents WHERE doc_id % 5 <> 0
    ), flagged AS (
      SELECT b.doc_id, b.source,
             (c.fp IS NOT NULL) AS in_cat,
             ROW_NUMBER() OVER (PARTITION BY b.fp ORDER BY b.doc_id) AS rn
      FROM batch b LEFT JOIN catalog c ON b.fp = c.fp
    )
    SELECT source,
           COUNT(*) AS n_batch,
           CAST(COUNT(*) FILTER (WHERE in_cat) AS BIGINT) AS n_dup_catalog,
           CAST(COUNT(*) FILTER (WHERE NOT in_cat AND rn > 1) AS BIGINT)
               AS n_dup_batch,
           CAST(COUNT(*) FILTER (WHERE NOT in_cat AND rn = 1) AS BIGINT)
               AS n_kept
    FROM flagged GROUP BY source
    """,
    description="incremental dedup (L1 delta shape): an incoming batch "
    "(every 5th doc) deduped against the existing corpus's fingerprint "
    "catalog AND within itself — the op a production pipeline runs per "
    "ingest, instead of re-deduping the whole corpus. Classification: "
    "dup-vs-catalog (left join hit), dup-within-batch (not first for its "
    "fingerprint), kept. Scale: one fp-equi join of the small batch "
    "against the catalog (runtime bloom filter prunes catalog-side "
    "partitions; the batch side is the natural broadcast candidate) + one "
    "window over batch-only rows.",
    tags=("L1", "ETL"),
)
def l26_incremental_dedup(spark, sf_dir):
    from ..functions.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    catalog = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("in_cat", F.lit(True))
    )
    flagged = batch.join(catalog, "fp", "left").select(
        "doc_id", "source",
        F.coalesce("in_cat", F.lit(False)).alias("in_cat"),
        F.row_number()
        .over(Window.partitionBy("fp").orderBy("doc_id")).alias("rn"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.when(F.col("in_cat"), 1).otherwise(0))
        .cast("bigint").alias("n_dup_catalog"),
        F.sum(F.when(~F.col("in_cat") & (F.col("rn") > 1), 1).otherwise(0))
        .cast("bigint").alias("n_dup_batch"),
        F.sum(F.when(~F.col("in_cat") & (F.col("rn") == 1), 1).otherwise(0))
        .cast("bigint").alias("n_kept"),
    )


# --- l27: lexicon sentiment scoring -----------------------------------------

_POS_WORDS, _NEG_WORDS = ("fast", "small"), ("slow", "big")


@register(
    "l27_lexicon_sentiment",
    oracle="""
    WITH s AS (
      SELECT lang,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('fast', 'small'))) AS p,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('slow', 'big'))) AS q,
             len(string_split(text, ' ')) AS nt
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(p) AS BIGINT) AS pos_hits,
           CAST(SUM(q) AS BIGINT) AS neg_hits,
           ROUND(AVG((p - q) / CAST(nt AS DOUBLE)), 6) AS avg_polarity
    FROM s GROUP BY lang
    """,
    description="lexicon-based sentiment scoring (the classic distributed "
    "Spark text-analytics shape, cf. EDBT'16 Twitter sentiment): per-doc "
    "polarity = (positive-hits − negative-hits)/tokens from a broadcast-"
    "free inline lexicon, aggregated per language. Pure higher-order "
    "column ops — one shuffle, no Python. The fixture vocabulary "
    "('fast/small' vs 'slow/big') stands in for a real sentiment lexicon; "
    "swap the word lists for a production one.",
    tags=("L4",),
)
def l27_lexicon_sentiment(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    p = F.size(F.filter(toks, lambda w: w.isin(*_POS_WORDS)))
    q = F.size(F.filter(toks, lambda w: w.isin(*_NEG_WORDS)))
    s = d.select(
        "lang", p.alias("p"), q.alias("q"), F.size(toks).alias("nt")
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("p").cast("bigint").alias("pos_hits"),
        F.sum("q").cast("bigint").alias("neg_hits"),
        F.round(F.avg((F.col("p") - F.col("q")) / F.col("nt").cast("double")), 6)
        .alias("avg_polarity"),
    )


# --- ts1: time-series similarity search over user activity ------------------


@register(
    "ts1_series_similarity",
    oracle="""
    WITH dc AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), nd AS (SELECT COUNT(DISTINCT d) AS n FROM dc),
    ref AS (SELECT d, c AS rc FROM dc WHERE user_id = 1),
    ry AS (SELECT SUM(rc) AS sy, SUM(rc * rc) AS syy FROM ref),
    ux AS (
      SELECT u.user_id, SUM(u.c) AS sx, SUM(u.c * u.c) AS sxx,
             SUM(u.c * COALESCE(r.rc, 0)) AS sxy
      FROM dc u LEFT JOIN ref r USING (d)
      WHERE u.user_id <> 1 GROUP BY u.user_id
    )
    SELECT user_id,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS corr_ref
    FROM ux, nd, ry
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY corr_ref DESC, user_id LIMIT 10
    """,
    description="time-series similarity search (EDBT'19 shape): top-10 "
    "users whose daily activity series correlates most with a reference "
    "user's, missing days as zeros. Pearson correlation decomposes into "
    "exact integer sums (sum, sum-of-squares, cross-product vs the "
    "broadcast reference series), so the float appears only in the final "
    "expression — engine-exact from identical longs. Scale: one (user,day) "
    "count shuffle, reference series broadcast, per-user sums, TakeOrdered "
    "top-10; zero-variance series excluded before the division.",
    tags=("TS", "W5"),
)
def ts1_series_similarity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    dc = ev.groupBy("user_id", "d").agg(F.count(F.lit(1)).alias("c"))
    nd = dc.agg(F.countDistinct("d").alias("n"))
    ref = dc.filter(F.col("user_id") == 1).select("d", F.col("c").alias("rc"))
    ry = ref.agg(F.sum("rc").alias("sy"),
                 F.sum(F.col("rc") * F.col("rc")).alias("syy"))
    ux = (
        dc.filter(F.col("user_id") != 1)
        .join(F.broadcast(ref), "d", "left")
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("sx"),
            F.sum(F.col("c") * F.col("c")).alias("sxx"),
            F.sum(F.col("c") * F.coalesce("rc", F.lit(0))).alias("sxy"),
        )
    )
    j = ux.join(F.broadcast(nd)).join(F.broadcast(ry))
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double")))
    )
    return (
        j.filter((var_x > 0) & (var_y > 0))
        .select("user_id", F.round(corr, 6).alias("corr_ref"))
        .orderBy(F.desc("corr_ref"), F.asc("user_id"))
        .limit(10)
    )


# --- mm3: audio-style frame energy over vector windows ----------------------

_FRAME_W, _FRAME_HOP = 16, 8


@register(
    "mm3_frame_energy",
    oracle=f"""
    WITH off AS (
      SELECT vec_id, label, embedding,
             UNNEST(range(0, {_SRP_DIMS}, {_FRAME_HOP})) AS o
      FROM embeddings
    ), fr AS (
      SELECT vec_id, label, CAST(o // {_FRAME_HOP} AS BIGINT) AS frame_idx,
             list_transform(embedding[o + 1 : o + {_FRAME_W}],
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sq
      FROM off
    )
    SELECT vec_id, frame_idx,
           CAST(len(sq) AS BIGINT) AS n_samples,
           ROUND(list_reduce(sq, (a, b) -> a + b), 6) AS energy
    FROM fr
    """,
    description="audio-style frame analysis over the vector column (L5 "
    f"shape): {_FRAME_W}-sample frames at hop {_FRAME_HOP} with per-frame "
    "energy (sum of squares, left-to-right fold — bit-identical to the "
    "oracle's list_reduce since 0+x1² = x1²). The framing math every "
    "waveform feature extractor needs, as pure codegen'd column ops: "
    "sequence+explode+slice+fold, no shuffle, no Python — the real audio "
    "decode stays behind the multimodal mapInPandas plumbing (mm1/mm2).",
    tags=("L5", "F4"),
)
def mm3_frame_energy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    frame = F.slice(F.col("v"), F.col("o") + 1, F.lit(_FRAME_W))
    energy = F.aggregate(frame, F.lit(0.0), lambda acc, x: acc + x * x)
    return (
        e.select(
            "vec_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(_SRP_DIMS - 1), F.lit(_FRAME_HOP))
            ).alias("o"),
            "v",
        )
        .select(
            "vec_id",
            (F.col("o") / _FRAME_HOP).cast("long").alias("frame_idx"),
            F.size(frame).cast("long").alias("n_samples"),
            F.round(energy, 6).alias("energy"),
        )
    )


# --- l28: source distribution drift (KL divergence) -------------------------


@register(
    "l28_source_drift",
    oracle="""
    WITH tok AS (
      SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents
    ), b AS (
      SELECT source, substr(md5(w), 1, 2) AS bk FROM tok
    ), sb AS (
      SELECT source, bk, COUNT(*) AS c FROM b GROUP BY 1, 2
    ), st AS (SELECT source, SUM(c) AS n FROM sb GROUP BY 1),
    gb AS (SELECT bk, SUM(c) AS g FROM sb GROUP BY 1),
    gt AS (SELECT SUM(c) AS m FROM sb)
    SELECT sb.source, CAST(MAX(st.n) AS BIGINT) AS n_tokens,
           ROUND(SUM(((sb.c + 1.0) / (st.n + 256.0))
                     * ln(((sb.c + 1.0) / (st.n + 256.0))
                          / ((gb.g + 1.0) / (gt.m + 256.0)))), 5) AS kl_drift
    FROM sb JOIN st USING (source) JOIN gb USING (bk), gt
    GROUP BY sb.source
    """,
    description="corpus drift monitor (the distribution-shift check a "
    "training pipeline runs per source/ingest): add-1-smoothed KL "
    "divergence of each source's hashed-token distribution (256 md5 "
    "buckets) from the global corpus distribution. Buckets a source never "
    "emits contribute nothing to the sum (their smoothed p is a constant "
    "factored out by the shared bucket join on observed rows only — "
    "mirrored exactly in the oracle). Scale: one corpus tokenize pass to "
    "(source,bucket) counts; everything after runs on |sources| x 256 "
    "rows; the global bucket table broadcasts.",
    tags=("L4", "DQ"),
    bench=True,
)
def l28_source_drift(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    # materialized: sb feeds FOUR consumers (itself + the st/gb/gt
    # rollups), and the r13 plan audit showed four full documents
    # scans + tokenize passes — ReuseExchange does not fire across the
    # differently-keyed re-aggregations. The checkpointed frame is
    # |sources| x 256 rows; the subtree it replaces is the whole corpus
    # tokenize, so at 100 TB this is 1 corpus pass instead of 4.
    sb = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .select("source", F.substring(F.md5("w"), 1, 2).alias("bk"))
        .groupBy("source", "bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    st = sb.groupBy("source").agg(F.sum("c").alias("n"))
    gb = sb.groupBy("bk").agg(F.sum("c").alias("g"))
    gt = sb.agg(F.sum("c").alias("m"))
    p = (F.col("c") + 1.0) / (F.col("n") + 256.0)
    q = (F.col("g") + 1.0) / (F.col("m") + 256.0)
    return (
        sb.join(F.broadcast(st), "source")
        .join(F.broadcast(gb), "bk")
        .join(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 5).alias("kl_drift"),
        )
    )


# --- t12: interval union length (sweep-line via prefix-max) -----------------

#: synthesized interval fixture shared by t12 (union) and j17 (overlap):
#: each event opens an interval of event_id % _IVL_MAX_LEN seconds. The
#: modulus also fixes j17's blocking bucket width — _OVL_BUCKET must be
#: >= the max interval length for its <=2-buckets-per-interval bound, so
#: the two constants are tied here, and both oracles interpolate the
#: same value.
_IVL_MAX_LEN = 600


def _synth_intervals(ev, *cols):
    return ev.select(
        *cols,
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.col("event_id") % _IVL_MAX_LEN)
        .alias("e"),
    )


@register(
    "t12_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + event_id % {_IVL_MAX_LEN} AS e,
             event_id
      FROM events
    ), sweep AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pme
      FROM iv
    )
    SELECT user_id,
           CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(pme, s)), 0))
                AS BIGINT) AS covered_s,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM sweep GROUP BY user_id
    """,
    description="interval-union length per user (the classic "
    "hard-in-plain-SQL coverage op: total ONLINE seconds with overlapping "
    "activity intervals merged, not summed). Sweep-line as a prefix-max "
    "window: each interval contributes max(0, end - max(start, "
    "prev_max_end)) under a deterministic total order — exact integer "
    "epoch-second arithmetic on both engines. Interval = [ts, ts + "
    "event_id%600s] synthesized from the point events. Scale: ONE "
    "shuffle on user_id; the window is per-user ordered, no global sort.",
    tags=("T3", "W3"),
    bench=True,
)
def t12_interval_union(spark, sf_dir):
    ev = _synth_intervals(load_table(spark, sf_dir, "events"),
                          "user_id", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sweep = ev.withColumn("pme", F.max("e").over(w))
    contrib = F.greatest(
        F.col("e") - F.greatest(F.col("s"), F.coalesce("pme", F.col("s"))),
        F.lit(0),
    )
    return sweep.groupBy("user_id").agg(
        F.sum(contrib).cast("bigint").alias("covered_s"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


# --- l29: n-gram novelty scoring --------------------------------------------


@register(
    "l29_ngram_novelty",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             UNNEST(list_distinct(CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END)) AS g
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents)
    ), df AS (
      SELECT g, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY g
    ), per_doc AS (
      SELECT sh.doc_id, sh.source,
             CAST(COUNT(*) FILTER (WHERE df.nd = 1) AS DOUBLE) / COUNT(*)
                 AS novelty
      FROM sh JOIN df USING (g) GROUP BY sh.doc_id, sh.source
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(novelty), 5) AS avg_novelty,
           ROUND(MIN(novelty), 5) AS min_novelty
    FROM per_doc GROUP BY source
    """,
    description="n-gram novelty scoring (the uniqueness/memorization-risk "
    "metric a curation pipeline tracks): per doc, the fraction of its "
    "distinct 3-gram shingles that appear in NO other document, averaged "
    "per source. Per-doc ratios are exact int/int divisions; only the "
    "per-source average is rounded. Scale: one explode pass to distinct "
    "(doc, shingle) rows, a shingle-document-frequency aggregate joined "
    "back on the shingle key — the same two-shuffle shape as TF-IDF, with "
    "the DF table reused via the materialized intermediate pattern.",
    tags=("L4", "L2"),
)
def l29_ngram_novelty(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sh = (
        d.select(
            "doc_id", "source",
            F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("g"),
        )
        .localCheckpoint(eager=True)  # feeds both the DF agg and the join
    )
    df_tbl = sh.groupBy("g").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        sh.join(df_tbl, "g")
        .groupBy("doc_id", "source")
        .agg(
            (F.count_if(F.col("nd") == 1).cast("double")
             / F.count(F.lit(1))).alias("novelty")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("novelty"), 5).alias("avg_novelty"),
        F.round(F.min("novelty"), 5).alias("min_novelty"),
    )


# --- a20: robust spread (median absolute deviation) -------------------------


@register(
    "a20_mad_robust_spread",
    oracle="""
    -- isnan CASE mirrors the Spark side's nan_to_null (see a5): NaN
    -- prices are excluded from BOTH medians on BOTH engines
    WITH li AS (
      SELECT l_returnflag,
             CASE WHEN NOT isnan(l_extendedprice)
                  THEN l_extendedprice END AS price
      FROM lineitem
    ), med AS (
      SELECT l_returnflag, median(price) AS med
      FROM li GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(ROUND(MAX(m.med), 4) AS DOUBLE) AS median_price,
           CAST(ROUND(median(ABS(l.price - m.med)), 4) AS DOUBLE)
               AS mad_price
    FROM li l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    description="median absolute deviation per group (the robust spread "
    "statistic outlier-heavy pipelines use instead of stddev): two-pass "
    "exact interpolated medians — group median broadcast back onto the "
    "fact rows, then the median of absolute deviations. Same "
    "exact-percentile parity the a5 family pinned. Scale: two shuffles "
    "on the 3-value group key; the tiny median table broadcasts.",
    tags=("A5", "A6"),
)
def a20_mad_robust_spread(spark, sf_dir):
    from .helpers import nan_to_null

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", nan_to_null("l_extendedprice").alias("price"))
    # nan_to_null: see a5 — NaN prices are excluded from BOTH medians
    # (Spark would rank them greatest, DuckDB excludes; r7 tier-2 find)
    med = li.groupBy("l_returnflag").agg(
        F.percentile("price", 0.5).alias("med"))
    dev = li.join(F.broadcast(med), "l_returnflag")
    return dev.groupBy("l_returnflag").agg(
        F.round(F.max("med"), 4).alias("median_price"),
        F.round(
            F.percentile(F.abs(F.col("price") - F.col("med")), 0.5),
            4).alias("mad_price"),
    )


# --- j17: interval-overlap join ---------------------------------------------

_OVL_BUCKET = _IVL_MAX_LEN  # >= max interval length: spans <= 2 buckets


@register(
    "j17_interval_overlap_join",
    oracle=f"""
    WITH iv AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + event_id % {_IVL_MAX_LEN} AS e
      FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM iv a JOIN iv b
      ON a.event_id < b.event_id AND a.user_id <> b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1, 2
    """,
    description="interval-OVERLAP join (distinct from j7's "
    "point-in-interval): concurrent-activity pairs across users, i.e. "
    "interval pairs with a.s <= b.e AND b.s <= a.e. Spark side avoids the "
    "quadratic theta join via time-bucket blocking: each interval lands "
    "in its ceil(len/600s) <= 2 covering buckets, candidates equi-join on "
    "the bucket, the exact overlap predicate filters, and each pair is "
    "emitted only from its FIRST common bucket (the one holding "
    "max(a_s, b_s)) — shuffle-free dedup, O(pairs-per-bucket) work per "
    "bucket instead of all-pairs, the same blocking idea as the LSH and "
    "range join operators. The oracle is the direct theta join (DuckDB "
    "IEJoin).",
    tags=("J7", "T3"),
    bench=True,
)
def j17_interval_overlap_join(spark, sf_dir):
    ev = _synth_intervals(load_table(spark, sf_dir, "events"),
                          "event_id", "user_id", "event_type")
    iv = ev.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / _OVL_BUCKET),
                F.floor(F.col("e") / _OVL_BUCKET),
            )
        ),
    )
    a = iv.select(*[F.col(c).alias(f"a_{c}") for c in
                    ("event_id", "user_id", "event_type", "s", "e")], "bkt")
    b = iv.select(*[F.col(c).alias(f"b_{c}") for c in
                    ("event_id", "user_id", "event_type", "s", "e")], "bkt")
    pairs = (
        a.join(b, "bkt")
        .filter(
            (F.col("a_event_id") < F.col("b_event_id"))
            & (F.col("a_user_id") != F.col("b_user_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            # count each pair ONCE without any dedup shuffle: an
            # overlapping pair shares every bucket in the overlap region,
            # so report it only from the first common bucket — the one
            # containing max(a_s, b_s), which both intervals provably
            # cover. Replaces a .distinct() over (ids, types) that added
            # a full-width exchange (r2 verdict item: widest bench query).
            & (F.col("bkt")
               == F.floor(F.greatest("a_s", "b_s") / _OVL_BUCKET))
        )
        .select("a_event_type", "b_event_type")
    )
    return pairs.groupBy(
        F.col("a_event_type").alias("type_a"),
        F.col("b_event_type").alias("type_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# --- j18: nearest-in-time join (as-of family completion) --------------------


@register(
    "j18_nearest_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS cts FROM events
      WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, c.click_id,
           CAST(ABS(epoch_us(p.ts) - epoch_us(c.cts)) AS BIGINT) AS gap_us
    FROM p JOIN c USING (user_id)
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY p.event_id
      ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.cts)), c.cts, c.click_id
    ) = 1
    """,
    description="NEAREST-in-time join (completes the as-of family: j8 "
    "backward, j8b forward, this picks whichever is closer, ties to the "
    "earlier/backward side, equal-timestamp clicks to the smallest "
    "click_id via the asof tie_break — deterministic even if a user ever "
    "logs two clicks in the same microsecond): each purchase matched to "
    "its nearest click per user in either direction. Composed from the "
    "two one-shuffle as-of passes + a gap comparison, so it inherits "
    "their scaling; the "
    "oracle is the per-event argmin over all candidates (QUALIFY "
    "row_number), feasible only because DuckDB sees small fixtures — at "
    "scale the composed form is the only viable plan.",
    tags=("J8",),
)
def j18_nearest_join(spark, sf_dir):
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"))
    back = asof_join(p, c, on="user_id", left_ts="ts", right_ts="cts",
                     payload=["click_id", "cts"], how="left",
                     direction="backward", tie_break="click_id").select(
        "event_id", "user_id", "ts",
        F.col("click_id").alias("b_id"), F.col("cts").alias("b_ts"))
    fwd = asof_join(p, c, on="user_id", left_ts="ts", right_ts="cts",
                    payload=["click_id", "cts"], how="left",
                    direction="forward", tie_break="click_id").select(
        F.col("event_id").alias("f_eid"),
        F.col("click_id").alias("f_id"), F.col("cts").alias("f_ts"))
    j = back.join(fwd, back.event_id == fwd.f_eid)
    us = lambda col: F.unix_micros(F.col(col))  # noqa: E731
    b_gap = F.abs(us("ts") - us("b_ts"))
    f_gap = F.abs(us("ts") - us("f_ts"))
    take_back = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (b_gap <= f_gap))
    return j.select(
        "event_id", "user_id",
        F.when(take_back, F.col("b_id")).otherwise(F.col("f_id"))
        .alias("click_id"),
        F.when(take_back, b_gap).otherwise(f_gap).cast("bigint")
        .alias("gap_us"),
    ).filter(F.col("click_id").isNotNull())


# --- a21: frequency-weighted percentile -------------------------------------


@register(
    "a21_weighted_median",
    oracle="""
    WITH expanded AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem, UNNEST(range(CAST(l_quantity AS BIGINT))) AS r
    )
    SELECT l_returnflag,
           CAST(ROUND(median(l_extendedprice), 4) AS DOUBLE) AS w_median,
           CAST(SUM(1) AS BIGINT) AS total_weight
    FROM expanded GROUP BY l_returnflag
    """,
    description="frequency-weighted percentile (A5 variant): the median "
    "price where each row counts l_quantity times — Spark's native "
    "percentile(col, p, frequency) three-argument form, which computes "
    "the weighted quantile WITHOUT materializing the expansion. The "
    "oracle proves the semantics by actually expanding (unnest x weight) "
    "and taking the plain median — viable only on fixture data; at scale "
    "the frequency form is the only plan that works (the expansion "
    "multiplies the shuffle by the mean weight, ~25x here).",
    tags=("A5",),
)
def a21_weighted_median(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    freq = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5), freq), 4)
        .alias("w_median"),
        F.sum(freq).alias("total_weight"),
    )


# --- g3: triangle counting (degree-oriented) --------------------------------


@register(
    "g3_triangle_count",
    oracle=f"""
    WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    sized AS (
      SELECT l_orderkey FROM p GROUP BY l_orderkey
      HAVING COUNT(*) <= {_COOC_CAP}
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM p a JOIN p b USING (l_orderkey) JOIN sized USING (l_orderkey)
      WHERE a.l_partkey < b.l_partkey
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3
      ON e3.u = e1.u AND e3.v = e2.v
    """,
    description="triangle counting over the co-purchase graph (completes "
    "the distributed graph trio: connected components, PageRank, "
    "triangles — the clustering-coefficient primitive). Spark side uses "
    "the DEGREE-ORIENTED adjacency-intersection formulation: each "
    "undirected edge is directed from the (degree, id)-smaller endpoint "
    "(the standard trick that tames power-law hubs at scale; r14 weights "
    "the degree by basket multiplicity, which preserves correctness — "
    "ANY strict total order yields an acyclic orientation counting each "
    "triangle exactly once — while letting the degree pass skip edge "
    "dedup), out-neighborhoods are packed into arrays by a collect_set "
    "whose map-side partial dedups the raw pairs (no separate "
    "Θ(pairs)-row distinct exchange), and each directed edge (u,v) — "
    "exploded straight off the adjacency rows — contributes "
    "|adj(u) ∩ adj(v)| via one JVM-native array_intersect — Θ(E) rows "
    "carrying arrays instead of the Σ outdeg² wedge materialization the "
    "r3 plan shuffled (measured 2x faster at sf0.1: 7.3s → 3.5s warm). "
    "The oracle counts the same triangles with the plain id-ordered "
    "triple join — orientation-independent, equal by construction.",
    tags=("G3",),
    bench=True,
)
def g3_triangle_count(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # materialized: feeds the degree pass AND the pair expansion — one
    # row per capped order, arrays of ≤ _COOC_CAP parts (orders of
    # magnitude fewer rows than the Θ(pairs) edge list the r13 plan
    # checkpointed here).
    baskets = _baskets(li).localCheckpoint(eager=True)
    # Orientation degree, WEIGHTED BY MULTIPLICITY (r14): d(n) = Σ over
    # capped baskets containing n of (basket size - 1) — the number of
    # raw (pre-dedup) pair endpoints at n. Computed from the basket rows
    # BEFORE pair expansion: Θ(Σ basket size) narrow rows into the
    # shuffle instead of the 2Θ(E) distinct-edge union the r13 plan
    # aggregated. CORRECTNESS: the triangle count is invariant to WHICH
    # total order orients the edges — any strict total order yields an
    # acyclic orientation in which each triangle {x,y,z} (x<y<z in that
    # order) is counted exactly once, at its (x,y) edge (z is the common
    # out-neighbor); (d, id) with the unique-id tie-break is such an
    # order for ANY per-vertex d. Degree-with-multiplicity keeps the
    # hub-taming heuristic (hot parts have high multiplicity degree a
    # fortiori) while letting the degree pass skip edge dedup entirely.
    # Materialized (r13 finding kept): da and db below feed two SEPARATE
    # broadcast exchanges whose canonical plans differ (different
    # aliases) — unmaterialized, the aggregate runs once per build.
    deg = (
        baskets.select((F.size("parts") - 1).alias("w"),
                       F.explode("parts").alias("n"))
        .groupBy("n").agg(F.sum("w").alias("d"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    # The degree table is one row per VERTEX (the part catalog — orders
    # of magnitude smaller than the edge list at any scale), so both
    # degree joins are explicit broadcasts: orientation costs zero
    # shuffles. Raw pairs (same undirected edge re-emitted by several
    # baskets) orient CONSISTENTLY — deg is a fixed per-vertex value —
    # so the duplicates collapse in the adjacency collect_set below.
    directed = (
        _pairs_from_baskets(baskets, "a", "b")
        .join(F.broadcast(da), "a").join(F.broadcast(db), "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # out-adjacency arrays: ~|V| rows, Θ(E) total payload. collect_SET
    # (r14): edge dedup now happens INSIDE this aggregation — partial
    # map-side collect_set dedups before the exchange — replacing the
    # r13 plan's separate Θ(pairs)-row distinct() exchange + Θ(E)-row
    # edge checkpoint (one exchange and one materialization fewer; the
    # same bytes arrive here grouped as ≤|V| array rows). The probe join
    # below carries no hint deliberately — adj is Θ(E) data, NOT safely
    # broadcastable at scale (unlike the degree table); the planner
    # broadcasts it when its measured size is under the threshold (the
    # sf0.1 regime) and shuffles it otherwise, which with the AQE
    # shuffled-hash conversion (session.py) never sorts the
    # array-carrying rows. Materialized: referenced by both probe sides
    # and the edge count — the recompute pitfall again.
    adj = directed.groupBy("u").agg(
        F.collect_set("v").alias("nb")
    ).localCheckpoint(eager=True)
    adj_v = adj.select(F.col("u").alias("v"), F.col("nb").alias("nb_v"))
    # Probe rows come from EXPLODING adj itself — (u, nb, v) for each
    # distinct directed edge, each exactly once — so the r13 plan's
    # u-side join disappears; only the v-side join remains. The inner
    # join is correct: a vertex missing from adj has no out-edges, so
    # its intersection would be empty — dropping the row changes
    # nothing. Each triangle u→v, u→w, v→w is counted exactly once, at
    # its (u,v) edge (w is the unique common out-neighbor). coalesce: on
    # a triangle-free graph the probe can drop EVERY row (e.g. a star —
    # no oriented head has out-edges) and sum() over zero rows is NULL,
    # where the oracle's COUNT(*) is 0.
    tri = (
        adj.select("nb", F.explode("nb").alias("v"))
        .join(adj_v, "v")
        .select(F.size(F.array_intersect("nb", "nb_v")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_triangles"))
    )
    # each undirected edge appears exactly once across the adjacency
    # sets (consistent orientation + set dedup), so |E| = Σ size(nb) —
    # a |V|-row scan instead of the r13 plan's Θ(E)-row count; coalesce
    # for the empty-graph case (sum over zero rows is NULL).
    n_edges = adj.agg(
        F.coalesce(F.sum(F.size("nb")), F.lit(0)).alias("n_edges"))
    return n_edges.join(F.broadcast(tri)).select(
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )


# --- t14: week-over-week growth ---------------------------------------------


@register(
    "t14_wow_growth",
    oracle="""
    WITH w AS (
      -- ts IS NOT NULL mirrors Spark exactly: F.window() EXCLUDES
      -- NULL-timestamp rows by definition, while DuckDB's
      -- time_bucket(NULL) would bucket them into a NULL week
      -- (r7 hostile-corpus find)
      SELECT event_type,
             time_bucket(INTERVAL 7 DAY, ts, TIMESTAMP '1970-01-01') AS wk,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), l AS (
      SELECT event_type, wk, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
      FROM w
    )
    SELECT event_type, wk, n, prev_n,
           ROUND((n - prev_n) / CAST(prev_n AS DOUBLE), 4) AS wow_growth
    FROM l WHERE prev_n IS NOT NULL
    """,
    description="week-over-week growth per event type (the BI trend "
    "report): weekly counts, previous week via LAG, relative change as "
    "exact-int difference over exact-int base — one rounded division. "
    "Scale: one shuffle to the weekly rollup; the window runs over "
    "weeks-per-type rows.",
    tags=("T1", "W2"),
)
def t14_wow_growth(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "event_type",
        F.window("ts", "7 days").getField("start").alias("wk"),
    ).agg(F.count(F.lit(1)).alias("n"))
    lag = F.lag("n").over(
        Window.partitionBy("event_type").orderBy("wk"))
    return (
        w.withColumn("prev_n", lag)
        .filter(F.col("prev_n").isNotNull())
        .select(
            "event_type", "wk", "n", "prev_n",
            F.round(
                (F.col("n") - F.col("prev_n")) / F.col("prev_n").cast("double"),
                4).alias("wow_growth"),
        )
    )
