#!/usr/bin/env python
"""Dev-only 10x scale stress: detects nonlinear blowups bench.py can't see.

bench.py never leaves sf0.1, so an operator that is quadratic in corpus
size (a missing bucket cap, a widening blocking window, a fast-path
threshold) looks fine there and melts at 100 TB. This tool synthesizes a
10x corpus FROM the sf0.1 fixtures — entirely executor-side (explode over
a replica spine; no driver-side row synthesis) — with the salting chosen
so that within-replica structure is preserved and cross-replica rows
cannot collide:

- documents: every token gets a per-replica suffix -> each replica is an
  independent corpus with the ORIGINAL near-dup structure; pair graph
  scales x10, never x100.
- embeddings: per-replica circular shift of the vector (an orthogonal
  permutation) -> within-replica cosines exact, cross-replica ~random.
- events: ids offset per replica; timestamps untouched -> 10x density on
  the same time axis (the honest stress for time-blocked operators:
  pairs-per-bucket grows, which is the regime j17 must survive).
- lineitem/orders/customer: order/cust keys offset consistently; nation
  and supplier keys untouched so g1's 625-row edge list stays fixed.

Run:  python tools/scale_stress.py [--regen] > SCALE_STRESS.md
Prints four wall-time tables: the 1x->10x tier over the full heavy-tail
case list, 100x events / documents amortization tiers that show the
sub-linear 10x exponents converging toward true linear cost as fixed
stage overhead washes out, and a 100x graph/embedding tier (g3 + l25,
with the hot-bucket guard's measured exclusion fractions). Measurement protocol (both r4-hardened
against artifacts that distorted the r3 tables):

- EVERY tier — including a layout-normalized 1x copy of the fixture —
  is written with the same part-file count, so exponents compare equal
  scan parallelism (see synthesize's docstring for the single-file
  artifact this removes).
- every case is min-of-2 after a warmup in its OWN subprocess Spark
  session: shared-session timings proved contaminated by multi-second
  background cleanup (shuffle files, broadcast/checkpoint block
  removal) from earlier cases, which neither a GC barrier nor min-of-2
  dodges, and which moved 4-6x inflation between victims on identical
  code (see run_case / run_case_isolated docstrings for the measured
  pairs).

Each row carries the empirical scaling exponent log10(t_big/t_small)
and the expected exponent with the reason. Kept OUT
of PLANS.md because these are measured wall-times — PLANS.md must stay
byte-regenerable for the staleness test (tests/test_plan_staleness.py).
Takes ~25 minutes end-to-end on an otherwise idle machine (~10s JVM
startup per isolated case; the price of reproducible numbers).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nf2pq_spark import plans  # noqa: E402
from nf2pq_spark.session import get_spark  # noqa: E402
from nf2pq_spark.sources.tables import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST1 = "/tmp/nf2pq_scale1"  # layout-normalized 1x (see synthesize)
DST = "/tmp/nf2pq_scale10"
K = 10
N_FILES = 32  # part-files per synthesized big table, EVERY tier

#: (query, expected exponent, reason) — expected ~1.0 unless the OUTPUT
#: itself grows superlinearly, in which case O(output) is optimal.
CASES = [
    ("q1_pricing_summary", 1.0, "single scan+agg; linear baseline"),
    ("s6_netflow_v5_decode", 1.0, "wire decode, fixed-layout vectorized "
     "path: one np.frombuffer per datagram, flows from the tier's events "
     "(1 flow/event; capture synthesis is cached by the warmup run — "
     "timed runs decode+aggregate only, 8 capture files every tier so "
     "decode parallelism is equal across sizes)"),
    ("s6b_ipfix_decode", 1.0, "wire decode, template-driven vectorized "
     "path: per-announced-layout np dtype over the accumulated data "
     "sets — the collector's RFC 7011 hot path at growing flow counts"),
    ("s6l_v9_uptime_wrap", 1.0, "wrap-corrected decode, BOTH formats "
     "(v5 fixed-layout + v9 template-driven, each through its "
     "vectorized path): the r10 -2^32 ms correction is branch-free "
     "numpy arithmetic per record, so the decode stays linear — this "
     "row postdates the wrap rewrite the older s6/s6b rows predated"),
    ("s6m_varlen_strings", 1.0, "varlen string IEs (r11): the in-order "
     "SCALAR walk — per-record Python loop over length prefixes, the "
     "structural cost of a self-describing layout; linear in flows, "
     "parallel across capture files, and the absolute per-row cost is "
     "the documented reason with_strings is opt-in"),
    ("s6n_multi_varlen", 1.0, "TWO varlen string IEs per record (r12): "
     "same scalar walk as s6m with a second length-prefixed field and "
     "the str_ies map build per record — still linear in flows"),
    ("s6o_basiclist", 1.0, "RFC 6313 basicList (r12): scalar walk plus "
     "a per-record packed-list parse (elements bounded per record) and "
     "the JVM-side F.aggregate over the decoded arrays — linear in "
     "flows"),
    ("s6p_enterprise_ies", 1.0, "enterprise-numbered IEs (r13): PEN "
     "fields ride the VECTORIZED frombuffer path as opaque padding "
     "columns, so the 16-field template with four vendor IEs decodes "
     "at fixed-layout speed — the scale claim behind decoding AROUND "
     "instead of falling back to the scalar walk"),
    ("s6q_subtemplate_lists", 1.0, "RFC 6313 subTemplateList + "
     "subTemplateMultiList (r13): scalar walk with nested sub-record "
     "parses (sub-record counts bounded per record) feeding four "
     "flattened list columns — linear in flows"),
    ("l2d_neardup_components", 1.0, "pair graph x10 by construction "
     "(independent replicas); CC cost O(pairs)"),
    ("l25_semdedup_srp", 1.3, "the SHIPPED config, now ADAPTIVE planes "
     "(r5 verdict item 2): clamp(ceil(log2(N/32)), 6, 32) -> 6 planes at "
     "1x (2000 vecs, ~31/bucket) and 10 planes at 10x (20k vecs, ~20 "
     "expected/bucket) — pairing RUNS at both tiers (the old fixed "
     "6-plane default excluded ~93% at 10x); residual superlinearity is "
     "within-bucket pair growth on the skew tail"),
    ("l25@6planes_uncapped", 2.0, "guard disabled: 64 fixed buckets hold "
     "10x members -> within-bucket pairs x100. This is the raw "
     "fixed-plane quadratic the guard and the n_planes parameter exist "
     "for"),
    ("l25@9planes_uncapped", 1.5, "guard disabled, n_planes=9 (512 "
     "buckets): 8x more buckets -> ~8x fewer pairs than 6-plane "
     "uncapped at the same n; the residual superlinearity is the "
     "remaining population growth (planes must keep scaling with "
     "log2(n))"),
    ("j17_interval_overlap_join", 2.0, "OUTPUT is every concurrent pair: "
     "10x density on the same time axis -> Theta(n^2) result rows; plan "
     "cost is O(output), which is optimal for this query"),
    ("g1_nation_pagerank", 1.0, "fact aggregation x10; iterations run on "
     "the constant 625-row edge list"),
    ("j8_asof_join", 1.0, "one shuffle + per-user windows"),
    ("j8c_asof_hot_key", 1.0, "bucketed as-of (r3 phantom-carry plan: 3 "
     "exchanges, no join): hot key splits into day-buckets; the extra "
     "small stages are constant-cost — this row is the evidence behind "
     "bench.py's skew-ratio envelope"),
    ("l2_minhash_bands", 1.0, "per-doc shingle+md5 folds; no pairing"),
    ("l16_decontamination", 1.0, "eval-gram set broadcast, one train "
     "pass"),
    ("l24_dsir_weights", 1.0, "one (doc,bucket) count table, weights "
     "broadcast"),
    ("l26_incremental_dedup", 1.0, "new-batch fingerprints anti-join "
     "the seen set"),
    ("g2_copurchase_pairs", 1.0, "per-order pair expansion capped at "
     "10 parts/order — pair count linear in orders"),
    ("g3_triangle_count", 1.0, "triangles on the aggregated small "
     "graph; the fact aggregation is the linear part"),
    ("sql6_volume_shipping", 1.0, "TPC-H Q7 shape: broadcast dims + "
     "one fact shuffle"),
    ("a19_two_phase_skew_agg", 1.0, "salted partial agg then final agg "
     "over salt groups"),
    ("j14_salted_skew_join", 1.0, "salted replicated-dim join"),
    ("t12_interval_union", 1.0, "per-user interval sweep windows"),
]

#: 100x amortization tier (events-only, 10M rows): the 10x table's
#: sub-linear exponents mean fixed stage overhead still dominates at 1M
#: rows — this tier shows the same operators converging toward true
#: linear cost, and in particular whether the bucketed as-of's constant
#: overhead (bench.py's skew-ratio envelope) washes out at real sizes.
K100 = 100
DST100 = "/tmp/nf2pq_scale100"
CASES_100 = [
    ("s6_netflow_v5_decode", 1.0, "10M flows through the fixed-layout "
     "vectorized decoder — the collector throughput claim measured "
     "where data dominates"),
    ("s6b_ipfix_decode", 1.0, "10M flows through the template-driven "
     "vectorized decoder (np dtype per announced layout)"),
    ("s6l_v9_uptime_wrap", 1.0, "10M wrap-spanning flows per format "
     "(20M decodes) through the corrected rel_abs arithmetic — the "
     "wrap fix measured where data dominates"),
    ("j8_asof_join", 1.0, "one shuffle + per-user windows"),
    ("j8c_asof_hot_key", 1.0, "hot key = 8M of 10M events, split into "
     "~30 day-buckets; at data-dominated sizes the segmented scan costs "
     "~2x the uniform baseline — one extra column-pruned pass for the "
     "bucket summary/spine — which is the structural price of skew "
     "resilience (the plain window on this key would be ONE 8M-row "
     "task and at cluster scale never finishes)"),
    ("a19_two_phase_skew_agg", 1.0, "salted partial agg"),
    ("t12_interval_union", 1.0, "per-user interval sweep windows"),
    ("t1_tumbling_hour", 1.0, "tumbling-window rollup"),
]


#: 100x documents tier: the documents-corpus heavy tail was 10x-only in
#: r3; this tier runs the same 10x->100x step so the sub-linear 10x
#: exponents can be checked against a 10x-larger corpus (both tiers on
#: the normalized 32-file layout).
CASES_100_DOCS = [
    ("l2_minhash_bands", 1.0, "per-doc shingle+md5 folds; no pairing"),
    ("l2d_neardup_components", 1.3, "pair graph grows exactly linearly "
     "(measured: 213,949 pairs at 10x -> 2,139,121 at 100x), but this "
     "step CROSSES connected_components' 1M-edge gate: 10x solves on "
     "the driver (one Arrow collect + union-find), 100x runs the "
     "distributed pointer-doubling loop (~11 rounds x per-round job "
     "overhead on local[32]) — a path crossover, not superlinear "
     "scaling; at cluster scale the distributed path IS the design and "
     "its cost is O(pairs x log diameter)"),
    ("l16_decontamination", 1.0, "eval-gram set broadcast, one train "
     "pass"),
    ("l24_dsir_weights", 1.0, "one (doc,bucket) count table, weights "
     "broadcast"),
]


#: 100x graph/embedding tier (r4 verdict item 4): g3 and l25 were
#: 10x-only (exponents 0.31 / 0.36 — fixed overhead still dominated);
#: this tier runs their 10x→100x step so the claims are tested where
#: data dominates: g3's triangle phase is O(aggregated E) — the replica
#: construction repeats the SAME part co-purchases under shifted order
#: keys, so the aggregated pair graph stays constant while the fact
#: scan and per-order pair expansion scale 100x (cost should go linear,
#: like the fact-agg claim says); l25's shipped ADAPTIVE config (r6)
#: lands at 13 planes for 200k vectors so pairing runs, and the
#: @12planes row keeps the manual knob as a reference point on the same
#: measured operating curve.
CASES_100_MISC = [
    ("g3_triangle_count", 1.0, "same aggregated part-pair graph at "
     "every tier by construction; the 100x cost is the fact scan + "
     "per-order pair expansion, both linear — the triangle "
     "intersection itself is constant"),
    ("l25_semdedup_srp", 1.3, "shipped ADAPTIVE config at 200k vectors: "
     "13 planes (8192 buckets, ~24 expected/bucket) — pairing actually "
     "runs where the old fixed 6-plane default put 100% of vectors in "
     "over-cap buckets and silently found nothing; see the "
     "exclusion-fraction lines below the table"),
    ("l25@12planes", 1.3, "the manual knob one step coarser (4096 "
     "buckets, ~50 members): reference point showing the adaptive "
     "formula lands on the same measured operating curve"),
]


def synthesize_events_100x(spark) -> None:
    """Write the 100x events table under DST100 (events-only tier)."""
    os.makedirs(DST100, exist_ok=True)
    spine = F.explode(F.sequence(F.lit(0), F.lit(K100 - 1))).alias("__k")
    ev = load_table(spark, SRC, "events")
    k = F.col("__k").cast("long")  # k*1e8 overflows int32 past k=21
    (ev.select("*", spine)
     .select(
         (F.col("event_id") + k * F.lit(100_000_000)).alias("event_id"),
         "ts",
         (F.col("user_id") + k * F.lit(10_000_000)).alias("user_id"),
         "event_type", "value", "props")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST100}/events.parquet"))


def synthesize_docs_100x(spark) -> None:
    """Write the 100x documents table under DST100 — same per-replica
    token-suffix construction as the 10x tier (each replica keeps the
    original near-dup structure; cross-replica shingles never collide)."""
    os.makedirs(DST100, exist_ok=True)
    spine = F.explode(F.sequence(F.lit(0), F.lit(K100 - 1))).alias("__k")
    docs = load_table(spark, SRC, "documents")
    k = F.col("__k").cast("long")
    (docs.select("*", spine)
     .select(
         (F.col("doc_id") + k * F.lit(10_000_000)).alias("doc_id"),
         F.array_join(
             F.transform(F.split("text", " "),
                         lambda t: F.concat(t, F.lit("_"), F.col("__k"))),
             " ").alias("text"),
         "lang", "source", "n_chars")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST100}/documents.parquet"))


def synthesize_misc_100x(spark) -> None:
    """100x lineitem (g3's co-purchase graph source) and embeddings
    (l25's corpus) under DST100, same replica constructions as the other
    tiers: order keys shift per replica while part keys stay — the same
    part sets recur in every replica, so the AGGREGATED part-pair graph
    is constant while scan + pair expansion scale 100x (exactly the
    O(aggregated E) claim the g3 row tests); embeddings rotate per
    replica (k % dims) like the 10x tier — with 100 replicas over 64
    dims, each original contributes ~36 identical replica pairs, real
    near-dup mass for the bucket join."""
    os.makedirs(DST100, exist_ok=True)
    spine = F.explode(F.sequence(F.lit(0), F.lit(K100 - 1))).alias("__k")
    k = F.col("__k").cast("long")

    li = load_table(spark, SRC, "lineitem")
    (li.select("*", spine)
     .select(
         (F.col("l_orderkey") + k * F.lit(100_000_000)).alias("l_orderkey"),
         *[c for c in li.columns if c != "l_orderkey"])
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST100}/lineitem.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    shifted = F.concat(
        F.slice(F.col("embedding"), (F.col("__k") % dims) + 1, dims),
        F.slice(F.col("embedding"), 1, F.col("__k") % dims))
    (emb.select("*", spine)
     .select(
         (F.col("vec_id") + k * F.lit(10_000_000)).alias("vec_id"),
         shifted.alias("embedding"), "label")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST100}/embeddings.parquet"))


def l25_exclusion_fraction(spark, sf_dir: str, n_planes: int,
                           cap: int) -> float:
    """Fraction of vectors the hot-bucket guard excludes from pairing —
    same md5-derived ±1 hyperplane signatures as l25 itself (reuses its
    module internals, so this can't drift from the measured query)."""
    from nf2pq_spark.plans.curation import _SRP_DIMS, _srp_sign
    from nf2pq_spark.functions.vectors import as_double_array

    e = load_table(spark, sf_dir, "embeddings").select(
        as_double_array("embedding").alias("v"))
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(_srp_sign(p, i)) for i in range(_SRP_DIMS)])
        dot_p = F.aggregate(
            F.zip_with(F.col("v"), signs, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot_p >= 0, "1").when(dot_p < 0, "0"))
    per = (e.select(F.concat(*bits).alias("bucket"))
           .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))
    row = per.agg(
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(F.lit(0)))
        .alias("exc"),
        F.sum("n").alias("tot")).first()
    return float(row.exc) / float(row.tot)


def synthesize(spark) -> None:
    """Write the 10x tables (+ passthrough copies) under DST, and the
    layout-NORMALIZED 1x copies under DST1.

    Every synthesized big table is ``repartition(N_FILES)`` before the
    write. Without it the output inherits the source scan's partitioning
    — the sf0.1 fixtures are single small files, so the 10x corpus came
    out as ONE part-file / one row group, and every 10x measurement ran
    its scan AND the per-row CPU above it (shingling, explode) on a
    single core while the 100x tables (already repartitioned) ran on 32.
    The r3/r4 sub-linear exponents partly measured that layout artifact
    (l16 at 10x: 6.9s single-file vs 1.1s at 32 files, same data). The
    1x tier exists for the same reason: exponents must compare equal
    layouts, and the driver fixture itself is a single file."""
    os.makedirs(DST, exist_ok=True)
    spine = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("__k")

    docs = load_table(spark, SRC, "documents")
    (docs.select("*", spine)
     .select(
         (F.col("doc_id") + F.col("__k") * F.lit(10_000_000)).alias("doc_id"),
         F.array_join(
             F.transform(F.split("text", " "),
                         lambda t: F.concat(t, F.lit("_"), F.col("__k"))),
             " ").alias("text"),
         "lang", "source", "n_chars")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    shifted = F.concat(
        F.slice(F.col("embedding"), (F.col("__k") % dims) + 1,
                dims),  # slice clamps at the end
        F.slice(F.col("embedding"), 1, F.col("__k") % dims))
    (emb.select("*", spine)
     .select(
         (F.col("vec_id") + F.col("__k") * F.lit(10_000_000)).alias("vec_id"),
         shifted.alias("embedding"), "label")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/embeddings.parquet"))

    ev = load_table(spark, SRC, "events")
    (ev.select("*", spine)
     .select(
         (F.col("event_id") + F.col("__k") * F.lit(100_000_000)).alias("event_id"),
         "ts",
         (F.col("user_id") + F.col("__k") * F.lit(10_000_000)).alias("user_id"),
         "event_type", "value", "props")
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/events.parquet"))

    li = load_table(spark, SRC, "lineitem")
    (li.select("*", spine)
     .select(
         (F.col("l_orderkey") + F.col("__k") * F.lit(100_000_000)).alias("l_orderkey"),
         *[c for c in li.columns if c != "l_orderkey"])
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/lineitem.parquet"))

    od = load_table(spark, SRC, "orders")
    (od.select("*", spine)
     .select(
         (F.col("o_orderkey") + F.col("__k") * F.lit(100_000_000)).alias("o_orderkey"),
         (F.col("o_custkey") + F.col("__k") * F.lit(10_000_000)).alias("o_custkey"),
         *[c for c in od.columns if c not in ("o_orderkey", "o_custkey")])
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/orders.parquet"))

    cu = load_table(spark, SRC, "customer")
    (cu.select("*", spine)
     .select(
         (F.col("c_custkey") + F.col("__k") * F.lit(10_000_000)).alias("c_custkey"),
         *[c for c in cu.columns if c != "c_custkey"])
     .repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST}/customer.parquet"))

    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet")

    # layout-normalized 1x: same rows as the sf0.1 fixture, same file
    # count as the synthetic tiers, so the tier-1 exponent measures data
    # growth — not the jump from the fixture's single file to 32
    os.makedirs(DST1, exist_ok=True)
    for t in ("documents", "embeddings", "events", "lineitem", "orders",
              "customer"):
        (load_table(spark, SRC, t).repartition(N_FILES)
         .write.mode("overwrite").parquet(f"{DST1}/{t}.parquet"))
    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST1}/{t}.parquet")


def run_case(spark, case: str, sf_dir: str) -> float:
    """Warmup + min-of-2 inside the CURRENT session. Only meaningful in a
    fresh per-case session (see run_case_isolated): r4 measured the same
    query 4-6x slower inside a session that had run other heavy cases —
    multi-second background cleanup (shuffle files, broadcast and
    checkpoint block removal via the ContextCleaner) outlives both a
    gc.collect()+System.gc() barrier and the min-of-2 window."""
    if case.startswith("l25@"):
        import re

        from nf2pq_spark.plans.curation import l25_semdedup_srp
        m = re.search(r"(\d+)planes", case)
        n = int(m.group(1)) if m else 6
        cap = 10**9 if "uncapped" in case else None
        fn = (lambda s, d: l25_semdedup_srp(  # noqa: E731
            s, d, n_planes=n, max_bucket=cap or 200))
    else:
        fn = plans.REGISTRY[case].fn

    def once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # warmup (JIT, listings)
    return round(min(once(), once()), 3)


def run_case_isolated(case: str, sf_dir: str) -> float:
    """Time one case in its OWN subprocess Spark session — the isolation
    that makes runs reproducible (fresh-session probes: l2@10x 1.6s vs
    6.9s shared, j8@100x 1.0s vs 3.5s shared, and the inflation moved
    between victims on identical code) — and take the MIN over two
    separate subprocess invocations: this host is a VM whose neighbors
    can inflate a whole multi-second window, so single-invocation rows
    bounced up to 2x between full runs on identical code+data (r5:
    g3@10x 6.8s vs 12.3s) in a way no in-process barrier or in-session
    min-of-2 can dodge; the cross-invocation min is the stable
    statistic for the exponent signal."""
    return min(_one_subprocess(case, sf_dir), _one_subprocess(case, sf_dir))


def _one_subprocess(case: str, sf_dir: str) -> float:
    import subprocess

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", case, sf_dir],
        capture_output=True, text=True)
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
    if p.returncode != 0 or not lines:
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"isolated case failed: {case} @ {sf_dir}")
    return float(lines[-1].split()[1])


def _l25_exclusion_table(spark) -> dict:
    """Guard-exclusion fractions for the fixed legacy default (6 planes),
    the manual 12-plane knob, and the shipped ADAPTIVE default at each
    tier's actual corpus size (10x: 20k vectors -> 10 planes; 100x:
    200k -> 13)."""
    from nf2pq_spark.plans.curation import _srp_adaptive_planes

    n10 = load_table(spark, DST, "embeddings").count()
    n100 = load_table(spark, DST100, "embeddings").count()
    a10, a100 = _srp_adaptive_planes(n10), _srp_adaptive_planes(n100)
    return {
        ("10x", 6): l25_exclusion_fraction(spark, DST, 6, 200),
        ("10x", "adaptive", a10): l25_exclusion_fraction(spark, DST, a10,
                                                         200),
        ("100x", 6): l25_exclusion_fraction(spark, DST100, 6, 200),
        ("100x", 12): l25_exclusion_fraction(spark, DST100, 12, 200),
        ("100x", "adaptive", a100): l25_exclusion_fraction(spark, DST100,
                                                           a100, 200),
    }


def _print_l25_exclusion(excl: dict) -> None:
    ad = {k[0]: k[2] for k in excl if len(k) == 3}
    print("l25 guard exclusion fraction (vectors in buckets over the "
          "cap, cap=200): "
          f"**{excl[('10x', 6)]:.0%}** at 10x/6 planes (the old fixed "
          "default) vs "
          f"**{excl[('10x', 'adaptive', ad['10x'])]:.0%}** at 10x with "
          f"the shipped adaptive default ({ad['10x']} planes); "
          f"**{excl[('100x', 6)]:.0%}** at 100x/6 planes vs "
          f"**{excl[('100x', 12)]:.0%}** at 100x/12 planes (manual knob) "
          f"and **{excl[('100x', 'adaptive', ad['100x'])]:.0%}** with "
          f"the adaptive default ({ad['100x']} planes) — the fixed plane "
          "count saturated at 200k vectors (the guard kept the job "
          "bounded but recall went silently to zero); the adaptive "
          "default clamp(ceil(log2(N/32)), 6, 32) keeps expected bucket "
          "loads under the cap so pairing actually runs at every tier.")


def _synthesize_embeddings_only(spark) -> None:
    """Embeddings tables for all three tiers, construction identical to
    synthesize()/synthesize_misc_100x() — lets --l25-refresh run without
    paying the full multi-table synthesis."""
    emb = load_table(spark, SRC, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    os.makedirs(DST1, exist_ok=True)
    (emb.repartition(N_FILES)
     .write.mode("overwrite").parquet(f"{DST1}/embeddings.parquet"))
    for dst, reps in ((DST, K), (DST100, K100)):
        os.makedirs(dst, exist_ok=True)
        spine = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("__k")
        k = F.col("__k").cast("long")
        shifted = F.concat(
            F.slice(F.col("embedding"), (F.col("__k") % dims) + 1, dims),
            F.slice(F.col("embedding"), 1, F.col("__k") % dims))
        (emb.select("*", spine)
         .select(
             (F.col("vec_id") + k * F.lit(10_000_000)).alias("vec_id"),
             shifted.alias("embedding"), "label")
         .repartition(N_FILES)
         .write.mode("overwrite").parquet(f"{dst}/embeddings.parquet"))


def _l25_refresh_entry() -> None:
    """Targeted refresh of the l25 rows after the adaptive-default change
    (r5 verdict item 2): re-times ONLY the l25 cases (each still isolated
    min-of-2-subprocess, the full protocol) and re-measures the exclusion
    table, printing a splice for SCALE_STRESS.md. The other rows' code
    paths are untouched by the change, so their committed numbers stand."""
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("nf2pq_spark-scale-l25", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    if not (os.path.exists(f"{DST}/embeddings.parquet")
            and os.path.exists(f"{DST1}/embeddings.parquet")
            and os.path.exists(f"{DST100}/embeddings.parquet")):
        _synthesize_embeddings_only(spark)
    excl = _l25_exclusion_table(spark)
    spark.stop()
    try:
        from pyspark import SparkContext
        if SparkContext._gateway is not None:
            SparkContext._gateway.shutdown()
    except Exception:
        pass
    os.sync()
    time.sleep(10.0)

    rows_10x = [c for c in CASES if c[0].startswith("l25")]
    rows_100x = [c for c in CASES_100_MISC if c[0].startswith("l25")]
    print("### l25 rows (refreshed after the adaptive-plane default, "
          "r6)")
    print()
    print("| query | t@1x | t@10x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    t10s = {}
    for case, expected, why in rows_10x:
        t1 = run_case_isolated(case, DST1)
        t10 = t10s[case] = run_case_isolated(case, DST)
        exp = round(math.log10(max(t10, 1e-9) / max(t1, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t1}s | {t10}s | {round(t10 / t1, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")
    print()
    print("| query | t@10x | t@100x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    for case, expected, why in rows_100x:
        if case not in t10s:
            t10s[case] = run_case_isolated(case, DST)
        t10 = t10s[case]
        t100 = run_case_isolated(case, DST100)
        exp = round(math.log10(max(t100, 1e-9) / max(t10, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t10}s | {t100}s | {round(t100 / t10, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")
    print()
    _print_l25_exclusion(excl)


def _one_case_entry() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    i = sys.argv.index("--one")
    case, sf_dir = sys.argv[i + 1], sys.argv[i + 2]
    spark = get_spark("nf2pq_spark-scale-one", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"RESULT {run_case(spark, case, sf_dir)}")


def main() -> None:
    if "--one" in sys.argv:
        _one_case_entry()
        return
    if "--l25-refresh" in sys.argv:
        _l25_refresh_entry()
        return
    # 10M-row checkpoints + 100-replica broadcast residue need more than
    # the 8g test default; the 100x documents tier OOMed under it (r4)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("nf2pq_spark-scale-stress", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    if "--regen" in sys.argv:
        for d in (DST1, DST, DST100):
            if os.path.exists(d):
                shutil.rmtree(d)
    if not (os.path.exists(f"{DST}/events.parquet")
            and os.path.exists(f"{DST1}/events.parquet")):
        print(f"synthesizing {K}x corpus at {DST} ...", file=sys.stderr)
        synthesize(spark)
    if not os.path.exists(f"{DST100}/events.parquet"):
        print(f"synthesizing {K100}x events at {DST100} ...", file=sys.stderr)
        synthesize_events_100x(spark)
    if not os.path.exists(f"{DST100}/documents.parquet"):
        print(f"synthesizing {K100}x documents at {DST100} ...",
              file=sys.stderr)
        synthesize_docs_100x(spark)
    if not (os.path.exists(f"{DST100}/lineitem.parquet")
            and os.path.exists(f"{DST100}/embeddings.parquet")):
        print(f"synthesizing {K100}x lineitem+embeddings at {DST100} ...",
              file=sys.stderr)
        synthesize_misc_100x(spark)
    # guard diagnostics for the misc tier (not timing-sensitive — the
    # shared synth session is fine here; only wall-times need isolation)
    excl = _l25_exclusion_table(spark)
    # all synthesis done — release the machine before any timing: every
    # case below runs in its own subprocess. Three barriers, each a
    # measured contamination source (r5): (1) spark.stop() alone leaves
    # the py4j gateway JVM alive holding this driver's multi-GB
    # synthesis heap until python exits — shut it down outright;
    # (2) freshly-written corpora (1.6 GB) drain via kernel writeback
    # DURING the first timed cases (a run timed right after synthesis
    # showed 2-4x outliers on its early rows; the same cases on
    # 35-minute-old corpora were clean) — sync() forces the flush now;
    # (3) a short settle lets the flush and JVM teardown finish.
    spark.stop()
    try:
        from pyspark import SparkContext
        if SparkContext._gateway is not None:
            SparkContext._gateway.shutdown()
    except Exception:
        pass
    os.sync()
    time.sleep(10.0)

    print("# SCALE_STRESS — 10x synthetic scale run (dev-only)")
    print()
    print("Generated by `python tools/scale_stress.py > SCALE_STRESS.md` "
          "(see the module docstring for the corpus construction). "
          "Wall-times are machine-sensitive; the EXPONENT column "
          "(log10(t10/t1)) is the signal. An operator whose empirical "
          "exponent exceeds its expectation by >0.3 is flagged **!**. "
          "Sub-linear exponents mean fixed overhead still dominates at "
          "these sizes. Protocol (r4): every tier is written with the "
          "SAME file count (32) so scan parallelism is equal at every "
          "size — the r3 tables inherited the fixture's single file at "
          "10x and serialized per-row CPU on one core, which distorted "
          "exponents downward; t@1x is the fixture's rows in that "
          "normalized layout. Every case is timed in its OWN Spark "
          "session (subprocess): shared-session timings proved "
          "contaminated by multi-second background cleanup from earlier "
          "cases that neither a GC barrier nor min-of-2 can dodge "
          "(same code, same data: l2@10x 6.9s shared vs 1.6s fresh). "
          "Each row is additionally the MIN over two separate subprocess "
          "invocations (r5): the host VM's neighbors can inflate a whole "
          "invocation window — single-invocation rows moved up to 2x "
          "between runs of identical code+data — and the "
          "cross-invocation min is the stable statistic.")
    print()
    print("| query | t@1x | t@10x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    t10s = {}  # tier-1's 10x timings, reused by both 100x tiers
    for case, expected, why in CASES:
        t1 = run_case_isolated(case, DST1)
        t10 = t10s[case] = run_case_isolated(case, DST)
        exp = round(math.log10(max(t10, 1e-9) / max(t1, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t1}s | {t10}s | {round(t10 / t1, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")

    print()
    print("## 100x amortization tier (events-only, 10M rows)")
    print()
    print("Exponents here are log10(t100/t10)/1 over the 10x→100x step; "
          "convergence toward ~1.0 confirms the sub-linear 10x numbers "
          "were fixed overhead, not mismeasured work. The j8c/j8 ratio "
          "at this size is the scale-side answer to bench.py's "
          "skew-ratio envelope.")
    print()
    print("| query | t@10x | t@100x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    t100s = {}
    for case, expected, why in CASES_100:
        if case not in t10s:
            t10s[case] = run_case_isolated(case, DST)
        t10 = t10s[case]
        t100 = run_case_isolated(case, DST100)
        t100s[case] = t100
        exp = round(math.log10(max(t100, 1e-9) / max(t10, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t10}s | {t100}s | {round(t100 / t10, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")
    print()
    print("## 100x amortization tier (documents-only, ~600k docs)")
    print()
    print("The 10x table leaves the documents heavy tail sub-linear "
          "(fixed overhead still visible at 50k docs); this tier runs "
          "the same 10x→100x step for the documents-corpus operators "
          "on the same normalized layout.")
    print()
    print("| query | t@10x | t@100x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    for case, expected, why in CASES_100_DOCS:
        if case not in t10s:
            t10s[case] = run_case_isolated(case, DST)
        t10 = t10s[case]
        t100 = run_case_isolated(case, DST100)
        exp = round(math.log10(max(t100, 1e-9) / max(t10, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t10}s | {t100}s | {round(t100 / t10, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")

    print()
    print("## 100x graph/embedding tier (g3 + l25, r4 verdict item 4)")
    print()
    print("g3's 10x exponent (0.31) said fixed overhead still dominated; "
          "here the fact side is 60M rows. The replica construction "
          "repeats the same part co-purchases under shifted order keys, "
          "so the AGGREGATED pair graph is constant across tiers — a "
          "~1.0 exponent means cost tracks the linear fact work and the "
          "triangle intersection really is O(aggregated E), independent "
          "of corpus size. l25's rows measure the shipped ADAPTIVE "
          "config (13 planes at 200k vectors, pairing live) against the "
          "12-plane manual knob; the old fixed 6-plane default "
          "saturated here (100% exclusion, silent zero recall) — "
          "exactly what the adaptive default removes.")
    print()
    print("| query | t@10x | t@100x | ratio | exponent | expected | why |")
    print("|---|---|---|---|---|---|---|")
    for case, expected, why in CASES_100_MISC:
        if case not in t10s:
            t10s[case] = run_case_isolated(case, DST)
        t10 = t10s[case]
        t100 = run_case_isolated(case, DST100)
        exp = round(math.log10(max(t100, 1e-9) / max(t10, 1e-9)), 2)
        flag = " **!**" if exp > expected + 0.3 else ""
        print(f"| {case} | {t10}s | {t100}s | {round(t100 / t10, 2)}x "
              f"| {exp}{flag} | ~{expected} | {why} |")
    print()
    _print_l25_exclusion(excl)

    if "j8_asof_join" in t100s and "j8c_asof_hot_key" in t100s:
        r = round(t100s["j8c_asof_hot_key"] / t100s["j8_asof_join"], 2)
        print()
        print(f"**j8c/j8 ratio at 100x: {r}** — the structural ~2x of "
              "the segmented scan (one extra column-pruned pass), not "
              "overhead; the sf0.1 envelope 1.3-2.6 is stage-dispatch "
              "noise on top of it. The honest comparison at scale is vs "
              "the plain window ON the skewed key, which serializes the "
              "hot key into a single task and does not complete at "
              "cluster sizes.")


if __name__ == "__main__":
    main()
