"""Hostile-corpus differential regression (r7).

The shipped fixture corpora are 100% ASCII text and well-formed unit-ish
embeddings, so the cross-engine oracle comparison had never exercised
input where Spark (Java/UTF8String) and DuckDB (RE2/utf8proc) genuinely
diverge, or where degenerate vectors (NaN/Inf/huge/zero/NULL) poison
vector analytics. The r7 sweep over such a corpus
(tools/hostile_corpus_fixture.py) found four silent divergences and six
hard crashes; the fixes were the embedding validity contract
(functions.vectors.embedding_is_valid, oracle-mirrored), the l10
zero-norm NULL pin, and f8's runtime-independent ASCII case folding.

This test re-runs exactly the queries that sweep caught, Spark vs
DuckDB, on a freshly built hostile fixture — so the bug class stays
dead. The FULL 253-query hostile sweep remains a tool
(`NF2PQ_VERIFY_SF_DIR=... python tools/driver_sim.py --all`), too heavy
for the suite.
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))

#: the queries the r7 hostile sweeps found silently diverging or
#: crashing. Wave 1 = degenerate embeddings + adversarial Unicode text;
#: wave 2 = relational edge rows (NULLs in every nullable slot,
#: boundary/leap dates, window ties, rounding-edge money, orphan FKs,
#: malformed JSON props). The heavier streaming st* catches (watermark
#: epoch-floor mirrors) are covered by the full-sweep tool, not here —
#: except st7, whose catch was a REAL operator bug (NaN→int64-min sum
#: poisoning), pinned in test_streaming.py instead of this module.
CAUGHT = [
    # wave 1: embeddings + Unicode
    "f8_hash",            # silent: Java vs utf8proc lower() on İ/ß/σ
    "l3_cosine_topk",     # silent: NaN ranks first in desc top-k
    "l3c_cosine_neardup", # silent: NaN threshold comparison
    "l25_semdedup_srp",   # silent: NaN signs flip SRP buckets
    "l3b_lsh_topk",       # rows-only: same NaN surface as l3
    "l3d_ivf_topk",       # crash: Spark ML KMeans refuses non-finite
    "l3e_lsh_recall_gate",
    "l3f_ivf_recall_gate",
    "l5_multimodal_join", # crash: decimal overflow on 1e30 components
    "l6_label_centroids",
    "l10_vec_quantize",   # silent: '' vs NULL q8 for the zero vector
    "f4_arrays",          # crash: DuckDB NaN->int cast in the battery
    # wave 2: relational edge rows
    "w5_distribution",    # silent: Spark NULLS FIRST vs DuckDB NULLS LAST
    "w8_ewma_smoothing",  # silent: NULL-ts ordering flips the EWMA lag
    "w2_lag_lead",        # silent: same NULL-ordering default split
    "t14_wow_growth",     # silent: F.window drops null-ts, time_bucket keeps
    "t1_tumbling_hour",   # silent: same null-ts window split
    "t3_session_window",
    "t10_dynamic_session_gap",
    "rl1_hypertable_rollup",
    "a17_distribution_shape",  # silent: COUNT(*) vs COUNT(col) moments
    "f4c_array_setops",   # silent: '' vs NULL empty-list serialization
    "l22_stratified_sample_gate",  # silent: NULL target for novel stratum
    "j8_asof_join",       # DuckDB ASOF treats NULL probe as +inf
    "j8c_asof_hot_key",   # + F.window dropped NULL-ts left rows (operator)
    "x6_cogroup_asof",    # merge_asof raises on NaT probe keys
    "x8_arrow_native_udf",  # crash: blind slice+cast on free-form name
    "x9_udtf_table_arg",  # crash: int(None); int() vs FLOOR on negatives
    "f6_json",            # crash: DuckDB json_extract on malformed JSON
    "v1_variant_json",    # crash: parse_json/variant_get on malformed
    "s6c_netflow_v9_decode",  # silent: signed % vs & on pre-epoch wrap
    "f1_strings",         # silent: upper(ß) SpecialCasing SS vs 1:1 ẞ
    "t8_cohort_retention",  # crash: week-floor beyond pandas ns range
]


@pytest.fixture(scope="module")
def hostile_sf(tmp_path_factory):
    from hostile_corpus_fixture import build

    # sf0.001 keeps this module ~30s; the builder appends the hostile
    # tail to the real corpus so every query threshold stays non-vacuous
    return build(src=os.environ.get("NF2PQ_TEST_SF_DIR",
                                    "/root/testdata/sf0.001"),
                 dst=str(tmp_path_factory.mktemp("hostile") / "sfh"))


def test_caught_queries_match_oracle_on_hostile_corpus(spark, hostile_sf):
    import duckdb

    import __spark_entry__ as em
    from driver_sim import register_oracle_views, vhash

    qs, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    register_oracle_views(con, hostile_sf)
    bad = []
    for name in CAUGHT:
        s = qs[name](spark, hostile_sf).toPandas()  # must not crash
        if name not in oracles:
            continue
        d = con.execute(oracles[name]).fetchdf()
        if not (len(s) == len(d)
                and sorted(s.columns) == sorted(d.columns)
                and vhash(s) == vhash(d)):
            bad.append(name)
    assert not bad, f"hostile-corpus divergence regressed: {bad}"
