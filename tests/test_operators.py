"""Unit tests for the operator/function libraries (edges the oracle queries
don't isolate)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nf2pq_spark.functions import flownet, text, vectors
from nf2pq_spark.operators.asof import asof_join
from nf2pq_spark.operators.dedup import exact_dedup, jaccard_pairs, lsh_candidate_pairs
from nf2pq_spark.operators.similarity import brute_force_topk, lsh_topk


def test_ipv4_roundtrip(spark):
    df = spark.createDataFrame(
        [("10.0.0.1",), ("192.168.1.255",), ("0.0.0.0",), ("255.255.255.255",)],
        ["ip"],
    )
    out = df.select(
        flownet.long_to_ipv4(flownet.ipv4_to_long(F.col("ip"))).alias("rt")
    ).collect()
    assert [r.rt for r in out] == ["10.0.0.1", "192.168.1.255", "0.0.0.0", "255.255.255.255"]


def test_in_cidr(spark):
    df = spark.createDataFrame([("10.1.2.3",), ("10.255.0.1",), ("11.0.0.1",)], ["ip"])
    out = df.select(flownet.in_cidr(F.col("ip"), "10.0.0.0/8").alias("x")).collect()
    assert [r.x for r in out] == [True, True, False]


def test_ipv6_normalize_and_cidr_vs_stdlib(spark):
    """Helpers agree with Python's ipaddress module, including '::' in every
    position, mixed case, and non-nibble-aligned prefix lengths."""
    import ipaddress

    ips = ["2001:db8::1", "::", "::1", "fe80::", "2001:DB8:0:0:1::ff",
           "1:2:3:4:5:6:7:8", "2001:db8:a:b::c:d", "ff02::2:ff00:0",
           "2001:db8:1fff::", "2001:db8:2000::"]
    cidrs = ["2001:db8::/32", "2001:db8::/35", "2001:db8::/45", "ff00::/8"]
    df = spark.createDataFrame([(i,) for i in ips], ["ip"])
    cols = [flownet.ipv6_normalize(F.col("ip")).alias("norm"),
            flownet.ipv6_prefix(F.col("ip"), 48).alias("p48")]
    cols += [flownet.in_cidr6(F.col("ip"), c).alias(f"c{i}")
             for i, c in enumerate(cidrs)]
    for r in df.select("ip", *cols).collect():
        a = ipaddress.IPv6Address(r.ip)
        assert r.norm == format(int(a), "032x")
        assert r.p48 == format(int(a), "032x")[:12]
        for i, c in enumerate(cidrs):
            assert r[f"c{i}"] == (a in ipaddress.IPv6Network(c)), (r.ip, c)


def test_ipv6_property_random_addresses(spark):
    """Property-based: random 128-bit addresses (compressed by the stdlib)
    normalize and CIDR-match exactly like ipaddress, for every prefix
    length 1..128 drawn."""
    import ipaddress

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        addrs=st.lists(st.integers(0, 2**128 - 1), min_size=1, max_size=8),
        net_int=st.integers(0, 2**128 - 1),
        bits=st.integers(1, 128),
    )
    def check(addrs, net_int, bits):
        cidr = str(ipaddress.IPv6Network((net_int, bits), strict=False))
        ips = [str(ipaddress.IPv6Address(a)) for a in addrs]  # compressed form
        df = spark.createDataFrame([(i,) for i in ips], ["ip"])
        rows = df.select(
            "ip",
            flownet.ipv6_normalize(F.col("ip")).alias("norm"),
            flownet.in_cidr6(F.col("ip"), cidr).alias("inc"),
        ).collect()
        for r in rows:
            a = ipaddress.IPv6Address(r.ip)
            assert r.norm == format(int(a), "032x")
            assert r.inc == (a in ipaddress.IPv6Network(cidr)), (r.ip, cidr)

    check()


def test_tcp_flags(spark):
    df = spark.createDataFrame([(18,), (2,), (0,), (63,)], ["b"])
    out = df.select(flownet.decode_tcp_flags(F.col("b")).alias("f")).collect()
    assert [r.f for r in out] == [".A..S.", "....S.", "......", "UAPRSF"]


def test_service_class(spark):
    df = spark.createDataFrame([(443,), (53,), (22,), (999,), (40000,)], ["p"])
    out = df.select(flownet.service_class(F.col("p")).alias("s")).collect()
    assert [r.s for r in out] == ["web", "dns", "shell", "system", "ephemeral"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    out = df.select(text.shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0].s == ["a b c", "b c d"]
    assert out[1].s == []


def test_lang_guess_tie_break(spark):
    # no markers at all → all scores 0 → ties resolve en > de > fr
    df = spark.createDataFrame([("xyz qqq",), ("der die und xyz",)], ["text"])
    out = df.select(text.lang_guess(F.col("text")).alias("g")).collect()
    assert [r.g for r in out] == ["en", "de"]


def test_asof_exact_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, 100), (2, 50)], ["id", "ts"])
    right = spark.createDataFrame([(100, "exact"), (99, "before"), (101, "after")],
                                  ["ts", "tag"])
    left = left.withColumn("key", F.lit(1))
    right = right.withColumn("key", F.lit(1))
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="ts",
                    payload=["tag"]).collect()
    by_id = {r.id: r.tag for r in out}
    assert by_id[1] == "exact"     # ts == right ts matches (>= semantics)
    assert by_id[2] == "before" or by_id[2] is None  # nothing ≤ 50 except none
    assert by_id[2] is None        # no click at or before 50


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 200)], ["id", "ts"]).withColumn("k", F.lit(1))
    right = spark.createDataFrame([(100, "x")], ["ts", "tag"]).withColumn("k", F.lit(1))
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["tag"], how="inner").collect()
    assert [r.id for r in out] == [2]


def test_asof_null_keys_never_match(spark):
    """DuckDB ASOF / pandas merge_asof semantics: a NULL key (or NULL ts)
    matches nothing — without the guard, Window.partitionBy groups NULL
    keys into one real partition and they match each other."""
    left = spark.createDataFrame(
        [(1, None, 10), (2, 7, 10), (3, 7, None)],
        "id int, k int, ts int")
    right = spark.createDataFrame(
        [(None, 5, "nullkey"), (7, 5, "real"), (7, None, "nullts")],
        "k int, ts int, tag string")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["tag"])
    by_id = {r.id: r.tag for r in out.collect()}
    assert by_id == {1: None, 2: "real", 3: None}
    inner = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      payload=["tag"], how="inner").collect()
    assert [r.id for r in inner] == [2]
    # bucketed variant: identical semantics
    from nf2pq_spark.operators.asof import asof_join_bucketed

    outb = asof_join_bucketed(left, right, on="k", left_ts="ts",
                              right_ts="ts", payload=["tag"], bucket=100)
    assert {r.id: r.tag for r in outb.collect()} == {1: None, 2: "real",
                                                     3: None}


def test_asof_rejects_unknown_how(spark):
    """A typo'd how= must raise, not silently behave as 'left'."""
    import pytest

    from nf2pq_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame([(1, 1)], "k int, ts int")
    right = spark.createDataFrame([(1, 1, "x")], "k int, ts int, tag string")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  payload=["tag"], how="innre")
    with pytest.raises(ValueError, match="how"):
        asof_join_bucketed(left, right, on="k", left_ts="ts", right_ts="ts",
                           payload=["tag"], how="right", bucket=10)


def test_zero_norm_vector_does_not_kill_topk(spark):
    """One zero embedding in the corpus must not DIVIDE_BY_ZERO the whole
    job under ANSI mode; its NULL cosine ranks last and never enters the
    top-k."""
    qs = spark.createDataFrame([(0, [1.0, 0.0])], ["q_id", "qv"])
    cs = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        ["c_id", "cv"])
    out = brute_force_topk(qs, cs, k=2).collect()
    assert [r.c_id for r in sorted(out, key=lambda r: r.rn)] == [3, 1]


def test_ipv4_malformed_yields_null(spark):
    """Malformed addresses decode to NULL, not an ANSI job abort."""
    from nf2pq_spark.functions.flownet import ipv4_to_long

    df = spark.createDataFrame(
        [("1.2.3.4",), ("1.2.3",), ("1.2.3.x",), ("999.1.1.1",),
         ("1.2.3.4.5",), (None,)], ["ip"])
    vals = [r.v for r in df.select(ipv4_to_long(F.col("ip")).alias("v"))
            .collect()]
    assert vals == [16909060, None, None, None, None, None]


def test_srp_dim_mismatch_raises_not_bucket0(spark):
    """A wrong dim= must fail loudly — the silent alternative put every
    vector in bucket 0 and degraded LSH to a full cross join. A NULL
    vector buckets to NULL (drops) instead of raising."""
    import pytest

    from nf2pq_spark.operators.similarity import hyperplanes, srp_bucket

    planes = hyperplanes(4, 2)
    bad = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "v"])  # 2-d vs 4
    with pytest.raises(Exception, match="srp_bucket"):
        bad.select(srp_bucket(F.col("v"), planes).alias("b")).collect()
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None)],
        "id int, v array<double>")
    rows = ok.select("id", srp_bucket(F.col("v"), planes).alias("b")).collect()
    got = {r.id: r.b for r in rows}
    assert got[1] is not None and got[2] is None
    # a vector CONTAINING a NULL element degrades like a wholly-NULL
    # vector (bucket NULL, row drops) — it must NOT abort the job with
    # the dim-mismatch error (r4 advice: one bad record killed the job)
    mixed = spark.createDataFrame(
        [(1, [1.0, None, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "id int, v array<double>")
    got = {r.id: r.b for r in
           mixed.select("id", srp_bucket(F.col("v"), planes).alias("b"))
                .collect()}
    assert got[1] is None and got[2] is not None


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [1, 3]  # case-normalized dup collapses to min id


def test_v5_vectorized_decode_equals_scalar():
    """The numpy v5 fast path produces exactly the scalar reference
    decoder's rows (same values, same order within a datagram)."""
    from nf2pq_spark.sources.ipfix import (_decode_v5, _decode_v5_array,
                                           _v5_frame, encode_netflow_v5)

    flows = [
        {"sa_int": (7 * i) % (1 << 32), "da_int": (11 * i + 3) % (1 << 32),
         "ipkt": i % 1000, "ibyt": i * 13 % (1 << 30), "ts_ms": i * 17,
         "te_ms": i * 17 + 5, "sp": i % 65536, "dp": (i * 3) % 65536,
         "flg": i % 64, "pr": i % 256, "sas": i % 70000, "das": (i * 7) % 70000}
        for i in range(95)
    ]
    for dgram in encode_netflow_v5(flows, per_packet=30):
        scalar = _decode_v5(dgram, "exp")
        fast = _v5_frame([_decode_v5_array(dgram)], ["exp"])
        assert [tuple(r) for r in fast.itertuples(index=False)] == scalar


def test_cms_top_talkers_planted_skew(spark):
    """Planted heavy hitter (30% of rows) tops the CMS estimate list, and
    estimates bound the true counts from above by at most eps*N."""
    from pyspark.sql import functions as F

    from nf2pq_spark.operators.sketch import top_talkers_cms

    n = 20000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(0))      # key 0: 30%
        .when(F.col("id") % 10 < 5, F.lit(1))       # key 1: 20%
        .otherwise(F.col("id") % 500 + 2).alias("k")
    )
    top = top_talkers_cms(df, "k", k=5, eps=0.005)
    keys = [t[0] for t in top]
    assert keys[0] == 0 and keys[1] == 1
    true0 = df.filter(F.col("k") == 0).count()
    assert true0 <= top[0][1] <= true0 + 0.005 * n


def test_connected_components_known_graph(spark):
    """Chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    triangle 10-11-12, isolated pair 20-21."""
    from nf2pq_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "u long, v long",
    )
    got = {r.n: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_lsh_finds_planted_neardup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this document about spark engines ok"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    pairs = lsh_candidate_pairs(df, n_bands=4).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in pairs}
    verified = jaccard_pairs(df, lsh_candidate_pairs(df, n_bands=4), threshold=0.5)
    rows = verified.collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    assert all(r.jaccard > 0.5 for r in rows)


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """1 000 identical docs land in ONE band bucket; uncapped LSH would
    emit ~500k candidate pairs (quadratic). The max_bucket guard drops the
    hot bucket — identical content is exact_dedup's job — while genuinely
    near-dup pairs in normal-size buckets survive."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    boiler = "all rights reserved this page uses cookies accept to continue now"
    rows = [(i, boiler) for i in range(1000)]
    rows += [(2001, base), (2002, near)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = lsh_candidate_pairs(df, n_bands=4, max_bucket=100)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # bounded: no quadratic boilerplate pairs, planted near-dup survives
    assert (2001, 2002) in got
    assert len(got) <= 10, f"hot bucket leaked {len(got)} pairs"

    # sanity: uncapped on a SMALL degenerate corpus is quadratic, so the
    # cap is doing real work (50 identical docs -> C(50,2) pairs)
    small = spark.createDataFrame(
        [(i, boiler) for i in range(50)], ["doc_id", "text"])
    assert lsh_candidate_pairs(small, n_bands=1, max_bucket=None).count() == 1225
    assert lsh_candidate_pairs(small, n_bands=1, max_bucket=10).count() == 0


def test_l2d_oracle_parity_with_cap_engaged(spark, tmp_path):
    """r6: the hot-bucket cap is now MIRRORED in the l2b/l2d/l2e oracles
    (the l25 standard) — before, a corpus with a >1000-member band
    bucket made Spark drop the bucket's candidates while the oracle's
    recursive CTE kept them, a latent hash divergence the graded
    fixtures (peak bucket ~21) could never expose. Cross-engine parity
    with the guard actually ENGAGED: 1100 identical boilerplate docs
    (one giant bucket in BOTH bands, over cap on both engines) plus a
    planted near-dup cluster that must still pair."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nf2pq_spark import plans
    from tests.test_correctness import assert_frames_match

    boiler = ("all rights reserved this page uses cookies accept to "
              "continue now")
    base = ("the quick brown fox jumps over the lazy dog again and "
            "again today")
    rows = [(i, boiler, "en", "web", len(boiler)) for i in range(1100)]
    rows += [(2001, base, "en", "web", len(base)),
             (2002, base.replace("today", "tomorrow"), "en", "web", 60),
             (3001, "completely different words in this document about "
                    "spark engines ok", "en", "web", 60)]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    for name in ("l2d_neardup_components", "l2e_neardup_dedup_keep"):
        spec = plans.REGISTRY[name]
        spark_pdf = spec.fn(spark, str(tmp_path)).toPandas()
        duck_pdf = con.execute(spec.oracle).fetchdf()
        assert_frames_match(spark_pdf, duck_pdf, f"{name}@cap-engaged")
    # non-vacuous on both sides: the planted pair formed a component
    # (the boilerplate blob did NOT — its bucket is over cap)
    comp = plans.REGISTRY["l2d_neardup_components"].fn(
        spark, str(tmp_path)).collect()
    assert {(r.component, r.n_docs) for r in comp} == {(2001, 2)}


def test_brute_force_topk_known_vectors(spark):
    qs = spark.createDataFrame([(0, [1.0, 0.0])], ["q_id", "qv"])
    cs = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.0]), (0, [1.0, 0.0])],
        ["c_id", "cv"],
    )
    out = brute_force_topk(qs, cs, k=2).collect()
    assert [r.c_id for r in sorted(out, key=lambda r: r.rn)] == [3, 1]
    assert all(r.c_id != 0 for r in out)  # self excluded


def test_lsh_topk_recall(spark, sf_dir):
    from nf2pq_spark.functions.vectors import as_double_array
    from nf2pq_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv"))
    c = e.select(F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("cv"))
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(q, c, k=5).collect()}
    approx = {(r.q_id, r.c_id) for r in lsh_topk(q, c, k=5, bits=2).collect()}
    # SRP-LSH with 2 bits keeps ~1/4 of candidates; recall must be well
    # above random (same-bucket vectors are the similar ones by design)
    assert len(approx & exact) / len(exact) >= 0.3


def test_asof_matches_pandas_merge_asof(spark):
    """Property-based cross-check: our distributed as-of join agrees with
    pandas.merge_asof on randomized inputs (keys, duplicate-free ts)."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        lts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                     min_size=1, max_size=25, unique=True),
        rts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                     min_size=1, max_size=25, unique=True),
    )
    def check(lts, rts):
        lpdf = pd.DataFrame(lts, columns=["k", "ts"]).drop_duplicates(["k", "ts"])
        rpdf = (pd.DataFrame(rts, columns=["k", "ts"])
                .drop_duplicates(["k", "ts"]).assign(payload=lambda d: d.ts * 10))
        left = spark.createDataFrame(lpdf.assign(lid=range(len(lpdf))))
        right = spark.createDataFrame(rpdf)
        got = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                        payload=["payload"]).toPandas()
        expect = pd.merge_asof(
            lpdf.assign(lid=range(len(lpdf))).sort_values("ts"),
            rpdf.sort_values("ts"), on="ts", by="k", direction="backward")
        g = got.sort_values("lid")["payload"].astype("float").reset_index(drop=True)
        x = expect.sort_values("lid")["payload"].astype("float").reset_index(drop=True)
        assert g.where(g.notna(), -1).tolist() == x.where(x.notna(), -1).tolist()

    check()


def test_cosine_identities(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [3.0, 0.0, -1.0])],
                               ["a", "b", "c"])
    r = df.select(
        vectors.cosine(F.col("a"), F.col("b")).alias("same"),
        vectors.dot(F.col("a"), F.col("c")).alias("dot_ac"),
    ).first()
    assert abs(r.same - 1.0) < 1e-12
    assert r.dot_ac == 0.0  # 1*3 + 2*0 + 3*(-1)


def test_partial_aggregation_in_plan(spark, sf_dir):
    """A11: verify Spark plans two-phase aggregation (map-side partial)."""
    from nf2pq_spark.sources.tables import load_table

    df = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_returnflag").agg(F.sum("l_quantity")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_broadcast_in_star_join_plan(spark, sf_dir):
    from nf2pq_spark import plans

    df = plans.REGISTRY["j5_star_broadcast"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ipfix_ipv6_template_decode(spark, tmp_path):
    """Dual-stack IPFIX: a v6 template (IEs 27/28, 16-byte addresses)
    decodes to canonical compressed IPv6 text."""
    import ipaddress

    from nf2pq_spark.sources.ipfix import (encode_ipfix, read_flow_files,
                                           write_capture_file)

    flows = [
        {"sa6": ipaddress.IPv6Address(f"2001:db8::{i:x}").packed,
         "da6": ipaddress.IPv6Address("fe80::1").packed,
         "sp": 1000 + i, "dp": 443, "pr": 6, "flg": 16,
         "ipkt": 10, "ibyt": 1000, "ts_ms": 1704067200000 + i,
         "te_ms": 1704067201000 + i, "sas": 1, "das": 2}
        for i in range(8)
    ]
    v6_fields = [(27, 16), (28, 16), (7, 2), (11, 2), (4, 1), (6, 1),
                 (2, 4), (1, 4), (152, 8), (153, 8)]
    dgrams = encode_ipfix(flows, template_fields=v6_fields, template_id=300)
    out = str(tmp_path / "v6caps")
    import os
    os.makedirs(out)
    write_capture_file(os.path.join(out, "cap_0.bin"), dgrams)
    decoded = read_flow_files(spark, out).collect()
    assert len(decoded) == 8
    assert {r.sa for r in decoded} == {
        str(ipaddress.IPv6Address(f"2001:db8::{i:x}")) for i in range(8)}
    assert all(r.da == "fe80::1" and r.dp == 443 for r in decoded)


def test_ivf_topk_recall(spark, sf_dir):
    from nf2pq_spark.functions.vectors import as_double_array
    from nf2pq_spark.operators.similarity import ivf_topk
    from nf2pq_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv"))
    c = e.select(F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("cv"))
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(q, c, k=5).collect()}
    approx_rows = ivf_topk(q, c, k=5, n_cells=8, n_probe=3).collect()
    approx = {(r.q_id, r.c_id) for r in approx_rows}
    assert len(approx_rows) == 25  # 5 per query — probed cells have depth
    assert len(approx & exact) / len(exact) >= 0.4


def test_decoder_drops_truncated_datagrams(spark, tmp_path):
    """Malformed/truncated datagrams are dropped per-packet, never failing
    the scan (collector semantics)."""
    import os

    from nf2pq_spark.sources.ipfix import (encode_netflow_v5, read_flow_files,
                                           write_capture_file)

    flows = [{"sa_int": 1, "da_int": 2, "sp": 1, "dp": 2, "pr": 6, "flg": 0,
              "ipkt": 1, "ibyt": 10, "ts_ms": 0, "te_ms": 1,
              "sas": 0, "das": 0} for _ in range(35)]
    good = encode_netflow_v5(flows)          # 2 datagrams (30 + 5)
    truncated = good[0][:40]                 # header claims 30 recs, cut mid-record
    garbage = b"\x00\x05" + b"\xff" * 10     # v5 version then junk
    out = str(tmp_path / "caps")
    os.makedirs(out)
    write_capture_file(os.path.join(out, "cap.bin"),
                       [good[0], truncated, garbage, good[1]])
    assert read_flow_files(spark, out).count() == 35  # both intact dgrams only


def test_v9_template_in_separate_file(spark, tmp_path):
    """NetFlow v9 (RFC 3954): data FlowSets landing in a different file
    (→ potentially a different scan partition) than their template FlowSet
    still decode — the two-phase harvest removes ordering assumptions —
    and FIRST/LAST_SWITCHED uptime arithmetic reconstructs absolute ms."""
    import os

    from nf2pq_spark.sources.ipfix import (encode_netflow_v9, read_flow_files,
                                           write_capture_file)

    flows = [{"sa_int": (10 << 24) + i, "da_int": (20 << 24) + i,
              "sp": 1000 + i, "dp": 53, "pr": 17, "flg": 0,
              "ipkt": 5, "ibyt": 512, "ts_ms": 7_000_000 + i,
              "te_ms": 7_001_000 + i, "sas": 64500, "das": 64501}
             for i in range(45)]
    # one template packet (first), then data-only packets
    dgrams = encode_netflow_v9(flows, per_packet=30, template_every=1000)
    assert len(dgrams) == 2
    out = str(tmp_path / "v9caps")
    os.makedirs(out)
    # data-only packet written FIRST, template-bearing packet elsewhere
    write_capture_file(os.path.join(out, "cap_data.bin"), [dgrams[1]])
    write_capture_file(os.path.join(out, "cap_tmpl.bin"), [dgrams[0]])
    decoded = read_flow_files(spark, out).orderBy("sp").collect()
    assert len(decoded) == 45
    assert decoded[0].ts_ms == 7_000_000 and decoded[0].te_ms == 7_001_000
    assert decoded[0].sa == "10.0.0.0" and decoded[0].dp == 53
    assert decoded[44].sas == 64500 and decoded[44].pr == 17


def test_capture_datasource_partition_per_file(spark, tmp_path):
    """The nfcapture Python DataSource plans one input partition per
    capture file and its decode agrees with the binaryFile two-phase path."""
    import os

    from nf2pq_spark.sources.datasource import register_capture_source
    from nf2pq_spark.sources.ipfix import (encode_netflow_v9, read_flow_files,
                                           write_capture_file)

    flows = [{"sa_int": (10 << 24) + i, "da_int": (20 << 24), "sp": i,
              "dp": 443, "pr": 6, "flg": 16, "ipkt": 2, "ibyt": 80,
              "ts_ms": 1_000_000 + i, "te_ms": 1_000_500 + i,
              "sas": 1, "das": 2} for i in range(120)]
    dgrams = encode_netflow_v9(flows, per_packet=30, template_every=1)
    out = str(tmp_path / "caps")
    os.makedirs(out)
    for i, d in enumerate(dgrams):  # one datagram per file → 4 files
        write_capture_file(os.path.join(out, f"cap_{i}.bin"), [d])

    register_capture_source(spark)
    ds = spark.read.format("nfcapture").load(out)
    assert ds.rdd.getNumPartitions() == 4
    via_ds = {(r.sp, r.ts_ms) for r in ds.collect()}
    via_files = {(r.sp, r.ts_ms) for r in read_flow_files(spark, out).collect()}
    assert via_ds == via_files and len(via_ds) == 120


def test_ipv4_cidr_property_vs_stdlib(spark):
    """Property: in_cidr / ipv4_to_long agree with the stdlib ipaddress
    module on random addresses x random prefixes (the IPv4 sibling of the
    v6 property test above)."""
    import ipaddress

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.functions.flownet import in_cidr, ipv4_to_long

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(0, 2**32 - 1),
           st.integers(0, 32))
    def check(a, n, bits):
        ip = str(ipaddress.IPv4Address(a))
        net = ipaddress.IPv4Network((n, bits), strict=False)
        cidr = str(net)
        row = (spark.range(1)
               .select(ipv4_to_long(F.lit(ip)).alias("v"),
                       in_cidr(F.lit(ip), cidr).alias("m"))
               .collect()[0])
        assert row.v == a
        assert row.m == (ipaddress.IPv4Address(a) in net)

    check()


def test_templated_vectorized_decode_equals_scalar():
    """The template-derived-dtype fast path produces exactly the scalar
    reference decode for IPFIX (v4 + v6 templates) and NetFlow v9."""
    from nf2pq_spark.sources.ipfix import (_decode_ipfix, _decode_v9,
                                           _decode_templated_vec,
                                           _VecAccumulator,
                                           encode_ipfix, encode_netflow_v9)
    import ipaddress

    flows = [{"sa_int": (10 << 24) + i, "da_int": (20 << 24) + 2 * i,
              "sp": i, "dp": 443 + i, "pr": 6 if i % 2 else 17,
              "flg": i % 64, "ipkt": i + 1, "ibyt": 40 + i,
              "ts_ms": 1_000_000 + i, "te_ms": 1_000_500 + i,
              "sas": i, "das": 2 * i,
              "sa6": ipaddress.IPv6Address(f"2001:db8::{i + 1:x}").packed,
              "da6": ipaddress.IPv6Address("fe80::1").packed}
             for i in range(64)]
    v6_fields = [(27, 16), (28, 16), (7, 2), (11, 2), (4, 1), (6, 1),
                 (2, 4), (1, 4), (152, 8), (153, 8)]
    cases = (
        list(encode_ipfix(flows)) +
        list(encode_ipfix(flows, template_fields=v6_fields, template_id=301)) +
        list(encode_netflow_v9(flows))
    )
    for dgram in cases:
        t_scalar, t_vec = {}, {}
        import struct
        version = struct.unpack_from(">H", dgram, 0)[0]
        scalar_fn = _decode_v9 if version == 9 else _decode_ipfix
        rows = scalar_fn(dgram, "exp", t_scalar)
        acc = _VecAccumulator()
        frames = _decode_templated_vec(dgram, "exp", t_vec, acc)
        frames.extend(acc.frames())
        got = [tuple(r) for f in frames for r in f.itertuples(index=False)]
        assert sorted(tuple(r) for r in rows) == sorted(got)
        assert t_scalar == t_vec


def test_observe_metrics_single_pass(spark, sf_dir, duck):
    """operators.monitor: quality metrics ride along with the real action —
    one scan, no extra job — and agree with a direct aggregate."""
    from nf2pq_spark.operators.monitor import run_with_metrics
    from nf2pq_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    m = run_with_metrics(ev)
    n, vmin, vmax = duck.execute(
        "SELECT COUNT(*), MIN(value), MAX(value) FROM events").fetchone()
    assert m["n_rows"] == n
    assert m["nulls_event_id"] == 0
    assert m["min_value"] == vmin and m["max_value"] == vmax


def test_capture_datasource_streaming(spark, tmp_path):
    """The nfcapture source also works under readStream: availableNow
    drains existing files; a restart from the same checkpoint consumes
    ONLY files that arrived while the query was down (offset = file-list
    prefix length)."""
    import os
    import tempfile

    from nf2pq_spark.sources.datasource import register_capture_source
    from nf2pq_spark.sources.ipfix import encode_netflow_v5, write_capture_file

    def mkflows(lo, n):
        return [{"sa_int": (10 << 24) + i, "da_int": (20 << 24), "sp": i,
                 "dp": 443, "pr": 6, "flg": 16, "ipkt": 2, "ibyt": 80,
                 "ts_ms": 1_000_000 + i, "te_ms": 1_000_500 + i,
                 "sas": 1, "das": 2} for i in range(lo, lo + n)]

    out = str(tmp_path / "caps")
    os.makedirs(out)
    for i, d in enumerate(encode_netflow_v5(mkflows(0, 60), per_packet=20)):
        write_capture_file(os.path.join(out, f"cap_a{i}.bin"), [d])

    register_capture_source(spark)
    sink = str(tmp_path / "sink")
    ckpt = tempfile.mkdtemp(prefix="nfcap_ckpt_")

    def drain():
        q = (spark.readStream.format("nfcapture").load(out)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 60

    # late rotation files land while the query is down; restart resumes
    # from the committed file-count offset
    for i, d in enumerate(encode_netflow_v5(mkflows(60, 40), per_packet=20)):
        write_capture_file(os.path.join(out, f"cap_b{i}.bin"), [d])
    drain()

    got = spark.read.parquet(sink)
    assert got.count() == 100
    assert got.select("sp").distinct().count() == 100  # exactly-once
    batch = spark.read.format("nfcapture").load(out)
    assert {r.sp for r in got.collect()} == {r.sp for r in batch.collect()}


def test_capture_stream_offset_monotonicity(tmp_path):
    """The nfcapture stream offset records the last consumed filename and
    partitions() fails LOUDLY if a newly arrived file sorts before it —
    silent offset remapping would break exactly-once (r1 advice)."""
    import pytest

    from nf2pq_spark.sources.datasource import CaptureStreamReader

    d = tmp_path / "caps"
    d.mkdir()
    (d / "cap_00000.bin").write_bytes(b"x")
    (d / "cap_00001.bin").write_bytes(b"x")
    r = CaptureStreamReader({"path": str(d)})
    off0, off1 = r.initialOffset(), r.latestOffset()
    assert off1["n_files"] == 2 and off1["last"].endswith("cap_00001.bin")
    assert len(r.partitions(off0, off1)) == 2

    # well-behaved arrival: sorts after the committed prefix
    (d / "cap_00002.bin").write_bytes(b"x")
    off2 = r.latestOffset()
    parts = r.partitions(off1, off2)
    assert [p.value for p in parts] == [str(d / "cap_00002.bin")]

    # misbehaving arrival: sorts BETWEEN committed files
    (d / "cap_00000a.bin").write_bytes(b"x")
    off3 = r.latestOffset()
    with pytest.raises(RuntimeError, match="non-monotonic"):
        r.partitions(off2, off3)

    # pre-upgrade checkpoint offsets (no 'last') still plan
    assert r.partitions({"n_files": 0}, {"n_files": 2})


def test_asof_bucketed_equals_plain(spark):
    """Property: the skew-resilient segmented-scan as-of is semantically
    identical to the plain one-window formulation — including buckets with
    no right rows (carry-in crosses bucket gaps) and NULL payloads."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.operators.asof import asof_join, asof_join_bucketed

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 2), st.integers(-100, 100)),
                    min_size=1, max_size=15),
           st.lists(st.tuples(st.integers(0, 2), st.integers(-100, 100)),
                    min_size=0, max_size=15),
           st.sampled_from([3, 10, 1000]))
    def check(left_rows, right_rows, width):
        lpdf = pd.DataFrame(left_rows, columns=["k", "ts"])
        lpdf["id"] = range(len(lpdf))
        rpdf = (pd.DataFrame(right_rows, columns=["k", "ts"])
                .drop_duplicates(["k", "ts"]).reset_index(drop=True))
        rpdf["v"] = rpdf["k"] * 1000 + rpdf["ts"]
        left = spark.createDataFrame(lpdf[["id", "k", "ts"]],
                                     schema="id long, k long, ts long")
        right = spark.createDataFrame(rpdf[["k", "ts", "v"]],
                                      schema="k long, ts long, v long")
        for how in ("left", "inner"):
            plain = asof_join(left, right, on="k", left_ts="ts",
                              right_ts="ts", payload=["v"], how=how)
            buck = asof_join_bucketed(left, right, on="k", left_ts="ts",
                                      right_ts="ts", payload=["v"], how=how,
                                      bucket=width)
            p = {(r["id"], r["v"]) for r in plain.collect()}
            b = {(r["id"], r["v"]) for r in buck.collect()}
            assert p == b, (how, width, left_rows, right_rows)

    check()


def test_observe_metrics_streaming(spark, sf_dir):
    """operators.monitor under a real stream: per-micro-batch quality
    metrics surface in StreamingQueryProgress.observedMetrics."""
    import tempfile

    from nf2pq_spark.operators.monitor import monitored
    from nf2pq_spark.sources.tables import load_table
    from nf2pq_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, sf_dir).select("event_id", "value")
    mdf, name = monitored(stream)
    assert isinstance(name, str)
    ckpt = tempfile.mkdtemp(prefix="obs_ckpt_")
    q = (mdf.writeStream.format("noop")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = 0
    for p in q.recentProgress:
        if hasattr(p, "asDict"):
            p = p.asDict(True)
        metrics = p.get("observedMetrics", {}).get(name)
        if metrics:
            rows += metrics["n_rows"]
    assert rows == load_table(spark, sf_dir, "events").count()


def test_asof_property_vs_pandas(spark):
    """Property: asof_join (both directions) agrees with pandas merge_asof
    on random per-key series — including exact-tie, no-match, and
    NULL-payload edges (a matching right row whose payload is null must be
    carried as null, not skipped for a farther non-null row; how='inner'
    must still classify it as matched)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.operators.asof import asof_join

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                    min_size=1, max_size=12),
           st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                    min_size=0, max_size=12))
    def check(left_rows, right_rows):
        lpdf = pd.DataFrame(left_rows, columns=["k", "ts"])
        lpdf["id"] = range(len(lpdf))
        # right (k, ts) must be unique: tie order among equal keys is
        # undefined in both engines
        rpdf = (pd.DataFrame(right_rows, columns=["k", "ts"])
                .drop_duplicates(["k", "ts"]).reset_index(drop=True)
                .astype({"k": "int64", "ts": "int64"}))
        # every 3rd right row carries a NULL payload value
        rpdf["v"] = (rpdf["k"] * 1000 + rpdf["ts"]).astype("Int64")
        rpdf.loc[rpdf.index % 3 == 0, "v"] = None
        rpdf["rid"] = range(len(rpdf))
        left = spark.createDataFrame(lpdf[["id", "k", "ts"]])
        right = spark.createDataFrame(
            [(int(r.k), int(r.ts), None if pd.isna(r.v) else int(r.v),
              int(r.rid)) for r in rpdf.itertuples()],
            schema="k long, ts long, v long, rid long")
        for direction in ("backward", "forward"):
            got = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                            payload=["v", "rid"], how="left",
                            direction=direction).collect()
            got_map = {r["id"]: (r["v"], r["rid"]) for r in got}
            exp = pd.merge_asof(
                lpdf.sort_values("ts"), rpdf.sort_values("ts"),
                on="ts", by="k", direction=direction)
            exp_map = {int(r.id): (None if pd.isna(r.v) else int(r.v),
                                   None if pd.isna(r.rid) else int(r.rid))
                       for r in exp.itertuples()}
            assert got_map == exp_map, (direction, left_rows, right_rows)
            # inner keeps exactly the rows a right ROW matched — including
            # matches whose payload value is null
            inner_ids = {
                r["id"] for r in asof_join(
                    left, right, on="k", left_ts="ts", right_ts="ts",
                    payload=["v", "rid"], how="inner",
                    direction=direction).collect()}
            exp_inner = {i for i, (_, rid) in exp_map.items()
                         if rid is not None}
            assert inner_ids == exp_inner, (direction, left_rows, right_rows)

    check()


def test_bucketed_range_join_property_vs_bruteforce(spark):
    """Property: bucketed_range_join equals the brute-force range join for
    random points/intervals across bucket widths — including intervals
    spanning many buckets, empty intervals, and bucket-boundary hits."""
    from datetime import datetime, timedelta

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.operators.rangejoin import bucketed_range_join

    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.integers(0, 7200), min_size=1, max_size=15),
           st.lists(st.tuples(st.integers(0, 7200), st.integers(0, 7200)),
                    min_size=1, max_size=10),
           st.sampled_from([60, 600, 3600]))
    def check(point_secs, iv_secs, bucket_seconds):
        base = datetime(2024, 1, 1)
        pts = spark.createDataFrame(
            [(i, base + timedelta(seconds=s))
             for i, s in enumerate(point_secs)], "p_id long, ts timestamp")
        ivs = spark.createDataFrame(
            [(i, base + timedelta(seconds=a), base + timedelta(seconds=b))
             for i, (a, b) in enumerate(iv_secs)],
            "i_id long, lo timestamp, hi timestamp")
        got = {(r.p_id, r.i_id) for r in bucketed_range_join(
            pts, ivs, "ts", "lo", "hi", bucket_seconds=bucket_seconds
        ).select("p_id", "i_id").collect()}
        want = {(p, i) for p, s in enumerate(point_secs)
                for i, (a, b) in enumerate(iv_secs) if a <= s < b}
        assert got == want, (bucket_seconds, point_secs, iv_secs)

    check()


def test_capture_stream_writer_abort_cleans_batch(tmp_path):
    """CaptureStreamWriter.abort must drop exactly the aborted batch's
    files (a retried batch then rewrites deterministic names cleanly),
    leaving other batches untouched."""
    from nf2pq_spark.sources.datasource import CaptureStreamWriter

    d = tmp_path / "caps"
    d.mkdir()
    (d / "cap_b0000000000_p00000.bin").write_bytes(b"x")
    (d / "cap_b0000000001_p00000.bin").write_bytes(b"x")
    (d / "cap_b0000000001_p00001.bin").write_bytes(b"x")
    w = CaptureStreamWriter({"path": str(d)})
    w.abort([], 1)
    left = sorted(f.name for f in d.iterdir())
    assert left == ["cap_b0000000000_p00000.bin"]
    # commit's batch-wide sweep keeps exactly what the tasks reported:
    # re-committing batch 0 with a message naming the surviving file
    # leaves it; other batches are never touched
    from nf2pq_spark.sources.datasource import _CapCommitMessage
    w.commit([_CapCommitMessage("cap_b0000000000_p00000.bin")], 0)
    assert (d / "_committed_0").exists()
    assert (d / "cap_b0000000000_p00000.bin").exists()


def test_capture_stream_writer_commit_sweeps_shrunk_replay(tmp_path):
    """r5 advice: a checkpointed batch replayed across the padding upgrade
    with FEWER partitions than the original run leaves higher-numbered
    legacy files that no current task's (batch, partition)-scoped healing
    covers — commit must sweep the whole batch pattern, keeping only the
    files the current run's tasks reported."""
    from nf2pq_spark.sources.datasource import (CaptureStreamWriter,
                                                _CapCommitMessage)

    d = tmp_path / "caps"
    d.mkdir()
    # original (pre-upgrade, 3-partition) run of batch 7
    (d / "cap_b7_p0.bin").write_bytes(b"x")
    (d / "cap_b7_p1.bin").write_bytes(b"x")
    (d / "cap_b7_p2.bin").write_bytes(b"x")
    # a stale PADDED file from a wider earlier padded attempt too
    (d / "cap_b0000000007_p00009.bin").write_bytes(b"x")
    # neighbor batches must survive (b70 especially: prefix collision)
    (d / "cap_b70_p0.bin").write_bytes(b"x")
    (d / "cap_b0000000006_p00000.bin").write_bytes(b"x")
    # replay of batch 7 with only 2 partitions writes padded names; the
    # per-task healing replaced p0/p1's legacy files, p2's survives
    (d / "cap_b0000000007_p00000.bin").write_bytes(b"y")
    (d / "cap_b0000000007_p00001.bin").write_bytes(b"y")
    w = CaptureStreamWriter({"path": str(d)})
    w.commit([_CapCommitMessage("cap_b0000000007_p00000.bin"),
              _CapCommitMessage("cap_b0000000007_p00001.bin"),
              _CapCommitMessage(None)], 7)  # an empty partition's message
    left = sorted(f.name for f in d.iterdir())
    assert left == ["_committed_7",
                    "cap_b0000000006_p00000.bin",
                    "cap_b0000000007_p00000.bin",
                    "cap_b0000000007_p00001.bin",
                    "cap_b70_p0.bin"]


def test_capture_stream_writer_heals_legacy_unpadded_names(tmp_path):
    """r4 advice: a checkpointed stream resumed across the padding
    upgrade replays batch N as cap_b000000000N_* alongside surviving
    legacy cap_bN_* files — abort (and the write-side replacement
    regex) must match BOTH schemes or the batch double-counts on read;
    batch 1's pattern must not swallow batch 10."""
    from nf2pq_spark.sources.datasource import (CaptureStreamWriter,
                                                _cap_name_re)

    d = tmp_path / "caps"
    d.mkdir()
    (d / "cap_b1_p0.bin").write_bytes(b"x")              # legacy scheme
    (d / "cap_b0000000001_p00000.bin").write_bytes(b"x")  # padded replay
    (d / "cap_b10_p0.bin").write_bytes(b"x")             # different batch
    w = CaptureStreamWriter({"path": str(d)})
    w.abort([], 1)
    assert sorted(f.name for f in d.iterdir()) == ["cap_b10_p0.bin"]
    # the per-(batch, partition) replacement regex the write path uses
    pat = _cap_name_re(1, 0)
    assert pat.match("cap_b1_p0.bin") and \
        pat.match("cap_b0000000001_p00000.bin")
    assert not pat.match("cap_b10_p0.bin") and \
        not pat.match("cap_b1_p00001.bin")


def test_capture_writer_append_jobs_do_not_clobber(tmp_path):
    """Two separate append WRITE JOBS into one directory must accumulate
    (per-job uuid names), while a retried task within one job replaces its
    own file (same uuid + pid); overwrite commit clears other jobs' files
    and abort drops only this job's output."""
    from nf2pq_spark.sources.datasource import CaptureWriter
    from nf2pq_spark.sources.ipfix import write_capture_file

    d = tmp_path / "caps"
    d.mkdir()
    w1 = CaptureWriter({"path": str(d)}, overwrite=False)
    w2 = CaptureWriter({"path": str(d)}, overwrite=False)
    assert w1.job_uuid != w2.job_uuid
    # simulate the executor-side naming for two jobs + a task retry
    for w, pid in ((w1, 0), (w1, 0), (w1, 1), (w2, 0)):
        write_capture_file(
            str(d / f"cap_w_{w.job_uuid}_{pid:05d}.bin"), [b"\x00" * 24])
    assert len(list(d.glob("*.bin"))) == 3  # retry replaced, jobs distinct

    # overwrite job: commit clears every file that isn't its own
    w3 = CaptureWriter({"path": str(d)}, overwrite=True)
    write_capture_file(
        str(d / f"cap_w_{w3.job_uuid}_00000.bin"), [b"\x00" * 24])
    w3.commit([])
    left = sorted(f.name for f in d.glob("*.bin"))
    assert left == [f"cap_w_{w3.job_uuid}_00000.bin"]

    # abort drops only the aborting job's files
    w4 = CaptureWriter({"path": str(d)}, overwrite=False)
    write_capture_file(
        str(d / f"cap_w_{w4.job_uuid}_00000.bin"), [b"\x00" * 24])
    w4.abort([])
    assert sorted(f.name for f in d.glob("*.bin")) == left


def test_uncommitted_batch_writer_files_are_invisible(tmp_path):
    """A batch write job whose driver died before commit/abort leaves
    cap_w files but no _committed_<jobid> marker — the reader must skip
    them (a rerun draws a new job id, so they'd double-count flows).
    Stream-sink files (cap_b*, deterministic replay names) and bridge/
    hand-written captures are always listed."""
    from nf2pq_spark.sources.datasource import CaptureWriter, _list_capture_files
    from nf2pq_spark.sources.ipfix import write_capture_file

    d = tmp_path / "caps"
    d.mkdir()
    w = CaptureWriter({"path": str(d)}, overwrite=False)
    write_capture_file(str(d / f"cap_w_{w.job_uuid}_00000.bin"), [b"\x00" * 24])
    write_capture_file(str(d / "cap_b0_p00000.bin"), [b"\x00" * 24])
    write_capture_file(str(d / "rotated_000001.bin"), [b"\x00" * 24])
    names = [f.rsplit("/", 1)[1] for f in _list_capture_files(str(d))]
    assert names == ["cap_b0_p00000.bin", "rotated_000001.bin"]
    w.commit([])  # publishes the marker
    names = [f.rsplit("/", 1)[1] for f in _list_capture_files(str(d))]
    assert sorted(names) == sorted(
        [f"cap_w_{w.job_uuid}_00000.bin", "cap_b0_p00000.bin",
         "rotated_000001.bin"])


def test_merge_template_rows_latest_announcement_wins():
    """An exporter re-announcing a template with a NEW layout mid-capture
    must win the seed cache (collector semantics: re-announcement
    withdraws the old definition) — regardless of how often the stale
    layout was announced or the order rows arrive in."""
    from collections import namedtuple

    from nf2pq_spark.sources.ipfix import _merge_template_rows

    Row = namedtuple("Row", "exporter tid sig src seq")
    old, new = "8:4|12:4", "8:4|12:4|2:8"
    rows = [
        Row("e1", 256, old, "/caps/e1/cap_001.bin", 0),
        Row("e1", 256, old, "/caps/e1/cap_002.bin", 0),
        Row("e1", 256, old, "/caps/e1/cap_003.bin", 0),
        Row("e1", 256, new, "/caps/e1/cap_004.bin", 1),  # latest, minority
    ]
    want = [(8, 4), (12, 4), (2, 8)]
    assert _merge_template_rows(rows)[("e1", 256)] == want
    assert _merge_template_rows(rows[::-1])[("e1", 256)] == want
    # within one file the larger seq is later
    rows2 = [
        Row("e1", 256, new, "/caps/e1/cap_001.bin", 0),
        Row("e1", 256, old, "/caps/e1/cap_001.bin", 3),
    ]
    assert _merge_template_rows(rows2)[("e1", 256)] == [(8, 4), (12, 4)]


def test_connected_components_property_vs_union_find(spark):
    """Random graphs: the distributed min-label/pointer-doubling loop must
    agree exactly with a sequential union-find (min-id representative)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.operators.dedup import connected_components

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        return {n: find(n) for n in parent}

    edge = st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda e: e[0] != e[1])

    @settings(max_examples=6, deadline=None)
    @given(st.lists(edge, min_size=1, max_size=60))
    def run(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        want = union_find_components(edges)
        # small-graph fast path (default threshold)
        fast = {r.n: r.component
                for r in connected_components(df).collect()}
        assert fast == want
        # distributed loop, forced (the 100 TB path)
        dist = {r.n: r.component
                for r in connected_components(
                    df, small_graph_edges=0).collect()}
        assert dist == want

    run()


def test_connected_components_long_chain_converges(spark):
    """A 60-node path (diameter 59) must converge well inside max_iter —
    the case two-hop pointer doubling exists for."""
    from nf2pq_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "u long, v long")
    got = {r.n: r.component
           for r in connected_components(
               edges, small_graph_edges=0).collect()}
    assert got == {i: 0 for i in range(60)}


def test_seed_dir_fixture_marker_protocol(tmp_path):
    """r7 verdict item (S4 residual): the old any-data-file guard trusted
    a TORN directory — a /tmp cleaner deleting SOME part files of a
    previous session's overwrite left survivors matching the glob, the
    seeder skipped, and an oracle-first evaluation silently aggregated
    fewer rows. The marker protocol must: seed fresh dirs atomically,
    leave a VOUCHED post-overwrite tree untouched (no data doubling,
    the r3 regression), and clear-and-reseed unmarked or torn trees so
    exactly one complete copy ever stands."""
    import os

    from nf2pq_spark.plans.collector import (_SEED_MARKER,
                                             _mark_seed_dir,
                                             _seed_dir_fixture)

    src = "/root/testdata/sf0.01/customer.parquet"
    sql = ("COPY (SELECT c_custkey FROM read_parquet('{src}') "
           "ORDER BY c_custkey LIMIT 5) "
           "TO '{dst}' (FORMAT CSV, HEADER, DELIMITER ',')")

    fresh = tmp_path / "fresh"
    _seed_dir_fixture(src, str(fresh), "seed.csv", sql)
    assert (fresh / "seed.csv").exists()
    # marker written last, no stray tmp files left behind
    assert sorted(p.name for p in fresh.iterdir()) == [
        _SEED_MARKER, "seed.csv"]

    # vouched post-overwrite tree (part files + the marker the query fn
    # writes): a warm-restart import must NOT touch it — re-seeding next
    # to part files would double the data the oracle globs (r3)
    warm = tmp_path / "warm"
    os.makedirs(warm)
    (warm / "part-00000.csv").write_text("c_custkey\n1\n")
    (warm / "part-00001.csv").write_text("c_custkey\n2\n")
    _mark_seed_dir(str(warm), "/root/testdata/sf0.01", "customer")
    _seed_dir_fixture(src, str(warm), "seed.csv", sql)
    assert not (warm / "seed.csv").exists()
    assert (warm / "part-00000.csv").read_text() == "c_custkey\n1\n"

    # TORN vouched tree (cleaner deleted a manifest file): cleared and
    # re-seeded — exactly one complete copy, never the partial survivors
    os.remove(warm / "part-00001.csv")
    _seed_dir_fixture(src, str(warm), "seed.csv", sql)
    assert sorted(p.name for p in warm.iterdir()) == [
        _SEED_MARKER, "seed.csv"]

    # unmarked tree (legacy layout / crashed overwrite): same treatment
    legacy = tmp_path / "legacy"
    os.makedirs(legacy)
    (legacy / "part-00000.csv").write_text("c_custkey\n1\n")
    _seed_dir_fixture(src, str(legacy), "seed.csv", sql)
    assert sorted(p.name for p in legacy.iterdir()) == [
        _SEED_MARKER, "seed.csv"]


def test_cache_marker_invalidates_on_source_change(tmp_path):
    """r3 review regression: /tmp caches keyed only by basename(sf_dir)
    served stale results after a fixture regeneration or when a
    same-named leaf dir in a different tree was pointed at. The stamped
    marker must go stale in both scenarios."""
    import os
    import shutil

    from nf2pq_spark.plans.helpers import (cache_current, source_stamp,
                                           write_cache_marker)

    sf = tmp_path / "sf0.01"
    os.makedirs(sf)
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                sf / "events.parquet")
    marker = str(tmp_path / "_BUILT")

    stamp = source_stamp(str(sf), "events")
    assert not cache_current(marker, stamp)          # no marker yet
    write_cache_marker(marker, stamp)
    assert cache_current(marker, source_stamp(str(sf), "events"))

    # regeneration: same path, new bytes/mtime -> stale
    with open(sf / "events.parquet", "ab") as fh:
        fh.write(b"x")
    assert not cache_current(marker, source_stamp(str(sf), "events"))

    # same-named leaf dir in another tree -> stale (path is in the stamp)
    other = tmp_path / "elsewhere" / "sf0.01"
    os.makedirs(other)
    shutil.copy(sf / "events.parquet", other / "events.parquet")
    assert not cache_current(marker, source_stamp(str(other), "events"))

    # legacy pre-stamp 'ok' markers read as stale, forcing one rebuild
    write_cache_marker(marker, "ok")
    assert not cache_current(marker, source_stamp(str(sf), "events"))


def test_source_stamp_tracks_code_identity(tmp_path):
    """The writer-upgrade staleness mode (r5): a /tmp cache whose WRITER
    code changed between rounds must self-invalidate — the fixture-only
    stamp read such caches as current forever on a long-lived machine.
    The stamp therefore carries a code-identity component over every
    package source file; changing any of them yields a different stamp."""
    import os
    import shutil

    import nf2pq_spark.plans.helpers as H

    sf = tmp_path / "sf"
    os.makedirs(sf)
    shutil.copy("/root/testdata/sf0.001/nation.parquet",
                sf / "events.parquet")

    s1 = H.source_stamp(str(sf), "events")
    assert ";code|" in s1                      # component present
    assert s1 == H.source_stamp(str(sf), "events")  # stable in-process

    # a legacy marker carrying a fixture-only stamp reads as stale
    legacy = s1.rsplit(";code|", 1)[0]
    marker = str(tmp_path / "_BUILT")
    H.write_cache_marker(marker, legacy)
    assert not H.cache_current(marker, s1)

    # the component itself flips on any source change — verified on a
    # copied tree (touching the real package from a test would churn
    # its mtimes): edit one file's content, then only its mtime
    pkg_copy = str(tmp_path / "pkg")
    shutil.copytree(os.path.dirname(os.path.abspath(H.__file__)), pkg_copy)
    c0 = H._code_stamp(pkg_copy)
    assert c0 == H._code_stamp(pkg_copy)       # deterministic, uncached
    target = os.path.join(pkg_copy, "helpers.py")
    with open(target, "a") as fh:
        fh.write("# changed\n")
    c1 = H._code_stamp(pkg_copy)
    assert c1 != c0                            # size + mtime moved
    os.utime(target, ns=(os.stat(target).st_mtime_ns + 10**12,) * 2)
    c2 = H._code_stamp(pkg_copy)
    assert c2 != c1                            # mtime alone moves it
    # non-.py files are invisible to the stamp
    with open(os.path.join(pkg_copy, "notes.txt"), "w") as fh:
        fh.write("x")
    assert H._code_stamp(pkg_copy) == c2


def test_flownet_garbage_strings_never_abort(spark):
    """Hostile-string sweep over the v4/v6 text parsers (the fuzz lens
    that caught the options-decoder hang, applied to the string side):
    for ANY input — garbage, lookalikes, unicode — ipv4_to_long /
    ip_prefix / in_cidr / ipv6_normalize / in_cidr6 must EXECUTE (no
    ANSI abort) and ipv4_to_long must be NULL or the exact stdlib value
    whenever the stdlib accepts the string. Spark is deliberately more
    liberal than ``ipaddress`` (try_cast trims whitespace, admits
    leading zeros / '+'), so only stdlib-VALID inputs pin exact values;
    everything else just must not kill the job."""
    import ipaddress
    import random

    rng = random.Random(4242)
    curated = [
        "", ".", "...", "1.2.3", "1.2.3.4.5", "1.2.3.4.", ".1.2.3.4",
        "256.1.1.1", "-1.2.3.4", "1.2.3.x", "0x1.2.3.4", "1..2.3",
        "999999999999.1.1.1", "1.2.3.4/8", " 1.2.3.4", "1.2.3.4 ",
        "01.2.3.4", "+1.2.3.4", "1,2,3,4", "∞.2.3.4", "１.2.3.4",
        "::", ":::", "::1", "1::2::3", "g::1", "1:2:3:4:5:6:7:8:9",
        "fe80::1%eth0", "::ffff:1.2.3.4", "café", "\x00\x01", "🌐.2.3.4",
    ]
    alphabet = "0123456789abcdefg.:x +-"
    fuzz = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 24)))
            for _ in range(250)]
    strings = curated + fuzz + ["10.0.0.1", "255.255.255.255", "0.0.0.0",
                                "2001:db8::1", "a:b:c:d:e:f:1:2"]

    df = spark.createDataFrame([(s,) for s in strings], ["ip"])
    rows = df.select(
        "ip",
        flownet.ipv4_to_long(F.col("ip")).alias("v4"),
        flownet.ip_prefix(F.col("ip"), 24).alias("p24"),
        flownet.in_cidr(F.col("ip"), "10.0.0.0/8").alias("c4"),
        flownet.ipv6_normalize(F.col("ip")).alias("v6"),
        flownet.in_cidr6(F.col("ip"), "2001:db8::/32").alias("c6"),
    ).collect()  # executing at all proves no ANSI abort
    got = {r.ip: r for r in rows}
    assert len(got) == len(set(strings))
    for s in set(strings):
        r = got[s]
        assert r.v4 is None or 0 <= r.v4 < (1 << 32), (s, r.v4)
        try:
            expected = int(ipaddress.IPv4Address(s))
        except ValueError:
            expected = None
        if expected is not None:
            assert r.v4 == expected, (s, r.v4, expected)
            assert r.p24 == expected & 0xFFFFFF00
            assert r.c4 == ((expected >> 24) == 10)
        # v6 canonicalization pins stdlib equality only on pure-hex forms
        try:
            a6 = ipaddress.IPv6Address(s)
            if "." not in s and "%" not in s:
                assert r.v6 == format(int(a6), "032x"), (s, r.v6)
                assert r.c6 == (a6 in ipaddress.IPv6Network("2001:db8::/32"))
        except ValueError:
            pass


def test_text_primitives_property_vs_naive_reference(spark):
    """Property: the zip_with shingle construction (O(n), built for
    codegen) and the rolling Karp-Rabin fingerprint fold equal their
    naive Python references on random token streams — including empty
    tokens from repeated/trailing separators, the edge a fixed example
    can't sweep. ASCII alphabet: ascii()/\\w semantics are
    engine-uniform there."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(alphabet="ab1_. ", min_size=0, max_size=4).map(
        lambda s: s.replace(" ", ""))  # no embedded separators
    texts = st.lists(
        st.lists(token, min_size=0, max_size=8).map(" ".join),
        min_size=1, max_size=8)

    def naive_shingles(t: str, k: int) -> list[str]:
        toks = t.split(" ")
        if len(toks) < k:
            return []
        return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]

    def naive_fp(t: str, mod: int = 1_000_000_007) -> int:
        h = 0
        for w in t.split(" "):
            v = len(w) * 256 + (ord(w[0]) if w else 0)
            h = (h * 131 + v) % mod
        return h

    @given(ts=texts, k=st.integers(2, 4))
    @settings(max_examples=25, deadline=None)
    def check(ts, k):
        df = spark.createDataFrame([(t,) for t in ts], ["text"])
        got = df.select(
            text.shingles(F.col("text"), k).alias("s"),
            text.rolling_fingerprint(F.col("text")).alias("fp"),
        ).collect()
        for t, r in zip(ts, got):
            assert r.s == naive_shingles(t, k), (t, k)
            assert r.fp == naive_fp(t), t

    check()


def test_vector_folds_bit_exact_vs_sequential_reference(spark):
    """Property: dot/l2_norm/cosine are LEFT-TO-RIGHT folds — the module's
    cross-engine contract is that results are bit-identical to any
    engine folding the same doubles in the same order. Random doubles
    (large magnitudes included: inf via overflow must match too) checked
    bitwise against Python's sequential IEEE fold; a length mismatch
    must yield NULL (zip_with pad), never a partial fold."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.floats(allow_nan=False, allow_infinity=False, width=64,
                     min_value=-1e300, max_value=1e300)
    vec = st.lists(vals, min_size=1, max_size=6)

    def ref_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def ref_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    @given(a=vec, b=vec)
    @settings(max_examples=25, deadline=None)
    def check(a, b):
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        df = spark.createDataFrame(
            [(a, b)], "a array<double>, b array<double>")
        r = df.select(
            vectors.dot(F.col("a"), F.col("b")).alias("d"),
            vectors.l2_norm(F.col("a")).alias("na"),
            vectors.cosine(F.col("a"), F.col("b")).alias("c"),
        ).collect()[0]
        eq = lambda x, y: (x is None and y is None) or (
            math.isnan(x) and math.isnan(y)) or x == y
        assert eq(r.d, ref_dot(a, b))
        assert eq(r.na, ref_norm(a))
        denom = ref_norm(a) * ref_norm(b)
        # NULLIF guards only exact 0.0; a NaN denominator folds through
        # to a NaN cosine on both sides
        ref_cos = None if denom == 0.0 else ref_dot(a, b) / denom
        assert eq(r.c, ref_cos)
        # length mismatch -> NULL, never a partial fold
        if len(a) >= 2:
            df2 = spark.createDataFrame(
                [(a, b[:-1])], "a array<double>, b array<double>")
            assert df2.select(
                vectors.dot(F.col("a"), F.col("b")).alias("d")
            ).collect()[0].d is None

    check()


def test_lsh_banding_and_jaccard_property_vs_reference(spark):
    """Property: on random small corpora, (a) uncapped LSH candidate
    pairs are EXACTLY the pairs sharing at least one band's min md5
    slice (the banding definition, computed independently in Python),
    and (b) jaccard_pairs returns exactly the candidate pairs whose
    distinct-token Jaccard clears the threshold, with the exact score."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.sampled_from(["a", "b", "c", "dd", "e1"])
    texts = st.lists(
        st.lists(token, min_size=0, max_size=8).map(" ".join),
        min_size=2, max_size=8)

    def ref_bands(t: str, k: int = 3, n_bands: int = 4):
        toks = t.split(" ")
        sh = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if not sh:
            return None
        hs = [hashlib.md5(s.encode()).hexdigest() for s in sh]
        return tuple(min(h[8 * b:8 * b + 8] for h in hs)
                     for b in range(n_bands))

    @given(ts=texts)
    @settings(max_examples=15, deadline=None)
    def check(ts):
        docs = [(i, t) for i, t in enumerate(ts)]
        df = spark.createDataFrame(docs, "doc_id long, text string")

        bands = {i: ref_bands(t) for i, t in docs}
        want_pairs = {
            (i, j)
            for i in bands for j in bands if i < j
            if bands[i] is not None and bands[j] is not None
            and any(x == y for x, y in zip(bands[i], bands[j]))
        }
        cands = lsh_candidate_pairs(df, max_bucket=None)
        got_pairs = {(r.id_a, r.id_b) for r in cands.collect()}
        assert got_pairs == want_pairs, ts

        def jac(i, j):
            a = set(ts[i].split(" ")); b = set(ts[j].split(" "))
            return round(len(a & b) / len(a | b), 6)

        thr = 0.6
        want_j = {(i, j): jac(i, j) for (i, j) in want_pairs
                  if jac(i, j) >= thr}
        got_j = {(r.id_a, r.id_b): r.jaccard
                 for r in jaccard_pairs(df, cands, threshold=thr).collect()}
        assert got_j == want_j, ts

    check()


def test_cache_marker_detects_partial_external_deletion(tmp_path):
    """/tmp cleaners (tmpwatch, systemd-tmpfiles) prune by age/atime and
    can delete individual DATA files while the marker survives. A
    stamp-only marker would vouch for the partial cache and the query
    would silently return fewer rows than the oracle — the marker now
    records a relpath|size manifest that cache_current re-verifies."""
    import os

    from nf2pq_spark.plans.helpers import cache_current, write_cache_marker

    cache = tmp_path / "cache"
    os.makedirs(cache / "d=2024-01-01")
    for i, rel in enumerate(["d=2024-01-01/part-0.parquet",
                             "d=2024-01-01/part-1.parquet", "_SUCCESS"]):
        with open(cache / rel, "wb") as fh:
            fh.write(b"x" * (i + 1))
    marker = str(cache / "_BUILT")
    write_cache_marker(marker, "stamp")
    assert cache_current(marker, "stamp")

    # truncation -> stale
    with open(cache / "d=2024-01-01/part-1.parquet", "wb") as fh:
        fh.write(b"y")
    assert not cache_current(marker, "stamp")
    with open(cache / "d=2024-01-01/part-1.parquet", "wb") as fh:
        fh.write(b"xx")                        # restored at recorded size
    assert cache_current(marker, "stamp")

    # deletion of one data file -> stale, even though the marker survives
    os.remove(cache / "d=2024-01-01/part-0.parquet")
    assert not cache_current(marker, "stamp")

    # extra files are tolerated (nothing external ADDS files)
    write_cache_marker(marker, "stamp")
    with open(cache / "stray.tmp", "w") as fh:
        fh.write("z")
    assert cache_current(marker, "stamp")


def test_rollup_cache_rebuilds_after_partial_tmp_cleanup(spark, sf_dir):
    """End-to-end through the graded rl1 plan: delete one parquet file
    from the /tmp rollup cache while its marker survives — the next
    invocation must detect the torn cache and rebuild, returning the
    same rows as before, not silently fewer."""
    import glob
    import os

    from nf2pq_spark.plans.timeseries import rl1_hypertable_rollup

    before = sorted(tuple(r) for r in
                    rl1_hypertable_rollup(spark, sf_dir).collect())
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/nf2pq_rollup_{tag}"
    victims = glob.glob(f"{path}/**/*.parquet", recursive=True)
    assert victims, "expected a populated rollup cache"
    os.remove(victims[0])
    assert os.path.exists(os.path.join(path, "_BUILT"))  # marker survives
    after = sorted(tuple(r) for r in
                   rl1_hypertable_rollup(spark, sf_dir).collect())
    assert after == before


def test_cache_manifest_property_random_trees_and_mutations(tmp_path):
    """Property over random cache trees: cache_current stays True under
    additions (nothing external ADDS meaningfully) and flips False for
    ANY deletion or size change of a recorded file — the exact guarantee
    the torn-/tmp-cache protection rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nf2pq_spark.plans.helpers import cache_current, write_cache_marker

    names = st.lists(
        st.text(alphabet="abcxyz0189._-", min_size=1, max_size=12)
        .filter(lambda s: s not in {".", "..", "_BUILT"} and "/" not in s),
        min_size=1, max_size=8, unique=True)

    case_n = [0]

    @settings(max_examples=40, deadline=None)
    @given(files=names, sizes=st.data())
    def prop(files, sizes):
        import os
        import shutil

        case_n[0] += 1
        root = tmp_path / f"c{case_n[0]}"
        sub = root / "part=0"
        os.makedirs(sub)
        paths = []
        for i, f in enumerate(files):
            p = (root if i % 2 else sub) / f
            with open(p, "wb") as fh:
                fh.write(b"x" * sizes.draw(st.integers(0, 64)))
            paths.append(p)
        marker = str(root / "_BUILT")
        write_cache_marker(marker, "s")
        assert cache_current(marker, "s")
        assert not cache_current(marker, "other-stamp")

        mutation = sizes.draw(st.sampled_from(["del", "resize", "add"]))
        victim = paths[sizes.draw(st.integers(0, len(paths) - 1))]
        if mutation == "del":
            os.remove(victim)
            assert not cache_current(marker, "s")
        elif mutation == "resize":
            old = os.path.getsize(victim)
            with open(victim, "wb") as fh:
                fh.write(b"y" * (old + 1))
            assert not cache_current(marker, "s")
        else:
            with open(root / "added.new", "w") as fh:
                fh.write("z")
            assert cache_current(marker, "s")
        shutil.rmtree(root)

    prop()


def test_embedding_validity_contract_cross_engine(spark):
    """The embedding validity contract (functions.vectors.embedding_is_valid
    and its DuckDB spelling EMBEDDING_VALID_SQL) must classify IDENTICALLY on
    both engines for every degenerate shape the hostile-corpus sweep found
    diverging or crashing (r7, tools/hostile_corpus_fixture.py): NaN, +/-Inf,
    over-cap magnitude, NULL component, NULL vector, zero vector, denormal."""
    import math

    import duckdb

    from nf2pq_spark.functions.vectors import (EMBEDDING_VALID_SQL,
                                               embedding_is_valid)

    vecs = [
        (0, [0.1, 0.2, 0.3], True),            # ordinary
        (1, [0.0, 0.0, 0.0], True),            # zero vector: valid, callers degrade
        (2, [float("nan"), 0.1, 0.1], False),  # NaN component
        (3, [float("inf"), 0.1, 0.1], False),  # +Inf
        (4, [-float("inf"), 0.1, 0.1], False), # -Inf (|x| > cap)
        (5, [1e30, 1e30, 1e30], False),        # over-cap magnitude
        (6, [-1e30, 0.0, 0.0], False),         # negative over-cap
        (7, [1e6, -1e6, 0.0], True),           # exactly at cap: valid
        (8, [1e-38] * 3, True),                # denormal-adjacent
        (9, None, False),                      # NULL vector
        (10, [None, 0.1, 0.1], False),         # NULL component
    ]
    sdf = spark.createDataFrame(
        [(i, v) for i, v, _ in vecs], "vec_id INT, embedding ARRAY<DOUBLE>")
    got = {r.vec_id: r.ok for r in sdf.select(
        "vec_id", embedding_is_valid("embedding").alias("ok")).collect()}
    # Spark forall: NULL vector / NULL-poisoned result reads as "not valid"
    # through a filter, so compare truthiness of the FILTER, not the raw col
    kept_spark = {r.vec_id for r in
                  sdf.filter(embedding_is_valid("embedding")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id INT, embedding DOUBLE[])")
    for i, v, _ in vecs:
        con.execute("INSERT INTO e VALUES (?, ?)", [i, v])
    where = EMBEDDING_VALID_SQL.format(col="embedding")
    kept_duck = {r[0] for r in
                 con.execute(f"SELECT vec_id FROM e WHERE {where}").fetchall()}

    expected = {i for i, _, valid in vecs if valid}
    assert kept_spark == expected, f"spark kept {kept_spark}"
    assert kept_duck == expected, f"duckdb kept {kept_duck}"
    # the raw Spark column never claims True for an invalid row
    for i, _, valid in vecs:
        assert (got[i] is True) == valid or not valid


def test_l10_zero_norm_quantizes_to_null_both_engines(spark, tmp_path):
    """Zero-norm vectors survive the validity contract (finite, in-cap) but
    cannot be L2-normalized: l10 must emit q8 = NULL on BOTH engines. Spark's
    array_join drops nulls ('' for an all-null array) while DuckDB's
    array_to_string over an all-null list is NULL — the explicit when()
    guard pins the NULL spelling (hostile-corpus find, r7)."""
    import duckdb

    import __spark_entry__ as em

    sf = str(tmp_path)
    rows = [(1, [0.6, 0.8], 0), (2, [0.0, 0.0], 1)]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    ).write.parquet(f"{sf}/embeddings.parquet")

    s = em.queries()["l10_vec_quantize"](spark, sf).toPandas()
    srow = s.set_index("vec_id")
    assert srow.loc[2, "q8"] is None
    assert srow.loc[1, "q8"] == "76,102"  # floor(.6*127+.5), floor(.8*127+.5)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet/*.parquet')")
    d = con.execute(em.oracle_sql()["l10_vec_quantize"]).fetchdf()
    drow = d.set_index("vec_id")
    assert drow.loc[2, "q8"] is None
    assert drow.loc[1, "q8"] == "76,102"


def test_asof_bucketed_timestamp_axis_null_ts_parity(spark):
    """The TIMESTAMP-axis bucketed as-of must keep NULL-ts left rows with
    a null payload, exactly like the plain operator. The original
    F.window-based bucketing silently DROPPED them — Catalyst's
    TimeWindowing rewrite injects isnotnull(ts) under any window()
    projection — and the numeric-axis tests above never exercised the
    timestamp path (r7 hostile-corpus find). Also pins epoch alignment:
    the arithmetic bucket must match F.window's epoch-aligned starts."""
    from datetime import datetime

    from nf2pq_spark.operators.asof import (_interval_micros, asof_join,
                                            asof_join_bucketed)

    t = lambda h, m=0: datetime(2024, 3, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t(10, 30)), (1, 2, t(23, 50)), (2, 3, None),
         (1, 4, None), (None, 5, t(12))],
        "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(9), "early"), (1, t(23, 45), "late"), (2, t(1), "other"),
         (1, None, "nullts"), (None, t(2), "nullkey")],
        "k int, ts timestamp, tag string")

    for how in ("left", "inner"):
        plain = {(r.id, r.tag) for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload=["tag"], how=how).collect()}
        for bucket in ("1 day", "2 hours", "30 minutes"):
            buck = {(r.id, r.tag) for r in asof_join_bucketed(
                left, right, on="k", left_ts="ts", right_ts="ts",
                payload=["tag"], how=how, bucket=bucket).collect()}
            assert buck == plain, (how, bucket)
    # left mode keeps the NULL-ts and NULL-key probes, unmatched
    assert {(1, "early"), (2, "late"), (3, None), (4, None),
            (5, None)} == {(r.id, r.tag) for r in asof_join_bucketed(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload=["tag"], how="left", bucket="1 day").collect()}

    # interval parser: F.window-compatible widths, loud on non-fixed units
    assert _interval_micros("1 day") == 86_400_000_000
    assert _interval_micros("30 minutes") == 1_800_000_000
    assert _interval_micros("2 Hours") == 7_200_000_000
    import pytest

    with pytest.raises(ValueError, match="bucket"):
        _interval_micros("1 month")
    with pytest.raises(ValueError, match="bucket"):
        _interval_micros("day")


def test_asof_bucketed_extreme_timestamp_integer_bucketing(spark):
    """r7 advice: the bucket arithmetic must be exact int64, not a double
    division — micros past 2^53 round in double, and 11324707199999999 μs
    (2328-11-12T23:59:59.999999, last micro of its day) double-divides to
    day-bucket 131073 instead of 131072. Bucketed results must match the
    plain operator at both timestamp extremes (far future past 2^53 μs,
    pre-epoch negatives where pmod's sign convention does the flooring),
    and the assigned bucket itself must be the exact integer floor."""
    from datetime import datetime

    from nf2pq_spark.operators.asof import asof_join, asof_join_bucketed

    # the exact misbucket boundary value, plus neighbors spanning it
    edge = datetime(2328, 11, 12, 23, 59, 59, 999999)
    nxt = datetime(2328, 11, 13, 0, 0, 0)
    pre = datetime(1620, 6, 5, 23, 59, 59, 999999)  # negative micros
    left = spark.createDataFrame(
        [(1, 1, edge), (1, 2, nxt), (1, 3, pre), (2, 4, edge)],
        "k int, id int, ts timestamp")
    right = spark.createDataFrame(
        [(1, datetime(2328, 11, 12, 1), "same-day"),
         (1, nxt, "next-day"),
         (1, datetime(1620, 6, 5, 1), "pre-epoch"),
         (2, edge, "tie")],
        "k int, ts timestamp, tag string")
    for how in ("left", "inner"):
        plain = {(r.id, r.tag) for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload=["tag"], how=how).collect()}
        for bucket in ("1 day", "1 hour"):
            buck = {(r.id, r.tag) for r in asof_join_bucketed(
                left, right, on="k", left_ts="ts", right_ts="ts",
                payload=["tag"], how=how, bucket=bucket).collect()}
            assert buck == plain, (how, bucket)
    assert {(r.id, r.tag) for r in asof_join_bucketed(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload=["tag"], how="left", bucket="1 day").collect()} == {
        (1, "same-day"), (2, "next-day"), (3, "pre-epoch"), (4, "tie")}

    # the bucket expression itself: exact integer floor at the 2^53 edge
    # and at a pre-epoch value (pmod keeps x - pmod(x, us) the FLOOR
    # multiple for negative micros, not the truncate-toward-zero one)
    import pyspark.sql.functions as F
    us = 86_400_000_000
    df = spark.createDataFrame([(edge,), (pre,)], "ts timestamp")
    micros = F.unix_micros(F.col("ts"))
    got = {r[0] for r in df.select(
        (micros - F.pmod(micros, F.lit(us))).alias("b")).collect()}
    exp = set()
    for d in (edge, pre):
        x = int((d - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        # recompute exactly (total_seconds is float): micros from days
        import calendar
        x = calendar.timegm(d.timetuple()) * 1_000_000 + d.microsecond
        exp.add((x // us) * us)
    assert got == exp


def test_cache_lock_serializes_concurrent_rebuilds(tmp_path):
    """Two graders sharing a /tmp cache can both see a stale marker and
    rebuild concurrently — interleaved writes from two generations that
    the second marker's manifest would then vouch for (silent wrong
    rows). cache_lock must serialize the check-and-rebuild window, and
    the loser's re-check under the lock must see the winner's build and
    skip its own. flock conflicts across separate open file
    descriptions, so two threads each opening the sibling lock file
    model two processes faithfully."""
    import threading
    import time

    from nf2pq_spark.plans.helpers import (cache_current, cache_lock,
                                           write_cache_marker)

    cache = tmp_path / "nf2pq_fake_cache"
    cache.mkdir()
    marker = str(cache / "_DONE")
    stamp = "s1"
    builds, timeline = [], []

    def grader(name, delay):
        time.sleep(delay)
        with cache_lock(marker):
            timeline.append((name, "in"))
            if not cache_current(marker, stamp):
                builds.append(name)
                time.sleep(0.3)  # a slow build inside the lock
                (cache / "data.bin").write_bytes(b"x" * 64)
                write_cache_marker(marker, stamp)
            timeline.append((name, "out"))

    a = threading.Thread(target=grader, args=("a", 0.0))
    b = threading.Thread(target=grader, args=("b", 0.05))
    a.start(); b.start(); a.join(); b.join()

    # exactly ONE build ran, and the critical sections never interleaved
    assert builds == ["a"], builds
    assert timeline == [("a", "in"), ("a", "out"), ("b", "in"), ("b", "out")]
    # the lock file lives OUTSIDE the cache dir, so the build's rmtree
    # cannot delete the locked inode
    import os

    assert os.path.exists(str(cache) + ".lock")
    assert not (cache / ".lock").exists()


def test_interval_micros_rejects_malformed_inputs():
    """Every malformed bucket raises the NAMED ValueError — never an
    IndexError from an empty string or a negative width accepted."""
    import pytest

    from nf2pq_spark.operators.asof import _interval_micros

    for bad in ("", "day", "1 month", "-3 days", "x hours",
                "1.5 hours", "0 days", "3 fortnights"):
        with pytest.raises(ValueError, match="bucket"):
            _interval_micros(bad)


def test_gc_stale_scan_dirs_rules(tmp_path):
    """r8 concurrent-drill follow-up: the per-process S4 dir GC must
    remove only dirs that are BOTH old (>1h) and not owned by a live
    pid — a recycled pid or a fresh tree must never be deleted out from
    under a live grader."""
    import os
    import time

    from nf2pq_spark.plans.collector import _gc_stale_scan_dirs

    base = str(tmp_path / "nf2pq_csv_customer")
    old = 2 * 3600.0

    def mk(name, age_s):
        d = f"{base}_{name}" if name else base
        os.makedirs(d)
        (open(os.path.join(d, "x.csv"), "w")).write("a\n")
        t = time.time() - age_s
        os.utime(d, (t, t))
        return d

    live = mk(str(os.getpid()), old)          # our own pid — alive
    dead_pid = str(2**31 - 1)  # beyond any real pid -> ESRCH for sure
    dead_old = mk(dead_pid, old)              # dead pid, old -> GC'd
    dead_young = mk(str(2**31 - 2), 60.0)     # dead pid, young -> kept
    legacy_old = mk("", old)                  # un-suffixed legacy -> GC'd
    open(dead_old + ".lock", "w").close()

    _gc_stale_scan_dirs(bases=(base,))
    assert os.path.exists(live)
    assert os.path.exists(dead_young)
    assert not os.path.exists(dead_old)
    assert not os.path.exists(dead_old + ".lock")
    assert not os.path.exists(legacy_old)


def test_read_message_headers_units_and_gap_detection(spark, tmp_path):
    """Header sequence counters survive the scan with per-version unit
    semantics (v5 flow_sequence counts FLOWS, v9 sequenceNumber counts
    PACKETS, v10 counts DATA RECORDS with no in-header record count) and
    a dropped datagram shows up as exactly its unit gap. Malformed
    datagrams drop per-packet, like the flow decoder."""
    import os

    from nf2pq_spark.sources.ipfix import (encode_ipfix, encode_netflow_v5,
                                           encode_netflow_v9,
                                           read_message_headers,
                                           write_capture_file)

    flows = [{"sa_int": 1, "da_int": 2, "sp": i, "dp": 2, "pr": 6, "flg": 0,
              "ipkt": 1, "ibyt": 10, "ts_ms": 0, "te_ms": 1,
              "sas": 0, "das": 0} for i in range(25)]
    out = str(tmp_path / "caps")
    v5 = encode_netflow_v5(flows, per_packet=10)    # seq 0,10,20 (flows)
    v9 = encode_netflow_v9(flows, per_packet=10)    # seq 0,1,2   (packets)
    v10 = encode_ipfix(flows, per_packet=10)        # seq 0,10,20 (records)
    os.makedirs(f"{out}/e1")
    # drop the MIDDLE datagram of each stream + splice in garbage
    write_capture_file(f"{out}/e1/cap.bin",
                       [v5[0], b"\x00\x09junk", v5[2], v9[0], v9[2],
                        v10[0], v10[2]])
    h = read_message_headers(spark, f"{out}/e1").toPandas()
    by_v = {v: sorted(zip(g["seq"], g["nrec"]))
            for v, g in h.groupby("version")}
    assert by_v[5] == [(0, 10), (20, 5)]     # gap: 20 - (0+10) = 10 flows
    assert by_v[9][0][0] == 0 and by_v[9][1][0] == 2   # gap: 2-0-1 = 1 pkt
    # v10: the header omits the record count — it is derived from the
    # two-phase template harvest (set bytes // record width), so the
    # data-only third message counts even though its template set lives
    # in the (dropped) first message's announcement replayed by phase 1
    assert by_v[10] == [(0, 10), (20, 5)]    # gap: 20 - (0+10) = 10 recs
    # exporter identity is the directory, like the flow decoder
    assert set(h["exporter"].map(lambda p: p.rsplit("/", 1)[-1])) == {"e1"}


def test_v10_record_count_unknown_for_varlen_or_unknown_template():
    """An IPFIX message whose data set rides a variable-length or
    never-announced template reports nrec = -1 (UNKNOWN), never a guess
    — sequence accounting must not invent record counts."""
    import struct

    from nf2pq_spark.sources.ipfix import _v10_record_count

    def msg(*sets: bytes) -> bytes:
        body = b"".join(sets)
        return struct.pack(">HHIII", 10, 16 + len(body), 0, 0, 1) + body

    def tset(tid, fields):
        rec = struct.pack(">HH", tid, len(fields)) + b"".join(
            struct.pack(">HH", ie, ln) for ie, ln in fields)
        return struct.pack(">HH", 2, 4 + len(rec)) + rec

    dset = struct.pack(">HH", 300, 4 + 8) + b"\x00" * 8
    # known fixed template: 2 records of 4 bytes
    m = msg(tset(300, [(7, 2), (11, 2)]), dset)
    assert _v10_record_count(m, "e", {}) == 2
    # never-announced template
    assert _v10_record_count(msg(dset), "e", {}) == -1
    # varlen field (0xFFFF width): length-derived counting impossible
    m = msg(tset(300, [(84, 0xFFFF)]), dset)
    assert _v10_record_count(m, "e", {}) == -1
    # a template-set-only message has 0 data records
    assert _v10_record_count(msg(tset(300, [(7, 2)])), "e", {}) == 0


def test_asof_bucketed_numeric_axis_past_double_precision(spark):
    """Numeric-axis twin of the timestamp-branch precision fix: an int64
    axis past 2^53 bucketed via double division rounded across a bucket
    boundary and could skip a boundary-adjacent right row. The bucket is
    now the exact-int64 start (x - pmod(x, bucket)); bucketed must equal
    plain out there."""
    from nf2pq_spark.operators.asof import asof_join, asof_join_bucketed

    base = 2**62 - 2**31          # far beyond double's 2^53 exactness
    bucket = 2**31
    rows_r = [(1, base - 3, 10), (1, base - 1, 20),   # just under boundary
              (1, base, 30), (1, base + 5, 40)]
    rows_l = [(i, 1, t) for i, t in enumerate(
        [base - 2, base - 1, base, base + 4, base + 6])]
    left = spark.createDataFrame(rows_l, schema="id long, k long, ts long")
    right = spark.createDataFrame(rows_r, schema="k long, ts long, v long")
    plain = {(r["id"], r["v"]) for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload=["v"]).collect()}
    buck = {(r["id"], r["v"]) for r in asof_join_bucketed(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload=["v"], bucket=bucket).collect()}
    assert plain == buck
    assert plain == {(0, 10), (1, 20), (2, 30), (3, 30), (4, 40)}


def test_asof_tie_break_must_be_payload_column(spark):
    """A tie_break naming a LEFT column orders equal-ts right rows by
    NULL — silently nondeterministic; reject it loudly."""
    import pytest

    from nf2pq_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], schema="k long, ts long")
    right = spark.createDataFrame([(1, 5, 7)], schema="k long, ts long, v long")
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  payload=["v"], tie_break="ts")
    with pytest.raises(ValueError, match="positive"):
        from nf2pq_spark.operators.asof import asof_join_bucketed
        asof_join_bucketed(left, right, on="k", left_ts="ts",
                           right_ts="ts", payload=["v"], bucket=0)


def test_connected_components_id_domain_is_path_independent(spark):
    """Which execution path runs (volume-gated) must never decide which
    inputs are legal: string ids fail LOUDLY on both paths (the
    convergence probe is a numeric sum — hash text ids first), and an
    int32 edge list returns int32 components from both paths (the fast
    path previously hardcoded int64)."""
    import pytest

    from nf2pq_spark.operators.dedup import connected_components

    sedges = spark.createDataFrame(
        [("a", "b")], "u string, v string")
    for gate in (1_000_000, 0):
        with pytest.raises(ValueError, match="integral"):
            connected_components(sedges, small_graph_edges=gate)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9)], "u int, v int")
    want = {(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)}
    fast = connected_components(edges)
    dist = connected_components(edges, small_graph_edges=0)
    assert {(r["n"], r["component"]) for r in fast.collect()} == want
    assert {(r["n"], r["component"]) for r in dist.collect()} == want
    assert dict(fast.dtypes) == dict(dist.dtypes) == {
        "n": "int", "component": "int"}


def test_ivf_topk_degenerate_query_degrades_not_garbage(spark):
    """A dimension-mismatched or null-element query has NULL distance to
    every centroid; it previously sorted NULLS FIRST and probed
    arbitrary cells, returning k 'neighbors' with NULL cosine. It must
    degrade to NO results, leaving valid queries untouched."""
    from nf2pq_spark.operators.similarity import ivf_topk

    import random
    rng = random.Random(7)
    cands = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    candidates = spark.createDataFrame(
        cands, "c_id long, cv array<double>")
    queries = spark.createDataFrame(
        [(100, cands[0][1]),            # valid: 8-dim
         (101, [1.0, 2.0]),             # dimension mismatch
         (102, [None] + [0.5] * 7)],    # null element
        "q_id long, qv array<double>")
    out = ivf_topk(queries, candidates, k=3, n_cells=4, n_probe=2)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert 100 in by_q and len(by_q[100]) == 3
    assert all(r["cos_sim"] is not None for r in by_q[100])
    assert 101 not in by_q and 102 not in by_q


def test_bucketed_range_join_shared_column_names(spark):
    """Both inputs may share a column name (intervals derived from the
    same event table still carrying 'ts'): the join condition uses
    side-qualified refs, so this must analyze and match instead of
    raising AMBIGUOUS_REFERENCE."""
    import datetime as dt

    from nf2pq_spark.operators.rangejoin import bucketed_range_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    points = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=30))], "p_id int, ts timestamp")
    intervals = spark.createDataFrame(
        [(7, t0, t0 + dt.timedelta(minutes=5), t0)],
        "i_id int, lo timestamp, hi timestamp, ts timestamp")
    out = bucketed_range_join(points, intervals, "ts", "lo", "hi")
    assert [(r.p_id, r.i_id) for r in out.collect()] == [(1, 7)]


def test_bucketed_range_join_far_future_precision(spark):
    """Bucket keys are exact-int64 starts (x - pmod): micros past 2^53
    (~2255 AD, inside the hostile corpus's 2262 extremes) must bucket
    consistently on both sides — double floor-division could round a
    point across a boundary and miss its interval."""
    import datetime as dt

    from nf2pq_spark.operators.rangejoin import bucketed_range_join

    base = dt.datetime(2260, 1, 1, 0, 0, 0)
    points = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s))
         for i, s in enumerate([0, 59, 60, 3599])],
        "p_id int, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, base, base + dt.timedelta(minutes=1)),
         (2, base + dt.timedelta(minutes=1), base + dt.timedelta(hours=1))],
        "i_id int, lo timestamp, hi timestamp")
    out = {(r.p_id, r.i_id) for r in bucketed_range_join(
        points, intervals, "ts", "lo", "hi", bucket_seconds=60).collect()}
    assert out == {(0, 1), (1, 1), (2, 2), (3, 2)}
