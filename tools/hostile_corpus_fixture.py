#!/usr/bin/env python
"""Build a hostile-corpus fixture for cross-engine differential probing.

The shipped fixture corpora are 100% ASCII lowercase space-separated
words (verified 2026-08-15) — so the text/LLM/similarity queries have
never been Spark-vs-DuckDB compared on input where the engines' regex
and Unicode machinery can actually disagree (Spark = Java regex +
UTF8String semantics; DuckDB = RE2 + its own UTF-8 handling), nor on
degenerate embeddings (zero norm, NaN/Inf components, dimension
mismatches) where NaN propagation and ordering notoriously differ.

This script writes ``/tmp/hostile_fixture/sfh/`` (deliberately OUTSIDE
the ``/tmp/nf2pq_*`` cache glob that ``driver_sim --cold`` clears):
every table hard-linked/copied verbatim from sf0.001 EXCEPT
``documents.parquet`` and ``embeddings.parquet``, which carry the
original rows PLUS a hostile tail. Keeping the original rows keeps every
threshold non-vacuous; appending keeps ids unique.

Usage:
    python tools/hostile_corpus_fixture.py          # build
    NF2PQ_VERIFY_SF_DIR=/tmp/hostile_fixture/sfh \
        python tools/driver_sim.py --all            # differential sweep
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
DST = "/tmp/hostile_fixture/sfh"

#: (text, lang) — each row targets a specific engine-divergence surface.
HOSTILE_DOCS: list[tuple[str, str]] = [
    ("", "en"),                                     # empty
    (" \t\n  \t", "en"),                            # whitespace-only
    ("a", "en"),                                    # single char
    ("\U0001f680\U0001f525 data \U0001f680 rocket", "en"),   # astral emoji
    ("café naive café naïve", "fr"),  # combining vs composed
    ("数据处理引擎测试中文分词", "zh"),  # CJK, no spaces
    ("مرحبا بالعالم data stream", "en"),  # RTL mixed
    ("İstanbul ısparta DATA İ i I", "en"),   # Turkish dotted/dotless I
    ("STRASSE straße GROSS groß", "de"),  # German sharp s casefold
    ("ΟΔΟΣ οδος σιγμα", "en"),  # Greek final sigma
    ("!!!??? ...,,, ;;;::: ((()))[[]]{{}}", "en"),   # punctuation-only tokens
    ("it's \"quoted\" \\back\\slash; DROP TABLE docs;--", "en"),  # quoting
    ("line one\nline two\ttabbed\rcarriage", "en"),  # embedded newlines/tabs
    ("spam " * 400, "en"),                          # one word repeated 400x
    ("w" + "ord " * 2500, "en"),                    # ~10k chars long doc
    ("12345 67890 3.14159 -42 1e10 0x1F", "en"),    # numeric tokens
    ("visit https://example.com/a?b=1&c=2 mail admin@example.com", "en"),
    ("ctrl\x01\x02chars\x07bell\x1besc", "en"),     # control chars
    ("a b c　d e", "en"),        # exotic unicode spaces
    ("zero​width‍join⁠ers", "en"),   # zero-width chars
    ("ＤＡＴＡ　ｓｐａｒｋ", "en"),  # fullwidth
    ("﻿bom start and � replacement", "en"),
    ("ThE QuIcK BrOwN FoX mIxEd CaSe", "en"),
    ("the the THE The tHe thE", "en"),              # case-variant dups
    ("éèêë üöä ñ ç accents", "es"),
    ("tab\tseparated\twords\there", "en"),
    ("trailing spaces   ", "en"),
    ("   leading spaces", "en"),
    ("hyphen-ated co-operate re-use state-of-the-art", "en"),
    ("under_scores snake_case __dunder__", "en"),
]


def _append(src: str, dst: str, table: str, rows: list[dict]) -> None:
    """Append `rows` (dicts keyed by column name; missing keys = NULL)
    to `table`, preserving the source schema exactly."""
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    base = t.to_pydict()
    for row in rows:
        for f in t.schema:
            base[f.name].append(row.get(f.name))
    pq.write_table(pa.table(base, schema=t.schema.remove_metadata()),
                   os.path.join(dst, f"{table}.parquet"))


def _dt(s: str):
    from datetime import datetime

    return datetime.fromisoformat(s)


def _relational_tails(src: str, dst: str) -> None:
    """In-domain EDGE rows for the relational tables — data any production
    pipeline legitimately sees, where engine semantics classically split:
    NULLs in every nullable slot (Spark ASC = NULLS FIRST, DuckDB default
    = NULLS LAST — any window ordered by a nullable column is exposed),
    exact ties for rank/row_number tie-breaks, duplicate rows, rounding-
    edge money (x.xx5 binary-representation traps), boundary + leap dates,
    orphan foreign keys, hot keys, Unicode/empty strings, malformed JSON
    props. Domain-VIOLATING values (NaN/Inf/1e30 money) are deliberately
    not here: those break the data contract and may legitimately fail
    loudly; this tail must stay hash-green forever."""
    lk, ok_, ck, ek = 10_000_000, 20_000_000, 900_000, 30_000_000
    pk, sk = 800_000, 700_000

    # dim anchors: Unicode names (collation in joins/group labels), an
    # orphan regionkey, an empty name — completes hostile coverage of
    # EVERY fixture table
    rschema = pq.read_schema(os.path.join(src, "region.parquet")).names
    _append(src, dst, "region", [
        {k: v for k, v in
         {"r_regionkey": 90, "r_name": "ÅSGÅRD-Ω",
          "r_comment": "über region"}.items() if k in rschema},
    ])
    nschema = pq.read_schema(os.path.join(src, "nation.parquet")).names
    _append(src, dst, "nation", [
        {k: v for k, v in
         {"n_nationkey": 90, "n_name": "ÆLFLAND", "n_regionkey": 90,
          "n_comment": ""}.items() if k in nschema},
        {k: v for k, v in
         {"n_nationkey": 91, "n_name": "", "n_regionkey": 999,
          "n_comment": None}.items() if k in nschema},  # orphan region
    ])

    _append(src, dst, "part", [
        # LIKE/regex metachars INSIDE data, Unicode names (collation in
        # min/max and ORDER BY), empty name, NULL price, zero/neg size
        {"p_partkey": pk + 0, "p_name": "100% cotton [new] (large)",
         "p_brand": "Brand#00", "p_type": "PROMO_PLATED% brass",
         "p_size": 0, "p_retailprice": 0.005},
        {"p_partkey": pk + 1, "p_name": "Ölfaß-Teil Ω", "p_brand": "Brand#Ü",
         "p_type": "ECONOMY bürstend", "p_size": -1,
         "p_retailprice": None},
        {"p_partkey": pk + 2, "p_name": "", "p_brand": "",
         "p_type": "", "p_size": 50, "p_retailprice": 2.675},
    ])
    _append(src, dst, "supplier", [
        {"s_suppkey": sk + 0, "s_name": "Ärna Supply Ω", "s_nationkey": 99,
         "s_acctbal": None},                         # orphan nation + NULL
        {"s_suppkey": sk + 1, "s_name": "", "s_nationkey": 0,
         "s_acctbal": -0.005},
    ])

    _append(src, dst, "customer", [
        {"c_custkey": ck + 0, "c_name": "Ärna Müller-Ω", "c_nationkey": 0,
         "c_acctbal": -999.99, "c_mktsegment": "BUILDING"},
        {"c_custkey": ck + 1, "c_name": "", "c_nationkey": 1,
         "c_acctbal": 0.0, "c_mktsegment": ""},
        {"c_custkey": ck + 2, "c_name": "zz tie", "c_nationkey": 2,
         "c_acctbal": None, "c_mktsegment": "MACHINERY"},
        {"c_custkey": ck + 3, "c_name": "zz tie", "c_nationkey": 2,
         "c_acctbal": None, "c_mktsegment": "MACHINERY"},
        # format-conforming names whose digit run breaks a naive cast:
        # beyond-int64 overflow (TRY_CAST → NULL; pc.cast raised and
        # killed the job, r7 advice) and value-in-range digits hidden
        # behind 20+ leading zeros (a length-bounded regex would wrongly
        # NULL these). The exact int64 max/max+1 boundary is pinned in a
        # unit test instead — an int64-max sfx reaching SUM() overflows
        # the aggregate itself on both engines (domain violation, not a
        # cast edge).
        {"c_custkey": ck + 4, "c_name": "Customer#99999999999999999999999",
         "c_nationkey": 3, "c_acctbal": 1.0, "c_mktsegment": "AUTOMOBILE"},
        {"c_custkey": ck + 5, "c_name": "Customer#00000000000000000000007",
         "c_nationkey": 3, "c_acctbal": 2.0, "c_mktsegment": "AUTOMOBILE"},
    ])

    _append(src, dst, "orders", [
        # hot key: many orders on one new customer; boundary/leap dates
        *[{"o_orderkey": ok_ + i, "o_custkey": ck + 0,
           "o_orderstatus": "O", "o_totalprice": 1000.005 + i,
           "o_orderdate": _dt("2024-02-29"), "o_orderpriority": "1-URGENT"}
          for i in range(6)],
        {"o_orderkey": ok_ + 6, "o_custkey": -1,        # orphan custkey
         "o_orderstatus": "F", "o_totalprice": 0.0,
         "o_orderdate": _dt("1992-01-01"), "o_orderpriority": "5-LOW"},
        {"o_orderkey": ok_ + 7, "o_custkey": ck + 1,
         "o_orderstatus": "P", "o_totalprice": None,    # NULL money
         "o_orderdate": _dt("1998-12-31"), "o_orderpriority": ""},
        {"o_orderkey": ok_ + 8, "o_custkey": ck + 2,
         "o_orderstatus": "O", "o_totalprice": 2.675,   # 2.67499999… repr
         "o_orderdate": None, "o_orderpriority": "3-MEDIUM"},
    ])

    li_common = {"l_partkey": 1, "l_suppkey": 1, "l_returnflag": "N",
                 "l_linestatus": "O", "l_shipdate": _dt("1995-06-15")}
    _append(src, dst, "lineitem", [
        # two EXACT duplicate lines (same orderkey+linenumber): window
        # tie-breaks and distinct-vs-all paths
        {**li_common, "l_orderkey": ok_ + 0, "l_linenumber": 1,
         "l_quantity": 25.0, "l_extendedprice": 0.005, "l_discount": 0.05,
         "l_tax": 0.0},
        {**li_common, "l_orderkey": ok_ + 0, "l_linenumber": 1,
         "l_quantity": 25.0, "l_extendedprice": 0.005, "l_discount": 0.05,
         "l_tax": 0.0},
        # NULLs in aggregated/ordered slots
        {**li_common, "l_orderkey": ok_ + 1, "l_linenumber": 1,
         "l_quantity": None, "l_extendedprice": 100.0, "l_discount": None,
         "l_tax": 0.08},
        {**li_common, "l_orderkey": ok_ + 1, "l_linenumber": 2,
         "l_quantity": 0.0, "l_extendedprice": 100.10, "l_discount": 0.1,
         "l_tax": None, "l_shipdate": None},
        # boundary dates: epoch day, far-past (pre-ns-range), far-future
        {**li_common, "l_orderkey": ok_ + 2, "l_linenumber": 1,
         "l_quantity": 50.0, "l_extendedprice": 50000.0, "l_discount": 0.0,
         "l_tax": 0.0, "l_shipdate": _dt("1970-01-01")},
        {**li_common, "l_orderkey": ok_ + 2, "l_linenumber": 2,
         "l_quantity": 1.0, "l_extendedprice": 901.0, "l_discount": 0.1,
         "l_tax": 0.08, "l_shipdate": _dt("1600-02-29")},
        {**li_common, "l_orderkey": ok_ + 2, "l_linenumber": 3,
         "l_quantity": 1.0, "l_extendedprice": 902.0, "l_discount": 0.1,
         "l_tax": 0.08, "l_shipdate": _dt("2260-12-31")},
        # orphan orderkey + novel flag values (new groupBy groups)
        {"l_orderkey": lk, "l_partkey": -5, "l_suppkey": -5,
         "l_linenumber": 1, "l_quantity": 30.0, "l_extendedprice": 30000.0,
         "l_discount": 0.02, "l_tax": 0.04, "l_returnflag": "Ω",
         "l_linestatus": "", "l_shipdate": _dt("1994-01-01")},
    ])

    _append(src, dst, "events", [
        # exact-tie timestamps for one user (session/dedup/rank ties)
        {"event_id": ek + 0, "ts": _dt("2024-03-10 02:30:00"),
         "user_id": 777001, "event_type": "click", "value": 1.5,
         "props": '{"k": "v"}'},
        {"event_id": ek + 1, "ts": _dt("2024-03-10 02:30:00"),
         "user_id": 777001, "event_type": "click", "value": 1.5,
         "props": '{"k": "v"}'},
        # epoch 0 and pre-epoch
        {"event_id": ek + 2, "ts": _dt("1970-01-01 00:00:00"),
         "user_id": 777002, "event_type": "view", "value": 0.0,
         "props": "{}"},
        {"event_id": ek + 3, "ts": _dt("1969-12-31 23:59:59"),
         "user_id": 777002, "event_type": "view", "value": -1.0,
         "props": "{}"},
        # NULL value / NULL ts / NULL props
        {"event_id": ek + 4, "ts": _dt("2024-06-01 12:00:00"),
         "user_id": 777003, "event_type": "purchase", "value": None,
         "props": None},
        {"event_id": ek + 5, "ts": None,
         "user_id": 777003, "event_type": "purchase", "value": 10.0,
         "props": '{"a": 1}'},
        # malformed / adversarial JSON in props
        {"event_id": ek + 6, "ts": _dt("2024-06-01 12:00:01"),
         "user_id": 777004, "event_type": "click", "value": 2.0,
         "props": '{"unterminated": '},
        {"event_id": ek + 7, "ts": _dt("2024-06-01 12:00:02"),
         "user_id": 777004, "event_type": "click", "value": 3.0,
         "props": '{"nested": {"quote\\"": "\\u0000"}}'},
        {"event_id": ek + 8, "ts": _dt("2024-06-01 12:00:03"),
         "user_id": 777004, "event_type": "", "value": 4.0,
         "props": "not json at all"},
        # well-formed JSON with WRONG-TYPED k: a direct
        # try_variant_get(..., 'bigint') numerically casts 1.5 → 1 and
        # true → 1 while json_extract_string + TRY_CAST yields NULL — v1
        # must route through string semantics on both engines (r7 advice)
        {"event_id": ek + 13, "ts": _dt("2024-06-01 12:00:06"),
         "user_id": 777004, "event_type": "click", "value": 5.0,
         "props": '{"k": 1.5}'},
        {"event_id": ek + 14, "ts": _dt("2024-06-01 12:00:07"),
         "user_id": 777004, "event_type": "click", "value": 6.0,
         "props": '{"k": true}'},
        {"event_id": ek + 15, "ts": _dt("2024-06-01 12:00:08"),
         "user_id": 777004, "event_type": "click", "value": 7.0,
         "props": '{"k": 42}'},
        {"event_id": ek + 16, "ts": _dt("2024-06-01 12:00:09"),
         "user_id": 777004, "event_type": "click", "value": 8.0,
         "props": '{"k": "7"}'},
        # integer-format but beyond int64 (passes the regex gate, both
        # TRY_CASTs overflow to NULL) and whitespace-padded digits
        # (both engines trim before casting)
        {"event_id": ek + 17, "ts": _dt("2024-06-01 12:00:10"),
         "user_id": 777004, "event_type": "click", "value": 9.0,
         "props": '{"k": "99999999999999999999999"}'},
        {"event_id": ek + 18, "ts": _dt("2024-06-01 12:00:11"),
         "user_id": 777004, "event_type": "click", "value": 10.0,
         "props": '{"k": " 5"}'},
        # control-char-padded digits: Spark's raw cast trims every char
        # <= 0x20 while DuckDB only [\t\n\f\r ] — the shared INT_GATE_RE
        # (explicit class, applied on BOTH engines) makes this NULL on
        # both instead of 5-vs-NULL (r8 review find)
        {"event_id": ek + 19, "ts": _dt("2024-06-01 12:00:12"),
         "user_id": 777004, "event_type": "click", "value": 11.0,
         "props": '{"k": "\\u000b5"}'},
        # NULL value on a user with 2+ DISTINCT non-null values: the
        # sharp probe for pandas NULL→NaN conflation inside per-group
        # UDFs (a lone NULL-value user hides behind the std<=0 branch)
        {"event_id": ek + 11, "ts": _dt("2024-06-01 12:00:04"),
         "user_id": 777004, "event_type": "click", "value": None,
         "props": "{}"},
        # timestamp-domain EDGES: the last/first pandas-representable
        # days. Timestamps OUTSIDE [1677-09-21, 2262-04-11] are
        # unsupported on any pandas-interop surface — Spark's Arrow
        # conversion coerces timestamp[us]→[ns] and a 2262-04-12 value
        # hard-crashes toPandas, mapInPandas, and every pandas UDF
        # (probed live, r7: ArrowInvalid out-of-bounds). Pure-JVM paths
        # handle Spark's full 0001–9999 range — the lineitem 1600-02-29
        # row above stays green through the whole relational sweep.
        {"event_id": ek + 9, "ts": _dt("2262-04-11 12:00:00"),
         "user_id": 777005, "event_type": "view", "value": 5.0,
         "props": "{}"},
        # lower edge leaves truncation headroom: day/week/month floors
        # and epoch-aligned 7-day buckets of this ts stay above the ns
        # minimum (1677-09-21 00:12:43) — a 1677-09-22 event's 7-day
        # bucket start lands on 1677-09-21 00:00 and overflows (probed)
        {"event_id": ek + 10, "ts": _dt("1677-10-05 06:00:00"),
         "user_id": 777005, "event_type": "view", "value": 6.0,
         "props": "{}"},
    ])


def _tier2_tails(dst: str) -> None:
    """DOMAIN-VIOLATING rows appended on top of the tier-1 fixture
    (``--tier2``): NaN/Inf/1e30 money and NaN event values break the
    data contract the TPC-H-shaped queries assume. The adjudication
    rule differs from tier 1: a LOUD error (either engine) is an
    acceptable outcome for these rows — only SILENT divergences
    (hash mismatch with no error) are findings. Not part of the
    regression-test fixture."""
    _append(dst, dst, "lineitem", [
        {"l_orderkey": 11_000_000, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 1, "l_quantity": 10.0,
         "l_extendedprice": float("nan"), "l_discount": 0.05,
         "l_tax": 0.02, "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": _dt("1995-06-15")},
        {"l_orderkey": 11_000_000, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 2, "l_quantity": 10.0,
         "l_extendedprice": float("inf"), "l_discount": 0.0,
         "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": _dt("1995-06-16")},
        {"l_orderkey": 11_000_001, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 1, "l_quantity": 1e30,
         "l_extendedprice": 1e30, "l_discount": 0.05,
         "l_tax": 0.02, "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": _dt("1995-06-17")},
    ])
    _append(dst, dst, "orders", [
        {"o_orderkey": 21_000_000, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": float("nan"), "o_orderdate": _dt("1996-01-01"),
         "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 21_000_001, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": -1e30, "o_orderdate": _dt("1996-01-02"),
         "o_orderpriority": "2-HIGH"},
    ])
    _append(dst, dst, "events", [
        {"event_id": 31_000_000, "ts": _dt("2024-06-02 09:00:00"),
         "user_id": 778001, "event_type": "view", "value": float("nan"),
         "props": "{}"},
        {"event_id": 31_000_001, "ts": _dt("2024-06-02 09:00:01"),
         "user_id": 778001, "event_type": "view", "value": float("inf"),
         "props": "{}"},
    ])


def build(src: str = SRC, dst: str = DST, tier2: bool = False) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            shutil.copyfile(os.path.join(src, f"{t}.parquet"), out)
    _relational_tails(src, dst)
    if tier2:
        _tier2_tails(dst)

    # documents: original rows + hostile tail (schema preserved exactly)
    dt = pq.read_table(os.path.join(src, "documents.parquet"))
    base = dt.to_pydict()
    next_id = max(base["doc_id"]) + 1
    for i, (text, lang) in enumerate(HOSTILE_DOCS):
        base["doc_id"].append(next_id + i)
        base["text"].append(text)
        base["lang"].append(lang)
        base["source"].append(f"hostile{i % 4}")
        base["n_chars"].append(len(text))
    pq.write_table(
        pa.table(base, schema=dt.schema.remove_metadata()),
        os.path.join(dst, "documents.parquet"))

    # embeddings: original rows + degenerate vectors
    et = pq.read_table(os.path.join(src, "embeddings.parquet"))
    ebase = et.to_pydict()
    dim = len(ebase["embedding"][0])
    nid = max(ebase["vec_id"]) + 1
    dup_of = list(ebase["embedding"][7])            # exact duplicate
    near = [v + (1e-4 if j == 0 else 0.0) for j, v in enumerate(dup_of)]
    hostile_vecs: list[tuple[list[float] | None, int]] = [
        ([0.0] * dim, 0),                           # zero norm
        ([float("nan")] + [0.1] * (dim - 1), 1),    # NaN component
        ([float("inf")] + [0.1] * (dim - 1), 2),    # +Inf component
        ([1e30] * dim, 3),                          # huge magnitude
        ([1e-38] * dim, 4),                         # denormal-adjacent
        (dup_of, 5),                                # exact duplicate
        (near, 6),                                  # near-duplicate
        ([-1.0] * dim, 7),                          # uniform negative
        ([None] + [0.1] * (dim - 1), 0),            # NULL component
        (None, 1),                                  # NULL vector
    ]
    for vec, label in hostile_vecs:
        ebase["vec_id"].append(nid)
        ebase["embedding"].append(vec)
        ebase["label"].append(label)
        nid += 1
    pq.write_table(
        pa.table(ebase, schema=et.schema.remove_metadata()),
        os.path.join(dst, "embeddings.parquet"))
    return dst


if __name__ == "__main__":
    import sys

    print(build(tier2="--tier2" in sys.argv))
