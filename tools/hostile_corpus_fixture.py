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


def build(src: str = SRC, dst: str = DST) -> str:
    os.makedirs(dst, exist_ok=True)
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]
    for t in tables:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            shutil.copyfile(os.path.join(src, f"{t}.parquet"), out)

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
    print(build())
