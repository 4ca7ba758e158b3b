#!/usr/bin/env python
"""Hostile PHYSICAL-LAYOUT fixture: same logical tables, adversarial files.

The corpus sweeps vary the DATA (hostile_corpus_fixture) and the engine
CONFIG (hostile_conf_sim), but every sweep so far read the fixture
parquet exactly as the generator wrote it: one writer's row order, row
group sizing, dictionary encoding, page version, and compression. A
100 TB deployment controls none of those — files arrive from many
writers, rows in arbitrary order, and a scan's split boundaries follow
the row groups. Any query whose value-hash depends on input row order
(tie-breaks taken from encounter order, non-stabilized float
accumulation, `first`/`any_value` semantics) or on a decoder quirk is
a latent driver red that the clean fixture can never expose.

This builder rewrites every table with, per table deterministically:

* a seeded random PERMUTATION of all rows (the big axis);
* tiny row groups (997 rows) — many scan split points instead of one;
* zstd compression, dictionary encoding OFF, data-page version 2.0 —
  the decoder paths the snappy/dictionary/v1 fixture never touches.

Both engines read the same rewritten files, so a divergence is an
order/decoder dependence in a QUERY, not an ingestion artifact.

    python tools/hostile_layout_fixture.py [dst]     # build, print dst
    NF2PQ_VERIFY_SF_DIR=<dst> python tools/driver_sim.py --all

One file per table (not a multi-file dir): the oracle views read
``read_parquet('<sf>/<t>.parquet')``, which must stay a single file —
the multi-file/listing-order axis is exercised by the conf sweep's
shattered_scans profile instead (many input splits per file). Composes
with hostile_corpus_fixture: build the corpus tails first, then point
``src`` here at that directory for adversarial rows in adversarial
files.
"""

from __future__ import annotations

import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def build(src: str = "/root/testdata/sf0.01",
          dst: str = "/tmp/nf2pq_hostile_layout",
          seed: int = 1337, row_group_rows: int = 997) -> str:
    import numpy as np
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for i, t in enumerate(TABLES):
        table = pq.read_table(os.path.join(src, f"{t}.parquet"))
        perm = np.random.RandomState(seed + i).permutation(len(table))
        pq.write_table(
            table.take(perm),
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=row_group_rows,
            compression="zstd",
            use_dictionary=False,
            data_page_version="2.0",
        )
    return dst


if __name__ == "__main__":
    out = build(dst=sys.argv[1] if len(sys.argv) > 1
                else "/tmp/nf2pq_hostile_layout")
    print(out)
