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

``n_files=1`` (default) writes each table as a single file;
``n_files>1`` writes ``<t>.parquet/`` as a DIRECTORY of part files,
with rows dealt round-robin across files and file NAMES chosen so the
listing order disagrees with the logical order — the file-listing /
scan-task-ordering axis a many-writer deployment always has
(driver_sim's oracle views read the dir via a glob). Composes with
hostile_corpus_fixture: build the corpus tails first, then point
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
          seed: int = 1337, row_group_rows: int = 997,
          n_files: int = 1) -> str:
    import numpy as np
    import pyarrow.parquet as pq

    import shutil

    os.makedirs(dst, exist_ok=True)
    opts = dict(row_group_size=row_group_rows, compression="zstd",
                use_dictionary=False, data_page_version="2.0")
    for i, t in enumerate(TABLES):
        table = pq.read_table(os.path.join(src, f"{t}.parquet"))
        perm = np.random.RandomState(seed + i).permutation(len(table))
        out = os.path.join(dst, f"{t}.parquet")
        # self-clean: a rebuild into an existing dst with a DIFFERENT
        # n_files would otherwise leave stale part files next to the
        # new ones (silently duplicated rows under the glob) or hit a
        # leftover directory with the single-file write (r8 review)
        if os.path.isdir(out):
            shutil.rmtree(out)
        elif os.path.exists(out):
            os.remove(out)
        if n_files <= 1 or len(table) < n_files:
            pq.write_table(table.take(perm), out, **opts)
            continue
        os.makedirs(out, exist_ok=True)
        for k in range(n_files):
            # round-robin slices, and REVERSED file numbering so the
            # lexicographic listing order disagrees with both logical
            # order and write order
            pq.write_table(table.take(perm[k::n_files]),
                           os.path.join(out,
                                        f"part-{n_files - 1 - k:03d}.parquet"),
                           **opts)
    return dst


if __name__ == "__main__":
    out = build(dst=sys.argv[1] if len(sys.argv) > 1
                else "/tmp/nf2pq_hostile_layout")
    print(out)
