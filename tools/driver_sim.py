#!/usr/bin/env python
"""Simulate the grading driver: vanilla SparkSession -> __spark_entry__
contract -> DuckDB oracles at sf0.01.

This is the end-to-end drive the verify skill prescribes
(.claude/skills/verify/SKILL.md): the session carries NO engine confs —
the engine must self-configure through ensure_session_conf exactly as it
does under the real driver — and results are compared with the same
order-insensitive value hash the driver uses.

    python tools/driver_sim.py            # the graded 50-query prefix
    python tools/driver_sim.py --all      # all registered queries
    python tools/driver_sim.py q1_pricing_summary j8_asof_join ...
    python tools/driver_sim.py --cold     # clear /tmp/nf2pq_* caches first

Exit code 0 iff every selected query matches (rows-only queries must
merely execute).
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
SF = os.environ.get("NF2PQ_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def register_oracle_views(con, sf: str) -> None:
    """Create the ten table views on a DuckDB connection. A table may be
    a single file (the driver's fixtures) or a DIRECTORY of part files
    (the multi-file layout fixture, where file-listing order is the
    axis under test) — Spark reads both spellings natively, DuckDB
    needs the glob for the dir form. ONE definition for every sweep
    (driver_sim, hostile_conf_sim, the suite's differential tests), so
    dir support cannot drift between them."""
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")


def vhash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    lines = sorted(
        ",".join(repr(v.tolist() if hasattr(v, "tolist") else v)
                 for v in row)
        for row in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    args = [a for a in sys.argv[1:]]
    if "--cold" in args:
        args.remove("--cold")
        for p in glob.glob("/tmp/nf2pq_*"):
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)

    # VANILLA on purpose: no engine confs — that is the point of the drive
    spark = (SparkSession.builder.master("local[16]")
             .appName("driver-sim").config("spark.ui.enabled", "false")
             .getOrCreate())
    import __spark_entry__ as entrymod
    # plain statement, NOT assert: python -O would strip the assert and
    # its entry() call with it — the one thing the real driver checks
    if len(entrymod.entry(spark).collect()) == 0:
        raise RuntimeError("entry() smoke failed")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    if "--all" in args:
        names = sorted(qs)
    elif args:
        names = args
    else:
        from nf2pq_spark import plans
        names = list(plans.CURATED_PREFIX)

    con = duckdb.connect()
    register_oracle_views(con, SF)
    bad = []
    t0 = time.time()
    for name in names:
        try:
            s = qs[name](spark, SF).toPandas()
            if name in oracles:
                d = con.execute(oracles[name]).fetchdf()
                ok = (len(s) == len(d)
                      and sorted(s.columns) == sorted(d.columns)
                      and vhash(s) == vhash(d))
                if not ok:
                    bad.append(name)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append(f"{name}: {type(ex).__name__} {str(ex)[:120]}")
    status = "OK" if not bad else "BAD"
    print(f"{status}: {len(names)} queries in {time.time() - t0:.0f}s"
          + (f"; failures: {bad}" if bad else ""))
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
