#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to a directory.

Optimization-round evidence tool: captures the physical plan of each
named query (default: the bench set) into <outdir>/<query>_<tag>.txt so
before/after plan diffs can be committed alongside OPTIMIZATION_r*.md.

    python tools/explain_dump.py --out plans/r13 --tag before [names...]

Notes: query functions with eager localCheckpoints execute those
sub-jobs while building the frame (that is what the checkpoint is for),
so this runs real Spark jobs for the heavy graph/dedup queries; the
captured plan is the FINAL frame's initial AQE plan, the same thing
`df.explain("formatted")` shows a user.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nf2pq_spark import plans  # noqa: E402
from nf2pq_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = args.names or [s.name for s in plans.REGISTRY.values() if s.bench]
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("explain-dump",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = plans.REGISTRY[name].fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
