#!/usr/bin/env python
"""Hostile-but-legal engine-config sweep: determinism under driver variation.

The grading driver hands the engine an arbitrary session. ``ensure_session_conf``
pins what it can (UTC, AQE, Arrow), but deliberately RESPECTS a non-default
shuffle-partition count, and cannot control the master's thread count, scan
split sizing, Arrow batch size, or the Python interpreter's hash seed. Any
query whose value-hash depends on one of those is a latent driver red even
though the vanilla drive (tools/driver_sim.py) is green.

Each profile below perturbs one such axis to an adversarial-but-legal value
and re-runs the full oracle comparison. Profiles need their own JVM (master
and several confs are static), so the default invocation forks one subprocess
per profile:

    python tools/hostile_conf_sim.py                 # all profiles, all queries
    python tools/hostile_conf_sim.py tiny_shuffle    # one profile, all queries
    python tools/hostile_conf_sim.py tiny_shuffle q1_pricing_summary ...

Exit 0 iff every profile's every oracle-backed query hash-matches (rows-only
queries must merely execute), mirroring tools/driver_sim.py.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import (SF, TABLES, register_oracle_views,  # noqa: E402
                              vhash)

#: name -> (master, static+runtime confs, extra env). Values chosen to be
#: maximally unlike the tested local[16]/local[32] x 32-partition layouts:
#: prime partition counts, a 3-thread pool, 17-row Arrow batches (forces
#: multi-batch mapInPandas on every fixture), 256 KB scan splits (shatters
#: every parquet file into many input partitions), and two different fixed
#: PYTHONHASHSEEDs (flushes out Python hash()/set-order dependence in UDFs).
#: per-operator force-spill/fallback thresholds shared VERBATIM by the
#: single-JVM spill profile and the multi-JVM composition below — one
#: definition so the two can never drift.
_SPILL_THRESHOLDS = {
    "spark.shuffle.spill.numElementsForceSpillThreshold": "1000",
    "spark.sql.windowExec.buffer.spill.threshold": "128",
    "spark.sql.windowExec.buffer.in.memory.threshold": "128",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "1000",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": "256",
    "spark.sql.sessionWindow.buffer.in.memory.threshold": "128",
    "spark.sql.cartesianProductExec.buffer.spill.threshold": "1000",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold": "256",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": "7",
    "spark.sql.TungstenAggregate.testFallbackStartsAt": "100,200",
}

PROFILES: dict[str, tuple[str, dict[str, str], dict[str, str]]] = {
    "tiny_shuffle": ("local[3]", {
        "spark.sql.shuffle.partitions": "7",
        "spark.default.parallelism": "5",
    }, {}),
    "tiny_arrow_batch": ("local[4]", {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "17",
    }, {}),
    "shattered_scans": ("local[4]", {
        "spark.sql.files.maxPartitionBytes": "262144",
        "spark.sql.files.openCostInBytes": "0",
    }, {}),
    "hash_seed_a": ("local[4]", {}, {"PYTHONHASHSEED": "1"}),
    "hash_seed_b": ("local[4]", {}, {"PYTHONHASHSEED": "31337"}),
    # maximally-offset host timezone (UTC+14): ensure_session_conf pins
    # the SESSION to UTC, but the JVM's user.timezone, Python's
    # datetime.fromtimestamp/localtime, pandas' tz-naive conversions,
    # and DuckDB's TimeZone setting all read the HOST zone — any leak
    # of local time into a seeder, a UDF, or an oracle shifts every
    # timestamp by 14 hours and flips date-boundary buckets (r7 lens)
    "hostile_tz": ("local[4]", {}, {"TZ": "Pacific/Kiritimati"}),
    # Turkish locale: the classic JVM hazard — any code path using
    # Locale.getDefault() case mapping turns I→ı / i→İ (the reason f8's
    # fingerprint folds only [A-Z] explicitly); also flips decimal
    # separators in naive number formatting. Python's str methods are
    # locale-independent, but the JVM and any C library honor LC_ALL.
    "hostile_locale": ("local[4]", {},
                       {"LANG": "tr_TR.UTF-8", "LC_ALL": "tr_TR.UTF-8"}),
    # spill pressure: the one execution axis a 128 GiB sandbox never
    # exercises and a 100 TB cluster always does — NOTHING in the clean
    # sweeps has ever spilled, so sort-spill merge order, sort-based
    # agg fallback, and spillable-buffer windows were unproven. A small
    # heap + low memory fraction makes acquisition pressure real, and
    # the documented per-operator thresholds force the spill/fallback
    # code paths to fire DETERMINISTICALLY on every operator that has
    # one (UnsafeExternalSorter external merge, window/SMJ spillable
    # buffers, ObjectHashAggregate sort fallback, hash-agg sort
    # fallback via the TungstenAggregate test hook). The UI is enabled
    # so run_profile can read stage metrics and FAIL the profile as
    # vacuous if nothing actually spilled (r7 verdict item 1).
    # (8g heap, not smaller: the local-mode driver also hosts every
    # toPandas collect and broadcast — a 3g heap OOM-killed the JVM
    # mid-sweep; the THRESHOLDS are what force the spill paths, the
    # heap+fraction just keep the acquisition pressure honest)
    "spill_pressure": ("local[4]", {
        "spark.driver.memory": "8g",
        "spark.memory.fraction": "0.15",
        "spark.memory.storageFraction": "0.1",
        **_SPILL_THRESHOLDS,
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "100000",
    }, {}),
    # REAL multi-JVM execution: every sweep before r10 ran ONE JVM
    # (local[N]), where "shuffle" is an in-process byte copy and
    # "broadcast" never crosses a socket. local-cluster forks 2 real
    # executor JVMs (standalone master/worker in-process, executors as
    # child processes): network shuffle fetch, serializer round-trips,
    # broadcast over the wire, Python DataSource / mapInPandas workers
    # living under executor JVMs that must import the package via
    # executorEnv.PYTHONPATH (the driver's sys.path.insert does NOT
    # propagate — exactly the class of bug this profile exists to
    # catch). run_profile guards against vacuous green by requiring
    # >= 2 non-driver executors via the REST API.
    "local_cluster": ("local-cluster[2,8,4096]", {
        "spark.executor.memory": "4g",
        "spark.executorEnv.PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
    }, {}),
    # multi-JVM x spill pressure (r10 verdict item 2): the two strongest
    # axes COMPOSED — serialization bugs love spill paths, and before
    # this profile every spill engagement ran single-JVM (in-process
    # shuffle) while every multi-JVM run had comfortable memory. Same
    # per-operator thresholds as spill_pressure (shared dict — no
    # drift), same real-executor layout and vacuous-guards as
    # local_cluster: external sort merges, window/SMJ spillable buffers
    # and hash-agg sort fallback all fire inside REAL executor JVMs
    # whose spill files and shuffle blocks cross process boundaries.
    # (8g executors, not 4g: with the forced thresholds the object-agg
    # and checkpoint paths OOMed 4g executor JVMs on 4 heavy queries —
    # exit 52 — same sizing rationale as spill_pressure's 8g driver)
    "local_cluster_spill": ("local-cluster[2,8,8192]", {
        "spark.executor.memory": "8g",
        "spark.executorEnv.PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        "spark.driver.memory": "8g",     # driver still hosts the collects
        "spark.memory.fraction": "0.15",
        "spark.memory.storageFraction": "0.1",
        **_SPILL_THRESHOLDS,
        "spark.ui.enabled": "true",
        "spark.ui.port": "0",
        "spark.ui.retainedStages": "100000",
    }, {}),
    # every knob at once: single-axis green does not prove the axes
    # don't INTERACT (e.g. a locale-sensitive format under an offset
    # zone inside a tiny Arrow batch) — one combined profile closes that
    "everything": ("local[3]", {
        "spark.sql.shuffle.partitions": "7",
        "spark.default.parallelism": "5",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "17",
        "spark.sql.files.maxPartitionBytes": "262144",
        "spark.sql.files.openCostInBytes": "0",
    }, {"PYTHONHASHSEED": "31337", "TZ": "Pacific/Kiritimati",
        "LANG": "tr_TR.UTF-8", "LC_ALL": "tr_TR.UTF-8"}),
}


def _spilled_bytes(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all stages so
    far, via the UI REST API (the profile enables the UI on an ephemeral
    port). Returns (0, 0) when the UI is off."""
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return (0, 0)
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages",
                                timeout=30) as resp:
        stages = json.load(resp)
    return (sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages))


#: node metrics that prove a spill/fallback path fired in that operator
_ENGAGEMENT_METRICS = ("spill size", "number of sort fallback tasks")


def _metric_engaged(value: str) -> bool:
    """True iff a REST metric display string is nonzero. Values come as
    '4', '645.0 MiB', or 'total (min, med, max (stageId: taskId))\\n7.9
    GiB (...)' — the leading numeric token of the LAST line is the
    total."""
    import re

    head = value.splitlines()[-1].split("(", 1)[0].strip()
    m = re.match(r"([0-9][0-9.]*)", head)
    return bool(m) and float(m.group(1)) > 0


def _sql_spill_attribution(spark, min_id: int):
    """Per-OPERATOR spill/fallback engagement from the SQL REST endpoint
    (stage counters say THAT something spilled; the per-node metrics say
    WHERE). Returns (next_min_id, {operator -> set of engaged metric
    names}) over executions with id >= min_id."""
    import json
    import urllib.request

    sc = spark.sparkContext
    try:
        with urllib.request.urlopen(
                f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
                f"/sql?details=true&length=100000", timeout=30) as resp:
            sqls = json.load(resp)
    except Exception:  # noqa: BLE001 — diagnostics never fail the sweep
        return min_id, {}
    ops: dict[str, set[str]] = {}
    nxt = min_id
    for ex in sqls:
        if ex.get("id", -1) < min_id:
            continue
        nxt = max(nxt, ex["id"] + 1)
        for node in ex.get("nodes", []):
            for met in node.get("metrics", []):
                if (met["name"] in _ENGAGEMENT_METRICS
                        and _metric_engaged(met["value"])):
                    ops.setdefault(node["nodeName"].split("(")[0].strip(),
                                   set()).add(met["name"])
    return nxt, ops


def run_profile(profile: str, names: list[str] | None) -> int:
    """Run the oracle sweep under one profile (in THIS process)."""
    import duckdb
    from pyspark.sql import SparkSession

    master, confs, _env = PROFILES[profile]
    builder = (SparkSession.builder.master(master)
               .appName(f"hostile-{profile}")
               .config("spark.ui.enabled", "false"))
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    import __spark_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = names or sorted(qs)

    con = duckdb.connect()
    register_oracle_views(con, SF)
    # the spill profile must PROVE the spill paths fired, else it is
    # vacuous green — track the per-query delta of the stage-level
    # spill counters and require both a nonzero total and a spread of
    # affected queries (not one lucky sort)
    check_spill = profile in ("spill_pressure", "local_cluster_spill")
    spilled_queries: list[str] = []
    prev_spill = _spilled_bytes(spark) if check_spill else (0, 0)
    #: operator -> (metric names seen engaged, # queries it engaged in)
    op_engaged: dict[str, set[str]] = {}
    op_queries: dict[str, int] = {}
    sql_cursor = 0
    bad = []
    t0 = time.time()
    if master.startswith("local-cluster"):
        # vacuous-guard: the whole point is multi-JVM execution — prove
        # the executors are real separate processes, not the driver.
        # Executors register asynchronously; poll briefly.
        import json
        import urllib.request

        sc = spark.sparkContext
        n_exec = 0
        for _ in range(60):
            with urllib.request.urlopen(
                    f"{sc.uiWebUrl}/api/v1/applications/"
                    f"{sc.applicationId}/executors", timeout=30) as resp:
                n_exec = sum(1 for e in json.load(resp)
                             if e["id"] != "driver")
            if n_exec >= 2:
                break
            time.sleep(1)
        worker_pids = set(sc.parallelize(range(8), 8).mapPartitions(
            lambda _: [__import__("os").getpid()]).collect())
        if n_exec < 2 or os.getpid() in worker_pids:
            bad.append(f"VACUOUS: not multi-JVM (executors={n_exec}, "
                       f"driver pid in workers={os.getpid() in worker_pids})")
        else:
            print(f"[{profile}] multi-JVM proven: {n_exec} executors, "
                  f"{len(worker_pids)} worker pids distinct from driver")
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
        if check_spill:
            cur = _spilled_bytes(spark)
            if cur != prev_spill:
                spilled_queries.append(name)
            prev_spill = cur
            # attribute the engagement to OPERATORS, not just stages:
            # which physical nodes actually took a spill/fallback path
            # during this query's executions (r8 carried item — the
            # stage counters proved THAT the paths fire, this records
            # WHERE)
            sql_cursor, ops = _sql_spill_attribution(spark, sql_cursor)
            for op, mets in ops.items():
                op_engaged.setdefault(op, set()).update(mets)
                op_queries[op] = op_queries.get(op, 0) + 1
    if check_spill:
        mem, disk = prev_spill
        print(f"[{profile}] spill engagement: {len(spilled_queries)} "
              f"queries spilled, {mem / 1e6:.0f} MB memory / "
              f"{disk / 1e6:.0f} MB disk total")
        for op in sorted(op_queries, key=op_queries.get, reverse=True):
            print(f"[{profile}]   {op}: engaged in {op_queries[op]} "
                  f"queries ({', '.join(sorted(op_engaged[op]))})")
        agg_fallback = any("number of sort fallback tasks" in m
                           for op, m in op_engaged.items()
                           if op.startswith("HashAggregate"))
        if disk <= 0 or len(spilled_queries) < 5:
            bad.append(f"VACUOUS: spill never engaged (disk={disk}, "
                       f"queries={len(spilled_queries)})")
        elif not agg_fallback:
            # the TungstenAggregate test hook is configured — its
            # absence from every execution means the hook silently
            # stopped engaging (A/B-proven to fire in r8)
            bad.append("VACUOUS: hash-agg sort fallback never attributed "
                       "to a HashAggregate node")
    status = "OK" if not bad else "BAD"
    print(f"[{profile}] {status}: {len(names)} queries in "
          f"{time.time() - t0:.0f}s" + (f"; failures: {bad}" if bad else ""))
    return 0 if not bad else 1


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--run-profile":
        # child mode: the parent already set env and picked the profile
        return run_profile(args[1], args[2:] or None)

    profiles = [args[0]] if args and args[0] in PROFILES else list(PROFILES)
    names = args[1:] if args and args[0] in PROFILES else args
    rc = 0
    for p in profiles:
        env = dict(os.environ, **PROFILES[p][2])
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run-profile", p,
             *names],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        rc = rc or r.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
