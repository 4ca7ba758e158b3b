"""Registry-wide physical-plan lint: every graded batch query's plan is
checked for scale red flags (SURVEY §4) without executing it.

- no CartesianProduct anywhere (broadcast-nested-loop with a predicate is
  the accepted non-equi form; an unconstrained cartesian is always a bug
  at 100 TB) — except the explicitly-cartesian j9;
- no BatchEvalPython (row-at-a-time Python UDF): Python must only appear
  as Arrow-batched nodes (ArrowEvalPython / FlatMapGroupsInPandas /
  MapInPandas / FlatMapGroupsInPandasWithState);
- no condition-less BroadcastNestedLoopJoin unless one side is BOUNDED
  (data-scale-free): a 1-row global aggregate (the repo's scalar-fold
  pattern for attaching a total without an eager .count()), a
  driver-local relation (IVF centroids), or a tiny generated Range
  (t6's date spine). A BNLJ *with* a predicate is the accepted non-equi
  join form (l3's top-k anti-self pair); any other bare BNLJ is a real
  nested-loop blow-up hiding behind the benign ones (r4 verdict item 3).
"""

from __future__ import annotations

import pytest

from nf2pq_spark import plans

#: intentional cartesian (J9 is the cross-join operator itself)
_CARTESIAN_OK = {"j9_cross_join"}

#: unpartitioned (global) windows funnel their whole input through ONE
#: task — allowed only where the window input is a bounded-domain
#: aggregate (w6: per-nation rows). Everything else must use a broadcast
#: scalar total instead (see sql24's rework). Empirically attributed r4:
#: a marker-instrumented cold 253-query sweep showed every
#: "WindowExec: No Partition Defined" warning (9 total) comes from
#: w6_ratio_to_report executions — the whitelisted bounded-domain case —
#: and none from anywhere else.
_GLOBAL_WINDOW_OK = {"w6_ratio_to_report"}


def _iter_jnodes(node):
    """Walk a JVM SparkPlan tree (descending through AdaptiveSparkPlan's
    hidden input plan — its children() is empty)."""
    yield node
    if node.nodeName() == "AdaptiveSparkPlan":
        yield from _iter_jnodes(node.inputPlan())
        return
    ch = node.children()
    for i in range(ch.length()):
        yield from _iter_jnodes(ch.apply(i))


#: unary wrappers that sit between a join input and the node that
#: determines its cardinality
_SIDE_WRAPPERS = ("BroadcastExchange", "BroadcastQueryStage",
                  "ReusedExchange", "InputAdapter", "WholeStageCodegen",
                  "ColumnarToRow")


def _is_bounded_side(node) -> bool:
    """True iff this join input's cardinality is independent of the fact
    data's size — the only sides a condition-less BNLJ may broadcast:

    - a 1-row global aggregate (``HashAggregate(keys=[], ...)``): the
      scalar-fold pattern (g1/g3/l28 totals);
    - a subtree whose every LEAF is data-scale-free: a driver-local
      relation (``LocalTableScan`` / ``Scan ExistingRDD`` — it already
      fit in driver memory, e.g. IVF's n_cells centroid list) or a
      generated ``Range`` of at most a handful of rows (t6's date spine
      is explode(sequence(...)) over Range(0, 1) — the cross's size is
      the calendar domain, not the corpus).
    """
    import re

    unwrapped = node
    while (unwrapped.nodeName().startswith(_SIDE_WRAPPERS)
           and unwrapped.children().length() == 1):
        unwrapped = unwrapped.children().apply(0)
    head = unwrapped.toString().splitlines()[0]
    if "Aggregate" in unwrapped.nodeName() and "keys=[]" in head:
        return True

    leaves = [x for x in _iter_jnodes(unwrapped)
              if x.children().length() == 0]
    if not leaves:
        return False
    for leaf in leaves:
        lhead = leaf.toString().splitlines()[0]
        if leaf.nodeName() == "LocalTableScan" or "ExistingRDD" in lhead:
            continue
        m = re.match(r"Range \((-?\d+), (-?\d+)", lhead)
        if m and int(m.group(2)) - int(m.group(1)) <= 64:
            continue
        return False
    return True


def _bad_bnlj_nodes(jplan) -> list[str]:
    """Condition-less BroadcastNestedLoopJoins where NEITHER side is
    bounded (1-row aggregate / driver-local / tiny Range) — the
    real-nested-loop signature. Conditioned BNLJ is the accepted
    non-equi join form and is left to the per-query plan review."""
    bad = []
    for n in _iter_jnodes(jplan):
        if "BroadcastNestedLoopJoin" not in n.nodeName():
            continue
        if n.condition().isDefined():
            continue
        ch = n.children()
        sides = [ch.apply(i) for i in range(ch.length())]
        if not any(_is_bounded_side(s) for s in sides):
            bad.append(n.toString().splitlines()[0])
    return bad


def _has_unpartitioned_window(plan: str) -> bool:
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.group(1).split(",")[0].strip()
        # partition columns precede ordering specs; a leading ASC/DESC or
        # frame spec means the partition list is empty
        if " ASC" in first or " DESC" in first                 or first.startswith("specifiedwindowframe"):
            return True
    return False

#: Every registered spec is linted. Queries whose fn EXECUTES work when
#: called (streaming runs, sink round-trips) carry a ``lint_probe`` that
#: builds the same transformation core on batch inputs (stream-batch
#: equivalence — the cores are shared functions, so the probe can't
#: drift from the streamed plan); everything else plans its real fn.
#: Source-family fns (s4*/s5*/s6*/mm2) synthesize their /tmp fixtures on
#: first call (stamped caches shared with the correctness tests) — cheap
#: at the test scale factor and not a streaming execution.
_ALL_SPECS = list(plans.REGISTRY.values())


@pytest.mark.parametrize("spec", _ALL_SPECS, ids=lambda s: s.name)
def test_plan_has_no_scale_red_flags(spark, sf_dir, spec):
    df = (spec.lint_probe or spec.fn)(spark, sf_dir)
    jplan = df._jdf.queryExecution().executedPlan()
    plan = jplan.toString()
    if spec.name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{spec.name}: cartesian join"
        bad = _bad_bnlj_nodes(jplan)
        assert not bad, (
            f"{spec.name}: condition-less BroadcastNestedLoopJoin with no "
            f"1-row-aggregate side — real nested loop, not a scalar fold: "
            f"{bad}"
        )
    assert "BatchEvalPython" not in plan, (
        f"{spec.name}: row-at-a-time Python UDF in plan"
    )
    if spec.name not in _GLOBAL_WINDOW_OK:
        assert not _has_unpartitioned_window(plan), (
            f"{spec.name}: unpartitioned window — single-task funnel; use a"
            " broadcast scalar aggregate unless the input is bounded"
        )


def test_no_driver_materialization_in_graded_fns():
    """No graded fn may pull a fixture table through the driver: at the
    100 TB design point a `.toPandas()`/`.collect()` of table-shaped data
    inside the graded path is a driver OOM. Source-checked over every
    module that registers queries (r1 verdict item 2 regression guard).

    Whitelisted, with reasons:
    - `approxQuantile` (O(1) boundary values, not rows);
    - ipfix.py's two-phase template harvest + sketch.py's CMS table
      (KB-sized, audited in r1) live outside plans/ and are not matched;
    - `status.count()` write barriers return one row per pack bucket.
    """
    import inspect
    import re
    import sys

    seen_modules = {spec.fn.__module__ for spec in plans.REGISTRY.values()}
    offenders = []
    for mod_name in sorted(seen_modules):
        src = inspect.getsource(sys.modules[mod_name])
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#")[0]
            if re.search(r"\.toPandas\(\)|\.collect\(\)", code):
                offenders.append(f"{mod_name}:{i}: {line.strip()}")
    assert not offenders, (
        "driver-side materialization in graded modules:\n" + "\n".join(offenders)
    )
