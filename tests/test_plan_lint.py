"""Registry-wide physical-plan lint: every graded batch query's plan is
checked for scale red flags (SURVEY §4) without executing it.

- no CartesianProduct anywhere (broadcast-nested-loop with a predicate is
  the accepted non-equi form; an unconstrained cartesian is always a bug
  at 100 TB) — except the explicitly-cartesian j9;
- no BatchEvalPython (row-at-a-time Python UDF): Python must only appear
  as Arrow-batched nodes (ArrowEvalPython / FlatMapGroupsInPandas /
  MapInPandas / FlatMapGroupsInPandasWithState).
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
    plan = df._jdf.queryExecution().executedPlan().toString()
    if spec.name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{spec.name}: cartesian join"
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
