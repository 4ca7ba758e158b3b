"""The grading driver's correctness sweep covers the FIRST 50 registered
queries. plans/__init__.py curates that prefix to span every SURVEY §2
family; this test pins it so a future module reshuffle or new @register
cannot silently reorder the registry and waste the sweep (r1 post-mortem:
all 50 slots went to one module).
"""

from __future__ import annotations

from nf2pq_spark import plans


def test_first_50_are_the_curated_prefix():
    assert len(plans.CURATED_PREFIX) == 50
    first50 = list(plans.REGISTRY)[:50]
    assert first50 == list(plans.CURATED_PREFIX)


def test_prefix_spans_the_survey_families():
    specs = [plans.REGISTRY[n] for n in plans.CURATED_PREFIX]
    tags = {t for s in specs for t in s.tags}
    # one representative per §2 family group must sit inside the prefix
    for family in ("S2", "S4", "S5", "S6", "J8", "A8", "F1", "F6", "F7",
                   "T1", "T3", "T4", "T5", "T6", "T7", "T8",
                   "L1", "L2", "L3", "L4", "X1", "X2", "X3", "X4", "X5",
                   "SQL"):
        assert family in tags, f"curated prefix lost family {family}"


def test_prefix_is_mostly_oracle_backed():
    # the sweep is only useful if the prefix rows carry hard hash checks
    specs = [plans.REGISTRY[n] for n in plans.CURATED_PREFIX]
    n_oracle = sum(1 for s in specs if s.oracle)
    assert n_oracle >= 48, f"only {n_oracle}/50 prefix queries have oracles"
