"""The grading driver's correctness sweep covers the FIRST 50 registered
queries, and its evidence accumulates across rounds. plans/__init__.py
COMPUTES that prefix at import — five fixed canaries + 45 never-graded
queries, where "graded" is read from the committed CORRECTNESS_r*.json
files — so every round automatically extends the cumulative driver-green
union (r1 post-mortem: all 50 slots went to one module; r2 post-mortem:
a frozen prefix would re-prove the same 50 queries forever). These tests
pin the registry ordering, the canaries, the rotation property, and the
algorithm's behavior on synthetic grade sets.
"""

from __future__ import annotations

import json
import os

from nf2pq_spark import plans


def test_first_50_are_the_curated_prefix():
    assert len(plans.CURATED_PREFIX) == 50
    first50 = list(plans.REGISTRY)[:50]
    assert first50 == list(plans.CURATED_PREFIX)


def test_prefix_keeps_the_canaries():
    assert len(plans.CANARIES) == 5
    for name in plans.CANARIES:
        assert name in plans.CURATED_PREFIX, f"canary {name} dropped"


def _committed_graded() -> set[str]:
    graded: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fn in sorted(os.listdir(root)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(root, fn)) as f:
                graded |= set(json.load(f))
    return graded


def test_prefix_rotates_to_never_graded_queries():
    """>=45 prefix slots must go to queries with no CORRECTNESS row in any
    committed round — until the never-graded pool itself runs dry."""
    graded = _committed_graded()
    if not graded:
        return  # bare checkout without grade files
    ungraded_total = sum(1 for n in plans.REGISTRY if n not in graded)
    first_time = [n for n in plans.CURATED_PREFIX if n not in graded]
    slots = 45 - len(plans.REGRADE_TAIL_ACTIVE)
    assert len(first_time) >= min(slots, ungraded_total), (
        f"only {len(first_time)} first-time names in the prefix "
        f"({ungraded_total} never-graded queries remain)"
    )


def test_regrade_tail_occupies_the_last_slots_while_active():
    """r4 verdict item 5: the three r1 rows-only names re-enter the
    prefix TAIL until a round >= 5 refreshes their rows, then drop out
    automatically (the computed-from-files property the rotation has
    always had)."""
    active = plans.REGRADE_TAIL_ACTIVE
    if active:
        tail = plans.CURATED_PREFIX[-len(active):]
        assert tail == active
    # the compute_prefix regrade arg pins names to the tail and never
    # duplicates or displaces canaries
    p = plans.compute_prefix(frozenset(), regrade=plans._REGRADE_TAIL)
    assert p[:5] == plans.CANARIES and len(set(p)) == 50
    assert p[-len(plans._REGRADE_TAIL):] == plans._REGRADE_TAIL


def test_rotation_algorithm_on_synthetic_grade_sets():
    reg = list(plans.REGISTRY)

    # nothing graded: canaries + the priority seed head the prefix
    p0 = plans.compute_prefix(frozenset())
    assert p0[:5] == plans.CANARIES and len(set(p0)) == 50

    # one round lands: the next prefix is 45 entirely-new names
    p1 = plans.compute_prefix(frozenset(p0))
    assert p1[:5] == plans.CANARIES
    fresh = [n for n in p1 if n not in set(p0)]
    assert len(fresh) == 45

    # successive rounds never re-grade until the pool is dry, and the
    # union reaches the whole registry
    graded: set[str] = set()
    rounds = 0
    while len(graded) < len(reg) and rounds < 10:
        graded |= set(plans.compute_prefix(frozenset(graded)))
        rounds += 1
    assert len(graded) == len(reg), "rotation never covers some queries"
    assert rounds <= (len(reg) - 5) // 45 + 2

    # everything graded: still a full, duplicate-free, canary-led prefix
    pc = plans.compute_prefix(frozenset(reg))
    assert pc[:5] == plans.CANARIES and len(set(pc)) == 50


def test_failed_rows_are_not_graded():
    """A driver row only counts as graded when it PASSED: hash-green for
    oracle-backed queries, executed-with-rows for rows-only ones. A
    failed or errored row must rotate back into the prefix so the driver
    re-verifies the fix (advice r3: a historically-failed non-canary
    would otherwise never earn a passing row)."""
    from nf2pq_spark.plans import _row_passed

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    assert _row_passed(green)
    assert not _row_passed({**green, "hash_match": False})
    assert not _row_passed({**green, "hash_match": None,
                            "err": "SomeError: boom"})
    # rows-only maximal grade: executed, no oracle
    assert _row_passed({"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": 3,
                        "oracle_rows": None, "err": "no_oracle"})
    # rows-only that never executed
    assert not _row_passed({"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": "no_oracle"})
    # legacy bare-name list shape: assume graded
    assert _row_passed("not-a-dict")


def test_all_graded_cycle_refreshes_stalest_first():
    """r6 verdict item 2: once every query has a passing grade, the
    rotation must fill the cycle slots oldest-passing-round-first (the
    naive registry-order refill would re-grade the registry head forever
    while r1-era grades — on code many rounds of fixes have touched —
    never refresh). Ties within a round break in registry order."""
    reg = list(plans.REGISTRY)
    # synthetic: everything graded, rounds assigned so the STALEST names
    # sit at the registry TAIL (the naive refill would never pick them)
    rounds = {n: (1 if i >= len(reg) - 60 else 5) for i, n in enumerate(reg)}
    for c in plans.CANARIES:
        rounds[c] = 5
    p = plans.compute_prefix(frozenset(reg), grade_rounds=rounds)
    assert p[:5] == plans.CANARIES and len(set(p)) == 50
    body = [n for n in p[5:]]
    # rows-only queries never recycle (r11 verdict item 4: their maximal
    # re-grade is the same `err: no_oracle` row they already hold — the
    # hash-gated companions carry the refreshable evidence), so the
    # stalest-first expectation ranges over oracle-backed names only
    stale = [n for n in reg if rounds[n] == 1 and n not in plans.CANARIES
             and plans.REGISTRY[n].oracle]
    assert body == stale[:45], "cycle slots are not the stalest names"
    assert all(plans.REGISTRY[n].oracle for n in p), \
        "a rows-only query re-entered the all-graded cycle"

    # without round data (synthetic grade sets), registry order still
    # applies — the legacy property
    p_legacy = plans.compute_prefix(frozenset(reg))
    assert p_legacy[:5] == plans.CANARIES and len(set(p_legacy)) == 50

    # and the LIVE prefix (committed grade files, all 253 graded as of
    # r6): every body slot's latest passing round must be <= every
    # non-prefix name's — i.e. the 45 body names ARE a stalest-45 set
    gr = plans._GRADE_ROUNDS
    if gr and all(n in gr for n in plans.REGISTRY):
        body_rounds = [gr[n] for n in plans.CURATED_PREFIX[5:]]
        outside = [gr[n] for n in plans.REGISTRY
                   if n not in set(plans.CURATED_PREFIX)
                   and plans.REGISTRY[n].oracle]  # rows-only never recycle
        assert max(body_rounds) <= min(outside), (
            "a fresher-graded name occupies a cycle slot while a staler "
            "one waits outside the prefix")


def test_prefix_is_mostly_oracle_backed():
    # the sweep is only useful if the prefix rows carry hard hash checks;
    # the registry has 7 rows-only queries and the rotation sends them
    # last, so no prefix can hold more than those 7
    specs = [plans.REGISTRY[n] for n in plans.CURATED_PREFIX]
    n_oracle = sum(1 for s in specs if s.oracle)
    assert n_oracle >= 43, f"only {n_oracle}/50 prefix queries have oracles"
