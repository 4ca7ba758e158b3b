"""Driver-contract edge cases (r6 verdict item 4).

The grading driver imports ``__spark_entry__`` and may legally drive it
in ways the repo's own tooling never does: call ``oracle_sql()`` before
``queries()``, call either twice, run ``entry()`` again on a warm
session, spell ``sf_dir`` with a trailing slash or through a symlink,
or consume a returned DataFrame more than once. None of that is
documented as forbidden, so all of it must work — these tests drive
each edge the hostile-but-legal way.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from nf2pq_spark import plans  # noqa: E402

# queries exercised for the sf_dir-spelling and double-consume edges:
# a plain relational plan, a scalar-function plan over a second table,
# and the rollup plan whose /tmp cache is KEYED on the sf_dir basename
# (the spelling-sensitive path: a trailing slash must normalize to the
# same cache tag, not a tag of "").
_SAMPLE = ["q1_pricing_summary", "f7_flownet", "rl1_hypertable_rollup"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_contract_functions_are_stable_and_order_independent():
    """oracle_sql() before queries(), then both again: same keys, same
    insertion order (the driver grades the FIRST 50), oracle keys a
    subset of query keys, and the returned dicts are fresh objects —
    a driver mutating one must not corrupt the next call."""
    o1 = entry_mod.oracle_sql()          # out of order: oracles first
    q1 = entry_mod.queries()
    o2 = entry_mod.oracle_sql()
    q2 = entry_mod.queries()
    assert list(q1) == list(q2) and list(o1) == list(o2)
    assert set(o1) <= set(q1)
    assert list(q1)[:50] == list(plans.CURATED_PREFIX)
    assert o1 == o2
    # mutation of a returned dict is invisible to later calls
    q1.clear()
    o1.pop(next(iter(o1)))
    assert list(entry_mod.queries()) == list(q2)
    assert entry_mod.oracle_sql() == o2


def test_entry_twice_on_warm_session(spark):
    """A second entry(spark) on an already-configured session must
    return the same result with the same schema — ensure_session_conf
    reapplying on a warm session is a no-op, not an error or a drift."""
    df1 = entry_mod.entry(spark)
    r1 = _rows(df1)
    assert len(r1) > 0
    df2 = entry_mod.entry(spark)
    assert df2.schema == df1.schema
    assert _rows(df2) == r1


def test_sf_dir_spellings_are_equivalent(spark, sf_dir, tmp_path):
    """Trailing slash and symlinked sf_dir resolve to the same rows and
    schema as the canonical spelling for every sampled query."""
    link = str(tmp_path / "sfln")
    os.symlink(sf_dir, link)
    qs = entry_mod.queries()
    for name in _SAMPLE:
        base_df = qs[name](spark, sf_dir)
        base = _rows(base_df)
        for spelling in (sf_dir + "/", link):
            df = qs[name](spark, spelling)
            assert df.schema == base_df.schema, (name, spelling)
            assert _rows(df) == base, (name, spelling)


def test_result_dataframes_survive_double_consumption(spark, sf_dir):
    """The driver may count(), then collect(), then collect() again on
    the same returned DataFrame — /tmp-cache-backed plans (rl1) must not
    have torn down anything a re-execution needs."""
    qs = entry_mod.queries()
    for name in _SAMPLE:
        df = qs[name](spark, sf_dir)
        n = df.count()
        first = _rows(df)
        assert len(first) == n
        assert _rows(df) == first, name


def test_streaming_query_reruns_in_one_session(spark, sf_dir):
    """Streaming plans create checkpoint dirs and memory-sink tables;
    a driver re-invoking one in the same session (retry, or grading the
    prefix twice) must get identical rows, not a name/path collision."""
    qs = entry_mod.queries()
    df1 = qs["st1_stream_tumbling"](spark, sf_dir)
    r1 = _rows(df1)
    assert len(r1) > 0
    df2 = qs["st1_stream_tumbling"](spark, sf_dir)
    assert _rows(df2) == r1


def test_deferred_consumption_across_queries(spark, sf_dir):
    """A driver may build several query DataFrames first and collect
    them later — any plan that depends on session conf at ACTION time
    (etl2 toggles partitionOverwriteMode inside its fn) or on /tmp
    state a later query touches must still evaluate to the same rows."""
    qs = entry_mod.queries()
    names = ["q1_pricing_summary", "etl2_partition_overwrite",
             "a8_collect"]
    held = [(n, qs[n](spark, sf_dir)) for n in names]   # build all first
    for n, df in held:                                  # consume after
        fresh = _rows(qs[n](spark, sf_dir))
        assert _rows(df) == fresh, n
