"""JVM-free differential pins for Python-side UDF kernels whose oracle
mirrors SQL TRY_CAST semantics (r7 advice: x8's arrow kernel raised
ArrowInvalid on int64 overflow instead of degrading to NULL per row).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa


def test_name_suffix_arrow_matches_duckdb_try_cast_on_int64_boundary():
    """The x8 kernel must equal regexp_extract + TRY_CAST row-for-row on
    every cast edge: beyond-int64 digit runs, the exact int64 max and
    max+1 boundary, values hidden behind 20+ leading zeros (a
    length-bounded regex would wrongly NULL these), all-zero digit runs,
    non-format names, empty strings, and NULLs."""
    from nf2pq_spark.plans.udf_surface import _name_suffix_arrow

    names = [
        "Customer#000000001",
        "Customer#0",
        "Customer#000",
        "Customer#00000000000000000000007",   # 23 digits, value 7
        "Customer#9223372036854775807",       # int64 max
        "Customer#9223372036854775808",       # int64 max + 1 → NULL
        "Customer#9999999999999999999",       # 19 digits over max → NULL
        "Customer#99999999999999999999999",   # 23 digits → NULL
        "Customer#1000000000000000000",       # 19 digits in range
        "Customer#", "Customer#12x", "junk", "", None, "Ärna Müller-Ω",
    ]
    got = _name_suffix_arrow(pa.array(names, pa.string())).to_pylist()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in names])
    exp = [r[0] for r in con.execute(
        "SELECT TRY_CAST(regexp_extract(name, '^Customer#([0-9]+)$', 1) "
        "AS BIGINT) FROM t").fetchall()]
    assert got == exp
