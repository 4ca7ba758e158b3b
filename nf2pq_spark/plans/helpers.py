"""Shared helpers for oracle-exact aggregates.

Float sums are order-nondeterministic under parallel aggregation, and —
verified empirically — ``round(double, k)`` itself disagrees between engines
near scale boundaries (Spark rounds the exact binary value via BigDecimal of
the shortest repr; DuckDB rounds via binary 10^k scaling, which can land on
an exact .5 and tie-break the other way). The fixture's money columns are
all ≤2-decimal clean, which enables a convention with NO cross-engine
rounding of doubles anywhere:

1. cast each source double to DECIMAL(10,2) *first* — the true value has ≤2
   decimals, so the double→decimal conversion is never near a rounding
   boundary and is identical in both engines;
2. all arithmetic in decimal (exact, order-independent; precision grows
   (p1+p2, s1+s2) per multiply — two money factors max, staying under 38);
3. exact decimal SUM, cast to DOUBLE at the very end (correctly-rounded
   conversion of identical decimals → identical doubles);
4. averages = double(sum) / COUNT — identical doubles divided by identical
   longs are bit-identical; never decimal÷decimal (scale rules differ).

Rounding remains ONLY for genuinely order-dependent or engine-divergent
computations (stddev/corr, transcendentals, pandas aggregations), where the
error ≪ the rounding grid and boundary hits are probabilistically nil.

Computed ints (year, size, row_number, …) are cast to BIGINT on the Spark
side: DuckDB's len()/year()/row_number() are BIGINT and its sum(int) is
HUGEINT (cast the oracle's integer SUM to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact money type: fixture values < 10^8 with ≤2 decimals
MONEY = "decimal(10,2)"

#: Integer-format gate applied to a STRING before a string→bigint cast,
#: on BOTH engines, so both route through identical cast semantics:
#: DuckDB TRY_CAST rounds decimal strings ('1.5' → 2) where Spark
#: try_cast yields NULL, and the two trim DIFFERENT whitespace (Spark's
#: cast trims every control char ≤ 0x20; DuckDB only [\t\n\f\r ], and
#: Java-regex \s vs RE2 \s ALSO disagree — Java includes \x0B).
#: Hence an EXPLICIT character class, identical under Java regex
#: (Spark rlike) and RE2 (DuckDB regexp_matches), whose members both
#: casts demonstrably trim. Values padded with any OTHER control char
#: fail the gate and degrade to NULL on both engines. ONE definition —
#: interpolated into every oracle and applied via rlike on every Spark
#: side — so the semantics cannot drift between queries (r8 review).
INT_GATE_RE = r"^[ \t\n\f\r]*[+-]?[0-9]+[ \t\n\f\r]*$"


def m(col: Column | str) -> Column:
    """Exact decimal view of a money/value column (boundary-free cast)."""
    return (F.col(col) if isinstance(col, str) else col).cast(MONEY)


def msql(col: str) -> str:
    """Oracle-side twin of :func:`m`."""
    return f"CAST({col} AS DECIMAL(10,2))"


def dsum(expr: Column, alias: str) -> Column:
    """Exact (decimal-expression) sum surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Exact-sum mean: double(sum)/count, bit-identical across engines."""
    return (F.sum(expr).cast("double") / F.count(F.lit(1))).alias(alias)


def osum(sql_expr: str, alias: str) -> str:
    """Oracle-side twin of :func:`dsum` (pass a decimal-typed expression)."""
    return f"CAST(SUM({sql_expr}) AS DOUBLE) AS {alias}"


def oavg(sql_expr: str, alias: str) -> str:
    """Oracle-side twin of :func:`davg`."""
    return f"CAST(SUM({sql_expr}) AS DOUBLE) / COUNT(*) AS {alias}"


# -- fixed-point (integer cents) fast path -----------------------------------
#
# Decimal sums above precision 18 leave Spark's Long-backed Decimal for
# BigDecimal and cost ~4× in the aggregation hot loop (profiled at sf0.1).
# Since money columns are ≤2-decimal clean, `round(x*100)` is an EXACT
# integer: all aggregation then runs as primitive-long codegen, and the
# final double(sum)/scale division is bit-identical cross-engine (the same
# exact integer converts to the same double in both). Hot queries use this;
# colder ones keep the decimal form for readability.


def cents(col: Column | str, factor: int = 100) -> Column:
    """Exact fixed-point view of a ≤2-decimal money double (long).

    floor(x*100 + 0.5) instead of round(): Spark's Round on doubles goes
    through BigDecimal per row (~0.7s/600k rows profiled); floor is a pure
    FP op. Since x*100 always lands within ~1e-9 of an integer (2-decimal
    money), +0.5-then-floor is the exact nearest integer for positive and
    negative values alike, identically in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * factor + F.lit(0.5)).cast("long")


def ocents(col: str, factor: int = 100) -> str:
    """Oracle-side twin of :func:`cents`."""
    return f"CAST(FLOOR({col} * {factor} + 0.5) AS BIGINT)"


def cents_sum(expr: Column, scale: int, alias: str) -> Column:
    """double(SUM(long expr)) / scale — exact integer sum, shared division."""
    return (F.sum(expr).cast("double") / F.lit(float(scale))).alias(alias)


def ocents_sum(sql_expr: str, scale: int, alias: str) -> str:
    return f"CAST(SUM({sql_expr}) AS DOUBLE) / {scale}.0 AS {alias}"


def cents_avg(expr: Column, scale: int, alias: str) -> Column:
    return (F.sum(expr).cast("double") / F.lit(float(scale))
            / F.count(F.lit(1))).alias(alias)


def ocents_avg(sql_expr: str, scale: int, alias: str) -> str:
    return f"CAST(SUM({sql_expr}) AS DOUBLE) / {scale}.0 / COUNT(*) AS {alias}"


def nan_to_null(col: Column | str) -> Column:
    """NaN → NULL for ordered-set aggregates (percentile/median/MAD).

    The engines genuinely disagree on NaN inside percentiles: Spark's
    percentile/median rank NaN as the GREATEST value (silently shifting
    every upper quantile), DuckDB's quantile_cont excludes it like NULL
    (r7 hostile-corpus tier-2 find). A NaN metric is garbage, not a
    magnitude — the production semantic is to exclude it, which also
    makes both engines agree. No-op on NaN-free data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c), c)


#: Knuth's multiplicative constant (2^32 / golden ratio, public knowledge)
KNUTH_MULT = 2654435761


def khash(col: Column | str) -> Column:
    """Deterministic multiplicative id hash (long) for reproducible
    sampling/splits/sharding: no rand(), no partition sensitivity,
    identical on any engine or cluster size. The ``% 2^31`` keeps the
    product inside long range. One definition shared by every query AND
    its oracle (:func:`okhash`) so the two sides cannot drift."""
    c = F.col(col) if isinstance(col, str) else col
    return (c % F.lit(2147483648)) * F.lit(KNUTH_MULT)


def okhash(col: str) -> str:
    """Oracle-side twin of :func:`khash`."""
    return f"(({col} % 2147483648) * {KNUTH_MULT})"


#: code-identity component of every cache stamp, computed once per process
_CODE_STAMP: str | None = None


def _code_stamp(pkg_root: str | None = None) -> str:
    """Identity of the package SOURCE backing a /tmp cache: file count,
    total size, and newest mtime over every ``nf2pq_spark/**/*.py``.
    Any code change therefore invalidates all stamped caches — the third
    staleness mode (after fixture regeneration and tree swaps): a cache
    whose WRITER changed layout or content between rounds otherwise
    reads as current forever on a long-lived machine, and the one manual
    guard against it (a hand-bumped version suffix like collector.py's
    ``|capfmt2``) only works when someone remembers to bump it. Rebuild
    cost is seconds at the graded scale factors; over-invalidation is
    the safe direction. ``pkg_root`` overrides the scanned tree (tests);
    only the default scan is cached."""
    global _CODE_STAMP
    if pkg_root is None and _CODE_STAMP is not None:
        return _CODE_STAMP
    import os

    root = pkg_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    n, total, newest = 0, 0, 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".py"):
                try:
                    st = os.stat(os.path.join(dirpath, f))
                except OSError:
                    continue
                n += 1
                total += st.st_size
                newest = max(newest, st.st_mtime_ns)
    stamp = f"code|{n}|{total}|{newest}"
    if pkg_root is None:
        _CODE_STAMP = stamp
    return stamp


def source_stamp(sf_dir: str, *tables: str) -> str:
    """Identity stamp of the fixture files backing a /tmp cache: absolute
    path + mtime_ns + size per table, plus the package code identity
    (:func:`_code_stamp`). A marker carrying this stamp self-invalidates
    when the fixture is regenerated, when a same-named leaf dir from a
    DIFFERENT tree is pointed at (the two modes a basename-keyed cache
    cannot see — r3 review), or when any package source file changes
    (the writer-upgrade mode — r5 review)."""
    import os

    parts = []
    for t in tables:
        p = os.path.join(os.path.abspath(sf_dir), f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{p}|{st.st_mtime_ns}|{st.st_size}")
        except OSError:
            parts.append(f"{p}|missing")
    parts.append(_code_stamp())
    return ";".join(parts)


def _dir_manifest(root: str, exclude: str) -> str:
    """``relpath|size`` per file under ``root`` (sorted), excluding the
    marker itself. The manifest is the marker's content-integrity half:
    /tmp cleaners (tmpwatch/systemd-tmpfiles prune by age/atime) can
    delete individual DATA files while the marker survives — a
    stamp-only marker would then vouch for a partial cache and the query
    would silently return fewer rows than the oracle."""
    import os

    lines = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            if os.path.abspath(p) == exclude:
                continue
            rel = os.path.relpath(p, root)
            try:
                lines.append(f"{rel}|{os.stat(p).st_size}")
            except OSError:
                lines.append(f"{rel}|gone")
    return "\n".join(sorted(lines))


def cache_lock(marker: str):
    """Advisory inter-process lock for a /tmp cache's check-and-rebuild
    window. Two graders sharing a machine can both see a stale marker
    and rebuild CONCURRENTLY — interleaved writes from two generations,
    and the second marker's manifest would then VOUCH for the mixed
    tree (silent wrong rows, not an error). flock serializes the
    rebuild; the loser re-checks under the lock and reads the winner's
    build. The lock file is a SIBLING of the cache dir, never inside
    it: the rebuild's rmtree must not delete the locked inode (a second
    process would lock a fresh file and the race returns). Held locks
    die with the process (fd-based), so a crashed builder never wedges
    the cache."""
    import contextlib
    import fcntl
    import os

    @contextlib.contextmanager
    def _lock():
        lock_path = os.path.dirname(os.path.abspath(marker)) + ".lock"
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    return _lock()


def cache_current(marker: str, stamp: str) -> bool:
    """True iff ``marker`` exists, records exactly ``stamp``, and every
    file in its recorded manifest is still present at its recorded size
    (extra files are tolerated — nothing external ADDS files; deletion
    and truncation are the external-cleanup failure modes). Legacy
    markers (pre-stamp, or stamp-only pre-manifest) read as stale,
    forcing one rebuild."""
    import os

    try:
        with open(marker) as fh:
            content = fh.read()
    except OSError:
        return False
    head, sep, manifest = content.partition("\n")
    if head != stamp or not sep:
        return False
    root = os.path.dirname(os.path.abspath(marker))
    for line in manifest.splitlines():
        rel, _, size = line.rpartition("|")
        try:
            if os.stat(os.path.join(root, rel)).st_size != int(size):
                return False
        except (OSError, ValueError):
            return False
    return True


def write_cache_marker(marker: str, stamp: str) -> None:
    """Record ``stamp`` plus a manifest of the marker's directory tree
    (see :func:`_dir_manifest`). Call only AFTER all cache data is
    written — every call site does (marker-last is the crash-safety
    protocol: an unmarked partial cache is rebuilt, never trusted)."""
    import os

    manifest = _dir_manifest(os.path.dirname(os.path.abspath(marker)),
                             os.path.abspath(marker))
    with open(marker, "w") as fh:
        fh.write(stamp + "\n" + manifest)
