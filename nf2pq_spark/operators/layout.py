"""Z-order (space-filling-curve) file layout for multi-column data skipping.

A sort on one column gives parquet min/max pruning on that column only; a
100 TB flow table is queried by source AND destination (or part AND
supplier), so single-column layout leaves one predicate unprunable.
Interleaving the key columns' bits into a Morton code and range-
partitioning + sorting on it gives every output file a small hyper-
rectangle of the key space — min/max footer stats then prune scans on ANY
of the interleaved columns.

This is the library form of the `z1_zorder_bucketing` graded query; the
write path is plain ``repartitionByRange`` + ``sortWithinPartitions`` so
the whole operation is two exchanges (range sampling + shuffle), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of k long columns.

    Disjoint-bit terms are summed (PySpark's ``|`` is logical); pure
    shift/mask arithmetic, stays in whole-stage codegen. ``k * bits`` is
    capped at 63: Java's ``<<`` masks the shift amount mod 64, so a
    larger code would silently WRAP terms onto low bits (garbage
    z-values, overlapping file ranges, no error), and bit 63 is the long
    sign bit (high keys would sort negative-first).
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"zvalue: {k} cols x {bits} bits = {k * bits} exceeds the 63 "
            "usable bits of a long — lower bits (shift amounts wrap mod "
            "64 in the JVM, silently corrupting the code)")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(F.shiftright(c, i).bitwiseAND(1), i * k + j)
    return z


def zvalue2(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of two long columns (x on even bits, y on odd) —
    the k=2 case of :func:`zvalue`, delegated so the interleave exists
    exactly once."""
    return zvalue([x, y], bits)


def zorder_write(df: DataFrame, cols: list[str], dst: str,
                 n_files: int, bits: int = 8) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``.

    Each column is min/max-quantized to ``bits`` bits (the ranges come
    from one metadata-sized aggregate), interleaved into a Morton key,
    and the frame is range-partitioned + sorted on it — so every output
    file covers a compact hyper-rectangle of the key space and parquet
    min/max footer stats prune on every interleaved column.

    ``dst`` must be a fresh directory disjoint from ``df``'s own input
    files: ``mode("overwrite")`` deletes ``dst`` at job start while the
    scan is lazy, so re-laying-out a table "in place" would destroy the
    only copy before reading it. Checked best-effort via
    ``df.inputFiles()`` (empty for non-file sources, where the hazard
    cannot arise).
    """
    import os

    dst_real = os.path.realpath(dst)
    for f in df.inputFiles():
        p = f[7:] if f.startswith("file://") else f
        p = p[5:] if p.startswith("file:") else p
        p = os.path.realpath(p)
        if p == dst_real or p.startswith(dst_real + os.sep):
            raise ValueError(
                f"zorder_write: dst {dst!r} overlaps the frame's own "
                f"input file {f!r} — the overwrite would delete the "
                "input at job start; write to a fresh directory and "
                "swap afterwards")
    # ranges are collected on the SAME long cast the executor-side
    # quantization applies, so timestamp keys (zorder on address+time is
    # the classic layout) reach the driver as ints — min(raw column)
    # would hand int() a datetime.datetime and TypeError
    ranges = df.agg(*[f for c in cols
                      for f in (F.min(F.col(c).cast("long")).alias(f"lo_{c}"),
                                F.max(F.col(c).cast("long")).alias(f"hi_{c}"))
                      ]).first()
    if ranges is None or any(ranges[f"lo_{c}"] is None for c in cols):
        # empty input (or an all-null key column): nothing to lay out —
        # write the frame as-is instead of crashing on int(None)
        null_cols = [c for c in cols
                     if ranges is None or ranges[f"lo_{c}"] is None]
        if df.isEmpty():
            df.write.mode("overwrite").parquet(dst)
            return
        raise ValueError(
            f"zorder_write: column(s) {null_cols} are entirely NULL — "
            "cannot derive a quantization range")
    scale = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        span = max(int(hi) - int(lo), 1)
        # divide BEFORE multiplying (double intermediate): the long
        # product (col - lo) * scale overflows for ranges wider than
        # 2^63/scale (epoch-nanos, random 64-bit ids) — an ANSI
        # ARITHMETIC_OVERFLOW abort under the session default, a silent
        # negative wrap if a caller disables ANSI; either way wrong
        quantized.append(
            ((F.col(c).cast("long") - int(lo)).cast("double")
             / span * scale).cast("long"))
    zv = zvalue(quantized, bits=bits)
    (df.withColumn("_zv", zv)
       .repartitionByRange(n_files, "_zv")
       .sortWithinPartitions("_zv")
       .drop("_zv")
       .write.mode("overwrite").parquet(dst))
