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


def zvalue2(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of two long columns.

    Disjoint-bit terms are summed (PySpark's ``|`` is logical); pure
    shift/mask arithmetic, stays in whole-stage codegen.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
             + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    return z


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` bits of k long columns."""
    k = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z + F.shiftleft(F.shiftright(c, i).bitwiseAND(1), i * k + j)
    return z


def zorder_write(df: DataFrame, cols: list[str], dst: str,
                 n_files: int, bits: int = 8) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on ``cols``.

    Each column is min/max-quantized to ``bits`` bits (the ranges come
    from one metadata-sized aggregate), interleaved into a Morton key,
    and the frame is range-partitioned + sorted on it — so every output
    file covers a compact hyper-rectangle of the key space and parquet
    min/max footer stats prune on every interleaved column.
    """
    ranges = df.agg(*[f for c in cols
                      for f in (F.min(c).alias(f"lo_{c}"),
                                F.max(c).alias(f"hi_{c}"))]).first()
    scale = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = ranges[f"lo_{c}"], ranges[f"hi_{c}"]
        span = max(int(hi) - int(lo), 1)
        quantized.append(
            ((F.col(c).cast("long") - int(lo)) * scale / span).cast("long"))
    zv = zvalue(quantized, bits=bits)
    (df.withColumn("_zv", zv)
       .repartitionByRange(n_files, "_zv")
       .sortWithinPartitions("_zv")
       .drop("_zv")
       .write.mode("overwrite").parquet(dst))
