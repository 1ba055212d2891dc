"""Multi-dimensional data layout: Z-order (Morton) clustering for
row-group pruning (the lakehouse table-organization technique; no reference
analog — Milan has no storage layout control at all).

A table range-partitioned and sorted by a single key prunes scans on THAT
key only; a 100 TB fact table queried by boxes over two keys (part ×
supplier, time × entity) wants both dimensions clustered. Interleaving the
key bits (Morton order) makes each parquet row group cover a small
axis-aligned box in key space, so each column's min/max row-group
statistics — all any engine's scan consults — prune 2-d box predicates on
EITHER OR BOTH dimensions.

Everything is static int64 bit algebra (Python loop builds the expression,
literal shift amounts → whole-stage codegen; no UDF). The layout write is
one range exchange + per-partition sort — the same cost as any sorted
write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(x, y, *, bits: int = 16) -> Column:
    """Morton interleave of two non-negative int columns' low ``bits`` bits:
    z = Σ_b ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1). 2·bits ≤ 62 keeps the
    result in non-negative int64."""
    if bits < 1 or bits > 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(yc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    partitions: int = 8,
    row_group_bytes: int = 64 * 1024,
) -> None:
    """Write ``df`` as parquet clustered in Morton order over (x, y): one
    range exchange on the z-value, per-partition sort, small row groups so
    min/max statistics stay tight. Readers need nothing special — standard
    row-group stats pruning sees clustered ranges on BOTH columns."""
    zc = z_value(x, y, bits=bits).alias("__z")
    (
        df.withColumn("__z", zc)
        .repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        .parquet(path)
    )
