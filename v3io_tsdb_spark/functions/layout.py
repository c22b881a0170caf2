"""Z-order (Morton) data layout for multi-dimensional data skipping.

Parquet row-group/file pruning reads min/max footer stats: a layout
sorted by ONE key prunes perfectly on that key and not at all on any
other. The reference has exactly that layout (ingest-side sort by
series then time — adapter.py W2, ref: pkg/appender); a query selective
only on a SECONDARY dimension (one user across all time, one label
across all partitions) must scan everything. Interleaving the bits of
two bucketed keys (Morton '66; the lakehouse ``OPTIMIZE ZORDER BY``)
makes files cover small RECTANGLES of the key space instead of slabs,
so min/max stats prune on BOTH dimensions — the standard trade: each
dimension's pruning is a bit worse than a dedicated sort, every other
dimension's goes from nothing to ~sqrt-fraction.

Everything here is scan-side integer column algebra + one
repartitionByRange — no UDF, no driver data. The pruning claim is not
asserted from theory: the pytest writes both layouts and counts, from
the parquet FOOTERS, how many files a secondary-dimension box actually
intersects (tests/test_round9c_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_col(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints < 2^bits: a's bit i
    lands at position 2i, b's at 2i+1. Pure shift/mask column algebra
    (whole-stage codegen), 2·bits disjoint-bit terms folded by +."""
    z = None
    for i in range(bits):
        ta = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        tb = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = ta + tb if z is None else z + ta + tb
    return z


def zorder_repartition(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_parts: int,
    bits: int = 16,
) -> DataFrame:
    """Lay the frame out in Morton order over two bucketed key columns:
    range-partition on the z-value (equal-size files along the curve)
    and sort within partitions, so every output file's (a, b) min/max
    box is a small curve segment. Drop-in before any partitioned
    write; the z column itself is not kept."""
    z = zvalue_col(F.col(col_a), F.col(col_b), bits).alias("_z")
    return (
        df.select("*", z)
        .repartitionByRange(n_parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
