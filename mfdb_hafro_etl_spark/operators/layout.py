"""Multi-dimensional data layout: Z-order (Morton) clustering for
file-level min/max pruning.

A 100 TB fact table is usually partitioned by ONE key chain
(data_source/year here, mirroring the reference's fact layout); a
predicate on any OTHER column still scans every file of the touched
partitions. Sorting each write by a Z-value — the bit-interleave of
the quantized predicate columns — makes every output file cover a
small hyper-rectangle of the key space, so parquet footer min/max
statistics prune files for predicates on ANY interleaved dimension
(the same mechanism Delta's OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrite rely on; here it is plain open-source Spark:
repartitionByRange + sortWithinPartitions + parquet stats).

Everything is a pure Column expression (codegen'd bit algebra —
shiftright/AND/shiftleft), so the cluster key costs one projection,
and the write itself is the only shuffle (the range partitioner).

tests/test_layout.py proves the pruning claim mechanically: it
writes the same rows naturally-ordered and Z-ordered, then counts
parquet row groups whose [min, max] admit a 2-D box predicate —
Z-ordered files admit a small fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into [0, 2^bits) cells over [lo, hi],
    clamped at the edges — the rank space the interleave consumes."""
    cells = 1 << bits
    width = (hi - lo) / cells
    c = F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.lit(cells - 1), F.greatest(F.lit(0), c))


def zvalue(cells: list[Column], bits: int = 8) -> Column:
    """Morton interleave of n quantized columns (each in [0, 2^bits)):
    bit b of column i lands at position n·b + i. Pure integer Column
    algebra — n·bits shift/mask/or terms, all inside whole-stage
    codegen."""
    n = len(cells)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cells):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, n * b + i)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    quantized: dict[str, Column],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` parquet clustered by the Z-value of ``quantized``
    (name -> already-quantized cell Column). repartitionByRange gives
    each output file a disjoint, compact z-range; the sort inside each
    file tightens row-group stats further."""
    z = zvalue(list(quantized.values()), bits).alias("__z__")
    (
        df.withColumn("__z__", z)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
