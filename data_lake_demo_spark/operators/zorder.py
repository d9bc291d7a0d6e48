"""Z-order (Morton) data layout for multi-column data skipping.

Parquet row-group pruning works off per-file/row-group min/max stats.
Sorting by one column makes ITS stats selective but destroys the
others'. Interleaving the bits of several key columns (a Z-value) and
range-partitioning + sorting by it keeps every participating column's
min/max ranges narrow in every file — so predicates on ANY of the
keys skip most files. This is the layout technique table formats call
OPTIMIZE ZORDER BY; here it is a plain write-path operator.

Scale shape: per-column bucket boundaries come from ``approxQuantile``
(a distributed sketch returning 256 numbers to the driver); bucketing
and bit-interleaving are then map-side literal expressions — no global
window, no extra shuffle beyond the final range partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 8  # per-column resolution: 256 quantile buckets each


def _bucket_expr(col: str, boundaries: list[float]) -> F.Column:
    """bucket id = #boundaries strictly below the value (map-side fold
    over ≤255 literals)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + (F.col(col).cast("double") > b).cast("long"),
    )


def zvalue(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add a ``__z`` column: interleaved bits of per-column quantile
    bucket ids."""
    n_b = 2**BITS - 1
    out = df
    for i, c in enumerate(cols):
        qs = df.approxQuantile(c, [j / (n_b + 1) for j in range(1, n_b + 1)], 0.001)
        out = out.withColumn(f"__b{i}", _bucket_expr(c, qs))
    z = F.lit(0).cast("long")
    for bit in range(BITS):
        for i in range(len(cols)):
            z = z + F.shiftleft(
                F.shiftrightunsigned(F.col(f"__b{i}"), bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + i,
            )
    return out.withColumn("__z", z).drop(*[f"__b{i}" for i in range(len(cols))])


def zorder_write(
    df: DataFrame, path: str, cols: list[str], *, n_files: int = 16
) -> None:
    """Rewrite ``df`` to ``path`` Z-ordered on ``cols``: range-partition
    by the Z-value so each output file covers a compact Z-range, i.e. a
    small hyper-rectangle in the key space."""
    (
        zvalue(df, cols)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
