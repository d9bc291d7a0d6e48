"""Vector math over ``array<float>`` columns — pure JVM-side
higher-order functions (no Python UDFs in the hot path).

All arithmetic is promoted to double *before* any multiply/add and
folded strictly left-to-right (``F.aggregate``), which makes results
deterministic and reproducible against other engines that fold
sequentially in double (the DuckDB oracle mirrors this shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, left fold in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize(x: Column, scale: int = 1_000_000) -> Column:
    """Exact fixed-point representation of a double (matches the SQL
    ``floor(x*scale + 0.5)/scale`` idiom used by the oracle)."""
    return F.floor(x * scale + F.lit(0.5)) / float(scale)
