"""Count-min sketch as a counter TABLE — bounded-memory frequency
estimation for unbounded key spaces (the frequency twin of the HLL
distinct sketches in plans/events.py).

Why a table and not a binary blob: Spark's built-in
``count_min_sketch`` aggregate emits opaque bytes that only the
driver-side ``estimateCount`` can read. Keeping the sketch as
``(depth, pos, c)`` rows makes every operation a plain relational
one — build is a groupBy, merge is a union + re-sum (decomposable,
exactly like the time-rollup partials), and point estimates are a
broadcast join — so estimation itself runs DISTRIBUTED over any
number of probe keys, and the sketch can live in a parquet table
between batches.

Guarantees (standard CM): estimates never undercount; overcount is
bounded by ~N*e/width with probability 1-(1/e)^depth. depth*width
counters regardless of key cardinality — 4x1024 longs = 32 KB where
an exact groupBy over a 100 TB key space is unbounded state.

Hash contract: positions come from ``xxhash64(key, depth_index)``;
build and probe key columns must share the same Spark type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH_DEFAULT = 4
WIDTH_DEFAULT = 1024


def _positions(key_col: str, depth: int, width: int):
    d = F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("depth")
    return d, lambda: F.pmod(
        F.xxhash64(F.col(key_col), F.col("depth")), F.lit(width)
    ).alias("pos")


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEPTH_DEFAULT,
    width: int = WIDTH_DEFAULT,
    weight_col: str | None = None,
) -> DataFrame:
    """One pass, one shuffle of (depth, pos) pairs with map-side
    combine; output is at most ``depth*width`` rows. ``weight_col``
    counts weighted frequency (e.g. token counts) instead of rows."""
    d, pos = _positions(key_col, depth, width)
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    return (
        df.select(F.col(key_col), w.alias("__w"), d)
        .select("depth", pos(), "__w")
        .groupBy("depth", "pos")
        .agg(F.sum("__w").alias("c"))
    )


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch(x) ⊕ sketch(y) == sketch(x ∪ y), counter for counter —
    the decomposability that lets per-batch sketches roll up across
    partitions, days, or clusters without touching raw data."""
    return (
        a.unionByName(b).groupBy("depth", "pos").agg(F.sum("c").alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEPTH_DEFAULT,
    width: int = WIDTH_DEFAULT,
) -> DataFrame:
    """Distributed point estimates: each probe key joins its ``depth``
    counters (broadcast — the sketch is KBs) and takes the min.
    A key whose counter row is absent has true count 0."""
    d, pos = _positions(key_col, depth, width)
    probes = keys.select(F.col(key_col), d).select(key_col, "depth", pos())
    return (
        probes.join(F.broadcast(sketch), ["depth", "pos"], "left")
        .select(key_col, F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )
