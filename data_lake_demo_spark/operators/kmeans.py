"""Distributed Lloyd iteration (k-means step) as pure JVM expressions.

The production ANN indexes train k-means on a bounded driver sample
(ann_index._kmeans — the FAISS recipe). THIS module is the distributed
counterpart for the step that must scale: given fixed centroids,
assign every vector and produce the updated centroids / objective in
one pass over the data.

Scale design (100 TB): centroids are LITERALS, so the argmin is a
single map-side expression — an ``array`` of k squared-L2 folds,
``array_min`` for the best distance, ``array_position`` for the cell
(first index = deterministic smallest-cell tie-break). No per-vector
fan-out, no window, no join: the only shuffle is the k-row partial
aggregate of the update step. Iterating Lloyd = re-calling this with
the new centroids; each iteration is one map + one tiny shuffle.

Hash portability: the update means and the inertia objective use the
integer-quantization fold (floor(x*scale + 0.5) summed as BIGINT), so
results are order-independent and value-hash across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_demo_spark.functions.vector import to_double_array


def _sq_l2(u, centroid: list[float]):
    """Σ (uᵢ - cᵢ)², left fold in double against a literal centroid."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(u, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lloyd_step(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    *,
    normalize: bool = True,
    scale: int = 1_000_000,
    mean_dims: int = 4,
) -> DataFrame:
    """One Lloyd iteration: assign each vector to its nearest literal
    centroid (squared L2, smallest-cell tie-break) and emit, per cell:

    - ``n`` — assigned vectors;
    - ``inertia`` — quantized Σ of the cell's squared distances (the
      k-means objective, order-independent integer fold);
    - ``c0..c{mean_dims-1}`` — the updated centroid's first
      coordinates (quantized means).
    """
    v = to_double_array(F.col(vec_col))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        v = F.transform(v, lambda x: x / nrm)
    staged = df.select(v.alias("__u"))
    dists = F.array(*[_sq_l2(F.col("__u"), c) for c in centroids])
    assigned = staged.select(
        F.col("__u").alias("u"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cell"),
        F.array_min(dists).alias("d2"),
    )
    fscale = float(scale)
    qint = lambda col: F.floor(col * scale + F.lit(0.5)).cast("bigint")
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(qint(F.col("d2"))) / fscale).alias("inertia"),
            *[
                (
                    F.sum(qint(F.col("u")[d]))
                    / (F.count(F.lit(1)) * fscale)
                ).alias(f"c{d}")
                for d in range(mean_dims)
            ],
        )
        .orderBy("cell")
    )
