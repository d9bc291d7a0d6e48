"""Distributed Lloyd iteration (k-means step) as pure JVM expressions.

The production ANN indexes train k-means on a bounded driver sample
(ann_index._kmeans — the FAISS recipe). THIS module is the distributed
counterpart for the step that must scale: given fixed centroids,
assign every vector and produce the updated centroids / objective in
one pass over the data.

Scale design (100 TB): centroids are LITERALS, so the argmin is a
single map-side expression — an ``array`` of k squared-L2 sums
(EXPANDED per-element arithmetic since r11: the aggregate/zip_with
folds are CodegenFallback, i.e. interpreted lambda evaluation, which
dominated wall at ~7 µs/element-op; the expansion is the identical
left-to-right double arithmetic, whole-stage-codegen'd),
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

from data_lake_demo_spark.functions.vector_expand import (
    sq_dist_lit_sql,
    sq_norm_sql,
)


def _staged_unit(df: DataFrame, vec_col: str, dim: int, *, normalize: bool):
    """``df`` plus ``__u`` — the (optionally L2-normalized) double
    vector — as EXPANDED per-element expressions instead of
    ``transform``/``aggregate`` folds (r11 optimization: HOFs are
    CodegenFallback, ~7 µs/element-op interpreted; the expansion is
    the identical arithmetic in codegen — see vector_expand).
    The norm is staged as its own column first: multiply-referenced
    non-cheap expressions survive CollapseProject, so it evaluates
    once per row instead of once per element."""
    if normalize:
        pre = df.select(
            "*", F.expr(f"SQRT({sq_norm_sql(vec_col, dim)})").alias("__nrm")
        )
        u_sql = "array(" + ",".join(
            f"(CAST({vec_col}[{i}] AS DOUBLE) / __nrm)" for i in range(dim)
        ) + ")"
        return pre.select(*df.columns, F.expr(u_sql).alias("__u"))
    u_sql = "array(" + ",".join(
        f"CAST({vec_col}[{i}] AS DOUBLE)" for i in range(dim)
    ) + ")"
    return df.select("*", F.expr(u_sql).alias("__u"))


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
    dim = len(centroids[0])
    staged = _staged_unit(df, vec_col, dim, normalize=normalize).select("__u")
    # stage the distance array as a COLUMN (the cluster_balanced_sample
    # discipline): it is referenced three times below, and the staged
    # multiply-referenced column survives CollapseProject, so the k×dim
    # arithmetic runs once per row
    staged = staged.select(
        "__u",
        F.expr(
            "array("
            + ",".join(sq_dist_lit_sql("__u", c) for c in centroids)
            + ")"
        ).alias("__ds"),
    )
    dists = F.col("__ds")
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


def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    frac: float,
    *,
    id_col: str = "vec_id",
    normalize: bool = True,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cluster-balanced curation (the DataComp/SemDeDup-family shape):
    assign every vector to its nearest literal centroid and keep, PER
    CLUSTER, the ``ceil(frac * cluster_size)`` most prototypical rows
    (smallest squared distance; (quantized-distance, id) is the total
    order, so the selection is deterministic and engine-portable).
    Balancing the sample across clusters preserves the corpus's modes
    instead of letting one dense region dominate a global top-k.

    Scale design (100 TB): the per-cluster rank is NOT a k-partition
    global window (k cells × n/k rows each would sort-spill whole
    clusters). Instead, the shard_assign_snake histogram technique:

    1. one map-side pass assigns (cell, quantized d2) — no fan-out;
    2. a (cell, qd2) COUNT histogram (bounded by distinct quantized
       distances, not rows) takes a cumulative sum on the tiny
       aggregated frame;
    3. each cell's threshold distance T and the residual quota at the
       tie broadcast back;
    4. rows strictly below T pass map-side; only the T-tie group —
       rows sharing ONE quantized distance — pays a bounded
       ``row_number`` window to fill the remaining quota by id.

    Returns the input columns plus ``cell`` and ``qd2``."""
    from pyspark.sql import Window as W

    dim = len(centroids[0])
    # stage the unit vector and the distance array as COLUMNS before
    # using them (the lloyd_step discipline): each is referenced many
    # times downstream, and multiply-referenced non-cheap expressions
    # survive CollapseProject — inlining them instead would duplicate
    # the normalization into all k*dim terms and the k-distance array
    # into every consumer (measured 6.7 s vs 0.3 s on 500 rows).
    staged = _staged_unit(df, vec_col, dim, normalize=normalize)
    # per-centroid squared distances as EXPANDED arithmetic (one
    # parsed SQL expression — identical fold order to the previous
    # aggregate/zip_with form, but whole-stage-codegen'd instead of
    # interpreted lambda evaluation; that interpretation dominated
    # this operator's wall: 7.5 s at sf0.1 for 2,000 rows)
    dists = F.expr(
        "array(" + ",".join(sq_dist_lit_sql("__u", c) for c in centroids) + ")"
    )
    staged = staged.select("*", dists.alias("__ds"))
    # lineage barrier (the MMR localCheckpoint precedent): without
    # it, the rule that folds projects into Aggregate inlines the
    # FULL fold chain into each grouping expression — the histogram
    # pass would interpret the k*dim lambdas several times per row
    # (measured ~8x wall). Checkpointed, the assignment materializes
    # once as a plain projection and both consumers read the blocks
    # (disk-backed executor-local storage, auto-released by the
    # ContextCleaner when the frame is dropped). Eager, matching MMR:
    # the lazy form defers doCheckpoint into the consumers and races
    # the cleaner (benign but noisy accumulator errors).
    assigned = staged.select(
        *df.columns,
        (F.array_position(F.col("__ds"), F.array_min("__ds")) - 1)
        .cast("int")
        .alias("cell"),
        F.floor(F.array_min("__ds") * scale + F.lit(0.5))
        .cast("bigint")
        .alias("qd2"),
    ).localCheckpoint(eager=True)
    hist = assigned.groupBy("cell", "qd2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("cell").orderBy("qd2")  # tiny aggregated frame
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = hist.groupBy("cell").agg(F.sum("cnt").alias("n_cell"))
    j = cum.join(totals, "cell").withColumn(
        "quota", F.ceil(F.lit(float(frac)) * F.col("n_cell")).cast("long")
    )
    thr = (
        j.filter(F.col("cum") >= F.col("quota"))
        .groupBy("cell", "quota")
        .agg(F.min("qd2").alias("__t"))
    )
    tie_info = thr.join(
        j.select(
            "cell",
            F.col("qd2").alias("__t"),
            (F.col("cum") - F.col("cnt")).alias("__below"),
        ),
        ["cell", "__t"],
    ).select(
        "cell", "__t", (F.col("quota") - F.col("__below")).alias("__at_tie")
    )
    # the threshold table is ONE ROW PER CLUSTER — a bounded driver
    # collect (the bloom-prune/bounded-sample discipline), inlined as
    # literal when-chains. This keeps the returned frame a SINGLE
    # lazy pass over the assignment (no operator-held persist that
    # nothing could unpersist, no broadcast plan that re-embeds the
    # histogram subtree): rows strictly below their cell's threshold
    # pass map-side; only the tie bucket — the rows sharing ONE
    # quantized distance per cell — consults a (cell, qd2)-partition
    # row_number to fill the residual quota, so no whole-cluster
    # global sort exists anywhere.
    tie_rows = tie_info.collect()
    if not tie_rows:  # frac == 0 or empty input: nothing qualifies
        return assigned.filter(F.lit(False))
    t_col = F.lit(None).cast("bigint")
    at_col = F.lit(None).cast("long")
    for r in tie_rows:
        t_col = F.when(F.col("cell") == r["cell"], F.lit(r["__t"])).otherwise(t_col)
        at_col = F.when(F.col("cell") == r["cell"], F.lit(r["__at_tie"])).otherwise(at_col)
    w_tie = W.partitionBy("cell", "qd2").orderBy(id_col)
    return (
        assigned.filter(F.col("qd2") <= t_col)
        .withColumn("__rn", F.row_number().over(w_tie))
        .filter((F.col("qd2") < t_col) | (F.col("__rn") <= at_col))
        .drop("__rn")
    )
