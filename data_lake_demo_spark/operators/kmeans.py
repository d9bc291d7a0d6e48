"""Distributed Lloyd iteration (k-means step) as pure JVM expressions.

The production ANN indexes train k-means on a bounded driver sample
(ann_index._kmeans — the FAISS recipe). THIS module is the distributed
counterpart for the step that must scale: given fixed centroids,
assign every vector and produce the updated centroids / objective in
one pass over the data.

Scale design (100 TB): centroids ride into the assignment as plain
constants, and the whole assign step is ONE map-side pass — since r11
an Arrow batch kernel (``_assign_arrow``: the aggregate/zip_with HOF
folds were CodegenFallback at ~7 µs/element-op, and the expanded-SQL
replacement blew Janino's 64 KB method limit and ran interpreted with
a re-attempted compile per action; the numpy kernel keeps the folds'
exact arithmetic and tie-break). No per-vector fan-out, no window, no
join: the only shuffle is the k-row partial aggregate of the update
step. Iterating Lloyd = re-calling this with the new centroids; each
iteration is one map + one tiny shuffle.

Hash portability: the update means and the inertia objective use the
integer-quantization fold (floor(x*scale + 0.5) summed as BIGINT), so
results are order-independent and value-hash across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _assign_arrow(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    *,
    normalize: bool,
    scale: int | None = None,
    emit_u: bool = False,
    emit_d2: bool = False,
) -> DataFrame:
    """Per-row nearest-centroid assignment as ONE Arrow batch kernel:
    appends ``cell`` (int, first-index argmin = the deterministic
    smallest-cell tie-break) and, on request, ``qd2`` (bigint,
    ``floor(min_d2*scale + 0.5)``), ``d2`` (double) and ``u``
    (array<double>, the optionally L2-normalized vector).

    r11 second pass: the expanded k×dim SQL arithmetic put ~500 terms
    into ONE expression; one expression compiles into one Java method
    and Janino dies past 64 KB ("Code grows beyond 64 KB"), after
    which the stage runs interpreted AND the doomed compile is
    re-attempted on EVERY action (failures are not cached — the bench
    stderr showed one ERROR CodeGenerator per run). Same cure as
    ``lsh_signatures``: a mapInPandas numpy kernel that keeps the
    fold's EXACT arithmetic — float64 throughout, every accumulator
    starts at 0.0 and adds terms in strict index order, the division
    and quantization reuse the identical double ops — so cell/d2/qd2
    are bit-identical to both the HOF fold and the expansion
    (verified row-for-row at sf0.001/0.01/0.1 + the DuckDB parity
    suite). Rows whose vector is absent or shorter than ``dim``
    produce NULL outputs, mirroring the NULL-chain the expansion
    yielded for out-of-bounds element access.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    k, dim = C.shape
    fields = list(df.schema.fields) + [T.StructField("cell", T.IntegerType())]
    if scale is not None:
        fields.append(T.StructField("qd2", T.LongType()))
    if emit_d2:
        fields.append(T.StructField("d2", T.DoubleType()))
    if emit_u:
        fields.append(T.StructField("u", T.ArrayType(T.DoubleType())))
    out_schema = T.StructType(fields)
    vname = vec_col
    scale_ = scale
    emit_u_, emit_d2_ = emit_u, emit_d2

    def op(it):
        for pdf in it:
            pdf = pdf.copy()
            n = len(pdf)
            col = pdf[vname]
            ok = col.map(
                lambda v: v is not None and len(v) >= dim
            ).to_numpy(dtype=bool)
            cell = np.zeros(n, dtype=np.int64)
            qd2 = np.zeros(n, dtype=np.int64)
            d2m = np.zeros(n, dtype=np.float64)
            U = np.zeros((0, dim))
            if ok.any():
                X = np.stack(
                    [np.asarray(v, dtype=np.float64)[:dim] for v in col[ok]]
                )
                if normalize:
                    # sq_norm: acc = 0.0, += x[d]·x[d] in dim order
                    nsq = np.zeros(len(X))
                    for d in range(dim):
                        nsq = nsq + X[:, d] * X[:, d]
                    U = X / np.sqrt(nsq)[:, None]
                else:
                    U = X
                # per-centroid squared L2: acc = 0.0, += (u-c)² in
                # dim order — the zip_with/left-fold association
                D2 = np.zeros((len(X), k))
                for d in range(dim):
                    diff = U[:, d : d + 1] - C[:, d]
                    D2 = D2 + diff * diff
                d2m[ok] = D2.min(axis=1)
                cell[ok] = np.argmin(D2, axis=1)  # first min index
                if scale_ is not None:
                    qd2[ok] = np.floor(
                        d2m[ok] * scale_ + 0.5
                    ).astype(np.int64)
            pdf["cell"] = pd.array(
                [int(c) if o else None for c, o in zip(cell, ok)],
                dtype="Int32",
            )
            if scale_ is not None:
                pdf["qd2"] = pd.array(
                    [int(q) if o else None for q, o in zip(qd2, ok)],
                    dtype="Int64",
                )
            if emit_d2_:
                pdf["d2"] = pd.array(
                    [float(x) if o else None for x, o in zip(d2m, ok)],
                    dtype="Float64",
                )
            if emit_u_:
                rows = iter(U.tolist())
                pdf["u"] = pd.Series(
                    [next(rows) if o else None for o in ok],
                    index=pdf.index,
                    dtype="object",
                )
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


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
    # one Arrow batch kernel computes u, cell and d2 per row (see
    # _assign_arrow: the expanded-SQL form blew Janino's 64 KB method
    # limit and re-attempted the doomed compile every action)
    assigned = _assign_arrow(
        df.select(vec_col),
        vec_col,
        centroids,
        normalize=normalize,
        emit_u=True,
        emit_d2=True,
    ).select("u", "cell", "d2")
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

    # one Arrow batch kernel computes cell + qd2 per row (see
    # _assign_arrow: the expanded-SQL form — one ~500-term expression
    # — blew Janino's 64 KB method limit, ran interpreted anyway, and
    # re-attempted the doomed compile on every action).
    # lineage barrier (the MMR localCheckpoint precedent): the
    # assignment feeds BOTH the histogram pass and the final filter;
    # checkpointed, the Python-stage assignment materializes once and
    # both consumers read the blocks (disk-backed executor-local
    # storage, auto-released by the ContextCleaner when the frame is
    # dropped). Eager, matching MMR: the lazy form defers
    # doCheckpoint into the consumers and races the cleaner (benign
    # but noisy accumulator errors).
    assigned = _assign_arrow(
        df, vec_col, centroids, normalize=normalize, scale=scale
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
