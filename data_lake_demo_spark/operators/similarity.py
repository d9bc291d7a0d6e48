"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **Brute-force top-k** (the exactness baseline): broadcast the query
  set, compute cosine JVM-side, per-query top-k via window. Cost is
  O(|queries| × |corpus|) but embarrassingly parallel and shuffle-free
  until the final tiny top-k — correct choice when |queries| is small.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (sign of dot with random vectors) bucket the corpus; candidates are
  fetched by bucket equi-join, then re-ranked exactly. At 100 TB the
  corpus is scanned once to build signatures; each query touches only
  its bucket's rows.

The IVF variant (``ivf_ann_topk``) fits its k-means coarse quantizer
with driver-side numpy on a bounded sample (the FAISS recipe) and
assigns cells with a single argmin expression — no pyspark.ml in the
hot path. Both ANN paths are seeded and deterministic, so results are
reproducible run-to-run.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_demo_spark.functions.vector import cosine, quantize, to_double_array
from data_lake_demo_spark.functions.vector_expand import cosine_cols_sql


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Output: (qid, nid, cos_sim) with cos_sim quantized to 1e-6 so
    ordering/tie-breaks are engine-reproducible. Self-matches are
    excluded.

    NOTE(r11): the expanded-arithmetic cosine (vector_expand) was
    tried here and measured a durable 2x REGRESSION (emb_hard_negatives
    1.44 s warm vs 0.68 s lock median; knn_brute_force 1.26 vs 0.80):
    the per-pair projection sits above a BroadcastNestedLoopJoin,
    whose stage is not whole-stage-codegen'd, so the ~380-node
    expanded tree evaluates interpreted node-by-node — slower than
    the HOF fold's single specialized loop over the primitive array.
    The fold stays.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), to_double_array(F.col(vec_col)).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), to_double_array(F.col(vec_col)).alias("nvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            quantize(cosine(F.col("qvec"), F.col("nvec"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cos_sim", "rk")
    )


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_pos: int = 5,
    k_neg: int = 15,
) -> DataFrame:
    """Hard-negative candidates for dense-retrieval training — the
    index-mined negatives of DPR (Karpukhin et al. 2020,
    arXiv:2004.04906) and the ANCE family: for each query, rank the
    corpus by cosine and keep the band ``(k_pos, k_neg]`` — documents
    close enough to be confusable but below the presumed-relevant
    top-``k_pos``. Output: (qid, nid, cos_sim, rk).

    This exact scorer is the correctness baseline; at corpus scale
    swap in the persisted ANN index (operators/ann_index.py) for the
    ranking and keep the SAME band selection — the band logic (one
    rank window per query) is scorer-agnostic.
    """
    ranked = brute_force_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=k_neg
    )
    return ranked.filter(F.col("rk") > k_pos)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _sql_double_array(vals) -> str:
    """SQL text for a constant array<double> literal.

    Building wide constant vectors element-by-element with ``F.lit``
    costs one py4j round-trip per element — ~3 s of DRIVER time for a
    16×64 centroid table (measured; see PERF.md). One ``F.expr`` over
    this string is a single round-trip and parses in milliseconds.
    ``repr(float)`` round-trips exactly; the D suffix forces DOUBLE
    (bare decimal literals parse as DECIMAL in Spark SQL).
    """
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def infer_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (a metadata-sized
    driver lookup). All rows must share this dimensionality — a shorter
    vector would zip against the hyperplanes with null padding and
    produce null/garbage bucket bits, so callers get an explicit error
    here instead of a silently degraded candidate set."""
    row = df.select(F.size(to_double_array(F.col(vec_col))).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(
            f"cannot infer embedding dimensionality from column {vec_col!r}"
        )
    return int(row.d)


def lsh_signatures(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per row — a single long.

    The hyperplanes are literal arrays baked into the plan (a few KB),
    not a driver-side loop: one pass, codegen'd, no shuffle.

    ``dim`` defaults to the dimensionality of the input's first vector
    (see ``infer_dim``); pass it explicitly when hashing several frames
    with the SAME hyperplane family (corpus + queries must agree).
    """
    if dim is None:
        dim = infer_dim(df, vec_col)
    planes = random_hyperplanes(dim, n_planes, seed)
    # r11: the n_planes×dim dot products run as an Arrow batch kernel
    # (the _pq_encode_arrow precedent — PERF.md measured interpreted
    # HOF folds ~30× slower than the numpy batch form). A pure-JVM
    # expansion of the folds was tried first and is WORSE here: the
    # bucket id combines n_planes×dim terms into ONE expression, one
    # expression compiles into one Java method, and past ~150 terms
    # Janino dies with "Code grows beyond 64 KB" — whole-stage
    # codegen is then disabled for every stage the expression lands
    # in and the big self-join consumers (graph edges, near-dup
    # candidates) run fully interpreted (measured: emb_graph_triangles
    # 6 s → 26 s). The kernel keeps the fold's EXACT arithmetic:
    # float64 accumulation starting at 0.0, adding xᵢ·pᵢ in index
    # order — bit-identical bucket ids (verified row-for-row vs the
    # fold at sf0.01/sf0.1 and by the DuckDB parity suite).
    import numpy as np
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "lsh_bucket"]
        + [T.StructField("lsh_bucket", T.LongType())]
    )
    vname = vec_col
    d_ = dim

    def op(it):
        for pdf in it:
            pdf = pdf.copy()
            n = len(pdf)
            if n == 0:
                pdf["lsh_bucket"] = pd.array([], dtype="Int64")
                yield pdf
                continue
            col = pdf[vname]
            ok = col.map(
                lambda v: v is not None and len(v) == d_
            ).to_numpy(dtype=bool)
            res = np.full(n, 0, dtype=np.int64)
            if ok.any():
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in col[ok]]
                )
                # strict left fold per plane: acc starts at 0.0 and
                # adds x[d]·p[d] in dimension order (the aggregate
                # init + zip_with order), all in float64
                acc = np.zeros((X.shape[0], P.shape[0]))
                for d in range(d_):
                    acc += X[:, d : d + 1] * P[:, d]
                res[ok] = ((acc > 0).astype(np.int64) * weights).sum(
                    axis=1
                )
            # rows with absent/mis-sized vectors: the fold produced a
            # NULL bucket (zip_with null-pads); mirror that
            pdf["lsh_bucket"] = pd.array(
                [int(r) if o else None for r, o in zip(res, ok)],
                dtype="Int64",
            )
            yield pdf

    return df.mapInPandas(op, schema=out_schema)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    re-ranked by exact cosine. Equi-join on the bucket id replaces the
    cross join — the 100 TB path.

    ``multi_probe=True`` additionally probes every Hamming-1 neighbor
    bucket (Lv et al. 2007, "Multi-Probe LSH"): near-misses on one
    hyperplane sign land one bit away, so probing the n_planes
    single-bit flips recovers them without more tables. Query-side
    only — the corpus keeps ONE bucket per vector; each query explodes
    to n_planes+1 probe rows (all distinct, so no candidate dedup is
    needed) and the join stays an equi-join on the bucket id.

    ``dim`` (embedding dimensionality) is inferred from the corpus when
    not given; the same value is used for the query side so both hash
    against the same hyperplane family."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    c = lsh_signatures(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")),
        vec_col="nvec",
        dim=dim,
        n_planes=n_planes,
        seed=seed,
    )
    q = lsh_signatures(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        vec_col="qvec",
        dim=dim,
        n_planes=n_planes,
        seed=seed,
    )
    if multi_probe:
        probes = ", ".join(
            ["lsh_bucket"] + [f"lsh_bucket ^ {1 << i}" for i in range(n_planes)]
        )
        q = q.select(
            "qid", "qvec", F.expr(f"explode(array({probes}))").alias("lsh_bucket")
        )
    scored = (
        c.join(F.broadcast(q), "lsh_bucket")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            # expanded cosine (bit-identical to the fold, codegen'd —
            # the element casts ARE the to_double_array promotion)
            quantize(F.expr(cosine_cols_sql("qvec", "nvec", dim))).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cos_sim", "rk")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    max_iter: int = 4,
    train_limit: int = 20_000,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    corpus into ``nlist`` cells; each query probes its ``nprobe``
    nearest cells and re-ranks exactly.

    Scale shape (the FAISS recipe): the quantizer trains on a BOUNDED
    sample collected to the driver and fit with numpy — at 100 TB one
    never fits k-means distributed on the full corpus, and Lloyd on
    20k×dim doubles is milliseconds locally vs one Spark job per
    iteration on the cluster. Cell assignment is a single codegen'd
    argmin-over-centroids expression (array_min over (dist, cell)
    structs) — one corpus pass, no row multiplication, no ML-lib
    dependency. The centroid table (nlist × dim floats) is broadcast;
    per-query work is proportional to nprobe/nlist of the corpus.
    """
    import numpy as np

    c = corpus.select(
        F.col(id_col).alias("nid"), to_double_array(F.col(vec_col)).alias("nvec")
    )
    sample = np.asarray(
        [r["nvec"] for r in c.select("nvec").limit(train_limit).collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    nlist_eff = min(nlist, len(sample))
    ctrs = sample[rng.choice(len(sample), size=nlist_eff, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((sample[:, None, :] - ctrs[None, :, :]) ** 2).sum(-1)
        owner = d2.argmin(1)
        for j in range(nlist_eff):
            pts = sample[owner == j]
            if len(pts):
                ctrs[j] = pts.mean(0)

    # One transform over a constant-folded array-of-structs centroid
    # literal beats 16 unrolled distance expressions: the plan stays
    # small (fast to compile) and the per-row loop is the same 16×dim
    # flops either way. array_min picks (min dist, lowest cell).
    cent_lit = F.expr(
        "array("
        + ",".join(
            f"struct({_sql_double_array(ctr)} as ctr, {i} as cell)"
            for i, ctr in enumerate(ctrs)
        )
        + ")"
    )
    dist2 = lambda v, ctr: F.aggregate(  # noqa: E731
        F.zip_with(v, ctr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = c.withColumn(
        "cell",
        F.array_min(
            F.transform(
                cent_lit,
                lambda s: F.struct(
                    dist2(F.col("nvec"), s["ctr"]).alias("d"),
                    s["cell"].alias("cell"),
                ),
            )
        )["cell"],
    )

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(ctrs)],
        "cell int, centroid array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("qid"), to_double_array(F.col(vec_col)).alias("qvec")
    )
    # probe cells ranked by the ASSIGNMENT metric (L2 to centroid) —
    # ranking by cosine here would probe cells the true neighbors were
    # never assigned to when centroid norms vary (the round-4 IVFPQ
    # probe-metric lesson, applied to the flat variant too)
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("d", dist2(F.col("qvec"), F.col("centroid")))
        .withColumn(
            "pr",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.col("d").asc(), F.col("cell"))
            ),
        )
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qvec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            quantize(cosine(F.col("qvec"), F.col("nvec"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "nid", "cos_sim", "rk")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + exact
    verification (id_a < id_b, cos ≥ threshold).

    SIZE ``n_planes`` TO THE CORPUS: buckets number 2^n_planes and the
    self-join emits O(Σ bucket²) pairs, so n_planes must grow with the
    corpus to keep expected bucket size bounded (8 planes/256 buckets
    suits ~10⁵ vectors; a 10⁹-vector corpus wants 20+ planes, i.e.
    ~10⁶ buckets, optionally several independent plane families OR'd
    together to recover recall the extra planes cost)."""
    dim = infer_dim(df, vec_col)
    from data_lake_demo_spark.functions.vector_expand import (
        dot_cols_sql,
        sq_norm_sql,
    )

    # r11: norms are computed ONCE PER ROW before the self-join (the
    # fold recomputed sqrt(Σv²) for both sides of every candidate
    # pair), and the pair dot is expanded arithmetic instead of an
    # interpreted aggregate/zip_with fold. sqrt-of-self-dot per row
    # is the same double the per-pair fold produced, and the division
    # keeps the norm(a)*norm(b) order — bit-identical cos_sim.
    sig = lsh_signatures(
        df, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed
    ).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        "lsh_bucket",
        F.expr(f"SQRT({sq_norm_sql(vec_col, dim)})").alias("__nrm"),
    )
    # pin the self-join to sort-merge (see minhash_lsh_candidates: a
    # mis-estimated broadcast of the full embedding frame OOMs at scale)
    a, b = sig.alias("a").hint("merge"), sig.alias("b")
    pair_cos = (
        f"({dot_cols_sql('a.vec', 'b.vec', dim)}"
        " / (a.__nrm * b.__nrm))"
    )
    return (
        a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            quantize(F.expr(pair_cos)).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 64,
    rerank: int = 4,
    seed: int = 42,
    max_iter: int = 4,
    train_limit: int = 20_000,
) -> DataFrame:
    """Product-quantization ANN: split each (L2-normalized) vector into
    ``m`` subvectors, vector-quantize each against a ``ksub``-centroid
    codebook, and score queries against the CODES by asymmetric
    distance (ADC) — a per-query lookup table replaces all float math
    on the corpus side. Top ``rerank*k`` ADC candidates are re-ranked
    with exact cosine (candidate-then-verify, like the LSH paths).

    Why it matters at 100 TB: codes are literally ``m`` BYTES per
    vector (binary column; m=8 → 32x smaller than float32), so the
    scan side of similarity search fits in a fraction of the memory/IO
    budget; the float originals are touched only for rerank candidates.

    This is the ephemeral (train+add+search in one call) wrapper over
    the staged machinery in operators/ann_index.py — use
    :class:`~data_lake_demo_spark.operators.ann_index.AnnIndex` to
    build once and query many times (the FAISS lifecycle).
    """
    from data_lake_demo_spark.operators import ann_index as ai

    c = corpus.select(
        F.col(id_col).alias("nid"), to_double_array(F.col(vec_col)).alias("nvec")
    )
    model = ai.train_pq_model(
        ai.sample_vectors(c, "nvec", train_limit),
        dim=infer_dim(corpus, vec_col),
        m=m,
        ksub=ksub,
        nlist=None,
        seed=seed,
        max_iter=max_iter,
    )
    codes = ai.encode_pq(c, model)
    q = queries.select(
        F.col(id_col).alias("qid"), to_double_array(F.col(vec_col)).alias("qvec")
    )
    cands = ai.adc_candidates(
        codes, ai.prep_queries(q, model), model, k=k, rerank=rerank
    )
    return ai.exact_rerank(
        cands.select("qid", "nid"), corpus, queries,
        id_col=id_col, vec_col=vec_col, k=k,
    )


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 64,
    rerank: int = 4,
    seed: int = 42,
    max_iter: int = 4,
    train_limit: int = 20_000,
    by_residual: bool = False,
    opq: bool = False,
) -> DataFrame:
    """IVF + PQ composed (the FAISS IVFPQ index; pass
    ``by_residual=True`` for FAISS's default residual encoding and/or
    ``opq=True`` for the learned rotation — the persisted
    ``AnnIndex`` path supports the same flags): the coarse quantizer prunes which rows are scored at all
    (each query touches ~nprobe/nlist of the corpus), and PQ codes make
    the surviving scan m bytes/vector via per-query ADC lookup tables.
    Top ``rerank*k`` ADC candidates are re-ranked with exact cosine.
    Probe cells are ranked by L2 to the coarse centroids — the SAME
    metric cell assignment uses (ranking by raw inner product probes
    the wrong cells when centroid norms vary).

    Why the composition is the 100 TB shape: IVF alone still reads
    full float vectors inside probed cells (8·dim bytes each); PQ
    alone scans every code in the corpus. Together the scan is
    (nprobe/nlist) × m bytes per vector — a ~4000× IO cut at dim=64,
    nlist=16, nprobe=4, m=8 — which is why every billion-vector
    system (FAISS IVFPQ, ScaNN, DiskANN hybrids) pairs a coarse
    pruner with a compressed in-cell code.

    Ephemeral wrapper over operators/ann_index.py (train + encode +
    search in one call, nothing persisted) — build an
    :class:`~data_lake_demo_spark.operators.ann_index.AnnIndex` once
    instead to amortize training + encoding across query batches.
    """
    from data_lake_demo_spark.operators import ann_index as ai

    c = corpus.select(
        F.col(id_col).alias("nid"), to_double_array(F.col(vec_col)).alias("nvec")
    )
    model = ai.train_pq_model(
        ai.sample_vectors(c, "nvec", train_limit),
        dim=infer_dim(corpus, vec_col),
        m=m,
        ksub=ksub,
        nlist=nlist,
        seed=seed,
        max_iter=max_iter,
        by_residual=by_residual,
        opq_iters=8 if opq else 0,
    )
    codes = ai.encode_pq(c, model)
    q = queries.select(
        F.col(id_col).alias("qid"), to_double_array(F.col(vec_col)).alias("qvec")
    )
    cands = ai.adc_candidates(
        codes, ai.prep_queries(q, model, nprobe=nprobe), model, k=k, rerank=rerank
    )
    return ai.exact_rerank(
        cands.select("qid", "nid"), corpus, queries,
        id_col=id_col, vec_col=vec_col, k=k,
    )
