"""Model-based quality filtering: a linear classifier over hashed
n-gram features (the CCNet/fastText recipe — Wenzek et al. 2019 train
a fastText classifier against a high-quality target corpus; GPT-3 and
LLaMA both used this family of filters for web-corpus selection).

Same split as every trained operator in this engine (k-means
codebooks, OPQ rotations, BPE merges): TRAIN with numpy on a bounded
driver sample, SCORE relationally across the cluster. Scoring needs
no Python at all — the model is a weights table of at most
``n_buckets`` rows, broadcast into a join against the exploded
feature stream, folded per doc, and squashed with ``F.sigmoid``-free
``1/(1+exp(-z))`` arithmetic inside codegen.

At 100 TB: the feature explode is the same map-side shape as
DSIR/TF-IDF; only (doc_id, bucket) pairs shuffle; the weights join is
a broadcast by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lake_demo_spark.operators.dedup import spread_small_input, tokens


def _bucket_expr(f: Column, n_buckets: int) -> Column:
    """Same md5 base-31 fold the DSIR features use (lmquality.py) —
    one deterministic bucket family across the quality operators."""
    from data_lake_demo_spark.operators.lmquality import _feature_bucket

    return _feature_bucket(f, n_buckets)


def _doc_buckets(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, b) unigram-feature stream, map-side."""
    return (
        docs.withColumn("__t", tokens("text"))
        .select("doc_id", F.explode("__t").alias("f"))
        .select("doc_id", _bucket_expr(F.col("f"), n_buckets).alias("b"))
    )


def train_linear_quality(
    docs: DataFrame,
    label_pred: Column,
    *,
    n_buckets: int = 1024,
    sample_limit: int = 10_000,
    epochs: int = 300,
    lr: float = 5.0,
    seed: int = 42,
):
    """Logistic regression on normalized bucket-count vectors, trained
    driver-side on a bounded sample. ``label_pred`` marks the positive
    ("high quality" / target-domain) class. Returns (weights: np
    (n_buckets,), bias: float). Deterministic: fixed init, full-batch
    gradient steps, no shuffling."""
    import numpy as np

    rows = (
        docs.select("doc_id", "text", label_pred.cast("int").alias("y"))
        .limit(sample_limit)
        .collect()
    )
    # hash features in python with the SAME md5 fold (hashlib matches
    # Spark's md5 hex); counts normalized per doc
    import hashlib

    def bucket(tok: str) -> int:
        # lockstep with lmquality._feature_bucket (radix parse of the
        # first 7 md5 hex chars)
        h = hashlib.md5(tok.encode("utf-8", "surrogatepass")).hexdigest()
        return int(h[:7], 16) % n_buckets

    X = np.zeros((len(rows), n_buckets))
    y = np.array([r.y for r in rows], dtype=np.float64)
    for i, r in enumerate(rows):
        toks = (r.text or "").split()
        for t in toks:
            X[i, bucket(t)] += 1.0
        if toks:
            X[i] /= len(toks)
    w = np.zeros(n_buckets)
    b = 0.0
    n = max(len(rows), 1)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * g.mean()
    return w, b


def score_quality(
    docs: DataFrame,
    weights,
    bias: float,
    *,
    n_buckets: int = 1024,
    quantize_q: int | None = 1_000_000,
) -> DataFrame:
    """(doc_id, n_toks, quality_score) — p(positive) per document,
    computed RELATIONALLY: explode unigrams, broadcast-join the
    ≤ n_buckets weights table, sum w_b per doc, normalize by token
    count, sigmoid. No Python in the plan.

    With ``quantize_q`` (the default) weights are quantized
    driver-side to integers ``floor(w*q + 0.5)`` and the per-doc fold
    is an integer sum — the engine's standard order-independence
    recipe (cf. dsir_weights), so the score is bit-identical
    regardless of partitioning/AQE ordering. ``quantize_q=None``
    keeps raw float weights (order-dependent in the last ulps)."""
    import math

    spark = docs.sparkSession
    if quantize_q:
        q = int(quantize_q)
        rows = [
            (i, int(math.floor(float(v) * q + 0.5)))
            for i, v in enumerate(weights)
        ]
        wtab = spark.createDataFrame(
            [(b, iw) for b, iw in rows if iw != 0], "b int, iw long"
        )
        sum_col = F.sum(F.coalesce(F.col("iw"), F.lit(0))).alias("sw")
        z_num = F.col("sw").cast("double") / F.lit(float(q))
    else:
        wtab = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(weights) if v != 0.0],
            "b int, w double",
        )
        sum_col = F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("sw")
        z_num = F.col("sw")
    feats = _doc_buckets(spread_small_input(docs, "doc_id"), n_buckets)
    sums = (
        feats.join(F.broadcast(wtab), ["b"], "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), sum_col)
    )
    z = z_num / F.col("n_toks") + F.lit(float(bias))
    return sums.select(
        "doc_id",
        "n_toks",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_score"),
    ).orderBy("doc_id")


def frozen_weights(n_buckets: int = 1024):
    """A deterministic literal weight family (no training): an LCG
    over the bucket index, centered to [-0.5, 0.5). Exists so the
    SCORING plan — the part that runs at 100 TB — gets a full
    cross-engine value-hash oracle: the same integer arithmetic
    replicates in ANSI SQL, while the trained production weights
    cannot (numpy gradient descent has no SQL twin). The same recipe
    as the portable MinHash/SimHash/PQ-codebook families."""
    import numpy as np

    k = (np.arange(n_buckets, dtype=np.int64) * 1103515245 + 12345) % 2039
    return k / 2039.0 - 0.5
