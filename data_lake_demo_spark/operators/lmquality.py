"""Statistical quality scoring for a training corpus: n-gram LM
perplexity (the CCNet/RedPajama filter) and DSIR importance weights.

Two published data-selection methods, re-expressed as pure relational
algebra so both are fully value-hash oracle-able:

- ``bigram_lm_scores`` — CCNet's quality signal (Wenzek et al. 2019,
  "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  Data"): score every document by the bits-per-token of an add-alpha
  smoothed bigram language model estimated from the corpus itself.
  High bits-per-token = improbable token transitions = boilerplate /
  gibberish / mis-encoded text.
- ``dsir_weights`` — Data Selection with Importance Resampling (Xie
  et al. 2023, arXiv:2302.03169): hashed n-gram features, per-bucket
  log probability ratio between a target domain and the raw corpus,
  document log-weight = sum of its features' log-ratios. Documents
  that "look like" the target domain get high weight; resampling by
  weight tilts the corpus toward the target distribution.

At 100 TB both reduce to the same scale-safe shapes used everywhere
else in this engine: one map-side explode of per-doc features, count
aggregations shuffling only (token, count) / (bucket, count) pairs —
never document text — and a final broadcast (DSIR: the ratio table is
at most ``n_buckets`` rows) or shuffled-on-key (LM: the bigram count
table) join back to feature occurrences. No driver loop, no Python
in the hot path; fixed-point per-feature quantization keeps the
float aggregation deterministic (NOTES parity rule 1).

Reference parity: the reference has no engine code (its queries are
Athena SQL strings, README.md:46-68); this module is part of the
§2.13 LLM-pipeline extension surface the north star mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lake_demo_spark.operators.dedup import spread_small_input, tokens


def _bigram_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair. The two
    ``slice`` calls are each evaluated ONCE per row and zipped in a
    single pass (``arrays_zip``), deliberately avoiding per-element
    indexing into a computed array inside a lambda (the O(n²)
    re-evaluation trap documented in NOTES)."""
    t = F.col("__t")
    zipped = F.arrays_zip(
        F.slice(t, F.lit(1), F.size(t) - 1),
        F.slice(t, F.lit(2), F.size(t) - 1),
    )
    return (
        docs.withColumn("__t", tokens("text"))
        .select("doc_id", F.explode(zipped).alias("bg"))
        .select(
            "doc_id",
            F.col("bg").getField("0").alias("w1"),
            F.col("bg").getField("1").alias("w2"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, *, alpha: float = 1.0, q: int = 1000
) -> DataFrame:
    """Per-document bits-per-token under an add-``alpha`` smoothed
    bigram LM estimated from the corpus (CCNet's quality filter, with
    the corpus itself as the LM training set).

    P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V) where c(w1·) counts
    bigram contexts and V is the continuation vocabulary (distinct
    w2). Per-bigram bits are fixed-point quantized BEFORE the per-doc
    sum so the aggregate is integer arithmetic — deterministic across
    engines and partitionings.

    Returns (doc_id, n_bigrams, bits_per_token); documents with fewer
    than two tokens have no bigrams and drop out (same in the oracle).

    Scale: only (w1, w2) token pairs shuffle — never text. The count
    tables are corpus-bounded aggregates joined back on their own
    keys; AQE picks broadcast when the vocabulary allows it. A
    production run would add a min-count prune + UNK fallback to cap
    the c12 table; at fixture scale exact counts keep the oracle
    exact.
    """
    pairs = _bigram_pairs(spread_small_input(docs, "doc_id")).cache()
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    v = pairs.agg(F.countDistinct("w2").alias("v"))
    a = F.lit(float(alpha))
    bits = (
        pairs.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))  # bounded scalar-subquery shape
        .select(
            "doc_id",
            F.floor(
                (-F.log2((F.col("c12") + a) / (F.col("c1") + a * F.col("v"))))
                * q
                + F.lit(0.5)
            )
            .cast("long")
            .alias("bq"),
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("bq").alias("sq"))
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.col("sq").cast("double")
                / (F.lit(float(q)) * F.col("n_bigrams"))
            ).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


def bigram_lm_oracle_sql(*, alpha: float = 1.0, q: int = 1000) -> str:
    """DuckDB twin of ``bigram_lm_scores`` — identical expression
    structure (slice-zip bigrams via aligned unnest, same smoothing,
    same fixed-point fold) so the driver's value-hash check covers
    the whole pipeline."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
pairs AS (
  SELECT doc_id,
         unnest([t[i] FOR i IN range(1, len(t))]) AS w1,
         unnest([t[i+1] FOR i IN range(1, len(t))]) AS w2
  FROM toks),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS v FROM pairs),
bits AS (
  SELECT doc_id,
         CAST(floor((-log2((c12 + CAST({alpha} AS DOUBLE))
                           / (c1 + CAST({alpha} AS DOUBLE) * v)))
                    * {q} + 0.5) AS BIGINT) AS bq
  FROM pairs JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(bq) AS DOUBLE) / (CAST({q} AS DOUBLE) * count(*))
         AS bits_per_token
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


def _feature_bucket(f: Column, n_buckets: int) -> Column:
    """Deterministic cross-engine feature bucket: the portable radix
    hash (first 7 md5 hex chars parsed base-16 — see dedup.
    _md5fold_expr for the measured ~4× win over the round-5 ascii
    fold), mod ``n_buckets``. xxhash64 would be marginally cheaper
    but has no DuckDB twin; md5 keeps the oracle exact."""
    h = F.md5(f.cast("binary"))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % n_buckets


def feature_bucket_oracle_expr(col: str, n_buckets: int) -> str:
    """DuckDB twin of ``_feature_bucket`` — MUST stay in lockstep."""
    return f"(CAST(('0x' || substr(md5({col}), 1, 7)) AS BIGINT) % {n_buckets})"


def _doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f) — unigram + bigram string features, one map-side
    explode. Bigrams reuse the shingle convention: a single-token
    document contributes its whole text once (mirrored in the
    oracle's CASE)."""
    t = F.col("__t")
    bigrams = F.when(F.size(t) <= 1, F.array(F.concat_ws(" ", t))).otherwise(
        F.zip_with(
            F.slice(t, F.lit(1), F.size(t) - 1),
            F.slice(t, F.lit(2), F.size(t) - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    return (
        docs.withColumn("__t", tokens("text"))
        .select("doc_id", F.explode(F.concat(t, bigrams)).alias("f"))
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    *,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    q: int = 1000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): log-weight of each
    document under hashed-n-gram importance resampling toward the
    ``target_pred`` slice of the corpus.

    Features are unigrams + bigrams hashed into ``n_buckets``;
    per-bucket smoothed log2-probability ratio
    ``log2 p_target(b) − log2 p_raw(b)`` is computed once (a table of
    at most ``n_buckets`` rows, broadcast), quantized at the bucket
    level, and summed over each document's feature occurrences — so
    the per-doc aggregate is pure integer arithmetic.

    Returns (doc_id, n_feats, log_weight) for ALL documents (the raw
    corpus); resample by ``exp2(log_weight)`` to tilt toward the
    target. Scale: feature text shuffles once into (bucket, count)
    partials; the docs themselves never shuffle — the ratio join is a
    broadcast and the final sum groups by doc_id on the already
    exploded features.
    """
    feats = (
        _doc_features(spread_small_input(docs, "doc_id"))
        .select(
            "doc_id", _feature_bucket(F.col("f"), n_buckets).alias("b")
        )
        .cache()
    )
    tgt_ids = docs.filter(target_pred).select("doc_id")
    tgt = feats.join(F.broadcast(tgt_ids), "doc_id").groupBy("b").agg(
        F.count("*").alias("ct")
    )
    raw = feats.groupBy("b").agg(F.count("*").alias("cr"))
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * n_buckets)
    totals = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.sum("ct").alias("tt"))
    )
    ratio = (
        raw.join(F.broadcast(tgt), ["b"], "left")  # both ≤ n_buckets rows
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.floor(
                (
                    F.log2(F.coalesce(F.col("ct"), F.lit(0)) + a)
                    - F.log2(F.col("tt") + ab)
                    - F.log2(F.col("cr") + a)
                    + F.log2(F.col("tr") + ab)
                )
                * q
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lrq"),
        )
    )
    return (
        feats.join(F.broadcast(ratio), ["b"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lrq").alias("sq"))
        .select(
            "doc_id",
            "n_feats",
            (F.col("sq").cast("double") / F.lit(float(q))).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


def dsir_oracle_sql(
    target_where: str,
    *,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    q: int = 1000,
) -> str:
    """DuckDB twin of ``dsir_weights`` over the ``documents`` view.
    ``target_where`` is the SQL predicate matching ``target_pred``."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
feats0 AS (
  SELECT doc_id,
         unnest(list_concat(
           t,
           CASE WHEN len(t) <= 1 THEN [array_to_string(t, ' ')]
                ELSE [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
           END)) AS f
  FROM toks),
feats AS (
  SELECT doc_id, {feature_bucket_oracle_expr('f', n_buckets)} AS b
  FROM feats0),
tgt AS (
  SELECT b, count(*) AS ct FROM feats
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE {target_where})
  GROUP BY b),
raw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
totals AS (
  SELECT (SELECT sum(cr) FROM raw) AS tr, (SELECT sum(ct) FROM tgt) AS tt),
ratio AS (
  SELECT raw.b,
         CAST(floor((log2(COALESCE(ct, 0) + CAST({alpha} AS DOUBLE))
                     - log2(tt + CAST({alpha * n_buckets} AS DOUBLE))
                     - log2(cr + CAST({alpha} AS DOUBLE))
                     + log2(tr + CAST({alpha * n_buckets} AS DOUBLE)))
                    * {q} + 0.5) AS BIGINT) AS lrq
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN totals)
SELECT doc_id, count(*) AS n_feats,
       CAST(sum(lrq) AS DOUBLE) / CAST({q} AS DOUBLE) AS log_weight
FROM feats JOIN ratio USING (b)
GROUP BY doc_id ORDER BY doc_id
"""
