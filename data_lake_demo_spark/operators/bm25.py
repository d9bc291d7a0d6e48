"""BM25 sparse lexical retrieval (Robertson/Spärck Jones; the Okapi
BM25 ranking function) over the ``documents`` table — the lexical
counterpart of the embedding RAG join (plans/llm.doc_retrieval_join).

Reference parity: the reference exposes retrieval only as Athena SQL
shapes over curated tables (README.md:46-80); BM25 here extends the
engine's training-data surface (corpus-level "more-like-this" mining,
contamination lookup by lexical overlap) the same way the dedup ladder
does — as a first-class oracle-checked operator.

Scale shape (100 TB contract)
-----------------------------
The inverted index is the ``(doc_id, term, tf)`` aggregate. Retrieval
for a bounded query batch touches only the postings of the query's
terms: the query-term set is broadcast and the big postings table is
SEMI-restricted by term before any scoring join, so corpus postings
never shuffle on anything but the matched rows. Document frequency is
computed on the restricted postings (restriction is by term, so the
per-term counts are identical to global df). Corpus-level stats
(N, avgdl) are one single-row aggregate, broadcast. The final
aggregation keys on (qid, doc_id) — cardinality ≤ |query terms| ·
max-df — and top-k is a bounded window per qid.

Determinism contract: each (qid, doc, term) contribution is quantized
to 1e-6 fixed point and summed as exact integers (the repo-wide qsum
idiom), so the cross-engine value hash is stable under any
accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_demo_spark.operators.dedup import tokens

BM25_SCALE = 1_000_000


def _postings(docs: DataFrame) -> DataFrame:
    toks = docs.withColumn("toks", tokens("text")).select(
        "doc_id", F.explode("toks").alias("term")
    )
    return toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    n_query_docs: int = 8,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """More-like-this BM25: each document with ``doc_id <
    n_query_docs`` queries the corpus with its own (distinct) term
    set; returns ``(qid, rk, nid, score)`` — top-``k`` non-self
    matches per query.

    idf uses the standard smoothed form ``ln(1 + (N - df + .5) /
    (df + .5))`` which is positive for all df, so scores are
    monotone in term overlap.
    """
    tf = _postings(docs)
    dl = (
        docs.withColumn("toks", tokens("text"))
        .select("doc_id", F.size("toks").alias("dl"))
    )
    stats = docs.withColumn("toks", tokens("text")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("toks")) / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = tf.filter(F.col("doc_id") < n_query_docs).select(
        F.col("doc_id").alias("qid"), F.col("term").alias("qterm")
    )
    # Semi-restrict the postings to query terms BEFORE df/scoring: the
    # broadcast term set is the only thing that touches full postings.
    posts = tf.join(
        F.broadcast(qterms.select(F.col("qterm").alias("term")).distinct()),
        "term",
        "left_semi",
    )
    df_ = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        F.broadcast(qterms)
        .join(posts, qterms.qterm == posts.term)
        .filter(F.col("doc_id") != F.col("qid"))
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib_q",
            F.floor(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * BM25_SCALE
                + F.lit(0.5)
            ),
        )
    )
    scored = contrib.groupBy("qid", F.col("doc_id").alias("nid")).agg(
        (F.sum("contrib_q") / float(BM25_SCALE)).alias("score")
    )
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "rk", "nid", "score")
    )


def bm25_oracle_sql(
    n_query_docs: int = 8, k: int = 5, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical tokenization,
    idf, quantized contribution fold, and tie-break. ``k1``/``b`` are
    CAST to DOUBLE in the SQL: DuckDB would otherwise parse ``1.2`` as
    DECIMAL and fold ``tf * (k1+1)`` in exact decimal, which can land
    1 ulp away from Spark's double arithmetic."""
    k1d = f"CAST({k1} AS DOUBLE)"
    bd = f"CAST({b} AS DOUBLE)"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs,
         (SELECT count(*) FROM toks) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM documents),
qterms AS (SELECT doc_id AS qid, term AS qterm FROM tf
           WHERE doc_id < {n_query_docs}),
df AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT DISTINCT qterm FROM qterms) GROUP BY 1),
contrib AS (
  SELECT q.qid, t.doc_id AS nid,
         floor(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * ({k1d} + 1.0))
               / (t.tf + {k1d} * (1.0 - {bd} + {bd} * l.dl / s.avgdl))
               * {BM25_SCALE} + 0.5) AS contrib_q
  FROM qterms q
  JOIN tf t ON q.qterm = t.term AND t.doc_id <> q.qid
  JOIN df d ON t.term = d.term
  JOIN dl l ON t.doc_id = l.doc_id
  CROSS JOIN stats s),
scored AS (
  SELECT qid, nid, sum(contrib_q) / CAST({BM25_SCALE} AS DOUBLE) AS score
  FROM contrib GROUP BY qid, nid)
SELECT qid, rk, nid, score FROM (
  SELECT qid, nid, score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, nid) AS rk
  FROM scored) t
WHERE rk <= {k}
"""
