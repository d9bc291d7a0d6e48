"""Interleaved A/B for the r11 bm25_topk dl/avgdl derivation.

Builds BOTH variants of doc_bm25_retrieval in one process (old =
re-tokenize for dl/stats, new = derive from tf) and alternates
A,B,A,B,... noop-sink runs so host noise bands hit both sides equally
(OPTIMIZATION_r11.md measurement-hygiene note).
"""

from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from pyspark.sql import DataFrame, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_lake_demo_spark.session import get_spark  # noqa: E402
from data_lake_demo_spark.operators.bm25 import (  # noqa: E402
    BM25_SCALE,
    _postings,
    bm25_topk,
)
from data_lake_demo_spark.operators.dedup import tokens  # noqa: E402


def bm25_topk_old(
    docs: DataFrame,
    n_query_docs: int = 8,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Pre-r11 body: dl and stats re-tokenize the corpus."""
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


def bm25_topk_cached(docs, n_query_docs=8, k=5, k1=1.2, b=0.75):
    """Variant C: tf computed once and persisted in-operator (the
    banded-signature idiom); dl/stats derive from the cached tf."""
    from pyspark import StorageLevel

    tf = _postings(docs).persist(StorageLevel.MEMORY_AND_DISK)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        F.broadcast(tf.agg(F.sum("tf").alias("__tok_total")))
    ).select(
        "n_docs", (F.col("__tok_total") / F.col("n_docs")).alias("avgdl")
    )
    qterms = tf.filter(F.col("doc_id") < n_query_docs).select(
        F.col("doc_id").alias("qid"), F.col("term").alias("qterm")
    )
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
        .select("qid", "rk", "nid", "score"),
        tf,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_bm25")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm FS cache

    def run(fn) -> float:
        out = fn(docs, n_query_docs=8, k=5)
        handle = None
        if isinstance(out, tuple):
            out, handle = out
        out = out.orderBy("qid", "rk")
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if handle is not None:
            handle.unpersist()
        return dt

    # one unmeasured warmup each
    run(bm25_topk_old)
    run(bm25_topk)
    run(bm25_topk_cached)
    olds, news, cach = [], [], []
    for i in range(rounds):
        olds.append(run(bm25_topk_old))
        news.append(run(bm25_topk))
        cach.append(run(bm25_topk_cached))
        print(
            f"round {i}: old={olds[-1]:.3f}s new={news[-1]:.3f}s "
            f"cached={cach[-1]:.3f}s",
            file=sys.stderr,
        )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        {
            "old_runs": [round(x, 3) for x in olds],
            "new_runs": [round(x, 3) for x in news],
            "cached_runs": [round(x, 3) for x in cach],
            "old_median": round(med(olds), 3),
            "new_median": round(med(news), 3),
            "cached_median": round(med(cach), 3),
        }
    )


if __name__ == "__main__":
    main()
