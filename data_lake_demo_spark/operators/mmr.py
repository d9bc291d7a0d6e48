"""Maximal Marginal Relevance (MMR) re-ranking — the retrieval
DIVERSITY operator (Carbonell & Goldstein 1998): greedily pick the
candidate maximizing ``lam * relevance - (1 - lam) * max-similarity-
to-already-picked``, so the final top-k answers the query from k
different angles instead of k near-duplicates of the best hit. The
standard last stage of a RAG retriever and of dense-retrieval
training-data curation (diverse positives/negatives).

Spark-first shape: the greedy loop is UNROLLED into k pure-JVM
rounds — each round is one qid-keyed join of the remaining pool
against the (≤ k-1 rows per query) picked set, one max-aggregate,
one window argmax. No Python in the loop, no per-query driver work;
at 100 TB the pool side is the upstream retriever's top-N per query
(N ~ 10-100), so every round's join is hash-partitioned on qid and
each query's work is O(N·k) — embarrassingly parallel across
queries. All comparisons run on 1e-6-quantized scores with id
tie-breaks, so the whole selection is deterministic and replays
exactly in ANSI SQL (the driver query's value-hash oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_demo_spark.functions.vector import cosine, quantize
from data_lake_demo_spark.functions.vector_expand import cosine_cols_sql


def mmr_rerank(
    candidates: DataFrame,
    *,
    k: int,
    lam: float,
    qid_col: str = "qid",
    id_col: str = "nid",
    rel_col: str = "rel",
    vec_col: str = "nvec",
    dim: int | None = None,
) -> DataFrame:
    """Greedy MMR over per-query candidate pools.

    ``candidates``: one row per (query, candidate) with a relevance
    score (ALREADY quantized — pass the retriever's 1e-6-grid score)
    and the candidate's vector. Pick 1 is pure argmax-relevance;
    pick i maximizes ``lam*rel - (1-lam)*max_sim`` where ``max_sim``
    is the max cosine to the picks so far (quantized per pair before
    the max, so the fold is engine-reproducible).

    Returns (qid, pick_rank, nid, mmr_score); queries with fewer than
    ``k`` candidates yield fewer picks."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    mu = 1.0 - lam  # computed HERE so the SQL oracle can replay the
    # exact double (1 - 0.7 != literal 0.3 in IEEE754)
    cands = candidates.select(
        F.col(qid_col).alias("qid"),
        F.col(id_col).alias("nid"),
        F.col(rel_col).alias("rel"),
        F.col(vec_col).alias("nvec"),
    ).persist()  # every round re-reads the pool; bounded at N per query
    round_frames = [cands]  # unpersisted once the result materializes
    w_rel = W.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("nid"))
    # each round's pick is ONE row per query — persist it, or round i
    # re-derives every earlier round's windows and the unrolled plan
    # grows multiplicatively (measured: 73 exchanges unpersisted vs a
    # flat per-round cost persisted); the picked side of each join is
    # also broadcast for the same reason
    picked = (
        cands.withColumn("__rn", F.row_number().over(w_rel))
        .filter(F.col("__rn") == 1)
        .select(
            "qid",
            "nid",
            "rel",
            "nvec",
            F.lit(1).alias("pick_rank"),
            F.col("rel").alias("mmr_score"),
        )
        .persist()
    )
    round_frames.append(picked)
    remaining = cands.join(picked.select("qid", "nid"), ["qid", "nid"], "left_anti")
    for i in range(2, k + 1):
        sims = (
            remaining.join(
                F.broadcast(
                    picked.select(
                        F.col("qid").alias("__pq"), F.col("nvec").alias("__pv")
                    )
                ),
                F.col("qid") == F.col("__pq"),
            )
            .select(
                "qid",
                "nid",
                "rel",
                "nvec",
                # dim known → expanded cosine (bit-identical to the
                # fold, codegen'd; see vector_expand). The fold stays
                # the fallback for callers with unknown dim.
                quantize(
                    F.expr(cosine_cols_sql("nvec", "__pv", dim))
                    if dim
                    else cosine(F.col("nvec"), F.col("__pv"))
                ).alias("__sim"),
            )
            .groupBy("qid", "nid")
            .agg(
                F.max("__sim").alias("__max_sim"),
                F.max("rel").alias("rel"),
                F.first("nvec").alias("nvec"),
            )
        )
        scored = sims.withColumn(
            "mmr_score",
            quantize(
                F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("__max_sim")
            ),
        )
        w_s = W.partitionBy("qid").orderBy(
            F.col("mmr_score").desc(), F.col("nid")
        )
        pick = (
            scored.withColumn("__rn", F.row_number().over(w_s))
            .filter(F.col("__rn") == 1)
            .select(
                "qid", "nid", "rel", "nvec",
                F.lit(i).alias("pick_rank"), "mmr_score",
            )
            .persist()
        )
        round_frames.append(pick)
        picked = picked.unionByName(pick)
        remaining = remaining.join(
            pick.select("qid", "nid"), ["qid", "nid"], "left_anti"
        )
    # every round's pick (and the pool) stays pinned until the result
    # exists — they are all inputs to it — then unpersists AT ONCE
    # instead of lingering until ContextCleaner GC. The materialized
    # result is k small rows per query (no vectors), checkpoint-backed
    # so re-reads never replay the k-round plan.
    # coalesce first: the union of k picks carries k×shuffle-partitions
    # near-empty partitions, and checkpointing a tiny result through
    # 100+ trivial tasks is pure scheduling overhead (measured ~0.5 s
    # at sf0.1); narrow-merging to a handful costs nothing upstream
    result = (
        picked.select("qid", "pick_rank", "nid", "mmr_score")
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    for f in round_frames:
        f.unpersist()
    return result
