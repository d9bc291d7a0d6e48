"""r12 verdict item 7: prove the r11 graph.pagerank edge
repartition("src")-before-persist removes the per-iteration edge-side
Exchange in the SORT-MERGE regime (at sf0.1 AQE broadcasts the
per-round join, so the elision is invisible locally — force SMJ with
autoBroadcastJoinThreshold=-1 and compare executed plans).

Writes plans/r12/graph_smj_{unpartitioned,partitioned}.txt and prints
the per-variant Exchange count of one iteration's executed plan.
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from data_lake_demo_spark.session import get_spark  # noqa: E402


def one_round(spark, edges, tag: str) -> str:
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    s0 = 1_000_000_000 // n_nodes
    scores = nodes.select("node", F.lit(s0).cast("bigint").alias("s"))
    contrib = (
        edges.join(scores.select(F.col("node").alias("src"), "s"), "src")
        .join(outdeg.select(F.col("node").alias("src"), "deg"), "src")
        .select(F.col("dst").alias("node"), F.expr("(85 * s) div (100 * deg)").alias("c"))
    )
    inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
    spark.sparkContext.setJobDescription(f"graph-smj-probe:{tag}")
    # collect() executes THIS Dataset's QueryExecution, so the
    # explain below shows the FINAL adaptive plan (the noop writer
    # would execute a separate QE and leave this one un-executed)
    inflow.collect()
    plan = inflow._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    nodes.unpersist()
    outdeg.unpersist()
    return plan


def main() -> None:
    spark = get_spark(
        "graph_smj_probe",
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    raw = (
        spark.range(200_000)
        .select(
            (F.col("id") % 50_000).alias("src"),
            F.pmod(F.xxhash64("id"), F.lit(50_000)).alias("dst"),
        )
    )
    outdir = os.path.join(repo, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for tag, edges in (
        ("unpartitioned", raw.persist(StorageLevel.MEMORY_AND_DISK)),
        ("partitioned", raw.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)),
        ("explicit_n", raw.repartition(n, "src").persist(StorageLevel.MEMORY_AND_DISK)),
    ):
        edges.count()  # materialize the cache
        plan = one_round(spark, edges, tag)
        with open(os.path.join(outdir, f"graph_smj_{tag}.txt"), "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_smj = plan.count("SortMergeJoin")
        print(f"{tag}: Exchange={n_ex} SortMergeJoin={n_smj}")
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
