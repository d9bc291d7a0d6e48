"""Scale up the driver's synthetic testdata by an integer factor —
the 10x ("sf1-equivalent") probe corpus for scale-cliff hunting.

Usage::

    python tools/make_sf_scale.py [src_dir] [dst_dir] [factor]
    # defaults: /root/testdata/sf0.1  /tmp/spark-graft-testdata/sf1  10

Each copy ``i`` shifts every key column by ``i * (max_key + 1)``,
CONSISTENTLY across tables (orders.o_custkey moves with
customer.c_custkey, lineitem's three FKs move with their dims), so
join selectivity, group cardinality growth, and dup-group structure
scale the way a real corpus grows — 10x the entities, not 10x
copies of one entity:

* ``documents``: copies beyond the first get a ``" v<i>"`` text
  suffix — within-copy duplicate structure (exact, prefix, shingle)
  is preserved, no artificial cross-copy duplicates appear.
* ``embeddings``: copy ``i`` rotates the vector left by ``i``
  positions — norms preserved, directions distinct, so the
  near-dup/ANN workload scales in corpus size without 10 exact
  twins of every point.
* ``events``: new user-id ranges per copy (horizontal user growth),
  same time window — event rate per hour grows 10x, the
  windowed-aggregation stress shape.
* ``region``/``nation`` stay fixed (TPC-H keeps dims constant).

Big tables land as multi-file parquet directories so a local scan
parallelizes like a real multi-file lake table.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

# key columns shifted per copy: table -> [(column, shift_group)]
SHIFTS = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
    "region": [],
    "nation": [],
}
# shift_group -> (table, column) that defines its base
GROUP_BASE = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
OUT_FILES = {  # parquet part files per table (big tables parallelize)
    "lineitem": 16,
    "orders": 8,
    "events": 8,
    "customer": 4,
    "part": 4,
    "documents": 4,
    "embeddings": 4,
    "supplier": 1,
    "region": 1,
    "nation": 1,
}


def scale_table(
    df: DataFrame, table: str, factor: int, bases: dict[str, int]
) -> DataFrame:
    if not SHIFTS[table]:
        return df
    copies = []
    for i in range(factor):
        c = df
        for col, group in SHIFTS[table]:
            c = c.withColumn(col, F.col(col) + F.lit(i * bases[group]))
        if table == "documents" and i > 0:
            suffix = f" v{i}"
            c = c.withColumn(
                "text", F.concat(F.col("text"), F.lit(suffix))
            ).withColumn("n_chars", F.col("n_chars") + F.lit(len(suffix)))
        if table == "embeddings" and i > 0:
            # left-rotate by i: norm-preserving, direction-distinct
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.expr(f"slice(embedding, {i + 1}, size(embedding) - {i})"),
                    F.slice("embedding", 1, i),
                ),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/spark-graft-testdata/sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from data_lake_demo_spark.session import get_spark
    from data_lake_demo_spark.sources.testdata import load_table

    spark = get_spark("make_sf_scale")
    os.makedirs(dst, exist_ok=True)
    bases: dict[str, int] = {}
    for group, (table, col) in GROUP_BASE.items():
        bases[group] = (
            load_table(spark, src, table).agg(F.max(col)).first()[0] + 1
        )
    for table in SHIFTS:
        out = scale_table(load_table(spark, src, table), table, factor, bases)
        path = os.path.join(dst, f"{table}.parquet")
        out.repartition(OUT_FILES[table]).write.mode("overwrite").parquet(path)
        print(f"{table}: {spark.read.parquet(path).count()} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
