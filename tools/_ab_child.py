"""One A/B pass (child of tools/ab_queries.py): time the named
registry queries once each with the bench methodology (noop sink,
bench warm-up) against the tree on PYTHONPATH; print one JSON line
{query: seconds}."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_lake_demo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("ab_child")
    queries = entrymod.queries()

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm = spark.range(1000).withColumnRenamed("id", "k")
    warm.join(warm, "k").groupBy((warm.k % 10)).count().write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
