"""Per-query measurement harness for the optimization rounds.

Usage:
    python tools/measure_query.py q1,q2,... [--runs N] [--explain TAG]

Times each named registry query with the noop sink (guide §1.4) on the
same session shape as bench.py, printing per-run walls to stderr and a
JSON summary to stdout. ``--explain TAG`` additionally writes
``plans/<TAG>/<query>_(before|after).txt`` with ``explain('formatted')``
output — pass ``--suffix after`` once a change landed.

Unlike bench.py this never touches BENCH_LOCK.json.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    argv = sys.argv[1:]
    if not argv:
        print("usage: measure_query.py q1,q2 [--runs N] [--explain TAG] "
              "[--suffix before|after]", file=sys.stderr)
        sys.exit(2)
    names = [n for n in argv[0].split(",") if n]
    runs = 3
    tag = None
    suffix = "before"
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])  # 0 = plans only
    if "--explain" in argv:
        tag = argv[argv.index("--explain") + 1]
    if "--suffix" in argv:
        suffix = argv[argv.index("--suffix") + 1]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from data_lake_demo_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("measure")
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries {unknown}", file=sys.stderr)
        sys.exit(2)

    # same warm-up as bench.py
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.count()
    warm = spark.range(1000).withColumnRenamed("id", "k")
    warm.join(warm, "k").groupBy((warm.k % 10)).count().write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"measure:{name}#{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            print(f"# {name} run{i}: {walls[-1]:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        if walls:
            out[name] = {
                "min": round(min(walls), 3),
                "runs": [round(w, 3) for w in walls],
            }
        if tag:
            plan_dir = os.path.join(repo, "plans", tag)
            os.makedirs(plan_dir, exist_ok=True)
            df = queries[name](spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
