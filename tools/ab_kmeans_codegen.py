"""Probe: does the Janino 64 KB whole-stage fallback cost wall time in
emb_cluster_balanced_sample, and does methodSplitThreshold fix it?

Runs the registry query N times warm in one process and reports per-run
walls + whether the CodeGenerator error fires, under the session's
default codegen settings (set SPARK_GRAFT_MST to try a different
spark.sql.codegen.methodSplitThreshold).
"""

from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from data_lake_demo_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_kmeans_codegen")
    mst = os.environ.get("SPARK_GRAFT_MST")
    if mst:
        spark.conf.set("spark.sql.codegen.methodSplitThreshold", mst)
        print(f"methodSplitThreshold={mst}", file=sys.stderr)
    q = entrymod.queries()["emb_cluster_balanced_sample"]
    walls = []
    for i in range(rounds + 1):  # first run = warmup
        t0 = time.monotonic()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if i:
            walls.append(dt)
        print(f"run {i}: {dt:.3f}s", file=sys.stderr)
    med = sorted(walls)[len(walls) // 2]
    print({"runs": [round(x, 3) for x in walls], "median": round(med, 3)})


if __name__ == "__main__":
    main()
