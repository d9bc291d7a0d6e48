"""Dump `explain formatted` for registry queries.

    python tools/dump_plans.py q1,q2 <suffix> [outdir]

Writes plans/r12/<query>_<suffix>.txt (same methodology as the
round's *_before.txt capture: the physical plan of the DataFrame the
query returns; queries that run verbs internally execute them as a
side effect of construction, which is the declared shape).
"""
from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from data_lake_demo_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    suffix = sys.argv[2]
    outdir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "plans", "r12"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    queries = entrymod.queries()
    jvm = spark._sc._jvm
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
