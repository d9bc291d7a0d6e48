"""Write-amplification probe: copy-on-write vs merge-on-read MERGE.

The workload where DV-merge pays: a CDC trickle whose keys scatter
across the table (one matched row per file), so CoW rewrites every
touched file while MOR commits one small add + per-file vectors.

Usage::

    PYTHONPATH=. python tools/probe_merge_mor.py [n_rows] [n_files]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_lake_demo_spark.tableformat import AcidTable


def run(spark, n: int, files: int, mode: str) -> dict:
    root = tempfile.mkdtemp(prefix=f"merge_{mode}_")
    t = AcidTable(spark, root + "/t")
    t.append(
        spark.range(n).selectExpr("id AS k", "id * 7 AS v"),
        partition_by=["k"],
    )
    per_file = n // files
    # one matched key per file + 5% fresh inserts
    batch = spark.range(files).selectExpr(
        f"id * {per_file} + 1 AS k", "-1 AS v"
    ).unionAll(
        spark.range(files // 20 + 1).selectExpr(f"id + {n} AS k", "-2 AS v")
    )
    t0 = time.perf_counter()
    t.merge(batch, ["k"], mode=mode)
    wall = time.perf_counter() - t0
    c = t._read_commit(t.latest_version())
    rewritten_rows = len(c.remove) * per_file
    added_bytes = sum(
        os.path.getsize(os.path.join(t.path, a["path"])) for a in c.add
    )
    assert t.snapshot().filter(F.col("v") == -1).count() == files
    return {
        "mode": mode, "wall": wall, "files_removed": len(c.remove),
        "files_added": len(c.add), "rows_rewritten": rewritten_rows,
        "added_mb": added_bytes / 1e6,
        "dv_rows": sum(e["n"] for e in c.dv or ()),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", str(files))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    for mode in ("copy_on_write", "merge_on_read"):
        r = run(spark, n, files, mode)
        print(
            f"{r['mode']:>14}: merge wall {r['wall']:.1f}s, "
            f"removed {r['files_removed']} files "
            f"(~{r['rows_rewritten']:,} rows rewritten), added "
            f"{r['files_added']} files ({r['added_mb']:.1f} MB), "
            f"dv-masked {r['dv_rows']:,} rows"
        )
    spark.stop()


if __name__ == "__main__":
    main()
