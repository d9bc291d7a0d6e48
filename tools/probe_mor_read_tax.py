"""Read-tax probe: sustained merge-on-read CDC with and without the
deletion-vector DEBT policy (``optimize.maxDeletedRowsRatio``).

The r10 write-amplification probe (probe_merge_mor.py) showed MOR
rewrites ~0 bytes per CDC batch; the flip side is the accumulating
read tax — every snapshot pays the tombstone anti-join until a
rewrite materializes the vectors. This probe measures that tax over N
batches (each updating a scattered ``1/stride`` slice of the table)
three ways:

* ``baseline``  — the zero-DV snapshot read wall before any batch;
* ``policy off``— vectors accumulate monotonically (the r10 state);
* ``policy on`` — the debt policy rewrites any file whose vector
  crosses the ratio, so accumulated DV rows (and the read wall) stay
  BOUNDED regardless of how many batches land.

Usage::

    PYTHONPATH=. python tools/probe_mor_read_tax.py [n_rows] [n_files] [batches]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import SparkSession

from data_lake_demo_spark.tableformat import AcidTable


def read_wall(t, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        t.snapshot().selectExpr("sum(v)").collect()
        best = min(best, time.perf_counter() - t0)
    return best


def run(spark, n: int, files: int, batches: int, ratio: float | None):
    root = tempfile.mkdtemp(prefix=f"mor_tax_{'on' if ratio else 'off'}_")
    t = AcidTable(spark, root + "/t")
    t.append(
        spark.range(n).selectExpr("id AS k", "id * 7 AS v"),
        partition_by=["k"],
    )
    if ratio is not None:
        t.set_properties({"optimize.maxDeletedRowsRatio": str(ratio)})
    base_wall = read_wall(t)
    stride = 50  # each batch touches 2% of rows, scattered over files
    out = []
    purges = 0
    for i in range(batches):
        batch = spark.range(n // stride).selectExpr(
            f"id * {stride} + {i % stride} AS k", f"-{i + 1} AS v"
        )
        t0 = time.perf_counter()
        t.merge(batch, ["k"], mode="merge_on_read")
        merge_wall = time.perf_counter() - t0
        if t._read_commit(t.latest_version()).op == "purge":
            purges += 1
        _, _, _, _, dvs = t._resolve_state(None)
        from data_lake_demo_spark.tableformat import _dv_count

        dv_rows = sum(_dv_count(v) for v in dvs.values())
        out.append(
            {
                "batch": i + 1,
                "merge_wall": merge_wall,
                "read_wall": read_wall(t),
                "dv_rows": dv_rows,
            }
        )
    return base_wall, out, purges


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", str(files))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    for label, ratio in (("policy off", None), ("policy on", 0.05)):
        base, rows, purges = run(spark, n, files, batches, ratio)
        print(f"== {label} (baseline zero-DV read {base:.2f}s, "
              f"{purges} auto-purge commits)")
        for r in rows:
            print(
                f"  batch {r['batch']:>2}: merge {r['merge_wall']:.2f}s, "
                f"snapshot read {r['read_wall']:.2f}s "
                f"({r['read_wall'] / base:.2f}x baseline), "
                f"accumulated dv rows {r['dv_rows']:,}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
