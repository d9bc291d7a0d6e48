"""Measure liquid clustering's incremental property directly: after an
initial clustering of N rows, appending 10% more and re-running
OPTIMIZE must cost ~O(new data), not O(table) — compared against the
non-incremental alternative (a full Z-order rewrite of the whole
table, which is what you'd pay per maintenance cycle without ZCube
stability). Run: python tools/probe_liquid_clustering.py [rows]
"""
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")
from data_lake_demo_spark.tableformat import AcidTable  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
root = tempfile.mkdtemp(prefix="liquid_probe_")
t = AcidTable(spark, root + "/t")
t.set_row_tracking()
chunk = ROWS // 8
for s in range(8):  # shuffled appends: every file spans the key space
    t.append(
        spark.range(chunk).select(
            ((F.col("id") * 7919 + s * 131) % ROWS).alias("k"),
            (F.col("id") % 97).cast("double").alias("x"),
            F.concat(F.lit("p"), F.col("id") % 13).alias("tag"),
        )
    )
t.set_clustering(["k"])

w0 = time.time()
t.optimize_cluster(n_files=32)
full = time.time() - w0
n_live = len(t._resolve(None)[0])

t.append(
    spark.range(ROWS // 10).select(
        ((F.col("id") * 104729) % ROWS).alias("k"),
        (F.col("id") % 97).cast("double").alias("x"),
        F.concat(F.lit("q"), F.col("id") % 13).alias("tag"),
    )
)
live0 = set(t._resolve(None)[0])
w1 = time.time()
t.optimize_cluster(n_files=4)
incr = time.time() - w1
live1 = set(t._resolve(None)[0])
carried = len(live0 & live1)

w2 = time.time()
t.optimize_zorder(["k"], n_files=32)  # the non-incremental alternative
zfull = time.time() - w2

hit, _, _ = t._pruned_live([("k", "=", 12345)], t.latest_version())
print(
    f"rows={ROWS} initial_cluster={full:.1f}s ({n_live} files) "
    f"incremental_10pct={incr:.1f}s (carried {carried} zcube files) "
    f"full_zorder_alternative={zfull:.1f}s "
    f"point_lookup_files={len(hit)}/{len(t._resolve(None)[0])}"
)
