"""r12 item 6 evidence: sf1 wide-commit CDF read (updateAsImages,
auto changeDiffBuckets) with rid-RANGE decomposition vs the r11
crc32 hash buckets, interleaved in one process on the SAME table —
the hash variant is forced by patching _rid_range_bounds to None
(plan-time fallback), so both variants run the same vectorized
kernel and differ ONLY in partition scoping (row-group skipping vs
m× re-read). Also asserts the two variants' rows are identical.

Usage: python tools/probe_rid_range_cdf.py [rounds]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_demo_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
spark = get_spark("probe_rid_range")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark-graft-testdata/sf1")

from data_lake_demo_spark.tableformat import AcidTable  # noqa: E402
from data_lake_demo_spark.streaming import acid_source as asrc  # noqa: E402

asrc.register(spark)

orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
print("orders rows:", orders.count(), file=sys.stderr)
root = tempfile.mkdtemp(prefix="probe_ridrange_")
t = AcidTable(spark, root + "/t")
t.set_row_tracking()
t.append(
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("status"),
    )
)
v0 = t.latest_version()
t.merge(
    orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") + (F.col("o_orderkey") % 5).cast("double")).alias(
            "total"
        ),
        F.col("o_orderstatus").alias("status"),
    ),
    ["k"],
)

parts = asrc._cdf_partitions(
    t, v0 + 1, t.latest_version() + 1, buckets=0, rid_mode=True
)
print(
    "auto partitions:",
    len(parts),
    "rid_ranges:",
    [p.rid_range for p in parts],
    file=sys.stderr,
)
assert any(p.rid_range is not None for p in parts), "rid ranges did not plan"


def read_df():
    return (
        spark.read.format("acidtable")
        .option("path", root + "/t")
        .option("readChangeFeed", "true")
        .option("updateAsImages", "true")
        .option("startingVersion", v0 + 1)
        .load()
    )


def timed():
    t0 = time.perf_counter()
    read_df().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


orig = asrc._rid_range_bounds
agg_rng = read_df().groupBy("_change_type").agg(
    F.count("*"), F.sum("total")
).collect()
asrc._rid_range_bounds = lambda *a: None
agg_hash = read_df().groupBy("_change_type").agg(
    F.count("*"), F.sum("total")
).collect()
asrc._rid_range_bounds = orig
assert sorted(map(tuple, agg_rng)) == sorted(map(tuple, agg_hash)), (
    agg_rng,
    agg_hash,
)
print("outputs identical across decompositions", file=sys.stderr)

res = {"range": [], "hash": []}
for r in range(rounds):
    order = [("range", orig), ("hash", lambda *a: None)]
    if r % 2:
        order.reverse()
    for tag, fn in order:
        asrc._rid_range_bounds = fn
        w = timed()
        res[tag].append(round(w, 3))
        print(f"# round {r} {tag}: {w:.3f}s", file=sys.stderr)
asrc._rid_range_bounds = orig
import json
import statistics

print(
    json.dumps(
        {
            k: {"median": statistics.median(v), "runs": v}
            for k, v in res.items()
        }
    )
)
spark.stop()
