"""One bisect pass: time registry queries on the CURRENT tree with a
named change toggled back to its r11 behavior (env TOGGLE=...).
Prints one JSON line {query: seconds}.

Toggles:
  none      — head as-is
  list      — restore parallelPartitionDiscovery.threshold=32
  dv        — disable the driver DV-encode fast path
  size      — restore r11 _size_output (substring check, whole plan)
  ranges    — restore separate ranges + uniqueness jobs
  all       — every toggle at once (≈ r11 behavior for these paths)
"""
from __future__ import annotations

import json
import os
import sys
import time

toggles = set(os.environ.get("TOGGLE", "none").split(","))
if "all" in toggles:
    toggles = {"list", "dv", "size", "ranges"}

if "list" in toggles:
    os.environ["SPARK_GRAFT_LIST_THRESHOLD"] = "32"

from data_lake_demo_spark.session import get_spark  # noqa: E402
from data_lake_demo_spark import tableformat as tf  # noqa: E402

if "dv" in toggles:
    tf.AcidTable._DV_ENCODE_DRIVER_MAX_ROWS = -1

if "size" in toggles:
    def _size_output_r11(self, df):
        try:
            if "Repartition" in df._jdf.queryExecution().analyzed().toString():
                return df
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return df
        if est <= 0:
            return df
        n = max(1, -(-est // self._TARGET_FILE_BYTES))
        return df.coalesce(n) if n < (1 << 20) else df

    tf.AcidTable._size_output = _size_output_r11

if "ranges" in toggles:
    def _ranges_split(self, updates, keys, what):
        from data_lake_demo_spark.operators.upsert import _assert_unique_keys

        _assert_unique_keys(updates, keys, what)
        row = self._batch_key_ranges(updates, keys)
        d = row.asDict()
        d["__max_cnt"] = 1
        from pyspark.sql import Row

        return Row(**d)

    tf.AcidTable._batch_key_ranges_checked = _ranges_split

import __spark_entry__ as entrymod  # noqa: E402

spark = get_spark("bisect_child")
queries = entrymod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
warm = spark.range(1000).withColumnRenamed("id", "k")
warm.join(warm, "k").groupBy((warm.k % 10)).count().write.format(
    "noop"
).mode("overwrite").save()

out: dict[str, float] = {}
for name in sys.argv[1].split(","):
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out[name] = round(time.perf_counter() - t0, 3)
spark.stop()
print(json.dumps(out))
