"""Deletion-vector scale probe: merge-on-read delete cost at
millions of masked rows, r10 codec (varint-RLE + sidecar spill +
executor-side encode/apply) vs the legacy representation (inline
base64 int64s, driver-side Row collect), emulated in-process.

What matters at 100 TB:
- commit JSON bytes per masked row (rides EVERY log resolution and
  checkpoint until a rewrite materializes the vector);
- delete wall time (legacy collects every matched (file, row) Row to
  the driver; r10 collects one compressed payload per file);
- masked snapshot read wall time (legacy builds the tombstone set on
  the driver; r10 decodes on executors above the broadcast
  threshold).

Usage::

    PYTHONPATH=. python tools/probe_dv_scale.py [n_rows]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import SparkSession

from data_lake_demo_spark.tableformat import AcidTable, _commit_name


def probe(spark, n: int) -> None:
    root = tempfile.mkdtemp(prefix="dv_probe_")
    t = AcidTable(spark, root + "/t")
    t.append(
        spark.range(n)
        .selectExpr("id AS k", "id % 2 AS r", "id * 7 AS v")
        .repartition(8)
    )

    t0 = time.perf_counter()
    t.delete([("r", "=", 1)], mode="merge_on_read")  # max fragmentation
    dt_delete = time.perf_counter() - t0
    commit_bytes = len(t.log.read(_commit_name(t.latest_version())))
    legacy_bytes = (n // 2) * 8 * 4 // 3  # base64 of 8B/row, ~est.

    t0 = time.perf_counter()
    assert t.snapshot().count() == n // 2
    dt_read = time.perf_counter() - t0

    # force the executor-side apply path regardless of size
    saved = AcidTable._DV_BROADCAST_MAX_ROWS
    AcidTable._DV_BROADCAST_MAX_ROWS = 0
    try:
        t0 = time.perf_counter()
        assert t.snapshot().count() == n // 2
        dt_read_exec = time.perf_counter() - t0
    finally:
        AcidTable._DV_BROADCAST_MAX_ROWS = saved

    print(
        f"n={n:,} masked={n // 2:,}: delete {dt_delete:.2f}s, "
        f"commit {commit_bytes:,} B (legacy inline would be "
        f"~{legacy_bytes:,} B, {legacy_bytes / max(commit_bytes, 1):.0f}x), "
        f"masked read {dt_read:.2f}s (driver-broadcast) / "
        f"{dt_read_exec:.2f}s (executor-decode)"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    for size in (1_000_000, n):
        probe(spark, size)
    spark.stop()


if __name__ == "__main__":
    main()
