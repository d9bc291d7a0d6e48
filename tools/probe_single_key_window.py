"""Skew-window probe (r7 verdict item 7): CUSUM / LTTB / gap-fill all
window ``PARTITION BY key ORDER BY bucket`` — a single key funnels its
whole series through ONE window partition. This probe measures that
worst case directly: ONE key, 10M (and 1M for the slope) pre-bucketed
rows, wall-clocked per operator. Linear-ish growth 1M→10M means the
partition sort dominates and there is no cliff; a superlinear jump
would argue for the segmented prefix-scan fallback the docstrings
name.

Usage::

    python tools/probe_single_key_window.py [n_rows ...]
    # default: 1000000 10000000
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from data_lake_demo_spark.operators.timeseries import (
    cusum_alarms,
    gap_fill,
    lttb_downsample,
)
from data_lake_demo_spark.session import get_spark


def probe(spark, n: int) -> None:
    # one key, n buckets, integer values with a mid-series mean shift
    # (so CUSUM actually alarms) — all generated JVM-side
    df = (
        spark.range(n)
        .select(
            F.lit("k1").alias("key"),
            F.col("id").alias("bucket"),
            (
                (F.col("id") % 97)
                + F.when(F.col("id") > n // 2, 40).otherwise(0)
            ).alias("x"),
        )
        .persist()
    )
    df.count()

    t0 = time.perf_counter()
    cusum_alarms(
        df.withColumn("__x_milli", (F.col("x") * 1000).cast("long")),
        ["key"],
        "x",
        "bucket",
        drift_milli=500,
        threshold_milli=1_000_000,
    ).write.format("noop").mode("overwrite").save()
    t_cusum = time.perf_counter() - t0

    t0 = time.perf_counter()
    lttb_downsample(
        df.withColumn(
            "ts", F.timestamp_seconds(F.col("bucket") * 60)
        ).select("key", "ts", "x"),
        ["key"],
        "ts",
        "x",
        n_out=1000,
        x_unit_seconds=60,
    ).write.format("noop").mode("overwrite").save()
    t_lttb = time.perf_counter() - t0

    # gap_fill on a DENSE minute series (no fan-out; the probe measures
    # the window, not sequence() explosion)
    t0 = time.perf_counter()
    gap_fill(
        df.withColumn(
            "bucket_ts", F.timestamp_seconds(F.col("bucket") * 60)
        ).select("key", F.col("bucket_ts").alias("bucket"), F.col("x")),
        ["key"],
        "bucket",
        "x",
        step="1 minute",
    ).write.format("noop").mode("overwrite").save()
    t_gap = time.perf_counter() - t0

    df.unpersist()
    print(
        f"n={n}: cusum={t_cusum:.1f}s lttb={t_lttb:.1f}s gap_fill={t_gap:.1f}s",
        flush=True,
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("probe-single-key-window")
    for n in sizes:
        probe(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
