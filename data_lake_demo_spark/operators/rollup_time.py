"""Hypertable-style time rollups (continuous aggregates).

The pattern: maintain a fine-grained rollup (e.g. hourly) of a huge
event stream, and answer coarser queries (daily/weekly) by
RE-aggregating the rollup instead of the raw data. Works because the
maintained aggregates are decomposable: count/sum compose by sum,
min/max by min/max. At 100 TB the daily query touches ~1/1000 of the
raw bytes.

Quantized sums (plans/relational.qsum) stay exact through the
composition, so a rollup-of-rollup equals the direct aggregate —
asserted by the oracle comparison (the oracle computes daily straight
from raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000


def time_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    interval: str = "1 hour",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained decomposable rollup: count + quantized-sum(+min/max)
    per (time bucket, group)."""
    group_cols = group_cols or []
    q = F.floor(F.col(value_col) * SCALE + F.lit(0.5))
    return (
        events.groupBy(F.window(ts_col, interval).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("value_q"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
        .select(F.col("w.start").alias("bucket_start"), *group_cols, "n", "value_q",
                "value_min", "value_max")
    )


def rollup_to(
    rollup: DataFrame,
    *,
    interval: str = "1 day",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Coarsen a rollup by re-aggregating its decomposable partials —
    never touches the raw events."""
    group_cols = group_cols or []
    return (
        rollup.groupBy(F.window("bucket_start", interval).alias("w"), *group_cols)
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_q").alias("value_q"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            *group_cols,
            "n",
            (F.col("value_q") / float(SCALE)).alias("total_value"),
            "value_min",
            "value_max",
        )
    )


def merge_rollup(
    stored: DataFrame,
    delta: DataFrame,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental continuous-aggregate maintenance: fold a new batch's
    rollup (same interval) into the stored rollup — union + one
    re-aggregation of the decomposable partials. The maintenance path
    never rescans history: at 100 TB the delta is one micro-batch's
    rollup, the merge shuffles only rollup rows, and late data simply
    re-merges into an already-present bucket (idempotent when the
    result is written with dynamic partition overwrite keyed on
    bucket_start). Exactness: counts/quantized sums compose by sum,
    min/max by min/max — merged == direct rollup over the union of the
    raw inputs (asserted by test_merge_rollup_equals_direct).
    """
    group_cols = group_cols or []
    keys = ["bucket_start", *group_cols]
    return (
        stored.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_q").alias("value_q"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
    )
