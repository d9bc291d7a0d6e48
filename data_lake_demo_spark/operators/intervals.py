"""Interval overlap joins via grid bucketization.

The naive equi-key interval overlap join is a non-equi self-join —
O(n² per key) pairs examined, the classic scale killer for temporal /
genomic / session-overlap workloads. The grid form explodes each
interval onto the day-grid cells it covers, meets candidates in a
plain (key, cell) EQUI-join (hash/SMJ, shuffle-local, AQE-skew-
splittable), and keeps each overlapping pair exactly once by electing
the single cell that contains the LATER of the two starts. Cost:
fan-out of span/bucket_days small rows per interval plus a standard
equi-join — pick ``bucket_days`` near the typical interval length so
the fan-out is ~1-2 cells per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _day_bucket(col: Column, bucket_days: int) -> Column:
    # all-positive post-1970 dates: floor == div
    return F.floor(
        F.datediff(col, F.lit("1970-01-01").cast("date"))
        / F.lit(float(bucket_days))
    ).cast("long")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_interval: tuple[str, str],
    right_interval: tuple[str, str],
    *,
    bucket_days: int = 30,
) -> DataFrame:
    """All (left, right) row pairs sharing ``keys`` whose DATE
    intervals ``[start, end]`` (inclusive, end >= start) overlap.
    Interval column names must be disjoint between the two frames
    (suffix them caller-side). Each qualifying pair is emitted exactly
    once — in the grid cell containing ``greatest(left.start,
    right.start)``.
    """
    sl, el = left_interval
    sr, er = right_interval
    lx = left.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                _day_bucket(F.col(sl), bucket_days),
                _day_bucket(F.col(el), bucket_days),
            )
        ),
    )
    rx = right.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                _day_bucket(F.col(sr), bucket_days),
                _day_bucket(F.col(er), bucket_days),
            )
        ),
    )
    later_start = F.greatest(F.col(sl), F.col(sr))
    return (
        lx.join(rx, [*keys, "__cell"])
        .filter(
            (F.col(sl) <= F.col(er))
            & (F.col(sr) <= F.col(el))
            & (F.col("__cell") == _day_bucket(later_start, bucket_days))
        )
        .drop("__cell")
    )
