"""Time-series gap filling: dense per-key bucket grids with LOCF and
linear interpolation over missing buckets.

The TimescaleDB ``time_bucket_gapfill`` / ``locf()`` / ``interpolate()``
family re-expressed relationally: the caller brings an already
bucketed frame (one row per key x bucket that HAS data); ``gap_fill``
derives each key's [min, max] bucket span, explodes the dense grid
JVM-side (``sequence`` + ``explode`` — no Python in the loop),
left-joins the observed rows back, and computes carry-forward /
interpolated values with two ordered windows per key.

Scale notes (100 TB): the grid is O(keys x span/step) *small* rows —
payload columns are never duplicated, only (key, bucket) pairs are
generated. The left join shuffles on (key, bucket), the same key both
sides already aggregated on. The two windows are a single sort per
key partition; skew equals key skew of the input, which bucketing has
already collapsed to one row per (key, bucket). Spans are bounded by
wall-clock time (10 years of hours = 87.6k rows/key), so the fan-out
is fixed by the schema, not the data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill(
    buckets: DataFrame,
    keys: list[str],
    bucket: str,
    value: str,
    step: str = "1 hour",
) -> DataFrame:
    """Densify ``buckets`` to one row per key per ``step`` between each
    key's first and last observed bucket.

    Returns the input columns (null on generated gap rows) plus:

    - ``is_gap`` — true on generated rows;
    - ``locf_<value>`` — last observed carried forward;
    - ``interp_<value>`` — linear interpolation between the previous
      and next observed values on the bucket-epoch axis (equals the
      observed value on non-gap rows; falls back to LOCF after the
      last observation, which by construction never happens because
      the span ends at an observed bucket).
    """
    spans = buckets.groupBy(*keys).agg(
        F.min(bucket).alias("__lo"), F.max(bucket).alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket),
    )
    filled = grid.join(buckets, [*keys, bucket], "left")

    v = F.col(value)
    back = (
        W.partitionBy(*keys)
        .orderBy(bucket)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(*keys)
        .orderBy(bucket)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    observed_at = F.when(v.isNotNull(), F.col(bucket))
    pv = F.last(v, ignorenulls=True).over(back)
    pt = F.last(observed_at, ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    nt = F.first(observed_at, ignorenulls=True).over(fwd)
    x, px, nx = (
        F.unix_timestamp(F.col(bucket)),
        F.unix_timestamp(pt),
        F.unix_timestamp(nt),
    )
    interp = (
        F.when(v.isNotNull(), v)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (x - px) / (nx - px))
    )
    return filled.select(
        "*",
        v.isNull().alias("is_gap"),
        pv.alias(f"locf_{value}"),
        interp.alias(f"interp_{value}"),
    )
