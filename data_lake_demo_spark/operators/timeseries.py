"""Time-series gap filling: dense per-key bucket grids with LOCF and
linear interpolation over missing buckets.

The TimescaleDB ``time_bucket_gapfill`` / ``locf()`` / ``interpolate()``
family re-expressed relationally. The caller brings an already
bucketed frame (one row per key x bucket that HAS data); ``gap_fill``
emits every missing bucket BETWEEN consecutive observed rows by
exploding a JVM-side ``sequence(bucket, next_bucket - step)`` on each
observed row — the observed row *is* the carry-forward source, so
LOCF needs no second window and the interpolation endpoints (this
row, ``lead`` row) ride along for free.

Scale notes (100 TB): ONE scan of the bucketed input (no self-join,
no span-table rescan — an earlier formulation derived per-key spans
with a groupBy + join, which re-computed the upstream aggregation
twice), one window (the ``lead``), one explode producing only
(key, bucket)-sized rows. Shuffle = the single window sort per key;
skew equals key skew, already collapsed to one row per (key, bucket).
Fan-out is bounded by wall-clock span / step, fixed by the schema,
not data volume.
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
    - ``locf_<value>`` — last observed value carried forward;
    - ``interp_<value>`` — linear interpolation between the previous
      and next observed values on the bucket-epoch axis (equals the
      observed value on non-gap rows; gaps always lie strictly between
      two observations, so both endpoints exist).
    """
    w = W.partitionBy(*keys).orderBy(bucket)
    payload = [c for c in buckets.columns if c not in (*keys, bucket)]
    nxt_b = F.lead(bucket).over(w)
    nxt_v = F.lead(value).over(w)
    run = buckets.select(
        *keys,
        *payload,
        F.col(bucket).alias("__obs"),
        nxt_b.alias("__nxt_b"),
        nxt_v.alias("__nxt_v"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.col("__obs"),
                F.coalesce(
                    F.col("__nxt_b") - F.expr(f"interval {step}"),
                    F.col("__obs"),
                ),
                F.expr(f"interval {step}"),
            )
        ).alias(bucket),
    )
    gap = F.col(bucket) != F.col("__obs")
    x, px, nx = (
        F.unix_timestamp(F.col(bucket)),
        F.unix_timestamp(F.col("__obs")),
        F.unix_timestamp(F.col("__nxt_b")),
    )
    pv, nv = F.col(value), F.col("__nxt_v")
    interp = F.when(~gap, pv).otherwise(pv + (nv - pv) * (x - px) / (nx - px))
    return run.select(
        *keys,
        bucket,
        # original payload columns are null on generated rows
        *[F.when(~gap, F.col(c)).alias(c) for c in payload],
        gap.alias("is_gap"),
        pv.alias(f"locf_{value}"),
        interp.alias(f"interp_{value}"),
    )
