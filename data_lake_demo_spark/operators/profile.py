"""Table profiling: one pass over a table → long-format column stats.

The lake-operations op every catalog needs (the reference relies on
Glue crawler stats; here profiling is explicit and queryable): for
each requested column, row count, null count, approximate distinct
count, and for numeric columns min/max — emitted long-format
``(column, metric, value)`` so the output schema is stable regardless
of the profiled table.

Scale shape: ONE aggregation job computes every metric for every
column simultaneously (a single partial+final HashAggregate pass over
the scan — no per-column jobs, no shuffles beyond the single global
aggregate); the wide one-row result is exploded to long format
driver-free with ``stack``-style unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) → rows of
    ``(column string, metric string, value double)``.

    Metrics: ``n_rows`` (same for every column), ``n_nulls``,
    ``distinct`` (HLL++ approximation by default; ``exact_distinct``
    switches to exact count-distinct — cross-engine-checkable but adds
    an Expand pass), and ``min``/``max`` for numeric columns. Values
    are doubles (counts are exact integers ≤ 2^53).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = list(columns or fields)
    aggs = [F.count(F.lit(1)).cast("double").alias("__n")]
    per_col: dict[str, list[str]] = {}
    for c in columns:
        safe = c.replace(".", "_")
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"__nulls_{safe}")
        )
        dist = (
            F.countDistinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(dist.cast("double").alias(f"__dist_{safe}"))
        per_col[c] = ["n_nulls", "distinct"]
        if isinstance(fields.get(c), _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{safe}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{safe}"))
            per_col[c] += ["min", "max"]
    wide = df.agg(*aggs)
    # unpivot the single wide row to long format — pure projection
    stack_items: list[str] = []
    metric_src = {
        "n_nulls": "__nulls_",
        "distinct": "__dist_",
        "min": "__min_",
        "max": "__max_",
    }
    for c in columns:
        safe = c.replace(".", "_")
        stack_items.append(f"'{c}', 'n_rows', __n")
        for mname in per_col[c]:
            stack_items.append(f"'{c}', '{mname}', {metric_src[mname]}{safe}")
    n = len(stack_items)
    return wide.selectExpr(
        f"stack({n}, {', '.join(stack_items)}) AS (column, metric, value)"
    )
