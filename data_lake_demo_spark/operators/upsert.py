"""MERGE-style upsert and SCD2 history without a table format.

The v1 image has no Delta/Iceberg jars, so MERGE INTO is emulated
with the classic anti-join + union rewrite (the same logical plan a
format's MERGE produces), committed via idempotent dynamic partition
overwrite. The reference's idempotent-write guard (worker.py:214-221)
is the degenerate case (insert-if-absent on the natural key).

At 100 TB: both operations shuffle once on the merge key; with the
target bucketed on the key the join side of the shuffle disappears.
Swap-in for Delta later: `target.alias("t").merge(updates, ...)`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """UPSERT (\"when matched update, when not matched insert\"):
    updated rows replace matched target rows; unmatched target rows
    pass through. Returns the merged DataFrame (caller writes it)."""
    keys = list(keys)
    untouched = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return untouched.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    effective_col: str = "effective_ts",
    current_col: str = "is_current",
    end_col: str = "end_ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    key appears in ``changes`` (set end_ts + is_current=false) and
    append the new versions as current.

    ``changes`` must carry the key, the new attribute columns, and
    ``effective_ts``.
    """
    changed_keys = changes.select(key).distinct()
    closing = (
        dim.filter(F.col(current_col))
        .join(
            F.broadcast(
                changes.select(key, F.col(effective_col).alias("__new_eff"))
            ),
            key,
        )
        .withColumn(end_col, F.col("__new_eff"))
        .drop("__new_eff")
        .withColumn(current_col, F.lit(False))
    )
    untouched_current = dim.filter(F.col(current_col)).join(
        changed_keys, key, "left_anti"
    )
    history = dim.filter(~F.col(current_col))
    new_rows = changes.withColumn(current_col, F.lit(True)).withColumn(
        end_col, F.lit(None).cast(dim.schema[end_col].dataType)
    )
    return history.unionByName(closing).unionByName(untouched_current).unionByName(
        new_rows, allowMissingColumns=False
    )
