"""Int8 embedding quantization — the storage/bandwidth step of a
large-scale similarity pipeline (4x smaller than float32, 8x than
double; ANN candidate generation runs fine on int8, exact re-score on
the float originals).

Scale shape: pure per-row map — no shuffle, no driver state, trivially
parallel at any corpus size. All arithmetic is double-promoted and
expressed with JVM higher-order functions (no Python UDFs), and the
per-vector scale is materialized as a real column BEFORE any lambda
references it (interpreted HOF eval re-evaluates captured
*expressions* per element; a captured *column reference* is free —
see PERF.md 'HOF lambda re-evaluation').

Rounding is ``floor(x/scale + 0.5)`` rather than ``round()`` so the
Spark plan and any SQL oracle (DuckDB) agree bit-for-bit on ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_lake_demo_spark.functions.vector import to_double_array

Q_MAX = 127  # symmetric int8 range [-127, 127]; -128 unused


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q",
    scale_col: str = "q_scale",
    keep_vec: bool = True,
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` as ``tinyint``. An all-zero
    vector quantizes to zeros with scale 0. By construction
    ``|q_i| <= 127`` (the max-magnitude element maps to exactly
    +/-127), so the tinyint cast can never overflow.

    Dequantization is ``q_i * scale``; the reconstruction error is
    bounded by ``scale/2 = max|x|/254`` per element.
    """
    v = F.col("__qz_v")
    out = (
        df.withColumn("__qz_v", to_double_array(F.col(vec_col)))
        .withColumn(
            scale_col,
            F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(float(Q_MAX)),
        )
        .withColumn(
            q_col,
            F.when(
                F.col(scale_col) > 0,
                F.transform(
                    v,
                    lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast(
                        "tinyint"
                    ),
                ),
            ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint"))),
        )
    )
    return out.drop("__qz_v") if not keep_vec else out.withColumnRenamed(
        "__qz_v", "_vec_double"
    )


def dequantize(q: F.Column, scale: F.Column) -> F.Column:
    """Reconstruct doubles from an int8 vector and its scale."""
    return F.transform(q, lambda e: e.cast("double") * scale)


def reconstruction_error(df: DataFrame, q_col: str = "q", scale_col: str = "q_scale"):
    """Per-row max-abs reconstruction error (double). Expects the
    ``_vec_double`` column kept by ``quantize_int8(keep_vec=True)``."""
    dq = dequantize(F.col(q_col), F.col(scale_col))
    return F.array_max(
        F.zip_with(F.col("_vec_double"), dq, lambda x, y: F.abs(x - y))
    )
