"""Loaders for the driver's synthetic parquet tables.

Plain ``spark.read.parquet`` — Catalyst gets full pushdown/pruning;
no schema inference cost (parquet footers carry types).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_demo_spark.model import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Columnar scan; filters/projections
    placed on top of this are pushed into the parquet reader.

    ``events.ts`` has historically shipped as ns-precision (read as
    LongType under ``spark.sql.legacy.parquet.nanosAsLong``) and now
    ships as tz-less µs, which Spark 4.x infers as TIMESTAMP_NTZ —
    a type ``withWatermark`` and numeric casts reject. Normalize both
    shapes to µs TimestampType here so every downstream plan sees one
    event-time type regardless of the session's read configs (the
    driver hands us a plain session without ours).
    """
    if name == "events":
        # the driver may hand us a session without this conf; it is
        # runtime-settable and required to read ns-precision parquet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, NOT `/`: ns-since-epoch (~1.7e18) exceeds the
        # double-exact range, so float division would be off by ±1µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name == "events" and isinstance(
        df.schema["ts"].dataType, T.TimestampNTZType
    ):
        # instant-preserving under a UTC session; wall-clock-preserving
        # otherwise — either way it matches the DuckDB oracle, which
        # reads the same naive values
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for the SQL API)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
