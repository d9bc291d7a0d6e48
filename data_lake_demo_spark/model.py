"""Canonical schemas for the engine.

The raw page-record schema mirrors the reference's mock payload
(reference: option_a_cdk_py/lambda/worker.py:93-99; Glue-inferred
column list rbac-demo/README.md:98) so the reference's own smoke /
RBAC queries run unchanged against our lake.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One JSON object per file/row: the page record produced by a fetch.
RAW_ITEM = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)

RAW_RECORD = T.StructType(
    [
        T.StructField("endpoint", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("page", T.LongType()),
        T.StructField("fetched_at", T.StringType()),
        T.StructField("items", T.ArrayType(RAW_ITEM)),
    ]
)

# Partition columns injected by the lake layout
# raw/source=<endpoint>/ingestion_date=<YYYY-MM-DD>/  (worker.py:27-28)
RAW_PARTITIONS = ["source", "ingestion_date"]

RAW_TABLE = T.StructType(
    list(RAW_RECORD.fields)
    + [
        T.StructField("source", T.StringType()),
        T.StructField("ingestion_date", T.StringType()),
    ]
)

# Work-unit message (planner → worker), planner.py:45-49.
WORK_UNIT = T.StructType(
    [
        T.StructField("endpoint", T.StringType()),
        T.StructField("ingestion_date", T.StringType()),
        T.StructField("page", T.LongType()),
    ]
)

# events.props JSON payload ({"k": <int>} in the driver fixtures).
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

# Driver synthetic tables (FIXTURES.md §B) — names only; parquet
# footers carry the authoritative types.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
