"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries`` / ``oracle_sql`` expose the full operator inventory from
SURVEY.md §2 (relational + events/streaming-batch + LLM ops), each
checked against the DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_lake_demo_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from data_lake_demo_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops whose
    hash families / FP accumulation are engine-specific — the driver
    records the weaker rows-only check for those)."""
    from data_lake_demo_spark.plans import all_oracle_sql

    return all_oracle_sql()
