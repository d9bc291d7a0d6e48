"""data_lake_demo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference data-lake demo (cmariscalaws/data-lake-demo): ingestion,
catalog, partitioned lake layout, governed SQL querying — plus the
LLM-data-pipeline operator set (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, dynamic partition overwrite)
- ``model``      canonical schemas (raw page record, events props, ...)
- ``catalog``    database/table registration, schema inference, MSCK
- ``rbac``       row/column governance via secured views
- ``sources``    mock + HTTP paged sources, planner, lake writer, testdata
- ``plans``      the query library (relational / events / llm / reference)
- ``operators``  dedup, similarity, text analysis, as-of join, multimodal
- ``functions``  dialect translation + vector math helpers
- ``streaming``  Structured Streaming ingestion and windowed aggregations
"""

from data_lake_demo_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
