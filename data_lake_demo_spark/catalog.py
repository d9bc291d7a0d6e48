"""Catalog layer: databases, external partitioned tables, schema
inference and partition registration (SURVEY D1-D6, re-homing the
Glue crawler + Athena DDL surface into the Spark metastore).

``MSCK REPAIR TABLE`` / ``SHOW TABLES`` / ``SHOW PARTITIONS`` are
Spark SQL built-ins and run verbatim (reference README.md:46,62,68).
The crawler's inference loop (stack.py:180-193) becomes
``infer_and_register``: read a sample with schema inference, diff
against the registered schema, update per the UPDATE_IN_DATABASE
policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def ensure_database(spark: SparkSession, db: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def register_json_table(
    spark: SparkSession,
    db: str,
    table: str,
    path: str,
    schema: T.StructType,
    partition_cols: list[str],
) -> None:
    """External partitioned JSON table over a lake path + partition
    discovery. Columns in ``schema`` exclude partition columns."""
    ensure_database(spark, db)
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    parts = ", ".join(f"`{c}` STRING" for c in partition_cols)
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")
    spark.sql(
        f"""
        CREATE TABLE {db}.{table} ({cols})
        USING json
        PARTITIONED BY ({parts})
        LOCATION '{path}'
        """
    )
    repair_table(spark, db, table)


def register_parquet_table(
    spark: SparkSession, db: str, table: str, path: str, partition_cols: list[str]
) -> None:
    """External partitioned parquet table (curated zone, SURVEY S10)."""
    ensure_database(spark, db)
    df = spark.read.parquet(path)
    data_cols = [f for f in df.schema.fields if f.name not in partition_cols]
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in data_cols)
    parts = ", ".join(f"`{c}` STRING" for c in partition_cols)
    spark.sql(f"DROP TABLE IF EXISTS {db}.{table}")
    spark.sql(
        f"""
        CREATE TABLE {db}.{table} ({cols})
        USING parquet
        PARTITIONED BY ({parts})
        LOCATION '{path}'
        """
    )
    repair_table(spark, db, table)


def repair_table(spark: SparkSession, db: str, table: str) -> None:
    """Partition registration — the reference's manual fallback
    (README.md:62), built into Spark verbatim."""
    spark.sql(f"MSCK REPAIR TABLE {db}.{table}")


def show_tables(spark: SparkSession, db: str) -> DataFrame:
    return spark.sql(f"SHOW TABLES IN {db}")


def show_partitions(spark: SparkSession, db: str, table: str) -> DataFrame:
    return spark.sql(f"SHOW PARTITIONS {db}.{table}")


def infer_schema(spark: SparkSession, path: str) -> T.StructType:
    """Crawler-style schema inference over a raw zone path."""
    return spark.read.option("compression", "gzip").json(path).schema


def infer_and_register(
    spark: SparkSession,
    db: str,
    table: str,
    path: str,
    partition_cols: list[str],
) -> T.StructType:
    """The crawler loop: infer, then create/refresh the table under an
    UPDATE_IN_DATABASE-style policy (new columns adopted; existing
    column types pinned by the inferred schema)."""
    inferred = infer_schema(spark, path)
    data_fields = [f for f in inferred.fields if f.name not in partition_cols]
    register_json_table(
        spark, db, table, path, T.StructType(data_fields), partition_cols
    )
    return inferred


def register_acid_table(
    spark: SparkSession,
    table: str,
    path: str,
    *,
    as_of: int | None = None,
) -> DataFrame:
    """Expose an AcidTable snapshot through the SQL catalog as a
    session view, so SHOW TABLES / plain SELECT / the RBAC layer's
    deny-by-default table extraction all see the transactional zone
    like any other relation. A VIEW over ``snapshot()`` (not an
    external table over the data dir) is deliberate: the commit log —
    not the directory listing — defines table membership, and a
    catalog pointed at the directory would read both
    staged-but-uncommitted and logically-removed files. ``as_of``
    pins a time-travel version. Re-register after new commits to
    advance (in-flight readers of the old view keep their pinned file
    set — snapshot isolation). Session-scoped because Spark's
    built-in catalog can't persist a view over a runtime-resolved
    file list; a durable mapping needs a catalog plugin, which is how
    Delta/Iceberg solve the same problem."""
    from data_lake_demo_spark.tableformat import AcidTable

    snap = AcidTable(spark, path).snapshot(as_of)
    snap.createOrReplaceTempView(table)
    return snap
