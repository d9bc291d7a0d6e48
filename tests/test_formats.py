"""Source/sink format breadth: the engine round-trips every format
the image supports (parquet is everywhere else in the suite; here
CSV, ORC, JSON-lines, and partitioned writes of each).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_demo_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return load_table(spark, SF, "nation")


def test_csv_roundtrip(spark, tmp_path):
    n = _nation(spark)
    path = str(tmp_path / "nation_csv")
    n.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(n.schema).csv(path)
    assert back.count() == 25
    assert back.subtract(n).count() == 0 and n.subtract(back).count() == 0


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "li_orc")
    li.write.orc(path)
    back = spark.read.orc(path).filter(F.col("l_orderkey") < 100)
    plan = spark._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan  # ORC scans get pushdown too
    assert back.count() == li.filter(F.col("l_orderkey") < 100).count()


def test_partitioned_json_gzip_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("string")
    )
    path = str(tmp_path / "orders_json")
    orders.write.partitionBy("yr").option("compression", "gzip").json(path)
    back = spark.read.option("basePath", path).json(path)
    assert back.count() == orders.count()
    # partition-column filter prunes directories
    assert back.filter(F.col("yr") == "1996").count() == orders.filter(
        F.col("yr") == "1996"
    ).count()
