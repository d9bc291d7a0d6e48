from data_lake_demo_spark.sources.testdata import load_table, register_views

__all__ = ["load_table", "register_views"]
