"""The reference's OWN query strings, run verbatim (modulo the
dialect translator) against our lake — the strongest parity check:
a user of the reference can paste their Athena queries unchanged.

Sources of the SQL text:
- smoke query: reference README.md:74-81
- shape query with cardinality() + Presto date_format partition
  filter: README.md:87-99
- RBAC demo queries: rbac-demo/comprehensive_rbac_demo.py:116,128,140
"""

from __future__ import annotations

import pytest

from data_lake_demo_spark.functions.dialect import translate
from data_lake_demo_spark.lake import Lake

DB = "ref_q_db"


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lk = Lake(spark, str(tmp_path_factory.mktemp("ref_lake")), db=DB)
    # ingest "today" so the reference's current_date partition filter matches
    today = spark.sql("SELECT date_format(current_date, 'yyyy-MM-dd') d").collect()[0].d
    lk.ingest_mock(today)
    lk.refresh_catalog()
    lk.grant("pii")
    lk.grant(
        "core",
        row_filter="endpoint = 'api-a'",
        columns=["endpoint", "date", "page", "fetched_at", "source", "ingestion_date"],
    )
    return lk


def test_reference_smoke_query(lake):
    # README.md:74-81 (table name re-pointed at our catalog)
    sql = translate(
        f"""
        SELECT source, ingestion_date, COUNT(*) AS files
        FROM {DB}.raw
        GROUP BY 1, 2
        ORDER BY ingestion_date DESC, source
        """
    )
    rows = lake.spark.sql(sql).collect()
    assert len(rows) == 4 and all(r.files == 10 for r in rows)


def test_reference_shape_query_with_presto_datefmt(lake):
    # README.md:87-99: cardinality() + date_format('%Y-%m-%d') filter
    sql = translate(
        f"""
        SELECT source, ingestion_date, page,
               cardinality(items) AS items_in_page,
               endpoint, date, fetched_at
        FROM {DB}.raw
        WHERE ingestion_date = date_format(current_date, '%Y-%m-%d')
        ORDER BY source, page
        LIMIT 20
        """
    )
    rows = lake.spark.sql(sql).collect()
    assert len(rows) == 20
    assert all(r.items_in_page == 5 for r in rows)
    assert rows[0].source == "api-a" and rows[0].page == 1


def test_reference_rbac_query_identical_text(lake):
    # comprehensive_rbac_demo.py:116: same text, both principals
    q = translate(
        f'SELECT endpoint, COUNT(*) as files FROM {DB}.raw '
        "GROUP BY endpoint ORDER BY endpoint"
    )
    core = [(r.endpoint, r.files) for r in lake.sql("core", q).collect()]
    pii = [(r.endpoint, r.files) for r in lake.sql("pii", q).collect()]
    assert core == [("api-a", 10)]
    assert pii == [("api-a", 10), ("api-b", 10), ("api-c", 10), ("api-d", 10)]


def test_reference_total_count_query(lake):
    # comprehensive_rbac_demo.py:140
    q = translate(f"SELECT COUNT(*) as total_records FROM {DB}.raw")
    assert lake.sql("pii", q).collect()[0].total_records == 40
    assert lake.sql("core", q).collect()[0].total_records == 10


def test_bucketed_join_has_no_shuffle(lake, spark):
    """Scale evidence (SURVEY §4): bucketed tables co-locate the join —
    physical plan contains no Exchange on the join keys."""
    sf = "/root/testdata/sf0.001"
    from data_lake_demo_spark.sources.testdata import load_table

    spark.sql(f"DROP TABLE IF EXISTS {DB}.orders_b")
    spark.sql(f"DROP TABLE IF EXISTS {DB}.lineitem_b")
    load_table(spark, sf, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(f"{DB}.orders_b")
    load_table(spark, sf, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        f"{DB}.lineitem_b"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(f"{DB}.lineitem_b").join(
            spark.table(f"{DB}.orders_b"), "o_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
