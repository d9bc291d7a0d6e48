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


def test_reference_lifecycle_at_bench_scale(spark, tmp_path_factory):
    """r7 verdict item 8: the reference's WHOLE lifecycle — work-unit
    planner → mock ingest → crawler refresh → the README.md:74-99
    queries verbatim (dialect-translated) → the RBAC split → identical
    SQL / different results — at bench scale: 3 ingestion dates ×
    4 endpoints × 250 pages = 3,000 gzip-JSON files (25× the toy
    fixture per day), wall-clocked (number recorded in PERF.md
    "reference lifecycle at scale")."""
    import time

    t0 = time.perf_counter()
    db = "ref_scale_db"
    lk = Lake(spark, str(tmp_path_factory.mktemp("ref_lake_scale")), db=db)
    today = (
        spark.sql("SELECT date_format(current_date, 'yyyy-MM-dd') d")
        .collect()[0]
        .d
    )
    days = ["2024-01-01", "2024-01-02", today]
    for d in days:
        lk.ingest_mock(d, pages=250)
    lk.refresh_catalog()
    lk.grant("pii")
    lk.grant(
        "core",
        row_filter="endpoint = 'api-a'",
        columns=[
            "endpoint", "date", "page", "fetched_at", "source",
            "ingestion_date",
        ],
    )

    # README.md:74-81 smoke, verbatim (translated)
    rows = spark.sql(
        translate(
            f"""
            SELECT source, ingestion_date, COUNT(*) AS files
            FROM {db}.raw
            GROUP BY 1, 2
            ORDER BY ingestion_date DESC, source
            """
        )
    ).collect()
    assert len(rows) == 12 and all(r.files == 250 for r in rows)

    # README.md:87-99 shape query: cardinality() + Presto date_format
    rows = spark.sql(
        translate(
            f"""
            SELECT source, ingestion_date, page,
                   cardinality(items) AS items_in_page,
                   endpoint, date, fetched_at
            FROM {db}.raw
            WHERE ingestion_date = date_format(current_date, '%Y-%m-%d')
            ORDER BY source, page
            LIMIT 20
            """
        )
    ).collect()
    assert len(rows) == 20 and all(r.items_in_page == 5 for r in rows)

    # RBAC: same SQL text, different principals, different results
    q = translate(
        f"SELECT endpoint, COUNT(*) as files FROM {db}.raw "
        "GROUP BY endpoint ORDER BY endpoint"
    )
    core = [(r.endpoint, r.files) for r in lk.sql("core", q).collect()]
    pii = [(r.endpoint, r.files) for r in lk.sql("pii", q).collect()]
    assert core == [("api-a", 750)]
    assert len(pii) == 4 and sum(f for _, f in pii) == 3000
    wall = time.perf_counter() - t0
    print(f"reference lifecycle at bench scale: {wall:.1f}s")
    assert wall < 600  # regression tripwire, generous for CI contention
