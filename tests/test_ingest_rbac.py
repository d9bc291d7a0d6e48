"""Reference-faithful E2E: ingestion goldens + catalog + RBAC suite.

Golden numbers come from the reference (via BASELINE.md):
- 4 endpoints × 10 pages/day → 40 files/rows per day (planner.py:44,
  stack.py:62; smoke query README.md:71-83)
- 5 items per page (worker.py:98; shape query README.md:87-106)
- RBAC world = 2 days = 80 records; Core (endpoint='api-a') sees 20,
  PII sees 80; Core selecting `items` FAILS
  (rbac-demo/README.md:29,88,126-137; comprehensive_rbac_demo.py)
- re-running ingestion must not duplicate (worker.py:214-221 →
  dynamic partition overwrite)
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

from data_lake_demo_spark.lake import Lake

D1, D2 = "2024-06-01", "2024-06-02"


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lk = Lake(spark, str(tmp_path_factory.mktemp("lake")), db="t_lake_db")
    lk.ingest_mock(D1)
    lk.ingest_mock(D2)
    lk.refresh_catalog()
    lk.grant(
        "core",
        row_filter="endpoint = 'api-a'",
        columns=["endpoint", "date", "page", "fetched_at", "source", "ingestion_date"],
    )
    lk.grant("pii")  # all rows, all columns
    return lk


def test_smoke_grouped_counts(lake):
    # README.md:74-83: one row per (source, day), ~10 files each
    got = (
        lake.table("raw")
        .groupBy("source", "ingestion_date")
        .agg(F.count(F.lit(1)).alias("files"))
        .orderBy(F.col("ingestion_date").desc(), "source")
        .collect()
    )
    assert len(got) == 8  # 4 endpoints × 2 days
    assert all(r.files == 10 for r in got)
    assert [r.source for r in got[:4]] == ["api-a", "api-b", "api-c", "api-d"]
    assert got[0].ingestion_date == D2  # DESC date ordering


def test_shape_five_items_per_page(lake):
    # README.md:87-106 + worker.py:98: cardinality(items) == 5
    rows = (
        lake.table("raw")
        .select("source", "page", F.size("items").alias("items_in_page"))
        .collect()
    )
    assert len(rows) == 80
    assert all(r.items_in_page == 5 for r in rows)


def test_item_payload_deterministic(lake):
    # worker.py:98: id = f"{endpoint}-{date}-{page}-{i}", value = i
    r = (
        lake.table("raw")
        .filter((F.col("source") == "api-b") & (F.col("page") == 3))
        .filter(F.col("ingestion_date") == D1)
        .select(F.explode("items").alias("it"))
        .select("it.id", "it.value")
        .orderBy("value")
        .collect()
    )
    assert [x.value for x in r] == [0, 1, 2, 3, 4]
    assert r[2].id == f"api-b-{D1}-3-2"


def test_idempotent_rerun(lake):
    # double-run the same day: partition overwritten, no duplicates
    before = lake.table("raw").count()
    lake.ingest_mock(D1)
    lake.refresh_catalog()
    assert lake.table("raw").count() == before


def test_partition_pruning_plan(lake):
    # P2: equality predicate on a partition column prunes the scan
    df = lake.table("raw").filter(F.col("ingestion_date") == D1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 40
    assert "PartitionFilters" in plan


def test_catalog_ddl(lake):
    tables = {r.tableName for r in lake.spark.sql("SHOW TABLES IN t_lake_db").collect()}
    assert "raw" in tables
    parts = lake.spark.sql("SHOW PARTITIONS t_lake_db.raw").collect()
    assert len(parts) == 8


def test_rbac_row_security(lake):
    # T1+T3 (comprehensive_rbac_demo.py:109-119,133-143): 20 vs 80
    core = lake.table_for("core")
    pii = lake.table_for("pii")
    assert core.count() == 20
    assert pii.count() == 80
    assert {r.endpoint for r in core.select("endpoint").distinct().collect()} == {"api-a"}
    assert (
        pii.select("endpoint").distinct().count() == 4
    )


def test_rbac_column_security(lake):
    # T2 (comprehensive_rbac_demo.py:121-131,191-200): Core query on
    # `items` must FAIL; PII succeeds
    q = "SELECT endpoint, CARDINALITY(items) AS item_count FROM t_lake_db.raw LIMIT 3"
    with pytest.raises(AnalysisException):
        lake.sql("core", q).collect()
    ok = lake.sql("pii", q).collect()
    assert len(ok) == 3 and all(r.item_count == 5 for r in ok)


def test_rbac_same_query_different_results(lake):
    # G3: identical SQL, different principal ⇒ different result
    q = (
        "SELECT endpoint, COUNT(*) AS files FROM t_lake_db.raw "
        "GROUP BY endpoint ORDER BY endpoint"
    )
    core = lake.sql("core", q).collect()
    pii = lake.sql("pii", q).collect()
    assert [(r.endpoint, r.files) for r in core] == [("api-a", 20)]
    assert [(r.endpoint, r.files) for r in pii] == [
        ("api-a", 20), ("api-b", 20), ("api-c", 20), ("api-d", 20)
    ]


def test_rbac_deny_by_default(lake):
    # The reference's Lake Formation model: an unauthorized query FAILS
    # (comprehensive_rbac_demo.py:121-131). A principal with no grants —
    # or a query touching any ungoverned table — must be denied, not
    # silently executed against the base table.
    with pytest.raises(PermissionError):
        lake.sql("nobody", "SELECT COUNT(*) AS n FROM t_lake_db.raw").collect()
    # governed principal + ungoverned table in the same query: denied
    lake.spark.range(3).createOrReplaceTempView("ungoverned_side")
    with pytest.raises(PermissionError):
        lake.sql(
            "core",
            "SELECT COUNT(*) AS n FROM t_lake_db.raw JOIN ungoverned_side ON 1=1",
        ).collect()


def test_rbac_backtick_and_literal_rewrite(lake):
    # backtick-quoted identifiers must not dodge the rewrite…
    q = "SELECT COUNT(*) AS n FROM `t_lake_db`.`raw`"
    assert lake.sql("core", q).collect()[0].n == 20
    # …and table names inside string literals must not be rewritten
    q2 = "SELECT 'from t_lake_db.raw' AS s, COUNT(*) AS n FROM t_lake_db.raw"
    row = lake.sql("core", q2).collect()[0]
    assert row.s == "from t_lake_db.raw" and row.n == 20


def test_rbac_cte_alias_not_denied(lake):
    # CTE aliases are not table references — only their sources are
    q = (
        "WITH c AS (SELECT endpoint FROM t_lake_db.raw) "
        "SELECT COUNT(*) AS n FROM c"
    )
    assert lake.sql("core", q).collect()[0].n == 20
    assert lake.sql("pii", q).collect()[0].n == 80


def test_rbac_column_masking(lake):
    # softer governance: column stays selectable but masked
    lake.grant(
        "analyst",
        row_filter=None,
        masked={"endpoint": "md5", "fetched_at": "null", "date": "last4"},
    )
    rows = lake.table_for("analyst").select("endpoint", "fetched_at", "date").limit(5).collect()
    import re

    assert all(re.fullmatch(r"[0-9a-f]{32}", r.endpoint) for r in rows)
    assert all(r.fetched_at is None for r in rows)
    assert all(re.fullmatch(r"\d{2}-\d{2}", r.date[-5:]) or len(r.date) == 4 for r in rows)
    # items column still fully visible (not masked, not denied)
    assert lake.table_for("analyst").select("items").count() == 80


def test_compact_partition(lake):
    import glob
    import os

    part_glob = os.path.join(
        lake.raw_path, "source=api-c", f"ingestion_date={D1}", "*.json.gz"
    )
    before = len(glob.glob(part_glob))
    assert before >= 2  # multiple page files from ingestion
    n = lake.compact_partition("api-c", D1, target_files=1)
    assert n == 10
    after = len(glob.glob(part_glob))
    assert after == 1
    # data intact, other partitions untouched
    lake.refresh_catalog()
    assert lake.table("raw").count() == 80
    assert (
        lake.table("raw")
        .filter((F.col("source") == "api-c") & (F.col("ingestion_date") == D1))
        .count()
        == 10
    )


def test_curated_promotion(lake):
    lake.promote_curated()
    cur = lake.table("curated")
    assert cur.count() == 80
    assert dict(cur.dtypes)["fetched_at"] == "timestamp"
    assert dict(cur.dtypes)["date"] == "date"
    assert cur.filter(F.col("item_count") != 5).count() == 0


def test_results_segregation(lake, tmp_path):
    # G4: per-principal result prefixes
    out = lake.sql_to_results("core", "SELECT COUNT(*) AS n FROM t_lake_db.raw")
    assert "/results/core/" in out
    got = lake.spark.read.json(out).collect()
    assert got[0].n == 20


def test_vacuum_results_lifecycle(lake):
    # reference: results bucket expires objects after 30 days
    # (option_a_cdk_py/option_a/stack.py:53-59)
    import os
    from datetime import datetime, timedelta, timezone

    out = lake.sql_to_results("pii", "SELECT 1 AS one FROM t_lake_db.raw LIMIT 1")
    assert os.path.isdir(out)
    # not old enough: nothing deleted
    assert lake.vacuum_results(30) == []
    assert os.path.isdir(out)
    # 31 days later the same directory is expired
    future = datetime.now(timezone.utc) + timedelta(days=31)
    deleted = lake.vacuum_results(30, now=future)
    assert out in deleted and not os.path.isdir(out)


def test_per_source_table_layout(lake):
    # README.md:256-258 layout variant: one external table per source,
    # sharing the single-table layout's files (no copy)
    tables = lake.register_per_source_tables()
    assert tables == ["raw_api_a", "raw_api_b", "raw_api_c", "raw_api_d"]
    a = lake.table("raw_api_a")
    assert a.count() == 20
    assert "source" not in a.columns  # partition moved out of the schema
    parts = lake.spark.sql("SHOW PARTITIONS t_lake_db.raw_api_b").collect()
    assert len(parts) == 2  # two ingestion dates
    # same files as the single-table layout
    assert (
        lake.table("raw").filter(F.col("source") == "api-a").count() == a.count()
    )


def test_rbac_over_acid_table_end_to_end(spark, tmp_path):
    """Governance composed with the table format (r5 verdict item #8):
    the SAME SQL string returns 20-vs-80 against an AcidTable-backed
    view — through a DELETE (rows governed AND transactionally
    removed), through a RESTORE (log surgery brings the rows back and
    governance still applies), and against an as_of-pinned historical
    view. The 20/80 split mirrors the reference's Core-vs-PII demo
    (comprehensive_rbac_demo.py:109-216) with the transactional zone
    as the storage layer."""
    from data_lake_demo_spark.catalog import AcidCatalog, register_acid_table
    from data_lake_demo_spark.rbac import Rbac
    from data_lake_demo_spark.tableformat import AcidTable

    t = AcidTable(spark, str(tmp_path / "gov"))
    rows = [(i, "api-a" if i < 20 else f"api-{chr(98 + i % 3)}") for i in range(100)]
    t.append(spark.createDataFrame(rows, "rec_id long, endpoint string"))

    # durable catalog entry + session view over the live snapshot
    cat = AcidCatalog(spark, str(tmp_path))
    cat.register("gov_events", str(tmp_path / "gov"))
    cat.attach("gov_events")

    rbac = Rbac(spark)
    rbac.grant("core", "gov_events", row_filter="endpoint = 'api-a'")
    rbac.grant("pii", "gov_events")
    q = "SELECT count(*) AS n FROM gov_events"
    assert rbac.sql("core", q).collect()[0].n == 20
    assert rbac.sql("pii", q).collect()[0].n == 80 + 20 - 0  # all 100
    # deny by default holds for ungoverned principals
    with pytest.raises(PermissionError):
        rbac.sql("intern", q)

    # transactional DELETE of half the governed slice; re-register to
    # advance the view to the new snapshot
    v_before_delete = t.latest_version()
    t.delete([("rec_id", "<", 10)])
    cat.attach("gov_events")
    assert rbac.sql("core", q).collect()[0].n == 10
    assert rbac.sql("pii", q).collect()[0].n == 90

    # time travel: an as_of-pinned view restores the historical counts
    register_acid_table(
        spark, "gov_events", str(tmp_path / "gov"), as_of=v_before_delete
    )
    assert rbac.sql("core", q).collect()[0].n == 20

    # RESTORE (log surgery): the deleted rows come back; the SAME
    # grants govern the restored table
    t.restore(v_before_delete)
    cat.attach("gov_events")
    assert rbac.sql("core", q).collect()[0].n == 20
    assert rbac.sql("pii", q).collect()[0].n == 100
