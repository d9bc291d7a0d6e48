"""Transparent materialized-view rewrite on the SQL surface
(ddl.AcidSql): CREATE/REFRESH/DROP MATERIALIZED VIEW plus automatic
serving of matching aggregate SELECTs — from the materialization when
its watermark equals the base head, from the live base (identical
quantized semantics) when stale.
"""

from __future__ import annotations

import pytest

from data_lake_demo_spark.ddl import AcidSql
from data_lake_demo_spark.tableformat import AcidTable


def _mk(spark, tmp_path):
    sql = AcidSql(spark, {"t": str(tmp_path / "t")}, mv_auto_rewrite=True)
    t = sql.table("t")
    t.append(
        spark.createDataFrame(
            [("a", 1.5), ("a", 2.25), ("b", 4.0)], "k string, v double"
        )
    )
    return sql, t


def _served_from_mv(df) -> bool:
    return any("_mv_" in f for f in df.inputFiles())


def test_create_refresh_and_transparent_rewrite(spark, tmp_path):
    sql, t = _mk(spark, tmp_path)
    sql.sql(
        "CREATE MATERIALIZED VIEW m AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    )
    q = "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    out = sql.sql(q)
    assert _served_from_mv(out)
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", 2, 3.75),
        ("b", 1, 4.0),
    ]

    # stale MV: the rewrite computes from the live base (same math),
    # never serves outdated state
    t.append(spark.createDataFrame([("b", 6.0)], "k string, v double"))
    out2 = sql.sql(q)
    assert not _served_from_mv(out2)
    assert sorted(tuple(r) for r in out2.collect()) == [
        ("a", 2, 3.75),
        ("b", 2, 10.0),
    ]

    # refresh folds the delta; the same SELECT serves from the MV again
    sql.sql("REFRESH MATERIALIZED VIEW m")
    out3 = sql.sql(q)
    assert _served_from_mv(out3)
    assert sorted(tuple(r) for r in out3.collect()) == sorted(
        tuple(r) for r in out2.collect()
    )


def test_rewrite_maps_avg_min_max_and_aliases(spark, tmp_path):
    sql, t = _mk(spark, tmp_path)
    sql.sql(
        "CREATE MATERIALIZED VIEW m2 AS SELECT k, count(*) AS n, "
        "sum(v) AS total, min(v) AS lo, max(v) AS hi FROM t GROUP BY k"
    )
    out = sql.sql(
        "SELECT k AS grp, avg(v) AS mean, max(v) AS peak FROM t GROUP BY k"
    )
    assert _served_from_mv(out)
    assert out.columns == ["grp", "mean", "peak"]
    rows = {r.grp: (r.mean, r.peak) for r in out.collect()}
    assert rows["a"] == (1.875, 2.25) and rows["b"] == (4.0, 4.0)


def test_non_matching_shapes_fall_through(spark, tmp_path):
    from pyspark.errors import AnalysisException

    sql, t = _mk(spark, tmp_path)
    sql.sql(
        "CREATE MATERIALIZED VIEW m3 AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    )
    # WHERE clause, wrong group col, unknown agg: none may silently
    # serve the MV — they fall to plain spark.sql, where 't' is not a
    # catalog table
    for stmt in (
        "SELECT k, count(*) AS n FROM t WHERE v > 0 GROUP BY k",
        "SELECT v, count(*) AS n FROM t GROUP BY v",
        "SELECT k, approx_count_distinct(v) AS d FROM t GROUP BY k",
    ):
        with pytest.raises(AnalysisException):
            sql.sql(stmt)


def test_drop_mv_and_reject_count_only(spark, tmp_path):
    from pyspark.errors import AnalysisException

    sql, t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="value column"):
        sql.sql(
            "CREATE MATERIALIZED VIEW bad AS "
            "SELECT k, count(*) AS n FROM t GROUP BY k"
        )
    sql.sql(
        "CREATE MATERIALIZED VIEW m4 AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    )
    sql.sql("DROP MATERIALIZED VIEW m4")
    with pytest.raises(AnalysisException):
        sql.sql("SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k")
    with pytest.raises(ValueError, match="not registered"):
        sql.sql("REFRESH MATERIALIZED VIEW m4")


def test_mv_rewrite_acid_path_reference(spark, tmp_path):
    """MVs compose with acid.`/path` addressing (no catalog needed)."""
    path = str(tmp_path / "raw")
    t = AcidTable(spark, path)
    t.append(spark.createDataFrame([("x", 2.0)], "k string, v double"))
    sql = AcidSql(spark, mv_auto_rewrite=True)
    sql.sql(
        f"CREATE MATERIALIZED VIEW pm AS SELECT k, count(*) AS n, "
        f"sum(v) AS total FROM acid.`{path}` GROUP BY k"
    )
    out = sql.sql(
        f"SELECT k, sum(v) AS total FROM acid.`{path}` GROUP BY k"
    )
    assert _served_from_mv(out)
    assert [tuple(r) for r in out.collect()] == [("x", 2.0)]


def test_show_materialized_views_freshness(spark, tmp_path):
    sql, t = _mk(spark, tmp_path)
    sql.sql(
        "CREATE MATERIALIZED VIEW mlist AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    )
    row = sql.sql("SHOW MATERIALIZED VIEWS").collect()[0]
    assert row.name == "mlist" and row.fresh and row.group_cols == "k"
    t.append(spark.createDataFrame([("c", 1.0)], "k string, v double"))
    row = sql.sql("SHOW MATERIALIZED VIEWS").collect()[0]
    assert not row.fresh
    sql.sql("REFRESH MATERIALIZED VIEW mlist")
    assert sql.sql("SHOW MATERIALIZED VIEWS").collect()[0].fresh


def test_mv_rewrite_requires_opt_in(spark, tmp_path):
    """The rewrite changes sum/avg to quantized semantics, so by
    default the identical SELECT is NOT silently redirected: it takes
    a SELECT /*+ MV */ hint, or a session built with
    mv_auto_rewrite=True (regression for ADVICE r6 low)."""
    from pyspark.errors import AnalysisException

    sql = AcidSql(spark, {"t": str(tmp_path / "t")})
    t = sql.table("t")
    t.append(
        spark.createDataFrame(
            [("a", 1.5), ("b", 4.0)], "k string, v double"
        )
    )
    sql.sql(
        "CREATE MATERIALIZED VIEW opt AS "
        "SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k"
    )
    # default: falls through to plain spark.sql ('t' unknown there)
    with pytest.raises(AnalysisException):
        sql.sql("SELECT k, count(*) AS n, sum(v) AS total FROM t GROUP BY k")
    # the hint opts a single statement in
    out = sql.sql(
        "SELECT /*+ MV */ k, count(*) AS n, sum(v) AS total "
        "FROM t GROUP BY k"
    )
    assert _served_from_mv(out)
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", 1, 1.5),
        ("b", 1, 4.0),
    ]
