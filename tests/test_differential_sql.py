"""Differential SQL fuzzing: hypothesis generates random (but
dialect-portable) SELECT queries over the TPC-H-ish fixture tables,
each query runs VERBATIM on Spark SQL and on DuckDB, and the result
multisets must agree exactly.

This extends the fixed oracle-parity registry (tests/
test_oracle_parity.py) with an open-ended grammar: projections,
conjunctive/disjunctive predicates over int/double/string columns,
single-key equi-joins, grouped aggregates, and HAVING — the shapes a
lake SQL front door serves all day. Determinism discipline:

* aggregates over doubles go through the same quantize-to-integer
  trick the registry oracles use (sum of ``floor(x * 100 + 0.5)`` is
  order-insensitive in int64 — IEEE double summation is NOT);
* no ORDER BY inside the query — both result sets are sorted in
  Python (engines disagree on NULL placement and collation);
* constants are drawn from the columns' actual value ranges so
  predicates neither always-pass nor always-empty.

Dialect notes: everything emitted is in the ANSI intersection both
engines parse (no backticks, no double-quoted identifiers, integer
literals, single-quoted strings).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"

TABLES = {
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "doubles": ["o_totalprice"],
        "strings": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "doubles": ["c_acctbal"],
        "strings": ["c_mktsegment"],
    },
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "doubles": ["l_quantity", "l_extendedprice", "l_discount"],
        "strings": ["l_returnflag", "l_linestatus"],
    },
}

#: equi-join edges (left table, right table, left key, right key)
JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
]

# value pools sampled per column type — drawn from the fixtures' real
# ranges so comparisons are selective but non-degenerate
INT_CONSTS = [1, 7, 64, 150, 750, 1500, 3000]
DOUBLE_CONSTS = [0.02, 0.05, 25.0, 900.0, 45000.0, 150000.0]
STRING_POOLS = {
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "3-MEDIUM", "5-LOW"],
    "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
}


@st.composite
def predicates(draw, table: str, qualify: str = ""):
    cols = TABLES[table]
    kind = draw(st.sampled_from(["int", "double", "string"]))
    if kind == "int":
        c = draw(st.sampled_from(cols["ints"]))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>", "%"]))
        if op == "%":
            m = draw(st.sampled_from([2, 3, 7]))
            return f"{qualify}{c} % {m} = 0"
        v = draw(st.sampled_from(INT_CONSTS))
        return f"{qualify}{c} {op} {v}"
    if kind == "double":
        c = draw(st.sampled_from(cols["doubles"]))
        op = draw(st.sampled_from(["<", ">", ">=", "<="]))
        v = draw(st.sampled_from(DOUBLE_CONSTS))
        return f"{qualify}{c} {op} {v}"
    c = draw(st.sampled_from(cols["strings"]))
    pool = STRING_POOLS[c]
    if draw(st.booleans()):
        vals = draw(
            st.lists(st.sampled_from(pool), min_size=1, max_size=2, unique=True)
        )
        inner = ", ".join(f"'{v}'" for v in sorted(vals))
        return f"{qualify}{c} IN ({inner})"
    return f"{qualify}{c} = '{draw(st.sampled_from(pool))}'"


@st.composite
def queries(draw):
    """One dialect-portable SQL string + its output column list."""
    join = draw(st.booleans())
    if join:
        lt, rt, lk, rk = draw(st.sampled_from(JOINS))
        frm = f"{lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk}"
        tabs = [lt, rt]
    else:
        lt = draw(st.sampled_from(sorted(TABLES)))
        frm, tabs = lt, [lt]

    wheres = [
        draw(predicates(t, f"{t}." if join else ""))
        for t in tabs
        for _ in range(draw(st.integers(0, 2)))
    ]
    glue = draw(st.sampled_from([" AND ", " OR "])) if len(wheres) > 1 else " AND "
    where = (" WHERE " + glue.join(wheres)) if wheres else ""

    gtab = tabs[0]
    gcols = draw(
        st.lists(
            st.sampled_from(
                [f"{gtab}.{c}" if join else c for c in TABLES[gtab]["strings"]]
                + [f"{gtab}.{c}" if join else c for c in TABLES[gtab]["ints"][:1]]
            ),
            min_size=0,
            max_size=2,
            unique=True,
        )
    )
    atab = tabs[-1]
    acol_d = draw(st.sampled_from(TABLES[atab]["doubles"]))
    acol_i = draw(st.sampled_from(TABLES[atab]["ints"]))
    if join:
        acol_d, acol_i = f"{atab}.{acol_d}", f"{atab}.{acol_i}"
    aggs = [
        "count(*) AS n",
        # order-insensitive exact double sum (the registry's qsum trick)
        f"sum(floor({acol_d} * 100 + 0.5)) AS qsum",
        f"min({acol_i}) AS mn",
        f"max({acol_i}) AS mx",
    ]
    if gcols:
        sel = ", ".join([*gcols, *aggs])
        group = " GROUP BY " + ", ".join(gcols)
        having = ""
        if draw(st.booleans()):
            having = f" HAVING count(*) > {draw(st.sampled_from([1, 3, 10]))}"
        sql = f"SELECT {sel} FROM {frm}{where}{group}{having}"
        out_cols = [c.split(".")[-1] for c in gcols] + ["n", "qsum", "mn", "mx"]
    else:
        sql = f"SELECT {', '.join(aggs)} FROM {frm}{where}"
        out_cols = ["n", "qsum", "mn", "mx"]
    return sql, out_cols


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if v is None:
                vals.append(None)
            elif isinstance(v, float):
                # integral-valued floats (duckdb sum of ints) == ints
                vals.append(int(v) if math.isfinite(v) and v == int(v) else v)
            else:
                vals.append(int(v) if isinstance(v, bool) is False and isinstance(v, int) else v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return spark, con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=queries())
def test_random_queries_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm(
        [r.asDict() for r in spark.sql(sql).collect()], cols
    )
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def window_queries(draw):
    """Window-function shapes: deterministic because every ORDER BY
    ends with a unique key (ties would make rank/lag engine-defined)."""
    table = draw(st.sampled_from(["orders", "lineitem"]))
    cols = TABLES[table]
    part = draw(st.sampled_from(cols["strings"]))
    ukey = cols["ints"][0]  # o_orderkey / l_orderkey(+linenumber)
    order = f"{ukey}" if table == "orders" else "l_orderkey, l_linenumber"
    fn = draw(
        st.sampled_from(
            [
                "row_number()",
                "rank()",
                "dense_rank()",
                f"lag({ukey}, 1) OVER_MARK",
                f"lead({ukey}, 1) OVER_MARK",
                f"sum(floor({draw(st.sampled_from(cols['doubles']))} * 100 + 0.5)) OVER_MARK",
                f"count(*) OVER_MARK",
                f"min({ukey}) OVER_MARK",
            ]
        )
    )
    over = f"OVER (PARTITION BY {part} ORDER BY {order})"
    expr = fn.replace(" OVER_MARK", "") + " " + over if "OVER_MARK" in fn else fn + " " + over
    where = draw(predicates(table))
    # keep result sets small and projection deterministic
    sql = (
        f"SELECT {order}, {part}, {expr} AS w "
        f"FROM {table} WHERE {where} AND {ukey} < 1500"
    )
    out_cols = ([ukey] if table == "orders" else ["l_orderkey", "l_linenumber"]) + [part, "w"]
    return sql, out_cols


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=window_queries())
def test_random_window_queries_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def scalar_queries(draw):
    """Scalar-expression shapes in the dialect intersection: string
    functions, integer math, and EXTRACT over the timestamp column.
    Deliberately excluded: round() (Spark HALF_UP vs DuckDB
    HALF_EVEN) and anything locale/collation-sensitive."""
    table = draw(st.sampled_from(["orders", "lineitem"]))
    cols = TABLES[table]
    sc = draw(st.sampled_from(cols["strings"]))
    ic = draw(st.sampled_from(cols["ints"]))
    dc = draw(st.sampled_from(cols["doubles"]))
    ts = "o_orderdate" if table == "orders" else "l_shipdate"
    ukey = cols["ints"][0]
    exprs = draw(
        st.lists(
            st.sampled_from(
                [
                    f"upper({sc})",
                    f"lower({sc})",
                    f"length({sc})",
                    f"substr({sc}, 1, 2)",
                    f"trim({sc})",
                    f"replace({sc}, 'A', '_')",
                    f"{sc} || '#' || {sc}",
                    f"reverse({sc})",
                    f"abs({ic} - 100)",
                    f"{ic} % 13",
                    f"floor({dc} / 7)",
                    f"ceil({dc} / 11)",
                    f"EXTRACT(YEAR FROM {ts})",
                    f"EXTRACT(MONTH FROM {ts})",
                    f"EXTRACT(DAY FROM {ts})",
                    f"CASE WHEN {ic} % 2 = 0 THEN 'even' ELSE 'odd' END",
                    f"coalesce(nullif({sc}, 'zz'), 'fallback')",
                    f"greatest({ic}, 50)",
                    f"least({ic}, 50)",
                ]
            ),
            min_size=1,
            max_size=4,
            unique=True,
        )
    )
    sel = ", ".join([ukey] + [f"{e} AS e{i}" for i, e in enumerate(exprs)])
    bound = draw(st.sampled_from([150, 400, 900]))
    sql = f"SELECT {sel} FROM {table} WHERE {ukey} < {bound}"
    return sql, [ukey] + [f"e{i}" for i in range(len(exprs))]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=scalar_queries())
def test_random_scalar_exprs_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def date_arith_queries(draw):
    """Date-arithmetic shapes in the dialect intersection: interval
    addition, date_trunc (cast to DATE — Spark returns timestamp,
    DuckDB date), last_day, EXTRACT parts, and date-literal range
    predicates. Deliberately excluded: datediff/date_add (different
    signatures per engine), DOW/WEEK extraction (different numbering
    conventions)."""
    table = draw(st.sampled_from(["orders", "lineitem"]))
    ts = "o_orderdate" if table == "orders" else "l_shipdate"
    ukey = TABLES[table]["ints"][0]
    exprs = draw(
        st.lists(
            st.sampled_from(
                [
                    # 30 DAY deliberately absent: DuckDB 1.0 interval
                    # equality normalizes 1 MONTH = 30 DAY, and its
                    # CSE then unifies `col + INTERVAL 30 DAY` with
                    # `col + INTERVAL 1 MONTH` in one SELECT, returning
                    # the day-add for both (reproduced standalone:
                    # DATE '1995-01-13' + both intervals → Feb 12
                    # twice over a parquet column). Spark is right;
                    # the oracle is buggy — keep the generator off the
                    # colliding pair. Found by this fuzzer in the r12
                    # round-start full-suite run.
                    f"{ts} + INTERVAL {draw(st.sampled_from([1, 5, 20]))} DAY",
                    f"{ts} + INTERVAL {draw(st.sampled_from([1, 3, 12]))} MONTH",
                    f"CAST(date_trunc('month', {ts}) AS DATE)",
                    f"CAST(date_trunc('quarter', {ts}) AS DATE)",
                    f"CAST(date_trunc('year', {ts}) AS DATE)",
                    f"CAST(date_trunc('week', {ts}) AS DATE)",
                    f"last_day({ts})",
                    f"EXTRACT(YEAR FROM {ts})",
                    f"EXTRACT(QUARTER FROM {ts})",
                    f"EXTRACT(MONTH FROM {ts})",
                    f"EXTRACT(DAY FROM {ts})",
                    f"greatest({ts}, DATE '1995-06-01')",
                    f"least({ts}, DATE '1996-01-01')",
                    f"CAST({ts} AS DATE)",
                    f"CASE WHEN {ts} >= DATE '1995-01-01' "
                    "THEN 'recent' ELSE 'old' END",
                ]
            ),
            min_size=1,
            max_size=4,
            unique=True,
        )
    )
    lo = draw(st.sampled_from(["1992-06-01", "1994-01-01", "1995-03-15"]))
    hi = draw(st.sampled_from(["1995-06-30", "1996-12-31", "1998-08-01"]))
    where = draw(
        st.sampled_from(
            [
                f"{ts} BETWEEN DATE '{lo}' AND DATE '{hi}'",
                f"{ts} >= DATE '{lo}' + INTERVAL 2 MONTH",
                f"{ts} < DATE '{hi}'",
            ]
        )
    )
    sel = ", ".join([ukey] + [f"{e} AS e{i}" for i, e in enumerate(exprs)])
    bound = draw(st.sampled_from([150, 400, 900]))
    sql = f"SELECT {sel} FROM {table} WHERE {where} AND {ukey} < {bound}"
    return sql, [ukey] + [f"e{i}" for i in range(len(exprs))]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=date_arith_queries())
def test_random_date_arith_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def subquery_queries(draw):
    """Subquery shapes: uncorrelated scalar comparisons, correlated
    EXISTS / NOT EXISTS, [NOT] IN over a subquery, and a correlated
    scalar subquery in the projection. Determinism: scalar subqueries
    aggregate INT columns with count/min/max only (no double avg —
    engines may differ in the last ulp at the comparison boundary);
    IN-subquery key columns are non-null in the fixtures, so NOT IN
    never hits the three-valued-logic trap."""
    outer, inner, ok, ik = draw(
        st.sampled_from(
            [
                ("customer", "orders", "c_custkey", "o_custkey"),
                ("orders", "lineitem", "o_orderkey", "l_orderkey"),
            ]
        )
    )
    ipred = draw(predicates(inner))
    iint = TABLES[inner]["ints"][0]
    kind = draw(
        st.sampled_from(
            ["scalar_where", "exists", "not_exists", "in", "not_in",
             "scalar_select"]
        )
    )
    if kind == "scalar_where":
        agg = draw(
            st.sampled_from(
                [f"min({iint})", f"max({iint})", "count(*)"]
            )
        )
        cmp_op = draw(st.sampled_from(["<", ">", "<=", ">="]))
        where = (
            f"{ok} {cmp_op} (SELECT {agg} FROM {inner} WHERE {ipred})"
        )
    elif kind in ("exists", "not_exists"):
        neg = "NOT " if kind == "not_exists" else ""
        where = (
            f"{neg}EXISTS (SELECT 1 FROM {inner} "
            f"WHERE {ik} = {ok} AND {ipred})"
        )
    elif kind in ("in", "not_in"):
        neg = "NOT " if kind == "not_in" else ""
        where = (
            f"{ok} {neg}IN (SELECT {ik} FROM {inner} WHERE {ipred})"
        )
    else:  # correlated scalar subquery in the projection
        bound = draw(st.sampled_from([30, 80, 200]))
        sql = (
            f"SELECT {ok}, (SELECT count(*) FROM {inner} "
            f"WHERE {ik} = {ok} AND {ipred}) AS n "
            f"FROM {outer} WHERE {ok} < {bound}"
        )
        return sql, [ok, "n"]
    sql = (
        f"SELECT count(*) AS n, min({ok}) AS mn, max({ok}) AS mx "
        f"FROM {outer} WHERE {where}"
    )
    return sql, ["n", "mn", "mx"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=subquery_queries())
def test_random_subqueries_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def outer_join_queries(draw):
    """LEFT/FULL OUTER join shapes: null-extended rows exercised via
    count(right_key) vs count(*) and coalesce'd aggregates. The join
    filter lives in the ON clause sometimes (changes the null-extension
    set — a classic engine-divergence spot) and in WHERE others."""
    lt, rt, lk, rk = draw(st.sampled_from(JOINS))
    jtype = draw(st.sampled_from(["LEFT", "FULL"]))
    rpred = draw(predicates(rt, f"{rt}."))
    lpred = draw(predicates(lt, f"{lt}."))
    on_extra = draw(st.booleans())  # predicate in ON vs WHERE
    on = f"{lt}.{lk} = {rt}.{rk}" + (f" AND {rpred}" if on_extra else "")
    where = f" WHERE {lpred}" if draw(st.booleans()) else ""
    gcol = f"{lt}.{draw(st.sampled_from(TABLES[lt]['strings']))}"
    rint = f"{rt}.{TABLES[rt]['ints'][0]}"
    rdbl = f"{rt}.{draw(st.sampled_from(TABLES[rt]['doubles']))}"
    sql = (
        f"SELECT {gcol} AS g, count(*) AS n, count({rint}) AS matched, "
        f"sum(floor(coalesce({rdbl}, 0) * 100 + 0.5)) AS qsum, "
        f"min({rint}) AS mn "
        f"FROM {lt} {jtype} JOIN {rt} ON {on}{where} "
        f"GROUP BY {gcol}"
    )
    return sql, ["g", "n", "matched", "qsum", "mn"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=outer_join_queries())
def test_random_outer_joins_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"


@st.composite
def grouping_queries(draw):
    """Grouping-extension shapes: ROLLUP / CUBE / GROUPING SETS with
    GROUPING() disambiguation (a real NULL group vs a super-aggregate
    row), quantized double sums, optional HAVING. Portable: both
    engines emit NULL for rolled-up keys and number GROUPING() the
    same way. Known dialect divergence EXCLUDED by construction: over
    an EMPTY input the SQL standard (and DuckDB/Postgres) still emit
    the () grouping set's one grand-total row, while Spark returns no
    rows — so the WHERE here is a key bound that always keeps rows."""
    table = draw(st.sampled_from(["orders", "lineitem"]))
    cols = TABLES[table]
    g1, g2 = draw(
        st.lists(st.sampled_from(cols["strings"]), min_size=2, max_size=2,
                 unique=True)
        if len(cols["strings"]) >= 2
        else st.just(cols["strings"] * 2)
    )
    if g1 == g2:
        g2 = cols["ints"][0]
    dc = draw(st.sampled_from(cols["doubles"]))
    shape = draw(st.sampled_from(["ROLLUP", "CUBE", "SETS"]))
    if shape == "SETS":
        group = (
            f"GROUP BY GROUPING SETS (({g1}, {g2}), ({g1}), ())"
        )
    else:
        group = f"GROUP BY {shape}({g1}, {g2})"
    having = ""
    if draw(st.booleans()):
        having = f" HAVING count(*) > {draw(st.sampled_from([2, 10, 50]))}"
    ukey = cols["ints"][0]
    where = f" WHERE {ukey} < {draw(st.sampled_from([150, 400, 900]))}"
    sql = (
        f"SELECT {g1}, {g2}, grouping({g1}) AS gr1, grouping({g2}) AS gr2, "
        f"count(*) AS n, sum(floor({dc} * 100 + 0.5)) AS qsum "
        f"FROM {table}{where} {group}{having}"
    )
    return sql, [g1, g2, "gr1", "gr2", "n", "qsum"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=grouping_queries())
def test_random_grouping_sets_agree_with_duckdb(engines, q):
    sql, cols = q
    spark, con = engines
    got = _norm([r.asDict() for r in spark.sql(sql).collect()], cols)
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    exp = _norm([dict(zip(names, row)) for row in cur.fetchall()], cols)
    assert got == exp, f"engines disagree on: {sql}"
