"""Property-based checks (hypothesis): the cross-engine determinism
contract and operator semantics hold for arbitrary inputs, not just
the fixtures.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_lake_demo_spark.operators.asof import asof_join
from data_lake_demo_spark.plans.relational import SCALE, qsum

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_quantized_sum_is_exact_and_order_free(spark, xs):
    """qsum == the Python-exact integer sum at any input order —
    the property the DuckDB parity rests on."""
    expected = sum(math.floor(x * SCALE + 0.5) for x in xs) / SCALE
    for order in (xs, list(reversed(xs))):
        df = spark.createDataFrame([(v,) for v in order], "v double").repartition(4)
        got = df.agg(qsum(F.col("v"), "s")).collect()[0].s
        assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=30),
)
def test_asof_join_matches_reference_semantics(spark, rights, lefts):
    """asof_join == per-row 'max right time <= left time' reference
    implementation, for arbitrary key/time/value sets."""
    right = spark.createDataFrame(rights, "k int, rt int, val int").dropDuplicates(
        ["k", "rt"]
    )
    left = spark.createDataFrame(lefts, "k int, lt int").dropDuplicates()
    got = {
        (r.k, r.lt): r.val_asof
        for r in asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt", value_cols=["val"]
        ).collect()
    }
    rmap: dict[int, list[tuple[int, int]]] = {}
    for k, rt, val in {(r.k, r.rt): (r.k, r.rt, r.val) for r in right.collect()}.values():
        rmap.setdefault(k, []).append((rt, val))
    for k, lt in {(r.k, r.lt) for r in left.collect()}:
        cands = [(rt, v) for rt, v in rmap.get(k, []) if rt <= lt]
        expected = max(cands)[1] if cands else None
        assert got[(k, lt)] == expected, (k, lt)
