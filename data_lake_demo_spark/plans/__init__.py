"""The engine's query library.

Each module exposes ``QUERIES: dict[str, callable]`` mapping a query
name to ``fn(spark, sf_dir) -> DataFrame``, and ``ORACLE: dict[str,
str]`` with the DuckDB-equivalent ANSI SQL (omitted for ops that are
not SQL-expressible — the driver then records a rows-only check).
"""

from __future__ import annotations

from data_lake_demo_spark.plans import events, llm, relational

ALL_MODULES = [llm, events, relational]

# The driver's correctness gate samples the FIRST 50 entries of
# queries(), so registration order is load-bearing. ``WINDOW`` is the
# explicit round-9 rotation, executing the r8 verdict's item 1
# verbatim: the FOUR queries registered late in r8 that have never had
# a driver CORRECTNESS row lead (they certify row tracking, DSv2 row
# ids + CDF id pairing, liquid clustering, and CONVERT TO ACID
# end-to-end — all four already pass the sf0.01 DuckDB parity replica
# run in tests/test_oracle_parity.py), followed by the now-stalest
# block: all 40 queries whose newest driver row is CORRECTNESS_r05,
# then 6 of the r6 aggregate rows. Evicted: the entire r8 window (all
# 50 entries green in CORRECTNESS_r08.json — 46 value-hash + 4
# rows-only-by-design — and re-proven at sf0.001 by the in-suite
# parity replica on every pytest run).
WINDOW = [
    # -- never driver-checked (registered late in r8) -------------------
    "orders_row_tracking_ids",  # stable row ids through UPDATE/
    # OPTIMIZE/MERGE rewrites (tableformat row tracking)
    "orders_cdf_row_id_pairs",  # update reconstruction via the
    # _row_id join over the CDF feed (DSv2 row ids)
    "orders_liquid_clustering",  # CLUSTER BY + incremental
    # optimize_cluster + pruned key-range read replay
    "orders_convert_adoption",  # CONVERT TO ACID zero-copy adoption
    # -- new in round 9 ---------------------------------------------------
    "doc_compression_portable",  # NEW: distinct-8-gram compressibility
    # proxy — the hash-green twin for the zlib rows-only signal
    "orders_merge_insert_columns",  # NEW: column-level conditional
    # MERGE INSERT (insert-only merge) under a value hash
    # -- r5 rows (stalest driver rows in the registry) -------------------
    # relational heads
    "q3_shipping_priority",
    "q4_order_priority_checking",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q12_priority_by_flag",
    "q13_order_count_distribution",
    # joins / set ops
    "semi_join_customers_with_orders",
    "full_outer_nation_activity",
    "non_equi_nation_pairs",
    "range_join_price_bands",
    "fuzzy_name_pairs",
    "set_ops_customer_cohorts",
    # window functions
    "top3_orders_per_customer",
    "running_revenue_by_supplier",
    "order_gaps_lag_lead",
    "rank_dense_rank_parts",
    "topk_expensive_orders",
    "window_distribution_functions",
    # subqueries / scalar expressions
    "scalar_subquery_above_avg",
    "in_subquery_asia_suppliers",
    "not_in_subquery_priorities",
    "scalar_functions_showcase",
    "case_when_conditional_agg",
    # reshaping / grouping extensions
    "pivot_qty_by_status",
    "unpivot_customer_measures",
    "unpivot_stack_measures",
    "grouping_id_rollup",
    "array_agg_per_group",
    "exact_percentiles",
    # LLM / events tail of the r5 block
    "emb_ivf_ann",
    "emb_pq_ann",
    "emb_ivfpq_ann",
    "doc_pii_scrub",
    "doc_sample_k_per_source",
    "events_hll_daily_users_exact",
    "media_frame_features",
    # -- r6 aggregate block (next-stalest) --------------------------------
    "global_count",
    "distinct_counts",
    "rollup_revenue",
    "cube_quantity",
]
assert len(WINDOW) == 50, len(WINDOW)
# having_filter and grouping_sets_revenue (both r6-green) yielded
# their slots to the two queries NEW this round; they stay re-proven
# by the in-suite parity replica like the other out-of-window rows.
# Everything outside this window is r6/r7/r8-green (unchanged since
# its hash row) and re-proven by the in-suite parity replica each run.


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    missing = [n for n in WINDOW if n not in out]
    assert not missing, f"WINDOW names not registered: {missing}"
    ordered = {n: out[n] for n in WINDOW}
    ordered.update({n: f for n, f in out.items() if n not in ordered})
    return ordered


def all_oracle_sql():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE)
    return out
