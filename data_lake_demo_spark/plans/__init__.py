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
# explicit round-5 rotation (replacing round-4's implicit
# module-order scheme): queries whose code changed this round lead,
# then the stalest entries — everything here except the first block
# was last driver-verified in ROUND 1 (rounds 2-4 windows were filled
# by the LLM/events modules; tests/test_oracle_parity.py re-proves
# the evicted set every pytest run, but driver rows are the hard
# signal). Evicted to make room: the r4-green llm/events blocks,
# unchanged since their green rows.
WINDOW = [
    # -- changed or new in round 5 ------------------------------------
    "doc_pii_scrub",  # phone pattern fixed + n_phones column
    "emb_pq_ann",  # now served from the persisted AnnIndex
    "emb_ivfpq_ann",  # persisted index + L2 probe ranking
    "events_hll_daily_users_exact",  # NEW exact twin of the HLL rollup
    "doc_paragraph_dedup",  # NEW Dolma-style paragraph dedup (evicts
    # distinct_counts from slot 50: r1-green, unchanged, re-proven by
    # the in-suite parity replica every pytest run)
    "emb_ivf_ann",  # CHANGED: persisted IVF-FLAT index + L2 probe
    # ranking (rows-only; evicts global_count — same r1-green rationale)
    "emb_semantic_dedup",  # NEW SemDeDup composition, full oracle
    # (evicts having_filter — r1-green, parity-reproved)
    "events_histogram_quantiles",  # NEW mergeable-histogram quantiles
    # (evicts grouping_sets_revenue — r1-green, parity-reproved)
    "doc_sample_k_per_source",  # NEW exact-k per-group sample, full
    # oracle (evicts cube_quantity — r1-green, parity-reproved)
    "doc_lm_perplexity",  # NEW CCNet bigram-LM quality score, full
    # oracle (evicts q22_idle_rich_customers — r1-green, parity-reproved)
    "doc_dsir_weights",  # NEW DSIR importance weights, full oracle
    # (evicts rollup_revenue — r1-green, parity-reproved)
    "media_frame_features",  # NEW frame-sample → Arrow decode tier,
    # full oracle (evicts q21_waiting_suppliers — r1-green, reproved)
    "doc_minhash_dups_portable",  # NEW portable-family MinHash-LSH,
    # full oracle (evicts q19_disjunctive_predicates — r1-green,
    # reproved); first value-hash row for the LSH pipeline itself
    "doc_simhash_buckets_portable",  # NEW portable-family SimHash,
    # full oracle (evicts q17_small_quantity_revenue — r1-green,
    # reproved); value-hash row for the bit-vote fingerprint algebra
    "events_hourly_anomalies",  # NEW z-score anomaly alarms, full
    # oracle (evicts q18_large_volume_orders — r1-green, reproved)
    "doc_retrieval_join",  # NEW RAG retrieval composition (ANN top-k
    # ∘ metadata hydration join), full oracle (evicts q15_top_supplier
    # — r1-green, reproved)
    "emb_lsh_multiprobe_ann",  # NEW multi-probe LSH, full oracle
    # (evicts q14_promo_revenue_pct — r1-green, reproved)
    # -- stalest r1-green: named in the r4 verdict --------------------
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    # -- stalest r1-green: the window-function block ------------------
    "top3_orders_per_customer",
    "running_revenue_by_supplier",
    "order_gaps_lag_lead",
    "rank_dense_rank_parts",
    "topk_expensive_orders",
    "window_distribution_functions",
    # -- remaining r1-green relational surface ------------------------
    "semi_join_customers_with_orders",
    "full_outer_nation_activity",
    "non_equi_nation_pairs",
    "set_ops_customer_cohorts",
    "scalar_subquery_above_avg",
    "in_subquery_asia_suppliers",
    "scalar_functions_showcase",
    "pivot_qty_by_status",
    "unpivot_customer_measures",
    "unpivot_stack_measures",
    "range_join_price_bands",
    "not_in_subquery_priorities",
    "grouping_id_rollup",
    "fuzzy_name_pairs",
    "array_agg_per_group",
    "exact_percentiles",
    "case_when_conditional_agg",
    "q4_order_priority_checking",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q12_priority_by_flag",
    "q13_order_count_distribution",
]
assert len(WINDOW) == 50, len(WINDOW)


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
