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
# explicit round-8 rotation, executing the r7 verdict's item 2
# verbatim: 48 of the 156 registered queries had no driver row newer
# than r4 (two are r3) — every one of them is in this window, led by
# the TWO queries new this round (which certify the r8 column-level
# SQL MERGE and replaceWhere work end-to-end on the ACID format).
# Evicted to make room: the ENTIRE r7 window — all 50 entries are
# r7-green in CORRECTNESS_r07.json (47 value-hash + 3 rows-only-by-
# design) and re-proven at sf0.001 by tests/test_oracle_parity.py on
# every pytest run, so they are now the LEAST stale rows in the
# registry. Within the stale block, the r3 rows lead, then the r4
# block grouped by family (relational smoke, events/time-series,
# corpus-prep twelve, dedup families, quality/text, embeddings,
# multimodal).
WINDOW = [
    # -- new in round 8 ------------------------------------------------
    "orders_merge_update_columns",  # NEW: WHEN MATCHED THEN UPDATE
    # SET c = expr lowered onto merge (ddl._merge_update_columns) —
    # multi-phase AcidTable query, full value-hash oracle
    "orders_replace_where_backfill",  # NEW: overwrite_where
    # (replaceWhere) partition backfill under a value hash
    # -- r3 rows (stalest in the registry) ------------------------------
    "approx_stats",  # rows-only by design (approx sketches); exact
    # twins exact_percentiles/distinct_counts are hash-green
    "orders_table_profile",
    # -- r4 relational/smoke -------------------------------------------
    "q1_pricing_summary",
    "group_count_ordinal",
    "anti_join_customers_without_orders",
    # -- r4 events / time-series ---------------------------------------
    "events_sessionization",
    "events_tumbling_hourly",
    "events_sliding_windows",
    "events_rolling_7d_active",
    "events_asof_last_view",
    "events_daily_retention",
    "events_daily_funnel",
    "events_daily_from_hourly_rollup",
    "events_json_extract",
    "events_hll_daily_users",  # rows-only by design (HLL sketch);
    # exact twin green, <=2%/day error pinned by test
    "countmin_event_type_freq",
    # -- r4 corpus-prep twelve -----------------------------------------
    "doc_split_assign",
    "doc_pack_sequences",
    "doc_chunk_overlap",
    "doc_quality_funnel",
    "doc_decontaminate",
    "doc_domain_mix",
    "doc_token_budget_mix",
    "doc_training_pipeline",
    "doc_normalize_scrub",
    "doc_scrub_boilerplate",
    "doc_token_stats",
    "doc_length_histogram",
    # -- r4 dedup families ----------------------------------------------
    "doc_exact_dedup",
    "doc_minhash_near_dups",
    "doc_simhash_buckets",
    "doc_ngram_jaccard_dups",
    "doc_winnowing_overlap",
    "doc_dedup_components",
    "doc_dedup_components_bigstar",
    "doc_fingerprint_buckets",
    # -- r4 quality / text -----------------------------------------------
    "doc_quality_scores",
    "doc_repetition_signals",
    "doc_lang_id",
    "doc_tfidf_top_terms",
    "doc_bpe_token_counts",
    # -- r4 embeddings ----------------------------------------------------
    "emb_norms",
    "emb_quantize_int8",
    "emb_label_centroid_sim",
    "emb_lsh_ann",
    "emb_near_dups",
    "knn_brute_force",
    # -- r4 multimodal ------------------------------------------------------
    "media_feature_stats",
]
assert len(WINDOW) == 50, len(WINDOW)
# Everything outside this window is r5/r6/r7-green (unchanged since
# its hash row) and re-proven by the in-suite parity replica each run.
# Registered this round OUTSIDE the window (parity-proven; lead the r9
# rotation): orders_row_tracking_ids, orders_cdf_row_id_pairs,
# orders_liquid_clustering, orders_convert_adoption.


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
