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
# explicit round-10 rotation, executing the r9 verdict's item 2:
# the THREE queries new this round (never driver-checked — they
# certify the r10 deletion-vector codec, the merge-on-read MERGE,
# and the merge-on-read SCD2) lead, then all 14 queries whose newest
# driver row is CORRECTNESS_r06 (three rounds stale), then 33 of the
# 50 rows whose newest driver row is CORRECTNESS_r07. Evicted: the
# entire r9 window (all 50 entries green in CORRECTNESS_r09.json —
# 47 value-hash + 3 rows-only-by-design — and re-proven at
# sf0.001/sf0.01 by the in-suite parity replica on every pytest
# run). The 17 r7 rows left out are the ones whose semantics are
# pinned by an in-window twin this round (portable-family siblings),
# a same-operator in-window row, or a hypothesis reference test;
# they lead the r11 rotation.
WINDOW = [
    # -- never driver-checked (new in r10) --------------------------------
    "orders_mor_delete_dv",  # merge-on-read DELETE through the NEW
    # compressed/sidecar deletion-vector codec, under a value hash
    "orders_merge_mor_upsert",  # merge-on-read MERGE (DV-based
    # low-shuffle merge) under a value hash
    "orders_scd2_mor_dimension",  # merge-on-read SCD2 (O(changed
    # keys) dimension maintenance) under a value hash
    # -- r6 rows (stalest driver rows in the registry) --------------------
    "bloom_semi_join_orders",
    "doc_quality_model_scores",
    "doc_temperature_mix",
    "emb_hard_negatives",
    "events_scd2_point_in_time",
    "grouping_sets_revenue",
    "having_filter",
    "q14_promo_revenue_pct",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    # -- r7 rows (next-stalest block; 36 of 50) ---------------------------
    # relational tail of TPC-H
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_suppliers",
    "lineitem_transit_overlaps",
    # documents: dedup / retrieval / quality
    "doc_bm25_retrieval",
    "doc_dedup_index_incremental",
    "doc_dsir_weights",
    "doc_inverted_index",
    "doc_lm_perplexity",
    "doc_minhash_dups_portable",
    "doc_paragraph_dedup",
    "doc_pmi_collocations",
    "doc_rag_pipeline",
    "doc_shard_assign_snake",
    "doc_simhash_buckets_portable",
    "doc_source_quality_eb",
    "doc_substring_dedup",
    "doc_tokenizer_fertility",
    "doc_weighted_sample",
    # embeddings: ANN / graph / clustering
    "emb_ann_recall_at_k",
    "emb_filtered_ann_portable",
    "emb_graph_communities",
    "emb_graph_pagerank",
    "emb_graph_triangles",
    "emb_kmeans_portable",
    "emb_lsh_multiprobe_ann",
    "emb_mmr_rerank",
    "emb_semantic_dedup",
    # events: time-series kernels
    "events_cusum_alarms",
    "events_histogram_quantiles",
    "events_window_funnel",
    # media
    "media_video_scene_cuts",
]
assert len(WINDOW) == 50, len(WINDOW)
# Deferred to r11 (r7-green, each pinned by an in-window sibling this
# round): doc_retrieval_join (composed inside the in-window
# doc_rag_pipeline), doc_lsh_recall_eval (banding recall pinned by the
# in-window doc_minhash_dups_portable + its hypothesis property test),
# events_gap_fill (pinned by the hypothesis reference
# test_gap_fill_matches_python_reference),
# doc_bpe_vocab_tokens (rows-only; token-count twin r8),
# doc_compression_signals (rows-only; portable twin r9),
# doc_quality_model_scores_frozen (live-twin in window), emb_ivf_ann_
# portable / emb_pq_ann_portable / emb_ivfpq_ann_portable /
# emb_sq_ann / emb_sq_ann_portable (ANN family; recall-at-k +
# filtered-portable in window), events_hourly_anomalies,
# events_kmv_retention, events_lttb_downsample, media_audio_features_
# real, media_image_stats_real, media_video_frames_real (scene-cuts
# twin in window). Everything outside this window is r7/r8/r9-green
# (unchanged since its hash row) and re-proven by the in-suite parity
# replica each run.


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
