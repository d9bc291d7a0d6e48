"""Physical-plan regression tests: the optimizations PERF.md claims
must stay visible in the formatted explain — pushdown, column
pruning, broadcast joins, true top-k, partial aggregation, codegen.
"""

from __future__ import annotations

from data_lake_demo_spark.plans.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q6_forecast_revenue,
    topk_expensive_orders,
)

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_query_build_time_stays_bounded(spark):
    """DataFrame CONSTRUCTION must stay cheap: per-element F.lit /
    Column-operator loops cost one py4j round-trip each and have
    twice crept to multi-second driver stalls per query (see PERF.md
    'Driver-side expression building'). Budget: 2.5 s per query build
    at sf0.001, generous for real expression trees but well under the
    regressed states (3-4 s). ivf stays in scope (its k-means sample
    collect is ~0.3 s; the 3.3 s regression was literal-building);
    only the iterative CC queries, which EXECUTE their rounds eagerly
    during construction, are exempted."""
    import time

    import __spark_entry__ as entry

    exempt = {
        "doc_dedup_components",
        "doc_dedup_components_bigstar",
        # label_propagation localCheckpoints its label frame each
        # round (eager) — the same execute-during-construction shape
        # as the CC queries above (~2.4-2.9 s at sf0.001)
        "emb_graph_communities",
        # composes connected_components, so it also EXECUTES its CC
        # rounds eagerly during construction (~2-3 s at sf0.001 —
        # execution cost, not expression-building cost)
        "emb_semantic_dedup",
        # runs the full multi-phase AcidTable build + three CDF syncs
        # eagerly and returns a collected result (~6 s at sf0.001 —
        # engine execution, not expression building)
        "doc_dedup_index_incremental",
        # EXECUTES the full greedy selection during construction: the
        # r8 persist-hygiene fix materializes the result via
        # localCheckpoint(eager=True) so the round frames can be
        # unpersisted deterministically (~2.5-2.9 s at sf0.001 —
        # execution cost, not expression building; its EXPRESSION
        # build is the unrolled 4-round algebra, well under budget)
        "emb_mmr_rerank",
        # same localCheckpoint(eager=True) materialization as MMR:
        # the assignment pass + the k-row threshold collect EXECUTE
        # during construction (execution cost, not expressions)
        "emb_cluster_balanced_sample",
        # the multi-phase ACID-lifecycle family: each builds a temp
        # AcidTable, runs its verbs (append/merge/cluster/CONVERT/CDF
        # reads — a dozen commits), and COLLECTS the reduced result
        # during construction; 2-3 s of engine execution at sf0.001,
        # not driver-side expression building (their expression trees
        # are a handful of aggregates)
        "orders_row_tracking_ids",
        "orders_cdf_row_id_pairs",
        "orders_liquid_clustering",
        "orders_convert_adoption",
        "orders_merge_update_columns",
        "orders_merge_insert_columns",
        "orders_replace_where_backfill",
        # the merge-on-read lifecycle queries (append + MOR verbs +
        # aggregate collect, all during construction — execution, not
        # expressions; 2-3.1 s each at sf0.001, straddling the budget
        # depending on host load)
        "orders_mor_delete_dv",
        "orders_merge_mor_upsert",
        "orders_scd2_mor_dimension",
        "orders_merge_sync_update",
        "orders_cdf_update_images",
        # composes emb_mmr_rerank, so it inherits MMR's eager
        # localCheckpoint (~2.6 s warm — execution, not expressions)
        "doc_rag_pipeline",
        # TRAINS the quality model driver-side on a bounded sample
        # during construction (execution; the frozen-weights variant
        # stays in scope and guards the scoring expression build)
        "doc_quality_model_scores",
    }
    qs = {n: f for n, f in entry.queries().items() if n not in exempt}
    for fn in qs.values():  # warmup: JVM JIT / analysis-path one-timers
        fn(spark, SF)
    worst: list[tuple[float, str]] = []
    for name, fn in qs.items():
        t = time.time()
        fn(spark, SF)
        worst.append((time.time() - t, name))
    worst.sort(reverse=True)
    offenders = [(round(t, 2), n) for t, n in worst if t > 2.5]
    # retrial pass (the bench.py adjudication idiom): this VM has
    # noisy-neighbor bands where ARBITRARY builds measure 1x-4x across
    # minutes (observed: a different untouched query over budget on
    # each of four consecutive runs, incl. at a months-old commit).
    # A real py4j-loop regression is deterministic per query, so
    # flagging only builds slow TWICE keeps the regression-catching
    # power and drops the host-band false positives.
    confirmed = []
    for t, name in offenders:
        retries = []
        for _ in range(2):  # min-of-2, the bench.py idiom: the least-
            t0 = time.time()  # contended observation is the code's cost
            qs[name](spark, SF)
            retries.append(time.time() - t0)
        if min(retries) > 2.5:
            confirmed.append((t, round(min(retries), 2), name))
    assert not confirmed, f"slow query builds (3x consecutive): {confirmed}"


def test_q6_pushdown_and_pruning(spark):
    plan = _plan(spark, q6_forecast_revenue(spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    # column pruning: only the 4 needed columns reach the reader
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, q3_shipping_priority(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_topk_uses_heap_not_global_sort(spark):
    plan = _plan(spark, topk_expensive_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q1_partial_aggregation_and_codegen(spark):
    df = q1_pricing_summary(spark, SF)
    plan = _plan(spark, df)
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    # codegen ids only materialize in the AQE final plan — execute first
    df.collect()
    assert "codegen id" in _plan(spark, df)


def test_dynamic_partition_pruning_on_lake(spark, tmp_path):
    """Joining the partitioned curated table against a filtered dim on
    the partition column must inject a dynamic pruning subquery — the
    partition-skipping mechanism that matters most at 100 TB."""
    from pyspark.sql import functions as F

    from data_lake_demo_spark.lake import Lake

    lk = Lake(spark, str(tmp_path / "dpp_lake"), db="dpp_t_db")
    lk.ingest_mock("2024-06-01")
    lk.refresh_catalog()
    lk.promote_curated()
    dim = spark.createDataFrame(
        [("api-a", "keep")], "source string, tag string"
    ).filter(F.col("tag") == "keep")
    j = spark.table("dpp_t_db.curated").join(dim, "source").groupBy("source").count()
    plan = _plan(spark, j)
    assert "dynamicpruningexpression" in plan
    assert j.collect()[0]["count"] == 10


def test_no_python_udf_in_relational_paths(spark):
    for fn in (q1_pricing_summary, q3_shipping_priority, q6_forecast_revenue):
        p = _plan(spark, fn(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_no_python_udf_in_llm_text_paths(spark):
    """The whole text-analysis/dedup surface must stay JVM-side —
    Python appears only behind Arrow in multimodal/http, never in the
    document hot paths."""
    from data_lake_demo_spark.plans.llm import (
        doc_repetition_signals,
        doc_token_stats,
    )

    for fn in (doc_token_stats, doc_repetition_signals):
        p = _plan(spark, fn(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_repetition_signals_partial_agg_and_pruning(spark):
    from data_lake_demo_spark.plans.llm import doc_repetition_signals

    plan = _plan(spark, doc_repetition_signals(spark, SF))
    # map-side combine on the (doc_id, gram) counts before the shuffle
    assert "partial_count" in plan or "partial_sum" in plan
    # column pruning: lang/n_chars never reach the parquet reader
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert reads and all("lang" not in l for l in reads)


def test_corpus_prep_plans_stay_jvm_side(spark):
    """Corpus-prep ops (splits/packing/chunking/funnel/decontam/mix)
    are pure JVM expressions — no Python eval anywhere in the plan."""
    from data_lake_demo_spark.plans.llm import (
        doc_chunk_overlap,
        doc_decontaminate,
        doc_domain_mix,
        doc_pack_sequences,
        doc_token_budget_mix,
        doc_training_pipeline,
        doc_quality_funnel,
        doc_split_assign,
    )

    for fn in (
        doc_split_assign,
        doc_pack_sequences,
        doc_chunk_overlap,
        doc_quality_funnel,
        doc_decontaminate,
        doc_domain_mix,
        doc_token_budget_mix,
        doc_training_pipeline,
    ):
        p = _plan(spark, fn(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, fn


def test_token_budget_mix_broadcasts_rates(spark):
    """The data-dependent rates join must be a broadcast of the tiny
    per-group totals — never a shuffle of the corpus by group (skewed:
    one language can be most of a corpus)."""
    from data_lake_demo_spark.plans.llm import doc_token_budget_mix

    p = _plan(spark, doc_token_budget_mix(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_chunking_is_map_side_only(spark):
    """chunk_documents must pipeline inside the scan stage: the only
    exchange in the whole query is the final presentation sort."""
    from data_lake_demo_spark.operators.corpus import chunk_documents
    from data_lake_demo_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    plan = _plan(spark, chunk_documents(docs))
    assert "Exchange" not in plan  # no shuffle at all without an orderBy


def test_stratified_sample_is_map_only(spark):
    from data_lake_demo_spark.operators.corpus import stratified_sample
    from data_lake_demo_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    plan = _plan(spark, stratified_sample(docs, {"en": 0.5}))
    assert "Exchange" not in plan  # deterministic filter, zero shuffle


def test_pack_sequences_partitions_window_by_shard(spark):
    """The packing cumsum must hash-partition on the shard key — a
    global (single-partition) window would funnel the corpus through
    one reducer."""
    from data_lake_demo_spark.operators.corpus import pack_sequences
    from data_lake_demo_spark.sources.testdata import load_table

    docs = load_table(spark, SF, "documents")
    plan = _plan(spark, pack_sequences(docs))
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_ivf_assignment_has_no_ml_dependency(spark):
    """IVF cell assignment is a codegen'd argmin expression, not an
    ml.KMeans transform (no row multiplication, no JVM ML stage)."""
    import inspect

    from data_lake_demo_spark.operators.similarity import ivf_ann_topk
    from data_lake_demo_spark.plans.llm import emb_ivf_ann

    p = _plan(spark, emb_ivf_ann(spark, SF))
    assert "BatchEvalPython" not in p
    assert "pyspark.ml" not in inspect.getsource(ivf_ann_topk)


def test_training_pipeline_never_shuffles_text(spark):
    """doc_training_pipeline computes digest/token-count in the scan
    and drops the document text before the first Exchange — every
    shuffle moves ~32 bytes/doc, not documents."""
    import re

    from data_lake_demo_spark.plans.llm import doc_training_pipeline

    plan = _plan(spark, doc_training_pipeline(spark, SF))
    exchange_blocks = [
        b
        for b in re.split(r"\n\n", plan)
        if b.strip().startswith("(") and "Exchange" in b.splitlines()[0]
    ]
    assert exchange_blocks  # the dedup + packing windows must shuffle
    for b in exchange_blocks:
        inputs = [l for l in b.splitlines() if l.startswith("Input")]
        assert inputs and all("text#" not in l for l in inputs), b


def test_bloom_probe_runs_before_the_join(spark):
    """The bloom membership check must sit in the fact scan's Filter —
    i.e. fact rows are pruned BEFORE the semi-join exchange — and the
    bitset must appear as one folded literal, not per-element lits."""
    from data_lake_demo_spark.plans.relational import bloom_semi_join_orders

    p = _plan(spark, bloom_semi_join_orders(spark, SF))
    join_at = p.find("Join")
    filt_at = p.find("xxhash64")
    assert filt_at != -1, "bloom probe filter missing from the plan"
    assert join_at != -1 and filt_at < join_at or "BroadcastHashJoin" in p


def test_no_python_udf_across_entire_query_registry(spark):
    """Blanket guarantee over every queries() entry: row-at-a-time
    Python (BatchEvalPython) appears NOWHERE, and Arrow-batched Python
    (ArrowEvalPython / MapInPandas) only in the explicitly-allowlisted
    multimodal decode path — everything else is whole-JVM."""
    import __spark_entry__ as entry

    # allowlisted Arrow (never row-at-a-time) stages: the multimodal
    # decode kernel, and the ANN index kernels — encode (m×ksub
    # interpreted HOF evals per row were 30× slower than the numpy
    # batch kernel, similarity._pq_encode_arrow) plus query prep;
    # emb_ivf_ann joined when it moved to the persisted flat index,
    # whose probe-cell ranking runs in the same Arrow tier;
    # media_frame_features is the frame-sample decode kernel (same
    # multimodal tier as media_feature_stats)
    arrow_ok = {"media_feature_stats", "media_frame_features",
                # real-codec tier: BMP/WAV encode AND decode are
                # Arrow kernels by design (payload bytes never leave
                # the Python worker batch)
                "media_image_stats_real", "media_audio_features_real",
                "media_video_frames_real", "media_video_scene_cuts",
                "emb_pq_ann", "emb_ivfpq_ann", "emb_ivf_ann",
                "emb_sq_ann",  # SQ8 prep runs in the same Arrow tier
                "doc_bpe_vocab_tokens",  # real-BPE apply kernel
                "doc_compression_signals",  # zlib Arrow kernel
                # the portable twins run the SAME Arrow encode/prep
                # kernels as their production counterparts (that is
                # their whole point — same stages, literal params)
                "emb_pq_ann_portable", "emb_ivfpq_ann_portable",
                "emb_sq_ann_portable",
                "emb_ivf_ann_portable",  # flat encode/prep kernels
                "emb_filtered_ann_portable",  # SQ kernels + pre-filter
                "emb_ann_recall_at_k",  # approx side = the SQ kernels
                # r11: lsh_signatures moved to the same Arrow tier
                # (numpy batch dot products, strict fold order) — the
                # pure-JVM alternatives both lose: HOF folds are
                # interpreted per element, and expanded arithmetic
                # blows Janino's 64 KB method limit and disables
                # whole-stage codegen for the consuming self-joins.
                # Every query whose plan consumes sign-LSH buckets:
                "emb_near_dups", "emb_semantic_dedup",
                "emb_graph_triangles", "emb_graph_pagerank",
                "emb_graph_communities", "emb_lsh_ann",
                "emb_lsh_multiprobe_ann", "doc_retrieval_join",
                # r11 second pass: the kmeans assignment joined the
                # same Arrow tier (kmeans._assign_arrow) — its
                # expanded-SQL form was ONE ~500-term expression that
                # blew Janino's 64 KB method limit, ran interpreted,
                # and re-attempted the doomed compile every action.
                # (emb_cluster_balanced_sample materializes the
                # kernel behind localCheckpoint, so its static plan
                # may or may not show the node depending on when the
                # checkpoint ran; listed for both orderings.)
                "emb_kmeans_portable", "emb_cluster_balanced_sample"}
    for name, fn in entry.queries().items():
        p = _plan(spark, fn(spark, SF))
        assert "BatchEvalPython" not in p, f"{name}: row-at-a-time Python UDF"
        if name not in arrow_ok:
            assert "ArrowEvalPython" not in p and "MapInPandas" not in p, (
                f"{name}: unexpected Python stage"
            )
