"""Corpus-preparation operators for LLM training pipelines: deterministic
train/val/test splits, context-window sequence packing, and overlapping
document chunking.

These are the steps between "deduplicated corpus" and "training shards".
None exist in the reference (cmariscalaws/data-lake-demo stops at curated
parquet, README.md:200-258); they extend the curated layer the same way
the dedup ladder does.

Design rules (100 TB):
- Everything is built-in JVM expressions — no Python UDFs, no collect().
- Splits hash a stable id (md5), never rand(): reproducible across runs,
  engines, and backfills; adding documents never reassigns old ones.
- Packing windows are PARTITIONED by a shard key, so the cumulative-sum
  window never funnels the corpus through one reducer; each shard packs
  independently, which is exactly how a 1000-executor job would write
  training shards anyway.
- Chunking explodes a per-row integer sequence (no join against a
  numbers table), so it pipelines inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lake_demo_spark.operators.dedup import (
    shingles,
    spread_small_input,
    tokens,
)


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: float = 0.90,
    val_pct: float = 0.05,
) -> DataFrame:
    """Assign each row a deterministic train/val/test split.

    The split key is the first 4 hex chars of ``md5(cast(id AS STRING))``
    compared lexicographically against fixed thresholds — stable across
    engines (DuckDB md5 produces the identical lowercase hex) and across
    reruns/backfills, unlike ``rand(seed)`` which depends on partitioning.
    16^4 = 65536 buckets → per-mille resolution on the split fractions.
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    t_train = format(int(train_pct * 65536), "04x")
    t_val = format(int((train_pct + val_pct) * 65536), "04x")
    split = (
        F.when(h < F.lit(t_train), F.lit("train"))
        .when(h < F.lit(t_val), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def split_thresholds(train_pct: float = 0.90, val_pct: float = 0.05) -> tuple[str, str]:
    """The hex thresholds ``split_assign`` uses (for oracle SQL strings)."""
    return (
        format(int(train_pct * 65536), "04x"),
        format(int((train_pct + val_pct) * 65536), "04x"),
    )


def whitespace_token_count(text_col: str = "text") -> Column:
    """Whitespace token count, matching plans/llm.py doc_token_stats."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_tokens: int = 2048,
    n_shards: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy concat-and-split sequence packing: assign each document to
    a (shard, pack) so that each pack is a contiguous run of documents
    whose cumulative whitespace-token count spans one ``ctx_tokens``
    context window (GPT-style packing; a document is owned by the pack
    where it starts).

    The cumulative sum is windowed PER SHARD (``id % n_shards``), not
    globally — a global ORDER BY window is a single-reducer funnel at
    100 TB, while per-shard packing parallelizes across ``n_shards``
    tasks and matches how training shards are physically written.
    Deterministic: shard/order/token-count are all pure functions of the
    row.
    """
    # tokens_col lets callers pass a precomputed count so text need
    # not survive to (or shuffle through) this stage at all
    toks = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else whitespace_token_count(text_col)
    )
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    w = (
        # ROWS UNBOUNDED PRECEDING .. 1 PRECEDING == tokens BEFORE this doc
        "(PARTITION BY shard ORDER BY {id} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    ).format(id=id_col)
    return (
        df.select(F.col(id_col), shard, toks.alias("n_tokens"))
        .withColumn(
            "cum_before",
            F.coalesce(F.expr(f"sum(n_tokens) OVER {w}"), F.lit(0)),
        )
        .withColumn(
            "pack_id", F.floor(F.col("cum_before") / F.lit(ctx_tokens)).cast("long")
        )
        .drop("cum_before")
    )


def sample_threshold_hex(rate: float) -> str:
    """Inclusive 4-hex-char keep threshold for ``stratified_sample``
    (md5-prefix <= threshold keeps exactly ``rate`` of the 65536
    hash buckets; rate=1.0 → 'ffff' keeps everything)."""
    if not 0.0 < rate <= 1.0:
        raise ValueError("rate must be in (0, 1]")
    return format(int(rate * 65536) - 1, "04x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-group downsampling — the domain-mixing step
    that reweights a corpus (e.g. cap web text, keep all code) before
    training. Keeps a row iff the first 4 hex chars of
    ``md5('mix:' || id)`` fall at or below the group's rate threshold.

    Hash-based (never ``rand()``/``sample()``): the same document is
    kept or dropped identically across reruns, engines, and backfills,
    and the 'mix:' salt decorrelates this decision from the
    ``split_assign`` hash. Pure map-side filter — zero shuffle at any
    scale; the rates dict compiles to a literal CASE expression, so no
    join against a rates table is needed until the dict outgrows a
    broadcast (thousands of domains), at which point swap the CASE for
    a broadcast join on ``group_col``.
    """
    h = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), 1, 4
    )
    thr = None
    for grp, rate in sorted(rates.items()):
        t = F.lit(sample_threshold_hex(rate))
        thr = (
            F.when(F.col(group_col) == grp, t)
            if thr is None
            else thr.when(F.col(group_col) == grp, t)
        )
    thr = (
        thr.otherwise(F.lit(sample_threshold_hex(default_rate)))
        if thr is not None
        else F.lit(sample_threshold_hex(default_rate))
    )
    return df.filter(h <= thr)


def token_budget_mix(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    *,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
) -> DataFrame:
    """Data-dependent downsampling to a target TOKEN mix: given mixture
    weights per group and a total token budget, derive each group's
    keep rate from its measured token mass —
    ``rate_g = min(1, weight_g · budget / tokens_g)`` — then keep each
    document by deterministic hash at that rate.

    The totals pass scans ``text_col`` a second time to count tokens;
    at 100 TB pass ``token_count_col`` (a token count materialized at
    ingest) so both passes prune the text column entirely.

    This is the "hit 30% code / 60% web / 10% books by tokens" step of
    a training-data build, where ``stratified_sample`` alone can't be
    used because the rates depend on the data. Two-pass, scale-correct
    shape: pass 1 is a tiny per-group token total (map-side partial
    agg, output rows = number of groups) broadcast back; pass 2 is a
    map-only keep decision per document. No rand(): the salted-hash
    bucket (``md5('budget:' || id)``) keeps the same document across
    reruns and engines, and the 'budget:' salt decorrelates it from
    ``split_assign`` / ``stratified_sample`` decisions.

    Returns the input with ``n_tok``, ``group_tokens``, ``keep_rate``
    and boolean ``kept`` columns (filter on ``kept`` for the sampled
    corpus; aggregate it for the mix report).
    """
    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else whitespace_token_count(text_col)
    )
    d = df.withColumn("n_tok", n_tok.cast("long"))
    totals = d.groupBy(group_col).agg(F.sum("n_tok").alias("group_tokens"))
    wmap = F.create_map(
        *[F.lit(x) for g in sorted(weights) for x in (g, float(weights[g]))]
    )
    rate = F.least(
        F.lit(1.0),
        F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
        * F.lit(float(budget_tokens))
        / F.col("group_tokens"),
    )
    flagged = d.join(
        F.broadcast(totals.withColumn("keep_rate", rate)), group_col
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("budget:"), F.col(id_col).cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    kept = (F.col("keep_rate") >= 1.0) | (
        bucket < F.floor(F.col("keep_rate") * F.lit(65536.0))
    )
    return flagged.withColumn("kept", kept)


def temperature_mix(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    n_target: int = 1000,
    group_col: str = "source",
    id_col: str = "doc_id",
    weight_q: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source mixing — the multilingual/multi-source
    rebalancing of mT5/XLM-R (Xue et al. 2021, arXiv:2010.11934 §3.1):
    sample source ``s`` with probability proportional to ``n_s^alpha``
    so low-resource sources are boosted and head sources damped
    (alpha=1 is natural frequency, alpha=0 uniform). Differs from
    ``token_budget_mix``: there the caller DECLARES the mix, here the
    mix is DERIVED from corpus counts by the temperature rule.

    Per-source quota = ``n_target * w_s div sum(w)`` with the weight
    ``w_s = floor(n_s^alpha * weight_q + 0.5)`` held in fixed-point —
    integer arithmetic end to end after the one pow() so the math is
    engine-reproducible. Document election is deterministic: the
    per-source ``row_number`` over ``(md5('temp:' || id), id)`` takes
    the quota's worth of hash-shuffled documents, stable across
    reruns and engines.

    Scale shape: pass 1 is the per-source count (map-side partial
    agg → rows = #sources, broadcast back with the weight/quota
    columns); pass 2 elects documents. The election here is a
    per-source sort window (exact quotas); at petabyte scale swap it
    for the threshold form used by ``token_budget_mix`` (keep iff
    ``hash_bucket < quota/n_s``, map-only, approximate quotas) — the
    quota derivation is shared.

    Returns one row per source: (group_col, n_docs, w_q, quota,
    n_sampled) where ``n_sampled = min(quota, n_docs)``.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn(
        "w_q",
        F.floor(
            F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
            * F.lit(int(weight_q))
            + F.lit(0.5)
        ).cast("long"),
    )
    tot = counts.agg(F.sum("w_q").alias("tot_w"))
    quotas = counts.crossJoin(F.broadcast(tot)).withColumn(
        "quota", F.expr(f"CAST({int(n_target)} AS BIGINT) * w_q div tot_w")
    )
    wnd = W.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit("temp:"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    elected = (
        df.select(group_col, id_col)
        .withColumn("rn", F.row_number().over(wnd))
        .join(F.broadcast(quotas.select(group_col, "quota")), group_col)
        .filter(F.col("rn") <= F.col("quota"))
    )
    sampled = elected.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return quotas.join(sampled, group_col, "left").select(
        group_col,
        "n_docs",
        "w_q",
        "quota",
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
    )


def quality_filter_funnel(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 16,
    max_chars: int = 500,
    min_uniq_frac: float = 0.35,
) -> DataFrame:
    """C4/Gopher-style quality filter with first-failing-reason
    attribution: each document gets a ``filter_reason`` of
    ``too_short`` / ``too_long`` / ``repetitive`` / ``kept`` (checked
    in that order), so the drop funnel is auditable per stage.

    Every signal is a pure JVM expression over the row (token count,
    char count, unique-token fraction via ``array_distinct``) — no
    shuffle at all until the caller aggregates by reason, which then
    shuffles only (reason, partial-agg) pairs. At 100 TB this is a
    map-only pass over the corpus.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    uniq_frac = F.size(F.array_distinct(toks)) / F.size(toks)
    reason = (
        F.when(n_tokens < min_tokens, F.lit("too_short"))
        .when(n_chars > max_chars, F.lit("too_long"))
        .when(uniq_frac < min_uniq_frac, F.lit("repetitive"))
        .otherwise(F.lit("kept"))
    )
    return df.withColumn("filter_reason", reason)


def contamination_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    train_pct: float = 0.90,
    val_pct: float = 0.05,
) -> DataFrame:
    """Train/test decontamination: flag TRAIN documents sharing any
    word ``ngram``-gram with any TEST document (the eval-leakage check
    every training pipeline runs before shipping a corpus). Returns
    one row per contaminated train doc with its shared-shingle count.

    100 TB shape: shingles are hashed to 64-bit ``xxhash64`` and
    de-duplicated per (doc, hash) map-side, so nothing but (8-byte
    hash, id) pairs ever shuffles — document text never leaves the
    scan stage. Train-vs-test matching is a single window over the
    hash (``max(split='test')`` per hash partition), NOT a self-join:
    a self-join would re-run the whole scan+shingle pipeline for each
    side (2× the corpus), while the window reads the shingle stream
    once and adds one hash-keyed shuffle. Hash collisions are the
    standard MinHash-family tradeoff (P ≈ n²/2⁶⁵ — negligible below
    ~10¹² distinct shingles).
    """
    from pyspark.sql import Window as W

    s = split_assign(df, id_col=id_col, train_pct=train_pct, val_pct=val_pct)
    sh = (
        # val docs take no part in the check — drop them pre-shingle.
        # spread_small_input parallelizes single-file test inputs and
        # skips the shuffle on many-split production scans.
        spread_small_input(s.filter(F.col("split") != "val"), id_col)
        .withColumn("__toks", tokens(text_col))
        .select(
            F.col(id_col),
            "split",
            F.explode(shingles(F.col("__toks"), ngram)).alias("g"),
        )
        .select(id_col, "split", F.xxhash64("g").alias("h"))
        .distinct()
    )
    has_test = F.max((F.col("split") == "test").cast("int")).over(
        W.partitionBy("h")
    )
    return (
        sh.withColumn("__has_test", has_test)
        .filter((F.col("split") == "train") & (F.col("__has_test") == 1))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap_chars: int = 50,
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap
    (stride = chunk - overlap): chunk i covers ``[i*stride, i*stride +
    chunk)``. Yields one row per (doc, chunk) with the chunk text.

    ``sequence() + explode`` generates chunk indices per row inside the
    scan stage — no numbers-table join, no shuffle; a 100 TB corpus
    chunks map-side only.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    stride = chunk_chars - overlap_chars
    n_chunks = F.when(F.length(text_col) <= chunk_chars, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((F.length(text_col) - F.lit(chunk_chars)) / F.lit(float(stride)))
    )
    return (
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(
                F.col(text_col), F.col("chunk_idx").cast("int") * stride + 1, chunk_chars
            ).alias("chunk_text"),
        )
    )


def boilerplate_line_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document boilerplate detection (the C4/RefinedWeb line-dedup
    step): a trimmed line is boilerplate when it appears in at least
    ``min_docs`` DISTINCT documents (nav bars, cookie banners, footers).

    Returns ``(line_hash, n_docs)``. Only 16-byte md5 digests ever
    shuffle: lines are hashed inside the scan stage, deduped per
    (doc, hash), then counted — document text never leaves its
    partition.
    """
    pairs = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "\n")).alias("__l"),
        )
        .select(id_col, F.trim(F.col("__l")).alias("__t"))
        .filter(F.length("__t") >= min_chars)
        .select(id_col, F.md5(F.col("__t")).alias("line_hash"))
        .distinct()
    )
    return (
        pairs.groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def scrub_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    out_col: str = "text_scrubbed",
    max_boilerplate: int = 100_000,
) -> DataFrame:
    """Remove cross-document boilerplate lines from every document.

    Two phases, mirroring the bloom pattern: (1) the frequency count
    above (hash-only shuffle) yields the boilerplate hash set — small
    by construction, because a line must recur across >= ``min_docs``
    documents to qualify; (2) the set is collected (bounded by
    ``max_boilerplate``, error beyond — switch to a line-level join
    if a corpus legitimately exceeds it) and baked into ONE array
    literal, so the rewrite is a pure map-side ``F.filter`` over each
    document's lines — the documents themselves never shuffle, and
    surviving lines keep their original (untrimmed) text and order.
    """
    hashes = sorted(
        r["line_hash"]
        for r in boilerplate_line_hashes(
            df, text_col, id_col, min_docs
        ).limit(max_boilerplate + 1).collect()
    )
    if len(hashes) > max_boilerplate:
        raise ValueError(
            f"boilerplate set exceeds max_boilerplate={max_boilerplate}; "
            "use a line-level semi-join instead of the literal path"
        )
    if not hashes:
        return df.withColumn(out_col, F.col(text_col))
    # one SQL literal (md5 hex is quote-safe), not 100k F.lit round-trips
    bad = F.expr("array(" + ",".join(f"'{h}'" for h in hashes) + ")")
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: ~F.array_contains(bad, F.md5(F.trim(l))),
    )
    return df.withColumn(out_col, F.concat_ws("\n", kept))


def sample_k_per_group(
    df,
    group_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
):
    """Deterministic EXACT-k per-group sample: order each group by
    md5(id) (a uniform, data-independent permutation) and keep the
    first ``k``. Complements ``stratified_sample``'s rate-based
    filter when the contract is "exactly k eval documents per
    domain" rather than a fraction. Unlike rate sampling this is NOT
    backfill-stable — a new row whose hash sorts early displaces the
    current k-th member; pin the snapshot (AcidTable ``as_of``) when
    reproducibility across corpus growth matters.

    One shuffle on ``group_col``; the md5 ranking needs no global
    sort and no driver state — at 100 TB the per-group top-k is a
    single windowed pass."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(
        F.md5(F.concat_ws(":", F.col(id_col))), id_col
    )
    return (
        df.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= k)
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    weight_col: Column | str,
    threshold_weight: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-proportional Bernoulli (Poisson) sampling — the
    distributable form of weighted sampling: each row is kept
    independently with probability ``p = min(1, w / threshold_weight)``
    against a DETERMINISTIC uniform (the portable md5-radix hash of
    ``id_col``), so the sample is reproducible run-to-run, engine-to-
    engine, and needs ONE map-side pass with no shuffle, no sort, no
    global state — unlike exact-k reservoir schemes whose u^(1/w) keys
    need a global top-k and whose pow() last-ulp differences don't
    replay across engines. Emits the Horvitz-Thompson inverse weight
    ``ht_weight = 1/p`` so downstream aggregates stay unbiased
    (Σ f(x)/p estimates the population sum).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # u in [0,1): 7 md5 hex chars / 16^7 — exact in double (28 bits)
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10).cast(
        "long"
    ) / F.lit(float(16**7))
    p = F.least(F.lit(1.0), w.cast("double") / F.lit(float(threshold_weight)))
    return (
        df.withColumn("p_include", p)
        .withColumn("__u", u)
        .filter(F.col("__u") < F.col("p_include"))
        .withColumn("ht_weight", F.lit(1.0) / F.col("p_include"))
        .drop("__u")
    )


def shard_assign_snake(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    tokens_col: str | None = None,
    id_bucket_width: int | None = None,
) -> DataFrame:
    """Token-balanced shard assignment by snake (boustrophedon)
    ordering: rank documents by token count descending and deal them
    out ``0,1,..,k-1,k-1,..,1,0,0,1,..`` so every shard receives one
    document from each size band — the classic near-LPT balancer for
    training-shard writers, deterministic (unlike hashing) and within
    a top-document of optimal when sizes are heavy-tailed.

    The exact GLOBAL rank is computed distributed, not via a
    single-partition ``Window.orderBy``: (1) per-token-count group
    sizes (one shuffle, vocabulary-of-sizes rows), (2) a cumulative
    offset over that tiny table (window over the size table, not the
    corpus), broadcast back, (3) within-group ``row_number``
    partitioned by token count — parallel across groups. rank =
    offset + within-group position. No stage funnels the corpus
    through one task.

    ``id_bucket_width`` guards the degenerate skew case where a huge
    share of documents has the SAME token count (then the within-group
    window itself funnels): ranking keys become
    ``(n_tokens, floor(doc_id / width))`` — the bucket preserves
    doc_id order inside a size group, so the rank is unchanged, but no
    window partition exceeds ``width`` rows. Use with DENSE ids (the
    offsets table grows to one row per non-empty bucket — for sparse
    hash-like ids leave it unset, the size-only offsets table stays
    vocabulary-sized)."""
    from pyspark.sql import Window as W

    toks = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else whitespace_token_count(text_col)
    )
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("n_tokens"))
    if id_bucket_width:
        d = d.withColumn(
            "_bkt", F.floor(F.col("doc_id") / F.lit(id_bucket_width))
        )
        grp = ["n_tokens", "_bkt"]
        order = [F.col("n_tokens").desc(), F.col("_bkt").asc()]
    else:
        grp = ["n_tokens"]
        order = [F.col("n_tokens").desc()]
    sizes = d.groupBy(*grp).agg(F.count(F.lit(1)).alias("g"))
    w = W.orderBy(*order)
    offsets = sizes.withColumn(
        "offset",
        F.coalesce(
            F.sum("g").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select(*grp, "offset")
    wg = W.partitionBy(*grp).orderBy("doc_id")
    ranked = (
        d.withColumn("pos", F.row_number().over(wg))
        .join(F.broadcast(offsets), grp)
        .withColumn("rank", (F.col("offset") + F.col("pos") - 1).cast("long"))
    )
    r = F.pmod(F.col("rank"), F.lit(2 * n_shards))
    shard = F.when(r < n_shards, r).otherwise(2 * n_shards - 1 - r)
    return ranked.select(
        "doc_id",
        "n_tokens",
        shard.cast("long").alias("shard"),
    )
