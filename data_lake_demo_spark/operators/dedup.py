"""Deduplication operators for large-scale text corpora.

Four tiers, cheapest first (the standard LLM-data-pipeline ladder):

1. **Exact** — hash-groupBy on a content digest. One shuffle on the
   digest; at 100 TB the digest (16 bytes) shuffles, never the text.
2. **MinHash + LSH banding** — shingle → 64 independent min-hashes →
   band → self-join on (band_id, band_hash). Candidate pairs only;
   verification by n-gram Jaccard. All JVM-side expressions.
3. **SimHash** — 64-bit weighted-majority fingerprint; near-dups share
   fingerprints (or differ in few bits). Bucket on the fingerprint.
4. **Embedding cosine** — see operators/similarity.py.

All operators avoid Python row-at-a-time UDFs: shingling and hashing
use ``F.transform`` / ``F.xxhash64`` (whole-stage codegen); the only
shuffles are the keyed groupBys/joins on compact integer keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative per exact content match.

    Deterministic (unlike ``dropDuplicates``, which keeps an arbitrary
    row) — required both for oracle parity and reproducible pipelines.
    """
    return (
        df.withColumn("__digest", F.md5(F.col(text_col).cast("binary")))
        .groupBy("__digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__digest")
    )


def spread_small_input(df: DataFrame, key: str) -> DataFrame:
    """Repartition by ``key`` ONLY when the input has fewer partitions
    than the cluster has slots — i.e. parallelize single-file test
    inputs without imposing a gratuitous full shuffle (of text-bearing
    rows!) on a production scan that already has thousands of splits.
    ``getNumPartitions`` is plan metadata — no job runs."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(F.col(key))
    return df


def tokens(text_col: str | F.Column) -> F.Column:
    """Whitespace token array for ``shingles``. ALWAYS materialize this
    as a real column (``withColumn``) before shingling: an expression
    embedded in the transform lambda re-evaluates per shingle — the
    regex split would run O(tokens) times per document (measured 3×
    slower end-to-end for the 5-gram pipeline at sf0.1)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def shingles(toks: F.Column, n: int = 5) -> F.Column:
    """Word n-gram shingles as an array<string> — pure JVM expression
    sliding a transform over an index sequence. ``toks`` must be a
    MATERIALIZED token-array column (see ``tokens``), not an inline
    split expression."""
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# Smallest prime > 2^32: the modulus that turns aᵢ·h+bᵢ into a
# universal hash family. WITHOUT a modulus, a·h+b is MONOTONIC in h, so
# every "family member" selects the same argmin shingle and the MinHash
# estimate degenerates to a 1-sample estimator (est ∈ {0,1}; recall at
# threshold J collapses to ≈J — found when the exact-Jaccard oracle
# caught a missed 0.89-Jaccard pair).
_MERSENNE_P = 4294967311


def _affine_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    # 31-bit coefficients over a 31-bit reduced hash: a*h+b < 2^62+2^31
    # never overflows a long even before the pmod (Spark 4 ANSI mode
    # errors on wrap), and pmod(·, p) with p > 2^32 > max(h) keeps the
    # map injective enough for a proper permutation family
    return [
        (rng.randrange(1, 2**31) | 1, rng.randrange(0, 2**31))
        for _ in range(num_hashes)
    ]


def _md5fold_expr(col: str) -> str:
    """SQL for a 28-bit base hash both engines can compute: the first
    7 hex chars of md5 parsed as an integer (Spark ``conv(_, 16, 10)``
    ≡ DuckDB ``CAST('0x' || _ AS BIGINT)``). Measured at parity with
    xxhash64 (~0.25 s / 2M shingles warm) — the round-5 base-31
    ascii-char fold cost ~4× that (eight substring+ascii ops per
    shingle allocate; a single radix parse doesn't), which made the
    portable MinHash twin the most expensive query in the bench.
    7 chars (not 8) keeps h < 2²⁸ so the affine family's a·h+b stays
    < 2⁵⁹ — no ANSI-mode overflow headroom games."""
    h = f"md5(cast({col} as binary))"
    return f"cast(conv(substring({h}, 1, 7), 16, 10) as bigint)"


def md5fold_oracle_expr(col: str) -> str:
    """The DuckDB twin of ``_md5fold_expr`` — MUST stay in lockstep."""
    return f"CAST(('0x' || substr(md5({col}), 1, 7)) AS BIGINT)"


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    shingle_n: int = 5,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document → (id, sig array<bigint>).

    Each shingle is hashed with xxhash64 exactly ONCE (explode → one
    string hash per row); the 64 hash-family members are affine
    permutations ``(aᵢ·h + bᵢ) mod p`` (p prime > 2^32 — see
    ``_MERSENNE_P``; an un-modded affine map is monotonic and NOT a
    hash family),
    reduced with 64 map-side-combinable ``min`` aggregates. This is
    ~64× cheaper than re-hashing every shingle per family member and
    shuffles only (id, 64×8 bytes) after partial aggregation.

    ``base_hash="md5fold"`` swaps the per-shingle hash for a DuckDB-
    replicable md5 fold (see ``_md5fold_expr``) so the WHOLE pipeline
    becomes oracle-checkable; xxhash64 stays the production default.
    """
    params = _affine_params(num_hashes)
    # spread docs across the cluster BEFORE the expensive shingle
    # explode: a single input file would otherwise pin the whole hash
    # stage to one task. Conditional — a production scan with many
    # splits skips the shuffle entirely (spread_small_input).
    exploded = (
        spread_small_input(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
            "id",
        )
        .withColumn("__toks", tokens("__t"))
        .select(
            "id",
            F.explode(
                F.array_distinct(shingles(F.col("__toks"), shingle_n))
            ).alias("sh"),
        )
        .withColumn(
            "h",
            F.pmod(F.xxhash64("sh"), F.lit(2**31))
            if base_hash == "xxhash64"
            else F.expr(_md5fold_expr("sh")),
        )
    )
    # one F.expr per aggregate (not per literal): element-wise Column
    # construction costs a py4j round-trip per call — ~1 s of driver
    # time for 64 affine aggregates (see PERF.md)
    mins = [
        F.expr(f"min(pmod(h * {a}L + {b}L, {_MERSENNE_P}L))").alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = F.expr(
        "array(" + ",".join(f"__m{i}" for i in range(num_hashes)) + ")"
    )
    return exploded.groupBy("id").agg(*mins).select("id", sig.alias("sig"))


def band_signatures(
    sig: DataFrame,
    *,
    num_hashes: int = 64,
    bands: int = 16,
    band_hash: str = "xxhash64",
) -> DataFrame:
    """Explode a (id, sig) MinHash frame into LSH band rows
    ``(id, sig, band_id, band_hash)`` — the join-ready form shared by
    the batch self-join and the incremental streaming store.
    ``band_hash="md5"`` keeps the bucket key DuckDB-replicable (a hex
    string instead of a bigint) for the oracle-checked variant."""
    rows_per_band = num_hashes // bands

    def _bh(slice_str):
        return (
            F.xxhash64(slice_str) if band_hash == "xxhash64" else F.md5(slice_str)
        )

    return sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    _bh(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"), b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_id", "band.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    min_jaccard: float = 0.5,
    signature_store: str | None = None,
    max_bucket: int | None = 256,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    rows = documents sharing ≥1 band (id_a < id_b), with their
    estimated Jaccard (fraction of matching minhashes).

    Scale path: the self-join key is (band_id, hash-of-band-slice) —
    a compact shuffle; the text column is dropped before the explode,
    so the wide payload never shuffles. Pass ``signature_store`` (a
    parquet path/URI) to materialize the banded signatures to storage
    instead of ``.cache()`` — at 100 TB the signature set exceeds
    executor storage memory, and a table also survives stage retries
    and can be reused by later pipelines.

    ``max_bucket`` guards the quadratic blowup a boilerplate-dominated
    bucket causes (one shared band among k docs → k² candidate pairs;
    a 100k-doc bucket is 5×10⁹ pairs from a single key): buckets
    larger than the cap are excluded from pairwise generation. Such
    mega-buckets are near-identical clusters by construction — the
    exact-dedup / connected-components path handles them at O(k), so
    dropping their O(k²) pair enumeration loses nothing. The count is
    a window over the same key the join shuffles on (co-partitioned,
    no extra exchange). None disables the cap.

    ``portable=True`` swaps both hash tiers (per-shingle base hash,
    band bucket key) for md5-derived DuckDB-replicable functions, so
    the ENTIRE LSH pipeline — family, banding, bucketing, estimator —
    value-hashes against an oracle (driver query
    ``doc_minhash_dups_portable``); identical plan shape, ~1.5× cost.
    """
    sig = minhash_signatures(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        base_hash="md5fold" if portable else "xxhash64",
    )
    banded = band_signatures(
        sig,
        num_hashes=num_hashes,
        bands=bands,
        band_hash="md5" if portable else "xxhash64",
    )
    # the self-join would otherwise recompute the whole signature
    # pipeline for BOTH aliases: either materialize to a parquet store
    # (production path) or cache in executor memory (small inputs).
    if signature_store is not None:
        banded.write.mode("overwrite").parquet(signature_store)
        banded = df.sparkSession.read.parquet(signature_store)
    else:
        banded = banded.cache()

    if max_bucket is not None:
        from pyspark.sql import Window as _W

        bucket_size = F.count(F.lit(1)).over(
            _W.partitionBy("band_id", "band_hash")
        )
        banded = (
            banded.withColumn("__bsz", bucket_size)
            .filter(F.col("__bsz") <= max_bucket)
            .drop("__bsz")
        )

    # Self-join strategy is pinned to sort-merge: cached/unmaterialized
    # plan stats are unknown, and Catalyst at 10× scale otherwise plans
    # a broadcast of the (hundreds-of-MB) signature frame and dies with
    # "Not enough memory to build and broadcast" — found by the 50k-doc
    # scale probe. AQE still demotes to broadcast when the runtime size
    # is genuinely small, which is the correct direction of adaptivity.
    a = banded.alias("a").hint("merge")
    b = banded.alias("b")
    # estimate BEFORE the pair dedup: a pair matching in k bands would
    # otherwise carry both 64-long signature arrays (~1 KB/row) through
    # the dropDuplicates shuffle k times; est is identical for every
    # duplicate, so deduping (id_a, id_b, est) shuffles 24 bytes/row
    # r12: the agreement fold expanded to a codegen integer chain —
    # the zip_with/aggregate HOF lambdas are CodegenFallback
    # (interpreted per element) and this projection sits in the
    # codegen stage above the pinned sort-merge join, the exact shape
    # where r11's lsh_ann_topk expansion measured faster (guide §4.1).
    # Integer sums are order-exact, so est is value-identical.
    from data_lake_demo_spark.functions.vector_expand import sig_agreement

    est = sig_agreement("a.sig", "b.sig", num_hashes) / float(num_hashes)
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_jaccard)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    *,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: majority vote per bit over token
    hashes. Explode → xxhash64 per token → ONE groupBy(id) carrying 64
    static conditional sums. The shuffle payload is (id, hash) — 16
    bytes/token — never the text itself.

    ``base_hash="md5fold"`` (pair with ``bits=28`` — the portable
    hash is 28-bit) makes the fingerprint DuckDB-replicable for the
    oracle-checked twin query; xxhash64/64-bit stays the default.
    """
    toks = (
        spread_small_input(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
            "id",
        )  # parallelize single-file inputs; no-op on many-split scans
        .select("id", F.explode(F.split(F.trim(F.col("__t")), r"\s+")).alias("tok"))
        .withColumn(
            "h",
            F.xxhash64("tok")
            if base_hash == "xxhash64"
            else F.expr(_md5fold_expr("tok")),
        )
    )
    # SQL-string expressions: one py4j call per aggregate instead of
    # one per operator/literal (~900 round-trips ≈ 1.4 s driver time)
    bit_sums = [
        F.expr(
            f"sum(cast(shiftrightunsigned(h, {b}) & 1 as int))"
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy("id").agg(F.count(F.lit(1)).alias("__n"), *bit_sums)
    # shiftleft(1L, b) is 2^b for b<63 and long-min (the sign bit) for
    # b=63 — exactly the per-bit weights; Catalyst constant-folds it
    fp = F.expr(
        " + ".join(
            f"(CASE WHEN __b{b} * 2 > __n THEN shiftleft(1L, {b}) ELSE 0L END)"
            for b in range(bits)
        )
    )
    return per_doc.select("id", fp.alias("fp"))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    include_members: bool = False,
    bits: int = 64,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Group documents by exact SimHash fingerprint (near-dups collide).
    Output one row per fingerprint bucket.

    ``member_ids`` is opt-in: ``collect_list`` is unbounded per bucket
    (a pathological near-dup cluster at corpus scale can be millions of
    ids in one row), so the scale-safe default returns only the count
    and the keep representative.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min("id").alias("keep_id"),
    ]
    if include_members:
        aggs.append(F.sort_array(F.collect_list("id")).alias("member_ids"))
    return (
        simhash_fingerprints(df, text_col, id_col, bits, base_hash=base_hash)
        .groupBy("fp")
        .agg(*aggs)
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list →
    ``(node, component)`` where component = min node id reachable.

    This is the cluster step of near-duplicate dedup: LSH/Jaccard
    emits PAIRS, but "keep one document per near-dup group" needs the
    transitive closure (A~B, B~C ⇒ {A,B,C} one group).

    Algorithm: iterative min-label propagation — each round every node
    takes the minimum label among itself and its neighbors; converges
    in O(diameter) rounds (near-dup clusters are small-diameter, so
    typically 2–4). Each round is one join + one groupBy (two compact
    shuffles of (node, label) longs); ``localCheckpoint`` truncates the
    lineage so the plan does not grow per iteration. Convergence is
    detected with a limit-1 changed-label probe. ``max_iter`` bounds
    pathological chain graphs; for planet-scale graphs swap in the
    large-star/small-star variant, which contracts star centers and
    converges in O(log² n) — the per-round dataflow shape (join +
    min-aggregate) is identical to this one.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select("u")
        .union(sym.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    for _ in range(max_iter):
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "lbl")
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        # convergence probe: one narrow aggregate over the checkpointed
        # labels (vs a join against the previous round). Labels only
        # ever decrease, so an unchanged (count, xor-hash) signature
        # means a fixpoint.
        sig = labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(node, lbl))").alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    return labels.select("node", F.col("lbl").alias("component"))


def connected_components_bigstar(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") → ``(node, component)`` with component =
    min node id, same contract as :func:`connected_components`.

    Why a second algorithm: min-label propagation converges in
    O(diameter) rounds, which is fine for near-dup clusters (diameter
    2-4) but pathological for chain-shaped graphs (web link graphs,
    citation chains). Large-star/small-star contracts edges toward the
    component minimum and converges in O(log² n) rounds REGARDLESS of
    diameter — a 64-node chain resolves in ~5 rounds vs 64.

    Per round (edges kept oriented ``hi > lo``, only long pairs ever
    shuffle):

    - **large-star**: per node u, m = min(u, Γ(u)); every strictly
      larger neighbor re-attaches to m → one groupBy + one join.
    - **small-star**: per node u, m = min of its smaller neighbors;
      u and those neighbors all attach to m → one groupBy + one join.

    Lineage is truncated per round with ``localCheckpoint``;
    convergence is a single (count, hash-sum) aggregate over the new
    edge set — no driver-side edge materialization.
    """
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("hi").alias("node"))
        .union(e.select(F.col("lo").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        # large-star: m(u) = min over {u} ∪ Γ(u); attach v>u to m(u)
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        e = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: m(u) = min of Γ⁻(u); attach u and Γ⁻(u)\{m} to m
        grp = e.groupBy("hi").agg(F.min("lo").alias("m"))
        e = (
            grp.select("hi", F.col("m").alias("lo"))
            .union(
                e.join(grp, "hi")
                .filter(F.col("lo") != F.col("m"))
                .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # bit_xor (order-independent, overflow-free; edges are distinct
        # so xor cancellation can't collide with the count unchanged)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # converged edge set is a forest of stars centered on component minima
    return (
        nodes.join(e.withColumnRenamed("hi", "node"), "node", "left")
        .select(
            "node", F.coalesce(F.col("lo"), F.col("node")).alias("component")
        )
    )


def exact_jaccard_join(
    df: DataFrame,
    *,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard similarity self-join at
    ``J >= threshold`` via PREFIX FILTERING (the PPJoin family,
    Vernica et al. SIGMOD'10 / Xiao et al. WWW'08) — no recall loss,
    no quadratic gram-bucket blowup:

    order every document's gram set by GLOBAL frequency (rarest
    first); for Jaccard >= t, any qualifying pair must share at least
    one gram within each side's first ``|g| - ceil(t*|g|) + 1`` grams
    of that canonical order (if they disagreed on every prefix gram,
    the overlap could not reach t). So the pair-generation join runs
    on PREFIX grams only — and a gram that floods the corpus (bucket
    blowup territory: boilerplate, stop-gram shingles) is by
    construction the LAST thing a prefix contains. Candidates are
    then verified with the exact full-set Jaccard.

    Measured: the naive shared-gram join on the 10x corpus (50k docs
    with a corpus-wide shared gram) runs ~110 s; this plan bounds
    every join bucket by prefix rarity. Returns (id_a, id_b, jaccard)
    with id_a < id_b."""
    g = (
        df.withColumn("__toks", tokens(text_col))
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles(F.col("__toks"), n)).alias("g"),
        )
        .persist()
    )
    ex = g.select("id", F.size("g").alias("sz"), F.explode("g").alias("gram"))
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("__freq"))
    from pyspark.sql import Window as _W

    ranked = ex.join(freq, "gram").withColumn(
        "__rn",
        F.row_number().over(
            _W.partitionBy("id").orderBy("__freq", "gram")
        ),
    )
    prefix = ranked.filter(
        F.col("__rn")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "gram")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(
            g.select(F.col("id").alias("id_a"), F.col("g").alias("__ga")),
            "id_a",
        )
        .join(
            g.select(F.col("id").alias("id_b"), F.col("g").alias("__gb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("__ga", "__gb"))
                / F.size(F.array_union("__ga", "__gb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact word n-gram Jaccard.

    Joins the texts back only for the (small) candidate set — the
    classic candidate-then-verify pattern that keeps the O(n²) part
    bounded by LSH recall, not corpus size.

    The candidate set is cached (it is small by construction and is
    consumed three times: the id semi-filter and both gram joins), and
    docs are semi-filtered to ids that appear in some candidate BEFORE
    shingling — so the expensive n-gram projection runs over candidate
    docs only, not the whole corpus (and not twice).
    """
    candidate_pairs = candidate_pairs.cache()
    used = (
        candidate_pairs.select(F.col("id_a").alias("id"))
        .union(candidate_pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # no broadcast hint: the candidate-id set is corpus-proportional
    # (LSH recall × corpus), so let the threshold/AQE decide — a hint
    # would force a forced broadcast of 100M+ ids at corpus scale
    docs_used = df.select(F.col(id_col).alias("id"), F.col(text_col)).join(
        used, "id", "left_semi"
    )
    grams = docs_used.withColumn("__toks", tokens(text_col)).select(
        "id",
        F.array_distinct(shingles(F.col("__toks"), n)).alias("grams"),
    )
    return (
        candidate_pairs.join(
            grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a"),
            "id_a",
        )
        .join(
            grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("grams_a", "grams_b"))
                / F.size(F.array_union("grams_a", "grams_b"))
            ).alias("jaccard"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
) -> DataFrame:
    """Winnowing (MOSS-style) local fingerprints: hash every k-gram,
    slide a w-gram window over the hash sequence, keep each window's
    minimum. Guarantee: any shared token run of >= w + k - 1 tokens
    between two documents yields at least one shared fingerprint — the
    substring-level overlap detector the whole-document MinHash family
    can't provide (MinHash measures global Jaccard; a paragraph pasted
    into an otherwise-different document is invisible to it).

    Returns distinct ``(id_col, fp)`` pairs — the join-ready form; a
    per-doc fingerprint set is one ``groupBy(id).collect_set`` away
    but is per-doc-unbounded, so it is not the default.

    Scale shape: gram hashing is map-side expression work (text never
    leaves the scan stage); the windowed min runs over exploded
    ``(id, pos, 32-byte hash)`` rows — ONE hash-only shuffle,
    partitioned by document for the window sort. The tempting
    zero-shuffle formulation (array_min over slice inside a transform
    lambda) was measured 10x SLOWER at sf0.01 (19 s vs 1.9 s):
    project collapse inlines the hash-array expression into the
    lambda, and interpreted HOF eval then re-evaluates it per window
    (PERF.md 'HOF lambda re-evaluation') — explode + window keeps
    evaluation linear and the shuffle carries hashes, not text.
    min-over-window works on the md5 hex strings lexicographically,
    which every engine orders identically.
    """
    from pyspark.sql import Window as W

    # Gram construction via lead() over exploded tokens rather than
    # the shingles() array transform: the interpreted HOF (slice +
    # concat_ws per gram inside a lambda) measured ~3.2 s alone at
    # sf0.1 even fully parallel, while the lead chain is whole-stage
    # codegen over already-exploded rows. Both window chains share
    # one partitioning (id, token pos ≡ gram pos), so Spark plans a
    # single Exchange+Sort for gram assembly AND the winnow min.
    # Values are bit-identical to the array formulation (same grams,
    # same md5s, same min) — the WINNOW_SQL oracle is untouched.
    toks_df = df.select(F.col(id_col), tokens(text_col).alias("__toks")).withColumn(
        "__nt", F.size("__toks")
    )
    # docs shorter than k tokens: the whole text is the single gram,
    # and the single fingerprint is its own window min
    short = toks_df.filter(F.col("__nt") < k).select(
        F.col(id_col), F.md5(F.concat_ws(" ", "__toks")).alias("fp")
    )
    wl = W.partitionBy(id_col).orderBy("tp")
    gram_cols = [F.col("tk")] + [F.lead("tk", i).over(wl) for i in range(1, k)]
    exploded = (
        toks_df.filter(F.col("__nt") >= k)
        .select(
            F.col(id_col),
            (F.col("__nt") - (k - 1)).alias("__n"),
            F.posexplode("__toks").alias("tp", "tk"),
        )
        .withColumn("g", F.concat_ws(" ", *gram_cols))
        .filter(F.col("tp") <= F.col("__n") - 1)  # complete grams only
        .select(id_col, "__n", F.col("tp").alias("pos"), F.md5("g").alias("h"))
    )
    win = W.partitionBy(id_col).orderBy("pos").rowsBetween(-(w - 1), 0)
    long_fps = (
        exploded.withColumn("fp", F.min("h").over(win))
        # complete windows only; a doc shorter than w grams emits its
        # single full-array min via the last position
        .filter((F.col("pos") >= w - 1) | (F.col("pos") == F.col("__n") - 1))
        .select(id_col, "fp")
    )
    return long_fps.union(short).distinct()


def winnow_containment(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 8,
) -> DataFrame:
    """Paragraph-level decontamination: for each TEST document, the
    fraction of its winnowing fingerprints that also occur anywhere in
    the TRAIN corpus. Complements the exact-shingle decontamination
    (operators/corpus.contamination_report): a verbatim 12+-token run
    copied from test into train is guaranteed to light up at least one
    fingerprint even when the surrounding document is entirely
    different (whole-doc Jaccard ~0), while near-zero containment
    certifies the split clean at substring granularity.

    Scale shape: both sides reduce to distinct (id, 16-byte md5) pairs
    map-side (winnow_fingerprints); the train side collapses to a
    DISTINCT fingerprint set (no ids), so the join key space is
    bounded by corpus vocabulary, not corpus size, and only hashes
    shuffle. Output: (id, n_fingerprints, n_contained, containment).
    """
    test_fp = winnow_fingerprints(test, text_col, id_col, k, w)
    train_fp = winnow_fingerprints(train, text_col, id_col, k, w).select(
        "fp"
    ).distinct()
    hit = F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
    return (
        test_fp.join(
            train_fp.withColumn("__hit", F.lit(1)), "fp", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(hit).cast("long").alias("n_contained"),
        )
        .withColumn(
            "containment",
            F.col("n_contained") / F.col("n_fingerprints"),
        )
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_len: int = 8,
    base_hash: str = "md5",
) -> DataFrame:
    """Exact-substring span dedup — the suffix-array recipe of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022, arXiv:2107.06499) re-expressed relationally: any token
    run of >= ``min_len`` tokens that occurs MORE THAN ONCE corpus-wide
    (across documents OR repeated inside one document) is marked, the
    marked positions are merged into maximal per-document spans, and
    every occurrence is scrubbed from the rebuilt text. Equivalent to
    the suffix-array formulation at k-token granularity: a duplicated
    run of length L >= k is exactly the union of its L-k+1 duplicated
    k-grams, so merged spans reproduce the maximal duplicated runs
    (the "remove all occurrences" policy — deterministic, no
    first-copy election needed).

    Distributed shape (the reason this beats a literal suffix array on
    a cluster): one token explode feeds BOTH the gram pipeline and the
    text rebuild; gram assembly is a lead()-chain over the exploded
    rows (whole-stage codegen, same partitioning as the span-merge
    window — see winnow_fingerprints for why not an array-HOF); the
    global duplicate test is ONE shuffle of (id, pos, digest) rows —
    16-byte digests with ``base_hash="md5"`` (the oracle-portable
    default), 8-byte longs with ``"xxhash64"`` (the production pick) —
    and a count-over-digest window, no collect_list (a pathological
    mega-hot gram never materializes a position list). Island merge is
    the classic prev-max-end window per document. Text tokens shuffle
    once, keyed (id, pos), to meet the covered set.

    Output: (id, n_spans, dup_tokens, n_tokens, text_scrub) — one row
    per input document; zero-span documents pass through with their
    original (whitespace-normalized) text.
    """
    from pyspark.sql import Window as W

    from pyspark.storagelevel import StorageLevel

    k = min_len
    toks_df = spread_small_input(
        df.select(F.col(id_col), tokens(text_col).alias("__t")), id_col
    )
    # the exploded tokens feed BOTH the gram pipeline and the text
    # rebuild; persist closes the double-compute (lineage recompute of
    # the explode — CPU, not shuffle), same policy as the graph/PMI
    # operators. ContextCleaner reclaims it.
    tok_rows = toks_df.select(
        F.col(id_col),
        F.size("__t").alias("__nt"),
        F.posexplode("__t").alias("pos", "tok"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    wl = W.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("tok"), *[F.lead("tok", i).over(wl) for i in range(1, k)]
    )
    dig = (
        F.md5(gram.cast("binary"))
        if base_hash == "md5"
        else F.xxhash64(gram)
    )
    grams = (
        tok_rows.withColumn("__dg", dig)
        .filter(F.col("pos") <= F.col("__nt") - k)  # complete grams only
        .select(id_col, "pos", "__dg")
    )
    marked = (
        grams.withColumn(
            "__n_occ", F.count(F.lit(1)).over(W.partitionBy("__dg"))
        )
        .filter(F.col("__n_occ") >= 2)
        .select(id_col, "pos")
    )
    prev_end = F.max("pos").over(wl.rowsBetween(W.unboundedPreceding, -1)) + (
        k - 1
    )
    # a gram at prev_end + 1 starts a covered range that TOUCHES the
    # previous one — same maximal contiguous duplicated region, so the
    # island only breaks on a real gap (pos > prev_end + 1); pinned by
    # the brute-force hypothesis property (test_properties.py)
    islands = marked.withColumn(
        "__new",
        F.when(
            prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
        ).otherwise(0),
    ).withColumn("__isl", F.sum("__new").over(wl))
    spans = islands.groupBy(id_col, "__isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
    )
    stats = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "dup_tokens"
        ),
    )
    # merged spans are disjoint by construction — the explode cannot
    # emit a (id, pos) twice, so no distinct before the anti-join
    covered = spans.select(
        F.col(id_col), F.explode(F.sequence("span_start", "span_end")).alias("pos")
    )
    rebuilt = (
        tok_rows.join(covered, [id_col, "pos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text_scrub")
        )
    )
    totals = toks_df.select(F.col(id_col), F.size("__t").alias("n_tokens"))
    return (
        totals.join(stats, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("text_scrub", F.lit("")).alias("text_scrub"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-global paragraph-level exact dedup — the Dolma recipe:
    split each document on the paragraph separator, keep only the
    FIRST occurrence of every distinct paragraph corpus-wide (first =
    lowest (doc_id, position)), and rebuild documents from their
    surviving paragraphs in original order. Catches boilerplate,
    quoted reposts, and licence blocks that document-level dedup
    misses because the surrounding text differs.

    Scale shape: the global winner election shuffles ONLY
    (16-byte md5, id, position) rows — paragraph text never enters
    that exchange. Text moves once, keyed by (id, position), to meet
    the winner set — the same partitioning the per-document rebuild
    groupBy consumes, so AQE plans one text shuffle total. Documents
    that lose every paragraph surface with empty text (n_kept = 0),
    not silently dropped.

    Output: (id, n_paras, n_kept, n_dropped, text_dedup).
    """
    from pyspark.sql import Window as W

    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__idx", "__para"),
    )
    keyed = paras.select(
        id_col, "__idx", F.md5(F.col("__para")).alias("__h")
    )
    wn = W.partitionBy("__h").orderBy(id_col, "__idx")
    winners = (
        keyed.withColumn("__rn", F.row_number().over(wn))
        .filter(F.col("__rn") == 1)
        .select(id_col, "__idx")
    )
    kept = paras.join(winners, [id_col, "__idx"])
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__para"))),
                lambda s: s["__para"],
            ),
            sep,
        ).alias("text_dedup"),
    )
    totals = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_paras",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )
