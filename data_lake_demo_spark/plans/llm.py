"""LLM-data-pipeline queries over ``documents`` and ``embeddings``
(SURVEY.md §2.13): dedup ladder, similarity search, text analysis.

SQL-expressible ops carry a DuckDB oracle; LSH/MinHash ops are
rows-only checked (driver's weaker check) because their hash families
are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_demo_spark.functions.vector import cosine, quantize, to_double_array
from data_lake_demo_spark.functions.vector_expand import cosine_cols_sql

# the fixture embeddings are 64-dimensional throughout; the wrappers
# bake the dim (like the centroid literals) so per-pair cosines can
# run as expanded codegen'd arithmetic instead of interpreted folds
# (r11 optimization — bit-identical, see functions/vector_expand)
_EMB_DIM = 64


def _cos64(a: str, b: str) -> F.Column:
    return F.expr(cosine_cols_sql(a, b, _EMB_DIM))
from data_lake_demo_spark.operators.dedup import (
    connected_components,
    connected_components_bigstar,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash_dedup,
    spread_small_input,
    tokens,
    winnow_fingerprints,
)
from data_lake_demo_spark.operators.bm25 import bm25_oracle_sql, bm25_topk
from data_lake_demo_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
)
from data_lake_demo_spark.operators.corpus import (
    chunk_documents,
    contamination_report,
    pack_sequences,
    quality_filter_funnel,
    sample_threshold_hex,
    split_assign,
    split_thresholds,
    stratified_sample,
    token_budget_mix,
)
from data_lake_demo_spark.operators.lmquality import (
    bigram_lm_oracle_sql,
    bigram_lm_scores,
    dsir_oracle_sql,
    dsir_weights,
)
from data_lake_demo_spark.operators.textops import (
    LANG_MARKERS,
    fingerprint,
    language_id,
    quality_features,
    word_tokens_bpe_ish,
)
from data_lake_demo_spark.sources.testdata import load_table


# --------------------------------------------------------------------------
# Dedup (oracle-checked where exact)
# --------------------------------------------------------------------------


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).orderBy("keep_id")


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


def doc_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidates (rows-only check)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs).orderBy("id_a", "id_b")


def doc_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint buckets (rows-only check)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        simhash_dedup(docs)
        .select("fp", "n_docs", "keep_id")
        .orderBy("fp")
    )


def doc_simhash_buckets_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint buckets with the portable (md5-derived,
    28-bit) hash family: every stage — per-token hash, per-bit
    majority vote, weighted fingerprint assembly, bucket aggregation —
    value-hashes against the DuckDB twin. The 64-bit xxhash64
    production variant stays rows-only beside it."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        simhash_dedup(docs, bits=28, base_hash="md5fold")
        .select("fp", "n_docs", "keep_id")
        .orderBy("fp")
    )


def _simhash_portable_oracle(bits: int = 28) -> str:
    from data_lake_demo_spark.operators.dedup import md5fold_oracle_expr

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents),
h AS (SELECT doc_id, {md5fold_oracle_expr('tok')} AS h FROM toks),
bs AS (
  SELECT doc_id, b.b AS b, sum((h >> b.b) & 1) AS s1, count(*) AS n
  FROM h CROSS JOIN (SELECT unnest(range(0, {bits})) AS b) b
  GROUP BY doc_id, b.b),
fps AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s1 * 2 > n
                       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
              AS BIGINT) AS fp
  FROM bs GROUP BY doc_id)
SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
FROM fps GROUP BY fp ORDER BY fp
"""


def doc_minhash_dups_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME banded MinHash-LSH pipeline as doc_minhash_near_dups,
    run with the portable (md5-derived) hash family so the whole
    thing — 64-permutation family, 16-band bucketing, candidate join,
    Jaccard estimator — value-hashes against a DuckDB twin. The
    xxhash64 production variant stays rows-only beside it; a green
    row here certifies the pipeline's ALGEBRA (the round-4
    degenerate-family postmortem is exactly the bug class this
    catches: an un-modded affine family passed rows-only checks while
    silently estimating from one sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, shingle_n=3, min_jaccard=0.5, portable=True
    ).orderBy("id_a", "id_b")


def _minhash_portable_oracle(
    *,
    num_hashes: int = 64,
    bands: int = 16,
    min_jaccard: float = 0.5,
    max_bucket: int = 256,
) -> str:
    from data_lake_demo_spark.operators.dedup import (
        _MERSENNE_P,
        _affine_params,
        md5fold_oracle_expr,
    )

    values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_affine_params(num_hashes))
    )
    rpb = num_hashes // bands
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
         ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                             FOR i IN range(1, len(t) - 1)])
    END) AS s
  FROM toks),
h AS (SELECT doc_id, {md5fold_oracle_expr('s')} AS h FROM sh),
mins AS (
  SELECT doc_id, p.i AS i, min((h * p.a + p.b) % {_MERSENNE_P}) AS m
  FROM h CROSS JOIN (VALUES {values}) p(i, a, b)
  GROUP BY doc_id, p.i),
sigs AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mins GROUP BY doc_id),
bnd AS (
  SELECT doc_id, i // {rpb} AS band_id,
         md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bh
  FROM mins GROUP BY doc_id, i // {rpb}
  QUALIFY count(*) OVER (PARTITION BY band_id, bh) <= {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bnd a JOIN bnd b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
est AS (
  SELECT id_a, id_b,
         len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))
           / CAST({num_hashes} AS DOUBLE) AS est_jaccard
  FROM cand
  JOIN sigs sa ON sa.doc_id = id_a
  JOIN sigs sb ON sb.doc_id = id_b)
SELECT id_a, id_b, est_jaccard FROM est
WHERE est_jaccard >= {min_jaccard} ORDER BY id_a, id_b
"""


def doc_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-then-verify: MinHash-LSH candidates re-scored with
    exact 3-gram Jaccard, keeping pairs at >= 0.4.

    Candidates are generated over the SAME 3-gram shingles the verify
    tier scores (a 5-gram candidate pass under-recalls pairs whose
    3-gram overlap clears the cut), with the estimated-Jaccard
    pre-filter relaxed to 0.3 — the exact verify does the real
    filtering, so the pre-filter is purely a cost knob. The oracle is
    the exact all-pairs computation, so a green row certifies LSH
    recall at this threshold, not just pair arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs, shingle_n=3, min_jaccard=0.3)
    return (
        ngram_jaccard_pairs(docs, cands)
        .filter(F.col("jaccard") >= 0.4)
        .orderBy("id_a", "id_b")
    )


NGRAM_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
         ELSE list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)])
    END AS g
  FROM toks),
scored AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.g, b.g)) * 1.0
           / len(list_distinct(list_concat(a.g, b.g))) AS jaccard
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.4 ORDER BY id_a, id_b
"""


def doc_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL of banded MinHash-LSH candidate generation against the
    exact 3-gram Jaccard truth set at J ≥ 0.5 — the dedup-family twin
    of emb_ann_recall_at_k: probabilistic tiers should carry a
    measured, hash-checked quality number, not a hope (the round-4
    degenerate-family postmortem is exactly what this query would
    have caught as a recall collapse). Truth is computed EXACTLY via
    a shared-gram inverted-index join (a pair with J > 0 must share a
    gram, so the all-pairs work is bounded by gram co-occurrence, not
    n²) with PREFIX FILTERING (operators/dedup.exact_jaccard_join —
    the 10x corpus exposed a corpus-wide shared gram that blew the
    naive shared-gram join to ~110 s; prefix filtering bounds every
    join bucket by gram rarity with zero recall loss); candidates are
    the portable-LSH banding with no estimator filter, so the number
    is the BANDING's recall. One output row:
    (n_truth, n_cand, n_hit, recall_q)."""
    from data_lake_demo_spark.operators.dedup import (
        exact_jaccard_join,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = (
        exact_jaccard_join(docs, threshold=0.5, n=3)
        .select("id_a", "id_b")
        .cache()
    )
    cand = (
        minhash_lsh_candidates(
            docs, shingle_n=3, min_jaccard=0.0, portable=True
        )
        .select("id_a", "id_b")
        .cache()
    )
    hit = truth.join(cand, ["id_a", "id_b"], "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_truth",
            "n_cand",
            "n_hit",
            (
                F.floor(
                    F.col("n_hit") / F.col("n_truth").cast("double") * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("recall_q"),
        )
    )


def _lsh_recall_oracle(
    *,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 256,
    threshold: float = 0.5,
) -> str:
    """DuckDB replica: exact shared-gram truth tier + the portable
    banding CTEs (lockstep with _minhash_portable_oracle), joined into
    the single recall row."""
    from data_lake_demo_spark.operators.dedup import (
        _MERSENNE_P,
        _affine_params,
        md5fold_oracle_expr,
    )

    values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_affine_params(num_hashes))
    )
    rpb = num_hashes // bands
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
         ELSE list_distinct([array_to_string(t[i:i+2], ' ')
                             FOR i IN range(1, len(t) - 1)])
    END AS g
  FROM toks),
ex AS (SELECT doc_id AS id, unnest(g) AS gram FROM grams),
sizes AS (SELECT doc_id AS id, len(g) AS sz FROM grams),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.id < b.id
  GROUP BY a.id, b.id),
truth AS (
  SELECT id_a, id_b FROM pairs
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {threshold}),
sh AS (SELECT doc_id, unnest(g) AS s FROM grams),
h AS (SELECT doc_id, {md5fold_oracle_expr('s')} AS h FROM sh),
mins AS (
  SELECT doc_id, p.i AS i, min((h * p.a + p.b) % {_MERSENNE_P}) AS m
  FROM h CROSS JOIN (VALUES {values}) p(i, a, b)
  GROUP BY doc_id, p.i),
bnd AS (
  SELECT doc_id, i // {rpb} AS band_id,
         md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY i)) AS bh
  FROM mins GROUP BY doc_id, i // {rpb}
  QUALIFY count(*) OVER (PARTITION BY band_id, bh) <= {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bnd a JOIN bnd b
    ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
agg AS (
  SELECT (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cand) AS n_cand,
         (SELECT count(*) FROM truth t
          WHERE EXISTS (SELECT 1 FROM cand c
                        WHERE c.id_a = t.id_a AND c.id_b = t.id_b)) AS n_hit)
SELECT n_truth, n_cand, n_hit,
       floor(n_hit / CAST(n_truth AS DOUBLE) * CAST(1000000 AS DOUBLE) + 0.5)
         / CAST(1000000 AS DOUBLE) AS recall_q
FROM agg
"""


def doc_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: connected components over a deterministic
    similarity graph → one (doc_id, component) row per document, with
    component = the keep-representative (min reachable id).

    The graph here connects documents sharing EITHER an md5-prefix or
    an md5-suffix bucket — deterministic on both engines, with real
    transitive chaining (a doc can bridge two buckets), so the oracle
    (a recursive CTE computing the same closure) genuinely exercises
    the iterative propagation. In production the edge list would be
    ``minhash_lsh_candidates`` + Jaccard verification instead; the CC
    step is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(_md5_bucket_edges(docs))
    return _label_all_docs(docs, comp)


def doc_dedup_components_bigstar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same similarity-graph closure as ``doc_dedup_components`` but
    via large-star/small-star contraction (operators/dedup.py
    connected_components_bigstar) — the O(log² n)-round scale path for
    graphs whose diameter is NOT small (chains, web graphs). Shares
    the recursive-CTE oracle with the min-label variant: the driver
    proves both algorithms produce the identical closure.
    """
    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components_bigstar(_md5_bucket_edges(docs))
    return _label_all_docs(docs, comp)


def _md5_bucket_edges(docs: DataFrame) -> DataFrame:
    """Deterministic doc similarity edges: share an md5 prefix OR
    suffix bucket (transitively chaining — see doc_dedup_components)."""
    keyed = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("text").cast("binary")), 1, 4).alias("k_pre"),
        F.substring(F.md5(F.col("text").cast("binary")), 29, 4).alias("k_suf"),
    )

    def bucket_pairs(col: str) -> DataFrame:
        a = keyed.select(F.col("doc_id").alias("id_a"), F.col(col).alias("k"))
        b = keyed.select(F.col("doc_id").alias("id_b"), F.col(col).alias("k"))
        return a.join(b, "k").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b"
        )

    return bucket_pairs("k_pre").union(bucket_pairs("k_suf")).distinct()


def _label_all_docs(docs: DataFrame, comp: DataFrame) -> DataFrame:
    # singletons (no edges) are their own component
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
        .orderBy("doc_id")
    )


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE
 keyed AS (
   SELECT doc_id, substr(md5(text), 1, 4) AS k_pre,
          substr(md5(text), 29, 4) AS k_suf
   FROM documents),
 edges AS (
   SELECT a.doc_id AS id_a, b.doc_id AS id_b
   FROM keyed a JOIN keyed b ON a.k_pre = b.k_pre AND a.doc_id < b.doc_id
   UNION
   SELECT a.doc_id, b.doc_id
   FROM keyed a JOIN keyed b ON a.k_suf = b.k_suf AND a.doc_id < b.doc_id),
 sym AS (
   SELECT id_a AS u, id_b AS v FROM edges
   UNION
   SELECT id_b, id_a FROM edges),
 reach(u, lbl) AS (
   SELECT doc_id, doc_id FROM documents
   UNION
   SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.u)
SELECT u AS doc_id, min(lbl) AS component
FROM reach GROUP BY u ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Text analysis (oracle-checked)
# --------------------------------------------------------------------------


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats: docs, whitespace tokens, avg chars."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .orderBy("lang")
    )


TOKEN_STATS_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
         AS total_tokens,
       avg(n_chars) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length/whitespace/token ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_chars_m", "n_tokens", "n_spaces", "avg_token_len", "ws_ratio"
    ).orderBy("doc_id")


QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars_m,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) - length(replace(text, ' ', '')) AS n_spaces,
       CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
         / len(regexp_split_to_array(trim(text), '\\s+')) AS avg_token_len,
       CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
         / length(text) AS ws_ratio
FROM documents ORDER BY doc_id
"""


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family):
    fraction of all word 2-grams taken by the most repeated 2-gram,
    plus unique-token fraction. High top-2-gram fraction / low unique
    fraction flags boilerplate and degenerate repetition.

    Scale shape: one explode + two keyed aggregations on (doc_id,
    gram) — map-side combinable; the unique-token fraction is a pure
    array expression (no shuffle at all).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    uniq = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("uniq_token_frac"),
    )
    grams = docs.withColumn("__toks", tokens("text")).select(
        "doc_id", F.explode(shingles(F.col("__toks"), 2)).alias("g")
    )
    counts = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("n"))
    rep = counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_2grams"), F.max("n").alias("top_2gram_n")
    )
    return (
        rep.join(uniq, "doc_id")
        .select(
            "doc_id",
            "n_2grams",
            "top_2gram_n",
            (F.col("top_2gram_n") / F.col("n_2grams")).alias("top_2gram_frac"),
            "uniq_token_frac",
        )
        .orderBy("doc_id")
    )


REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
 grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i + 1]) END) AS g
  FROM toks),
 counts AS (SELECT doc_id, g, count(*) AS n FROM grams GROUP BY 1, 2),
 rep AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_2grams,
         CAST(max(n) AS BIGINT) AS top_2gram_n
  FROM counts GROUP BY 1),
 uq AS (
  SELECT doc_id, CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
           AS uniq_token_frac
  FROM toks)
SELECT r.doc_id, n_2grams, top_2gram_n,
       CAST(top_2gram_n AS DOUBLE) / n_2grams AS top_2gram_frac,
       uniq_token_frac
FROM rep r JOIN uq USING (doc_id) ORDER BY doc_id
"""


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: fixed-width histogram over document
    character counts (the pre-tokenization length screen every
    training pipeline applies). One partial+final aggregation on the
    bucket id — no shuffle of document text."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("n_chars") / 100).cast("long")
    return (
        docs.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("len_bucket")
    )


LENGTH_HIST_SQL = """
SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY 1 ORDER BY len_bucket
"""


def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex sub-token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(word_tokens_bpe_ish(F.col("text"))).cast("long").alias("n_subtokens"),
    ).orderBy("doc_id")


BPE_COUNT_SQL = r"""
SELECT doc_id,
       len(list_filter(
           regexp_split_to_array(
               regexp_replace(text, '([^a-zA-Z0-9\s])', ' \1 ', 'g'), '\s+'),
           x -> x != '')) AS n_subtokens
FROM documents ORDER BY doc_id
"""


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID vs the labeled lang (confusion counts)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        language_id(docs)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_guess")
    )


def _lang_case_sql() -> str:
    """The DuckDB CASE expression mirroring operators.textops
    .language_id exactly (same marker order, same arithmetic) —
    shared by the lang-id confusion and tokenizer-fertility oracles."""

    def score(markers: list[str]) -> str:
        padded = "concat(' ', text, ' ')"
        parts = [
            f"(length({padded}) - length(replace({padded}, '{m}', ' '))) / {float(len(m) - 1)}"
            for m in markers
        ]
        return f"(({' + '.join(parts)}) / length({padded}))"

    scores = {lang: score(m) for lang, m in LANG_MARKERS.items()}
    whens = []
    for lang in LANG_MARKERS:
        conds = [
            f"{scores[lang]} > {scores[other]}" for other in LANG_MARKERS if other != lang
        ]
        conds.append(f"{scores[lang]} > 0")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'unk' END"


def _lang_id_oracle() -> str:
    return f"""
SELECT lang, {_lang_case_sql()} AS lang_guess, count(*) AS n
FROM documents GROUP BY 1, 2 ORDER BY lang, lang_guess
"""


def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per detected language — subword units per
    whitespace word, the standard multilingual tokenizer-efficiency
    report (a language whose fertility is 2× pays 2× the context
    budget). Subword units are the fixed-width greedy-merge proxy
    (operators/textops.subword_count: ceil(len/4) per word — a BPE
    with every merge up to length 4); language is the marker-density
    heuristic. All integer sums (zero float accumulation), one
    groupBy; the per-language ratio is quantized at the end."""
    from data_lake_demo_spark.operators.textops import subword_count

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return (
        language_id(docs)
        .select(
            "lang_guess",
            toks.alias("t"),
            subword_count(F.col("text")).alias("s"),
        )
        .groupBy("lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("tokens"),
            F.sum("s").alias("subwords"),
        )
        .withColumn(
            "fertility",
            F.floor(F.col("subwords") / F.col("tokens") * 1000000 + F.lit(0.5))
            / 1000000.0,
        )
        .orderBy("lang_guess")
    )


def _fertility_oracle() -> str:
    return rf"""
WITH d AS (
  SELECT {_lang_case_sql()} AS lang_guess,
         len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS t,
         list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                 w -> ceil(length(w) / 4.0)))::BIGINT AS s
  FROM documents)
SELECT lang_guess, count(*) AS n_docs, sum(t)::BIGINT AS tokens, sum(s)::BIGINT AS subwords,
       floor(sum(s)::DOUBLE / sum(t) * 1000000 + 0.5) / 1000000 AS fertility
FROM d GROUP BY 1 ORDER BY lang_guess
"""


def doc_source_quality_eb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed per-source quality — the curation rule
    for many small sources: a source's mean quality score shrinks
    toward the corpus mean with pseudo-count strength k=20, so a
    5-document source can't win (or lose) the mix on noise. The
    per-doc score (average token length) is fixed-point quantized to
    an INTEGER before any aggregation, so every sum is exact integer
    arithmetic and the value hash is immune to float summation order —
    the one float division per group is deterministic. Corpus totals
    ride in as a broadcast single-row crossJoin."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    nonspace = F.length(F.regexp_replace("text", " ", ""))
    q = F.floor((nonspace / toks) * 1000000 + F.lit(0.5)).cast("long")
    per = docs.select("source", q.alias("q"))
    gstats = per.agg(F.sum("q").alias("gq"), F.count(F.lit(1)).alias("gn"))
    return (
        per.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("q").alias("sq"))
        .crossJoin(F.broadcast(gstats))
        .withColumn(
            "mean_q",
            F.floor(F.col("sq") / F.col("n_docs") + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "smoothed_q",
            F.floor(
                (F.col("sq") + F.lit(20) * (F.col("gq") / F.col("gn")))
                / (F.col("n_docs") + F.lit(20))
                + F.lit(0.5)
            ).cast("long"),
        )
        .select("source", "n_docs", "mean_q", "smoothed_q")
        .orderBy("source")
    )


DOC_SOURCE_QUALITY_EB_SQL = r"""
WITH per AS (
  SELECT source,
         floor(length(replace(text, ' ', ''))::DOUBLE
               / len(regexp_split_to_array(trim(text), '\s+')) * 1000000 + 0.5)::BIGINT AS q
  FROM documents),
g AS (SELECT sum(q)::BIGINT AS gq, count(*)::BIGINT AS gn FROM per)
SELECT source, count(*) AS n_docs,
       floor(sum(q)::DOUBLE / count(*) + 0.5)::BIGINT AS mean_q,
       floor((sum(q) + 20 * (gq::DOUBLE / gn)) / (count(*) + 20) + 0.5)::BIGINT AS smoothed_q
FROM per, g GROUP BY source, gq, gn ORDER BY source
"""


def doc_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints shared across documents — the
    substring-level overlap report (operators/dedup.py
    winnow_fingerprints). Fingerprinting is zero-shuffle map work;
    only (doc_id, md5) pairs reach the groupBy. Oracle recomputes the
    same k=5/w=8 winnowing with DuckDB list lambdas."""
    docs = load_table(spark, sf_dir, "documents")
    fp = winnow_fingerprints(spread_small_input(docs, "doc_id"))
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("fp")
    )


WINNOW_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) - 4 <= 0 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks) - 3),
                     i -> array_to_string(toks[i:i+4], ' ')) END AS grams
  FROM t),
h AS (SELECT doc_id, list_transform(grams, x -> md5(x)) AS gh FROM g),
f AS (
  SELECT doc_id,
         CASE WHEN len(gh) < 8 THEN [list_min(gh)]
              ELSE list_transform(range(1, len(gh) - 6),
                     j -> list_min(gh[j:j+7])) END AS fps
  FROM h),
e AS (SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM f)
SELECT fp, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM e GROUP BY fp HAVING count(*) >= 2 ORDER BY fp
"""


def doc_fingerprint_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint prefix buckets (cheap pre-clustering)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        fingerprint(docs)
        .groupBy("fp_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("fp_bucket")
    )


FINGERPRINT_SQL = """
SELECT substr(md5(text), 1, 4) AS fp_bucket,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1 ORDER BY fp_bucket
"""


# --------------------------------------------------------------------------
# Similarity search (brute-force oracle-checked; LSH rows-only)
# --------------------------------------------------------------------------

COS_Q = 1_000_000


def emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per embedding, fixed-point quantized for parity."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    norm_sq = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        "label",
        quantize(F.sqrt(norm_sq), COS_Q).alias("l2_norm"),
    ).orderBy("vec_id")


EMB_NORMS_SQL = f"""
SELECT vec_id, label,
       floor(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * {COS_Q} + 0.5) / {COS_Q}
         AS l2_norm
FROM embeddings ORDER BY vec_id
"""


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 10 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5).orderBy("qid", "rk")


KNN_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings),
     scored AS (
       SELECT qid, nid,
              floor((list_sum(list_transform(list_zip(qe, ne),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(ne, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
                    * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
       FROM c CROSS JOIN q WHERE nid <> qid)
SELECT qid, nid, cos_sim, rk FROM (
  SELECT qid, nid, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM scored) t
WHERE rk <= 5 ORDER BY qid, rk
"""


def emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (operators/mmr.mmr_rerank): exact
    cosine top-10 pool per query, then 4 greedy MMR picks at
    lam=0.7 — the RAG diversity stage. The greedy loop is unrolled
    pure-JVM algebra (qid-keyed joins + window argmax on quantized
    scores), so the FULL selection value-hashes: the oracle
    precomputes the pool's pairwise sims and replays all four rounds
    with the identical double arithmetic (mu is computed as
    1.0 - 0.7 in double on BOTH sides — the literal 0.3 is a
    different IEEE754 value)."""
    from data_lake_demo_spark.operators.mmr import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    c = emb.select(
        F.col("vec_id").alias("nid"),
        to_double_array(F.col("embedding")).alias("nvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            "nvec",
            quantize(cosine(F.col("qvec"), F.col("nvec"))).alias("rel"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("nid"))
    pool = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    # NOTE(r11): the expanded-arithmetic cosine was tried here and in
    # the greedy rounds (dim=_EMB_DIM) and measured WORSE (3.1 s →
    # 5-8 s interleaved A/B): the unrolled k-round lineage embeds the
    # ~200-term expression into many per-round plans and the fused
    # stages lose whole-stage codegen. The fold stays.
    return mmr_rerank(pool, k=4, lam=0.7).orderBy("qid", "pick_rank")


_COS_Q_SQL = (
    "floor((list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"
    " * CAST(1000000 AS DOUBLE) + 0.5) / CAST(1000000 AS DOUBLE)"
)


def _mmr_rounds_sql(*, k: int) -> tuple[str, str]:
    """The unrolled greedy rounds as (CTE fragments, final UNION) —
    assumes CTEs ``pool`` (qid, nid, rel), ``pv`` (qid, nid, rel, v)
    and ``psim`` (qid, a, b, sim) are already defined. LAM/MU are the
    exact double expressions the operator uses (1 - 0.7 computed in
    double — the literal 0.3 is a different IEEE754 value)."""
    lam = "CAST(0.7 AS DOUBLE)"
    mu = "(CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))"

    def mmr_q(rel, max_sim):
        return (
            f"floor(({lam} * {rel} - {mu} * {max_sim})"
            " * CAST(1000000 AS DOUBLE) + 0.5) / CAST(1000000 AS DOUBLE)"
        )

    ctes = [
        """p1 AS (
  SELECT qid, nid, rel AS mmr_score FROM (
    SELECT qid, nid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
    FROM pool) WHERE rn = 1)"""
    ]
    for i in range(2, k + 1):
        prior = list(range(1, i))
        anti = "\n  ".join(
            f"JOIN p{j} ON pv.qid = p{j}.qid AND pv.nid <> p{j}.nid"
            for j in prior
        )
        sims = "\n  ".join(
            f"JOIN psim s{j}p ON s{j}p.qid = pv.qid AND s{j}p.a = pv.nid"
            f" AND s{j}p.b = p{j}.nid"
            for j in prior
        )
        mx = (
            f"s{prior[0]}p.sim"
            if len(prior) == 1
            else "greatest(" + ", ".join(f"s{j}p.sim" for j in prior) + ")"
        )
        ctes.append(
            f"""s{i} AS (
  SELECT pv.qid, pv.nid, pv.rel, {mx} AS max_sim
  FROM pv
  {anti}
  {sims})"""
        )
        ctes.append(
            f"""p{i} AS (
  SELECT qid, nid, score AS mmr_score FROM (
    SELECT qid, nid, {mmr_q("rel", "max_sim")} AS score,
           row_number() OVER (PARTITION BY qid
             ORDER BY {mmr_q("rel", "max_sim")} DESC, nid) AS rn
    FROM s{i}) WHERE rn = 1)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT qid, {i} AS pick_rank, nid, mmr_score FROM p{i}"
        for i in range(1, k + 1)
    )
    return ",\n".join(ctes), union


def _mmr_oracle(*, n_q: int = 5, pool_n: int = 10, k: int = 4) -> str:
    """DuckDB replica of the unrolled MMR selection. Pairwise pool
    sims are precomputed once (psim); each round joins the prior
    picks and takes greatest() of their quantized sims — the same
    values Spark's max-aggregate folds."""
    rounds, union = _mmr_rounds_sql(k=k)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {n_q}),
c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings),
scored AS (
  SELECT qid, nid, {_COS_Q_SQL.format(a="qe", b="ne")} AS rel
  FROM c CROSS JOIN q WHERE nid <> qid),
pool AS (
  SELECT qid, nid, rel FROM (
    SELECT qid, nid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rk
    FROM scored) WHERE rk <= {pool_n}),
pv AS (SELECT pool.qid, pool.nid, pool.rel, c.ne AS v
       FROM pool JOIN c ON c.nid = pool.nid),
psim AS (
  SELECT a.qid, a.nid AS a, b.nid AS b,
         {_COS_Q_SQL.format(a="a.v", b="b.v")} AS sim
  FROM pv a JOIN pv b ON a.qid = b.qid AND a.nid <> b.nid),
{rounds}
{union}
ORDER BY qid, pick_rank
"""


def doc_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval pipeline in ONE plan — the shape a
    production retriever runs per query batch: (1) quality gate the
    passage corpus (n_chars >= 200 here — stand-in for the model
    quality scores the engine also provides), (2) join passages to
    their embeddings, (3) exact cosine retrieval of a top-10
    candidate pool per query, (4) MMR diversification to the final 3
    (operators/mmr.mmr_rerank), (5) join the answer snippets back.
    Every stage is existing oracle-proven machinery composed — and
    the composition itself value-hashes end-to-end, so a regression
    at any seam (gate, join, ranking, diversification, rehydration)
    flips the hash."""
    from data_lake_demo_spark.operators.mmr import mmr_rerank

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = (
        emb.join(docs, emb.vec_id == docs.doc_id)
        .filter(F.col("n_chars") >= 200)
        .select(
            F.col("vec_id").alias("nid"),
            to_double_array(F.col("embedding")).alias("nvec"),
        )
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            "nvec",
            quantize(cosine(F.col("qvec"), F.col("nvec"))).alias("rel"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("nid"))
    pool = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    picks = mmr_rerank(pool, k=3, lam=0.7)  # fold cosine: see emb_mmr_rerank
    return (
        picks.join(
            docs.select(
                F.col("doc_id").alias("nid"),
                F.substring("text", 1, 40).alias("snippet"),
            ),
            "nid",
        )
        .select("qid", "pick_rank", "nid", "mmr_score", "snippet")
        .orderBy("qid", "pick_rank")
    )


def _rag_pipeline_oracle(*, n_q: int = 5, pool_n: int = 10, k: int = 3) -> str:
    """DuckDB replica of the composed RAG pipeline: the MMR rounds
    generator over a quality-gated passage corpus, wrapped with the
    snippet rehydration join."""
    rounds, union = _mmr_rounds_sql(k=k)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {n_q}),
c AS (SELECT vec_id AS nid, embedding AS ne
      FROM embeddings JOIN documents ON doc_id = vec_id
      WHERE n_chars >= 200),
scored AS (
  SELECT qid, nid, {_COS_Q_SQL.format(a="qe", b="ne")} AS rel
  FROM c CROSS JOIN q WHERE nid <> qid),
pool AS (
  SELECT qid, nid, rel FROM (
    SELECT qid, nid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rk
    FROM scored) WHERE rk <= {pool_n}),
pv AS (SELECT pool.qid, pool.nid, pool.rel, c.ne AS v
       FROM pool JOIN c ON c.nid = pool.nid),
psim AS (
  SELECT a.qid, a.nid AS a, b.nid AS b,
         {_COS_Q_SQL.format(a="a.v", b="b.v")} AS sim
  FROM pv a JOIN pv b ON a.qid = b.qid AND a.nid <> b.nid),
{rounds},
picks AS (
{union})
SELECT p.qid, p.pick_rank, p.nid, p.mmr_score,
       substr(d.text, 1, 40) AS snippet
FROM picks p JOIN documents d ON d.doc_id = p.nid
ORDER BY qid, pick_rank
"""


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for dense-retrieval training (operators/
    similarity.hard_negative_mining — the DPR/ANCE index-mined
    negatives): for the first 8 vectors, the cosine rank band (3, 10]
    — confusable-but-not-top neighbors. Full oracle: the scorer is
    the exact brute-force ranker."""
    from data_lake_demo_spark.operators.similarity import (
        hard_negative_mining,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return hard_negative_mining(emb, queries, k_pos=3, k_neg=10).orderBy(
        "qid", "rk"
    )


HARD_NEGATIVES_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
     c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings),
     scored AS (
       SELECT qid, nid,
              floor((list_sum(list_transform(list_zip(qe, ne),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(ne, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
                    * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
       FROM c CROSS JOIN q WHERE nid <> qid)
SELECT qid, nid, cos_sim, rk FROM (
  SELECT qid, nid, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM scored) t
WHERE rk > 3 AND rk <= 10 ORDER BY qid, rk
"""


def doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source rebalancing (operators/corpus.
    temperature_mix — the mT5/XLM-R n^alpha sampling rule): per-source
    quotas derived from corpus counts at alpha=0.3, documents elected
    deterministically. Fixed-point weights keep the whole derivation
    value-hash oracle-able."""
    from data_lake_demo_spark.operators.corpus import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    return temperature_mix(docs, alpha=0.3, n_target=200).orderBy("source")


TEMPERATURE_MIX_SQL = """
WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
        CAST(floor(pow(CAST(n_docs AS DOUBLE), CAST(0.3 AS DOUBLE))
                   * 1000000 + 0.5) AS BIGINT) AS w_q
      FROM counts),
tot AS (SELECT CAST(SUM(w_q) AS BIGINT) AS tot_w FROM w),
q AS (SELECT source, n_docs, w_q,
        CAST((CAST(200 AS BIGINT) * w_q) // tot_w AS BIGINT) AS quota
      FROM w, tot),
el AS (
  SELECT d.source,
         row_number() OVER (PARTITION BY d.source
           ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents d),
samp AS (
  SELECT el.source, count(*) AS n_sampled
  FROM el JOIN q USING (source) WHERE rn <= quota GROUP BY el.source)
SELECT q.source, CAST(q.n_docs AS BIGINT) AS n_docs, q.w_q, q.quota,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM q LEFT JOIN samp s USING (source) ORDER BY source
"""


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization roundtrip audit: quantize every
    embedding (operators/quantize.py), dequantize, and report per-label
    reconstruction stats. Pure map + one groupBy(label) — no shuffle of
    vectors beyond the label agg, no driver state; the per-row max-abs
    error is fixed-point quantized (1e-6) and summed as BIGINT per the
    parity rule (never sum raw doubles)."""
    from data_lake_demo_spark.operators.quantize import (
        quantize_int8,
        reconstruction_error,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qd = quantize_int8(emb)
    per_row = qd.select(
        "label",
        F.floor(reconstruction_error(qd) * COS_Q + F.lit(0.5))
        .cast("long")
        .alias("err_q"),
        F.array_max(F.transform(F.col("q"), lambda e: F.abs(e.cast("long")))).alias(
            "q_mag"
        ),
    )
    return (
        per_row.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_q").alias("sum_maxerr_q"),
            F.max("q_mag").alias("max_q_mag"),
        )
        .orderBy("label")
    )


EMB_QUANTIZE_SQL = f"""
WITH s AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
           AS scale
  FROM embeddings
), e AS (
  SELECT label,
         CASE WHEN scale > 0 THEN
           list_max(list_transform(v,
             x -> abs(x - floor(x / scale + 0.5) * scale)))
         ELSE 0.0 END AS max_err,
         CASE WHEN scale > 0 THEN
           list_max(list_transform(v,
             x -> CAST(abs(floor(x / scale + 0.5)) AS BIGINT)))
         ELSE 0 END AS q_mag
  FROM s
)
SELECT label, count(*) AS n_vecs,
       CAST(sum(CAST(floor(max_err * {COS_Q} + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_maxerr_q,
       CAST(max(q_mag) AS BIGINT) AS max_q_mag
FROM e GROUP BY label ORDER BY label
"""


def emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5. Oracle-checked like
    emb_near_dups: the sign-LSH hyperplane family is literal data, so
    the oracle replicates the same buckets, candidate join, quantized
    cosine, and top-k window in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(emb, queries, k=5).orderBy("qid", "rk")


def _lsh_ann_ctes(k: int) -> str:
    """Shared CTE block replicating lsh_ann_topk(n_planes=8, seed=42)
    down to the top-``k`` window — reused by the plain ANN oracle and
    the retrieval-join composition."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 8, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 10),
scored AS (
  SELECT qid, c.vec_id AS nid,
         floor(({_duck_dot('qv', 'c.v')}
            / (sqrt({_duck_dot('qv', 'qv')}) * sqrt({_duck_dot('c.v', 'c.v')})))
           * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
  FROM b c JOIN q USING (bucket) WHERE c.vec_id <> qid),
topk AS (
  SELECT qid, nid, cos_sim, rk FROM (
    SELECT qid, nid, cos_sim,
           row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
    FROM scored) t
  WHERE rk <= {k})"""


def _lsh_ann_oracle() -> str:
    return _lsh_ann_ctes(5) + "\nSELECT * FROM topk ORDER BY qid, rk"


def emb_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality as a first-class query: recall@5 of the
    SQ8 compressed scan against exact brute force, per query vector —
    the evaluation loop a production ANN deployment runs continuously
    ("measure, don't guess"; recall floors elsewhere live only in
    pytest). Both sides are already-oracle-proven stages (the
    portable SQ8 pipeline and the exact-cosine top-k), so the recall
    numbers themselves carry a full value-hash oracle. At scale the
    exact side is the expensive one — you run it on a sampled query
    set exactly like this (10 probes here). The fixture's LSH
    single-bucket recall is ~0 by construction (near-orthogonal
    synthetic vectors share no sign-bucket); the SQ8 byte grid keeps
    8 bits/dimension, so ITS recall quantifies pure quantization
    loss — the number a capacity-planning decision actually needs."""
    from data_lake_demo_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).select("qid", "nid")
    approx = _portable_sq_topk(emb, queries, k=5).select(
        "qid", F.col("nid").alias("anid")
    )
    joined = exact.join(
        approx,
        (exact.qid == approx.qid) & (exact.nid == approx.anid),
        "left",
    ).select(exact.qid, exact.nid, approx.anid)
    return (
        joined.groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("anid").alias("n_hits"),
        )
        .select(
            "qid",
            "n_exact",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_exact")).alias(
                "recall"
            ),
        )
        .orderBy("qid")
    )


def _ann_recall_oracle() -> str:
    return (
        _sq_portable_ctes()
        + f""",
approx AS (SELECT qid, nid FROM ranked WHERE rk <= 5),
exscored AS (
  SELECT q.qid, c.vec_id AS nid,
         floor(({_duck_dot('qv', 'c.v')}
            / (sqrt({_duck_dot('qv', 'qv')}) * sqrt({_duck_dot('c.v', 'c.v')})))
           * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
  FROM (SELECT vec_id, v FROM base) c
  CROSS JOIN (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 10) q
  WHERE c.vec_id <> q.qid),
ex AS (
  SELECT qid, nid FROM (
    SELECT qid, nid,
           row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
    FROM exscored) t
  WHERE rk <= 5),
hits AS (
  SELECT ex.qid, ex.nid, a.nid AS anid
  FROM ex LEFT JOIN approx a ON ex.qid = a.qid AND ex.nid = a.nid)
SELECT qid, count(*) AS n_exact, count(anid) AS n_hits,
       CAST(count(anid) AS DOUBLE) / count(*) AS recall
FROM hits GROUP BY qid ORDER BY qid
"""
    )


def emb_lsh_multiprobe_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): each query also probes
    its n_planes Hamming-1 neighbor buckets, recovering near-misses
    that flipped one hyperplane sign — candidate set is a strict
    superset of emb_lsh_ann's, so recall can only improve, at
    (n_planes+1)× probe rows on the TINY query side only. The probe
    arithmetic is literal (bucket XOR 2^i), so the FULL pipeline
    value-hashes like the single-probe variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(emb, queries, k=5, multi_probe=True).orderBy(
        "qid", "rk"
    )


def _lsh_multiprobe_oracle(n_planes: int = 8, k: int = 5) -> str:
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, n_planes, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q0 AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 10),
q AS (SELECT qid, qv, unnest([{probes}]) AS bucket FROM q0),
scored AS (
  SELECT qid, c.vec_id AS nid,
         floor(({_duck_dot('qv', 'c.v')}
            / (sqrt({_duck_dot('qv', 'qv')}) * sqrt({_duck_dot('c.v', 'c.v')})))
           * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
  FROM b c JOIN q USING (bucket) WHERE c.vec_id <> qid)
SELECT qid, nid, cos_sim, rk FROM (
  SELECT qid, nid, cos_sim,
         row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
  FROM scored) t
WHERE rk <= {k} ORDER BY qid, rk
"""


def doc_compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document (rows-only — DuckDB has no
    zlib; determinism and the class ordering repetitive < prose <
    noise are pytest-pinned). The Gopher/Dolma quality feature
    orthogonal to token statistics; map-only Arrow kernel."""
    from data_lake_demo_spark.operators.textops import compression_signals

    docs = load_table(spark, sf_dir, "documents")
    return (
        compression_signals(docs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def doc_compression_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable compressibility proxy — the hash-green twin of
    doc_compression_signals (whose zlib ratio has no DuckDB
    equivalent): the distinct-8-gram ratio in basis points. Repeated
    content re-uses character shingles, so low distinct/total is
    exactly what an LZ77 window exploits; the ranking agrees with the
    zlib signal on the fixture classes. Pure JVM expressions
    (sequence/transform/array_distinct) — no Python in the plan; at
    100 TB this is a map-only scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    d8 = (
        "size(array_distinct(transform(sequence(1, length(text) - 7), "
        "i -> substring(text, i, 8))))"
    )
    # the per-row work is CPU-bound (O(len) substrings + a distinct),
    # and the fixture lands as ONE parquet file → one scan task; spread
    # it so all cores work (a 100 TB documents table arrives in many
    # files and gets this for free — the repartition only matters when
    # file granularity under-parallelizes a compute-heavy projection).
    # NOTE: the shingle lambda is deliberately kept inline twice below —
    # higher-order functions are excluded from Spark's subexpression
    # elimination either way, and with the spread both evaluations are
    # cheap; a barrier between two projections would serialize the scan.
    docs = docs.repartition(64)
    return (
        docs.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.expr("greatest(length(text) - 7, 0)")
            .cast("long")
            .alias("n_shingles"),
            F.expr(
                f"CASE WHEN length(text) >= 8 THEN {d8} ELSE 0 END"
            ).cast("long").alias("distinct_shingles"),
            F.expr(
                f"CASE WHEN length(text) >= 8 THEN CAST({d8} * 10000 "
                "DIV (length(text) - 7) AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END"
            ).alias("compress_proxy_bp"),
        ).orderBy("doc_id")
    )


COMPRESSION_PORTABLE_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       greatest(length(text) - 7, 0) AS n_shingles,
       CASE WHEN length(text) >= 8
            THEN len(list_distinct(list_transform(range(1, length(text) - 6),
                     i -> substring(text, CAST(i AS INT), 8))))
            ELSE 0 END AS distinct_shingles,
       CASE WHEN length(text) >= 8
            THEN CAST(len(list_distinct(list_transform(range(1, length(text) - 6),
                     i -> substring(text, CAST(i AS INT), 8)))) * 10000
                 // (length(text) - 7) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS compress_proxy_bp
FROM documents ORDER BY doc_id
"""


def doc_quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scores (rows-only — the trained weights are
    data-dependent; separation, determinism, and the no-Python scoring
    plan are pytest-pinned): LR trained against the English slice on a
    bounded sample, every document scored relationally."""
    from data_lake_demo_spark.operators.quality_model import (
        score_quality,
        train_linear_quality,
    )

    docs = load_table(spark, sf_dir, "documents")
    w, b = train_linear_quality(docs, F.col("lang") == "en", sample_limit=2000)
    return score_quality(docs, w, b)


def doc_quality_model_scores_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME relational scoring plan as doc_quality_model_scores
    (explode unigrams → md5 bucket → broadcast weights join → integer
    fold → sigmoid) but with the frozen LCG weight family instead of
    trained weights — which makes the 100 TB-path plan fully
    value-hash oracle-able (the portable-family recipe: literal,
    seeded, non-iterative parameters replicate in ANSI SQL). The
    score is emitted quantized at 1e-4 to absorb any cross-engine
    exp() last-ulp divergence."""
    from data_lake_demo_spark.operators.quality_model import (
        frozen_weights,
        score_quality,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = score_quality(docs, frozen_weights(), -0.25, quantize_q=1000)
    return scored.withColumn(
        "quality_score",
        F.floor(F.col("quality_score") * 10000 + F.lit(0.5)) / F.lit(10000.0),
    )


QUALITY_FROZEN_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
feats AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5(f), 1, 7)) AS BIGINT) % 1024) AS b
  FROM (SELECT doc_id, unnest(t) AS f FROM toks)),
wtab AS (
  SELECT b,
         CAST(floor((((b * 1103515245 + 12345) % 2039)
                     / CAST(2039 AS DOUBLE) - 0.5)
                    * CAST(1000 AS DOUBLE) + 0.5) AS BIGINT) AS iw
  FROM (SELECT unnest(range(0, 1024)) AS b)),
sums AS (
  SELECT doc_id, count(*) AS n_toks, sum(COALESCE(iw, 0)) AS sw
  FROM feats LEFT JOIN wtab USING (b) GROUP BY doc_id),
logits AS (
  SELECT doc_id, n_toks,
         CAST(sw AS DOUBLE) / CAST(1000 AS DOUBLE) / n_toks
           + CAST(-0.25 AS DOUBLE) AS z
  FROM sums)
SELECT doc_id, n_toks,
       floor((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-z)))
             * CAST(10000 AS DOUBLE) + 0.5) / CAST(10000 AS DOUBLE)
         AS quality_score
FROM logits ORDER BY doc_id
"""


def doc_retrieval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG retrieval shape end to end: ANN top-3 per query vector
    (LSH-bucketed — the literal hyperplane family, so fully
    oracle-able) joined back to the documents table for neighbor
    metadata. At scale the metadata join is the standard post-
    retrieval hydration: candidates are tiny (k·|queries| rows), so
    AQE broadcasts THEM against the big documents table rather than
    shuffling it."""
    from data_lake_demo_spark.operators.similarity import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    queries = emb.filter(F.col("vec_id") < 10)
    hits = lsh_ann_topk(emb, queries, k=3)
    return (
        hits.join(docs, hits.nid == docs.doc_id)
        .select(
            "qid",
            "rk",
            "nid",
            "cos_sim",
            F.col("lang").alias("n_lang"),
            F.col("source").alias("n_source"),
        )
        .orderBy("qid", "rk")
    )


def _retrieval_join_oracle() -> str:
    return (
        _lsh_ann_ctes(3)
        + """
SELECT qid, rk, nid, cos_sim, d.lang AS n_lang, d.source AS n_source
FROM topk JOIN documents d ON topk.nid = d.doc_id
ORDER BY qid, rk
"""
    )


def doc_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 more-like-this retrieval (operators/bm25.py): the first 8
    documents each query the corpus with their own term set; top-5
    non-self matches per query by Okapi BM25, fully value-hash
    oracle-able (quantized per-term contribution fold). The lexical
    counterpart of ``doc_retrieval_join``'s embedding RAG shape."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, n_query_docs=8, k=5).orderBy("qid", "rk")


def emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-FLAT (k-means cells + nprobe, exact stored vectors)
    approximate top-5 (rows-only). Served from the PERSISTED AnnIndex
    in flat mode: warm runs skip train+assign and the probe read is a
    manifest-pruned scan of the probed cells' files."""
    idx, emb = _ann_index_for(spark, sf_dir, nlist=16, flat=True)
    queries = emb.filter(F.col("vec_id") < 10)
    return idx.query(queries, k=5, nprobe=4).orderBy("qid", "rk")


def _ann_index_for(
    spark: SparkSession,
    sf_dir: str,
    *,
    nlist: int | None,
    flat: bool = False,
    by_residual: bool = False,
    sq: bool = False,
):
    """Build-once / load-many AnnIndex over the embeddings table (the
    FAISS train/add/search lifecycle — operators/ann_index.py). The
    index persists under $SPARK_GRAFT_ANN_CACHE (default: a tmpdir
    keyed by corpus path + params), so repeated query batches — and
    repeated bench runs — pay only the ADC scan + rerank, not
    quantizer training + corpus encoding. A stale cache (row count no
    longer matching the corpus — a metadata-only parquet count) is
    rebuilt; rebuilds are atomic AcidTable snapshot swaps."""
    import hashlib
    import json as _json
    import os
    import tempfile

    from data_lake_demo_spark.operators.ann_index import AnnIndex

    emb = load_table(spark, sf_dir, "embeddings")
    params = {
        "nlist": nlist,
        "m": 8,
        "ksub": 64,
        "seed": 42,
        "flat": flat,
        "by_residual": by_residual,
        "sq": sq,
    }
    key = hashlib.sha1(
        _json.dumps({"sf": os.path.abspath(sf_dir), **params}, sort_keys=True).encode()
    ).hexdigest()[:16]
    root = os.environ.get(
        "SPARK_GRAFT_ANN_CACHE",
        os.path.join(tempfile.gettempdir(), "spark-graft-ann"),
    )
    path = os.path.join(root, key)
    try:
        idx = AnnIndex.load(spark, path)
        if idx.meta.get("n_rows") == emb.count() and idx.flat == flat:
            return idx, emb
    except FileNotFoundError:
        pass
    return (
        AnnIndex.build(
            emb,
            path,
            nlist=nlist,
            m=8,
            ksub=64,
            seed=42,
            flat=flat,
            by_residual=by_residual,
            sq=sq,
        ),
        emb,
    )


def emb_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed ANN top-5 (rows-only — both quantizers are
    k-means; recall vs brute force pinned in tests). The billion-vector
    shape: coarse cells prune the scan, m-BYTE binary PQ codes compress
    it, probes rank by the assignment metric. Served from the PERSISTED
    AnnIndex (warm runs skip train+encode entirely), with the FAISS
    default by-residual encoding: codes quantize x − centroid(cell),
    the centroid half of the score rides as a per-probe bias."""
    idx, emb = _ann_index_for(spark, sf_dir, nlist=16, by_residual=True)
    queries = emb.filter(F.col("vec_id") < 10)
    return idx.query(
        queries, k=5, nprobe=8, rerank_corpus=emb
    ).orderBy("qid", "rk")


def emb_sq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 ANN top-5 (rows-only — the per-dim [min, max] codebook is
    sample-trained; recall vs brute force and the byte-per-dim code
    width are pinned in tests/test_ann_index.py). One byte per
    DIMENSION — the middle rung of the compression ladder (flat 4·dim
    B, SQ8 dim B, PQ m B) — served from the persisted AnnIndex."""
    idx, emb = _ann_index_for(spark, sf_dir, nlist=16, sq=True)
    queries = emb.filter(F.col("vec_id") < 10)
    return idx.query(
        queries, k=5, nprobe=8, rerank_corpus=emb
    ).orderBy("qid", "rk")


def doc_bpe_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE token counts (rows-only — the greedy merge training
    loop is not SQL-expressible; determinism, lossless segmentation,
    and compression are pinned in tests): train the merge table on a
    bounded sample (operators/bpe.py), count subword tokens per doc
    in a map-only Arrow kernel. Complements the oracle-checked regex
    estimate (doc_bpe_token_counts) with the true algorithm."""
    from data_lake_demo_spark.operators.bpe import bpe_token_counts, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    model = train_bpe(docs, num_merges=256, sample_limit=2000)
    return (
        bpe_token_counts(docs, model)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


def emb_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-5 (rows-only check — the k-means
    codebooks are engine-specific; recall vs brute force is asserted
    in tests/test_operators.py). ADC scan over m-byte binary codes +
    exact cosine re-rank, served from the PERSISTED AnnIndex."""
    idx, emb = _ann_index_for(spark, sf_dir, nlist=None)
    queries = emb.filter(F.col("vec_id") < 10)
    return idx.query(
        queries, k=5, nprobe=None, rerank_corpus=emb
    ).orderBy("qid", "rk")


def emb_pq_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME encode→prep→ADC stages as the persisted PQ index
    (operators/ann_index.py: encode_pq's Arrow kernel, prep_queries'
    batched einsum LUTs, adc_candidates' codegen hex/conv byte decode
    and LUT fold) run with LITERAL seeded codebooks instead of
    k-means — which makes the pipeline value-hash oracle-able: the
    DuckDB twin regenerates the identical codebooks from integer
    arithmetic and replays unit-normalize → per-subspace argmin
    encode → LUT build → ADC top-k. The k-means production queries
    (emb_pq_ann etc.) stay rows-only beside it; a green row here
    certifies the ADC algebra they share. ADC scores are emitted
    quantized at 1e-6 — cross-engine float-sum order differs in the
    last ulps (numpy einsum vs SQL aggregation), which the margin
    absorbs."""
    from data_lake_demo_spark.operators.ann_index import (
        adc_candidates,
        encode_pq,
        portable_pq_model,
        prep_queries,
    )
    from data_lake_demo_spark.functions.vector import to_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    model = portable_pq_model(dim=64, m=8, ksub=16)
    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        to_double_array(F.col("embedding")).alias("nvec"),
    )
    codes = encode_pq(corpus, model)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    prepped = prep_queries(q, model)
    cands = adc_candidates(codes, prepped, model, k=5, rerank=1)
    return cands.select(
        "qid",
        F.col("rk0").alias("rk"),
        "nid",
        (F.floor(F.col("adc_score") * 1000000 + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "adc_q"
        ),
    ).orderBy("qid", "rk")


def _pq_portable_oracle(*, m: int = 8, ksub: int = 16, dsub: int = 8, k: int = 5) -> str:
    """DuckDB replica of the portable-codebook PQ pipeline. Stays in
    lockstep with portable_pq_model (the LCG) and with encode_pq /
    prep_queries / adc_candidates (unit-normalize, first-index argmin
    ties, nid != qid filter, score-desc-then-nid ranking)."""
    dim = m * dsub
    return f"""
WITH books AS (
  SELECT s.range AS s, j.range AS j, d.range AS d,
         (((s.range * 65537 + j.range * 257 + d.range * 97 + 31)
           * 1103515245 + 12345) % 2039)
           / CAST(2039 AS DOUBLE) - 0.5 AS w
  FROM range({m}) s, range({ksub}) j, range({dsub}) d),
base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
dists AS (
  SELECT vec_id AS nid, b.s AS s, b.j AS j,
         sum((u[b.s * {dsub} + b.d + 1] - b.w)
             * (u[b.s * {dsub} + b.d + 1] - b.w)) AS d2
  FROM unitv CROSS JOIN books b GROUP BY vec_id, b.s, b.j),
codes AS (
  SELECT nid, s, j AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY nid, s ORDER BY d2, j) AS rn
    FROM dists) WHERE rn = 1),
lut AS (
  SELECT vec_id AS qid, b.s AS s, b.j AS j,
         sum(u[b.s * {dsub} + b.d + 1] * b.w) AS dt
  FROM unitv CROSS JOIN books b
  WHERE vec_id < 10 GROUP BY vec_id, b.s, b.j),
adc AS (
  SELECT qid, nid, sum(dt) AS adc_score
  FROM codes JOIN lut ON codes.s = lut.s AND codes.code = lut.j
  WHERE nid != qid GROUP BY qid, nid),
ranked AS (
  SELECT qid, nid, adc_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_score DESC, nid) AS rk
  FROM adc)
SELECT qid, rk, nid,
       floor(adc_score * CAST(1000000 AS DOUBLE) + 0.5)
         / CAST(1000000 AS DOUBLE) AS adc_q
FROM ranked WHERE rk <= {k} ORDER BY qid, rk
"""


def emb_ivfpq_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emb_pq_ann_portable's sibling for the IVF tier: literal coarse
    centroids (a second LCG stream) compose with the literal
    codebooks, so the oracle additionally replays coarse cell
    assignment at encode, nprobe probe ranking at prep, and the
    per-cell ADC hash join — the stages that make IVFPQ scale
    (candidates come only from probed cells). A green row here plus
    emb_pq_ann_portable's covers every stage the k-means production
    indexes run except k-means itself."""
    from data_lake_demo_spark.operators.ann_index import (
        adc_candidates,
        encode_pq,
        portable_ivfpq_model,
        prep_queries,
    )
    from data_lake_demo_spark.functions.vector import to_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    model = portable_ivfpq_model(dim=64, m=8, ksub=16, nlist=8)
    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        to_double_array(F.col("embedding")).alias("nvec"),
    )
    codes = encode_pq(corpus, model)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    prepped = prep_queries(q, model, nprobe=2)
    cands = adc_candidates(codes, prepped, model, k=5, rerank=1)
    return cands.select(
        "qid",
        F.col("rk0").alias("rk"),
        "nid",
        (F.floor(F.col("adc_score") * 1000000 + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "adc_q"
        ),
    ).orderBy("qid", "rk")


def _ivfpq_portable_oracle(
    *,
    m: int = 8,
    ksub: int = 16,
    dsub: int = 8,
    nlist: int = 8,
    nprobe: int = 2,
    k: int = 5,
) -> str:
    """DuckDB replica of the portable IVFPQ pipeline: the PQ-portable
    oracle plus coarse assignment (argmin cell per vector), probe
    ranking (top-nprobe cells per query), and the cell-membership
    join restricting ADC candidates to probed cells."""
    dim = m * dsub
    return f"""
WITH books AS (
  SELECT s.range AS s, j.range AS j, d.range AS d,
         (((s.range * 65537 + j.range * 257 + d.range * 97 + 31)
           * 1103515245 + 12345) % 2039)
           / CAST(2039 AS DOUBLE) - 0.5 AS w
  FROM range({m}) s, range({ksub}) j, range({dsub}) d),
cents AS (
  SELECT c.range AS c, d.range AS d,
         (((c.range * 8191 + d.range * 127 + 7) * 1103515245 + 12345) % 2039)
           / CAST(2039 AS DOUBLE) - 0.5 AS w
  FROM range({nlist}) c, range({dim}) d),
base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
celld AS (
  SELECT vec_id, ct.c AS c, sum((u[ct.d + 1] - ct.w) * (u[ct.d + 1] - ct.w)) AS d2
  FROM unitv CROSS JOIN cents ct GROUP BY vec_id, ct.c),
cells AS (
  SELECT vec_id, c AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM celld) WHERE rn = 1),
probes AS (
  SELECT vec_id AS qid, c AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM celld WHERE vec_id < 10) WHERE rn <= {nprobe}),
dists AS (
  SELECT vec_id AS nid, b.s AS s, b.j AS j,
         sum((u[b.s * {dsub} + b.d + 1] - b.w)
             * (u[b.s * {dsub} + b.d + 1] - b.w)) AS d2
  FROM unitv CROSS JOIN books b GROUP BY vec_id, b.s, b.j),
codes AS (
  SELECT nid, s, j AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY nid, s ORDER BY d2, j) AS rn
    FROM dists) WHERE rn = 1),
lut AS (
  SELECT vec_id AS qid, b.s AS s, b.j AS j,
         sum(u[b.s * {dsub} + b.d + 1] * b.w) AS dt
  FROM unitv CROSS JOIN books b
  WHERE vec_id < 10 GROUP BY vec_id, b.s, b.j),
adc AS (
  SELECT lut.qid, codes.nid, sum(lut.dt) AS adc_score
  FROM codes
  JOIN cells ON codes.nid = cells.vec_id
  JOIN probes ON cells.cell = probes.cell
  JOIN lut ON codes.s = lut.s AND codes.code = lut.j AND lut.qid = probes.qid
  WHERE codes.nid != lut.qid GROUP BY lut.qid, codes.nid),
ranked AS (
  SELECT qid, nid, adc_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_score DESC, nid) AS rk
  FROM adc)
SELECT qid, rk, nid,
       floor(adc_score * CAST(1000000 AS DOUBLE) + 0.5)
         / CAST(1000000 AS DOUBLE) AS adc_q
FROM ranked WHERE rk <= {k} ORDER BY qid, rk
"""


def emb_ivf_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-FLAT rung of the portable family — the last ANN index mode
    without a value-hash row: LITERAL coarse centroids (the
    portable_ivfpq_model LCG stream) through the REAL IVF-FLAT stages
    — encode_flat's cell assignment (ann_index.py), prep_flat_queries'
    L2-ranked probe explode, and the same exact-cosine probe-join scan
    algebra as AnnIndex._query_flat (stored unit vectors, no rerank —
    the stored vectors ARE exact). The DuckDB twin regenerates the
    centroids from integer arithmetic and replays assignment, probe
    ranking, the cell-membership restriction, and the cosine top-k.
    Scores quantized at 1e-6 BEFORE ranking (nid tie-break) so
    cross-engine float-fold noise can't flip an order."""
    from data_lake_demo_spark.operators.ann_index import (
        encode_flat,
        portable_ivfpq_model,
        prep_flat_queries,
    )
    from data_lake_demo_spark.functions.vector import (
        cosine,
        quantize,
        to_double_array,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # only the coarse stream is used; the PQ books ride along unused
    model = portable_ivfpq_model(dim=64, m=8, ksub=16, nlist=8)
    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        to_double_array(F.col("embedding")).alias("nvec"),
    )
    inv = encode_flat(corpus, model)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    prepped = prep_flat_queries(q, model, nprobe=2)
    scored = (
        inv.join(F.broadcast(prepped), "cell")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            # fold cosine: the expanded _cos64 measured a durable 1.6x
            # regression here (1.7 s warm vs 1.09 s lock median) — the
            # per-pair projection follows a broadcast-hash-join probe
            # whose stage loses codegen on the ~380-node tree; see the
            # brute_force_topk note in operators/similarity.py
            quantize(cosine(F.col("qvec"), F.col("nvec"))).alias("cos_q"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_q").desc(), F.col("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "rk", "nid", "cos_q")
        .orderBy("qid", "rk")
    )


def _ivf_flat_portable_oracle(
    *, dim: int = 64, nlist: int = 8, nprobe: int = 2, k: int = 5
) -> str:
    """DuckDB replica of the portable IVF-FLAT pipeline: the literal
    coarse-centroid LCG (lockstep with portable_ivfpq_model), argmin
    cell assignment, top-nprobe probe ranking, cell-membership
    restriction, and the exact cosine fold over re-derived unit
    vectors (lockstep with functions/vector.cosine — dot over the
    stored unit vectors divided by both norms)."""
    return f"""
WITH cents AS (
  SELECT c.range AS c, d.range AS d,
         (((c.range * 8191 + d.range * 127 + 7) * 1103515245 + 12345) % 2039)
           / CAST(2039 AS DOUBLE) - 0.5 AS w
  FROM range({nlist}) c, range({dim}) d),
base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
celld AS (
  SELECT vec_id, ct.c AS c,
         sum((u[ct.d + 1] - ct.w) * (u[ct.d + 1] - ct.w)) AS d2
  FROM unitv CROSS JOIN cents ct GROUP BY vec_id, ct.c),
cells AS (
  SELECT vec_id, c AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM celld) WHERE rn = 1),
probes AS (
  SELECT vec_id AS qid, c AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM celld WHERE vec_id < 10) WHERE rn <= {nprobe}),
scores AS (
  SELECT pr.qid, cl.vec_id AS nid,
         list_sum([uq.u[i] * un.u[i] FOR i IN range(1, {dim + 1})])
           / (sqrt(list_sum([x * x FOR x IN uq.u]))
              * sqrt(list_sum([x * x FOR x IN un.u]))) AS cs
  FROM probes pr
  JOIN cells cl ON cl.cell = pr.cell
  JOIN unitv uq ON uq.vec_id = pr.qid
  JOIN unitv un ON un.vec_id = cl.vec_id
  WHERE cl.vec_id != pr.qid),
ranked AS (
  SELECT qid, nid,
         floor(cs * CAST(1000000 AS DOUBLE) + 0.5)
           / CAST(1000000 AS DOUBLE) AS cos_q,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY floor(cs * CAST(1000000 AS DOUBLE) + 0.5)
                      / CAST(1000000 AS DOUBLE) DESC, nid) AS rk
  FROM scores)
SELECT qid, rk, nid, cos_q
FROM ranked WHERE rk <= {k} ORDER BY qid, rk
"""


def _portable_sq_topk(emb: DataFrame, queries: DataFrame, *, k: int) -> DataFrame:
    """(qid, rk0, nid, adc_score) — the literal-range SQ8 pipeline's
    top-k, shared by emb_sq_ann_portable and the recall evaluation."""
    from data_lake_demo_spark.operators.ann_index import (
        encode_sq,
        portable_sq_model,
        prep_sq_queries,
        sq_candidates,
    )
    from data_lake_demo_spark.functions.vector import to_double_array

    model = portable_sq_model(dim=64)
    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        to_double_array(F.col("embedding")).alias("nvec"),
    )
    codes = encode_sq(corpus, model)
    q = queries.select(
        F.col("vec_id").alias("qid"),
        to_double_array(F.col("embedding")).alias("qvec"),
    )
    prepped = prep_sq_queries(q, model)
    return sq_candidates(codes, prepped, model, k=k, rerank=1)


def emb_sq_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQ8 rung of the portable family: literal per-dimension
    ranges (vmin=−1, delta=2/255 — the unit-component range) run
    through the REAL encode_sq / prep_sq_queries / sq_candidates
    stages, so the byte-grid encode and the weighted decoded-IP fold
    value-hash against the DuckDB twin. Scores quantized at 1e-6 for
    cross-engine sum-order noise; the exact-.5 rounding tie (numpy
    rint is half-even, the oracle floors +0.5) cannot occur off the
    u=0 gridpoint, where both round to 128."""
    emb = load_table(spark, sf_dir, "embeddings")
    cands = _portable_sq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return cands.select(
        "qid",
        F.col("rk0").alias("rk"),
        "nid",
        (F.floor(F.col("adc_score") * 1000000 + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "adc_q"
        ),
    ).orderBy("qid", "rk")


def _sq_portable_ctes(*, dim: int = 64, codes_where: str = "") -> str:
    """CTE block through ``ranked`` — shared by the SQ-portable ANN
    oracle, the SQ recall-evaluation oracle, and the filtered-search
    oracle (``codes_where`` restricts the candidate corpus — the
    pre-filtered vector-search shape)."""
    delta = "(CAST(2 AS DOUBLE) / CAST(255 AS DOUBLE))"
    return f"""
WITH base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
codes AS (
  SELECT vec_id AS nid,
         [LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
            CAST(floor((x + 1.0) / {delta} + 0.5) AS BIGINT))) FOR x IN u]
           AS cd
  FROM unitv {codes_where}),
qprep AS (
  SELECT vec_id AS qid, u, -list_sum(u) AS bias
  FROM unitv WHERE vec_id < 10),
scores AS (
  SELECT q.qid, c.nid,
         q.bias + list_sum(
           [q.u[i] * {delta} * c.cd[i] FOR i IN range(1, {dim + 1})])
           AS adc_score
  FROM codes c CROSS JOIN qprep q WHERE c.nid != q.qid),
ranked AS (
  SELECT qid, nid, adc_score,
         row_number() OVER (PARTITION BY qid
                            ORDER BY adc_score DESC, nid) AS rk
  FROM scores)"""


def _sq_portable_oracle(*, k: int = 5) -> str:
    return (
        _sq_portable_ctes()
        + f"""
SELECT qid, rk, nid,
       floor(adc_score * CAST(1000000 AS DOUBLE) + 0.5)
         / CAST(1000000 AS DOUBLE) AS adc_q
FROM ranked WHERE rk <= {k} ORDER BY qid, rk
"""
    )


def emb_filtered_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search under a value-hash oracle — the
    "semantic search over MY documents" shape every RAG deployment
    needs (metadata predicate restricts the candidate set; top-k is
    exact WITHIN the allowed set, so a heavily-filtered query can't
    silently return fewer-than-k good hits the way post-filtering a
    fixed candidate list does). Composes the allowed-set restriction
    (vec_id % 3 = 0 here — stand-in for any pushed-down metadata
    predicate) with the REAL portable-SQ8 stages (encode_sq /
    prep_sq_queries / sq_candidates); AnnIndex.query(allowed_ids=...)
    runs the same pre-filter semantics against the persisted index
    (tests/test_ann_index.py::test_filtered_vector_search_prefilter).
    Pre-filter-then-rank is exactly equivalent to ranking the encoded
    allowed subset, which is what the oracle replays."""
    emb = load_table(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.col("vec_id") % 3 == 0)
    cands = _portable_sq_topk(
        allowed, emb.filter(F.col("vec_id") < 10), k=5
    )
    return cands.select(
        "qid",
        F.col("rk0").alias("rk"),
        "nid",
        (F.floor(F.col("adc_score") * 1000000 + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "adc_q"
        ),
    ).orderBy("qid", "rk")


def emb_kmeans_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DISTRIBUTED Lloyd iteration (operators/kmeans.lloyd_step)
    from the literal LCG centroid family (the portable_ivfpq_model
    coarse stream, k=8 over dim 64): nearest-centroid assignment is a
    single map-side argmin expression (array of k squared-L2 folds +
    array_position — no fan-out, no window, no join), and the update
    step is ONE k-row partial aggregate emitting per-cell counts, the
    quantized inertia objective, and the updated centroid's first
    coordinates. The r5 verdict called k-means "rows-only forever" —
    this row value-hashes the distributed Lloyd STEP itself (the part
    that runs over all data at 100 TB; only the bounded-sample driver
    init remains un-oracled, by nature)."""
    import numpy as np

    from data_lake_demo_spark.operators.kmeans import lloyd_step

    c = np.arange(8, dtype=np.int64)[:, None]
    d = np.arange(64, dtype=np.int64)[None, :]
    cents = (
        ((c * 8191 + d * 127 + 7) * 1103515245 + 12345) % 2039
    ) / 2039.0 - 0.5
    emb = load_table(spark, sf_dir, "embeddings")
    return lloyd_step(emb, "embedding", [list(row) for row in cents], mean_dims=4)


_KMEANS_CENTROID = (
    "((((c * 8191 + d * 127 + 7) * 1103515245 + 12345) % 2039)"
    " / CAST(2039 AS DOUBLE) - 0.5)"
)

EMB_KMEANS_PORTABLE_SQL = f"""
WITH base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
dists AS (
  SELECT u,
         [ list_sum([ (u[d + 1] - {_KMEANS_CENTROID})
                      * (u[d + 1] - {_KMEANS_CENTROID})
                      FOR d IN range(64) ])
           FOR c IN range(8) ] AS ds
  FROM unitv),
assigned AS (
  SELECT u,
         CAST(list_position(ds, list_min(ds)) - 1 AS INTEGER) AS cell,
         list_min(ds) AS d2
  FROM dists)
SELECT cell, count(*) AS n,
  CAST(sum(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / CAST(1000000 AS DOUBLE) AS inertia,
  CAST(sum(CAST(floor(u[1] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / (count(*) * CAST(1000000 AS DOUBLE)) AS c0,
  CAST(sum(CAST(floor(u[2] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / (count(*) * CAST(1000000 AS DOUBLE)) AS c1,
  CAST(sum(CAST(floor(u[3] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / (count(*) * CAST(1000000 AS DOUBLE)) AS c2,
  CAST(sum(CAST(floor(u[4] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
    / (count(*) * CAST(1000000 AS DOUBLE)) AS c3
FROM assigned GROUP BY cell ORDER BY cell
"""


def emb_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation (new in r11 — the DataComp/DsDm
    family shape): assign every embedding to the literal LCG centroid
    family (k=8, dim 64 — the same portable coarse stream as
    emb_kmeans_portable) and keep the 25% most prototypical vectors
    of EVERY cluster (smallest quantized squared distance,
    vec_id tie-break), so the curated subset preserves all modes
    instead of letting the densest region win a global top-k. The
    Spark plan is the scale-safe histogram-threshold rank (no
    k-partition global window — operators/kmeans.
    cluster_balanced_sample); the oracle replays the selection with a
    plain per-cell window, proving the two formulations identical.
    Output: per cell, the kept count and the quantized distance sum
    of the kept rows."""
    import numpy as np

    from data_lake_demo_spark.operators.kmeans import cluster_balanced_sample

    c = np.arange(8, dtype=np.int64)[:, None]
    d = np.arange(64, dtype=np.int64)[None, :]
    cents = (
        ((c * 8191 + d * 127 + 7) * 1103515245 + 12345) % 2039
    ) / 2039.0 - 0.5
    emb = load_table(spark, sf_dir, "embeddings")
    kept = cluster_balanced_sample(
        emb, "embedding", [list(row) for row in cents], 0.25
    )
    return (
        kept.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            (F.sum("qd2") / 1_000_000.0).alias("d2_sum"),
            F.min("vec_id").alias("first_id"),
        )
        .orderBy("cell")
    )


EMB_CLUSTER_BALANCED_SAMPLE_SQL = f"""
WITH base AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings),
unitv AS (
  SELECT vec_id,
         [x / sqrt(list_sum([y * y FOR y IN v])) FOR x IN v] AS u
  FROM base),
dists AS (
  SELECT vec_id,
         [ list_sum([ (u[d + 1] - {_KMEANS_CENTROID})
                      * (u[d + 1] - {_KMEANS_CENTROID})
                      FOR d IN range(64) ])
           FOR c IN range(8) ] AS ds
  FROM unitv),
assigned AS (
  SELECT vec_id,
         CAST(list_position(ds, list_min(ds)) - 1 AS INTEGER) AS cell,
         CAST(floor(list_min(ds) * 1000000 + 0.5) AS BIGINT) AS qd2
  FROM dists),
ranked AS (
  SELECT cell, vec_id, qd2,
         row_number() OVER (PARTITION BY cell ORDER BY qd2, vec_id) AS rn,
         count(*) OVER (PARTITION BY cell) AS n_cell
  FROM assigned),
kept AS (SELECT * FROM ranked WHERE rn <= ceil(0.25 * n_cell))
SELECT cell, count(*) AS n_kept,
       CAST(sum(qd2) AS DOUBLE) / 1000000 AS d2_sum,
       min(vec_id) AS first_id
FROM kept GROUP BY cell ORDER BY cell
"""


def emb_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the LSH similarity graph — the
    data-curation signal "how representative is this vector of its
    semantic neighborhood". Edges are the seed-42 sign-LSH bucket
    co-membership pairs (the emb_near_dups candidate family, both
    directions); operators/graph.pagerank_fixed_point then runs 3
    Lloyd-style propagation rounds in INTEGER fixed point (bigint
    shares of 10^12), so the iterative distributed computation itself
    value-hashes: the oracle replays all 3 unrolled iterations with
    the same integer division, immune to float summation order."""
    from data_lake_demo_spark.operators.graph import pagerank_fixed_point
    from data_lake_demo_spark.operators.similarity import lsh_signatures

    emb = load_table(spark, sf_dir, "embeddings")
    sig = lsh_signatures(emb, vec_col="embedding", n_planes=8, seed=42).select(
        F.col("vec_id").alias("id"), "lsh_bucket"
    )
    a, b = sig.alias("a").hint("merge"), sig.alias("b")
    edges = a.join(
        b,
        (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
        & (F.col("a.id") != F.col("b.id")),
    ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    pr = pagerank_fixed_point(edges, iterations=3)
    return pr.orderBy(F.desc("rank"), "node").limit(100)


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration integer-fixed-point PageRank over the same
    seed-42 LSH bucket graph (keep in lockstep with
    pagerank_fixed_point: s0 = 10^12 div N, base = 15% of s0, inflow
    terms (85*s) div (100*deg) — all positive-integer division, so //
    here equals Spark's div)."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 8, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    step = """
it{t} AS (
  SELECT s0.node, s0.s0,
         (15 * s0.s0) // 100 + coalesce(fl.inflow, 0) AS s
  FROM s0 LEFT JOIN (
    SELECT e.dst AS node, sum((85 * p.s) // (100 * d.deg)) AS inflow
    FROM edges e JOIN it{p} p ON e.src = p.node
                 JOIN deg d ON e.src = d.node
    GROUP BY 1) fl USING (node))"""
    return (
        f"""
WITH ev AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
b AS (SELECT vec_id, {bucket} AS bucket FROM ev),
edges AS (
  SELECT a.vec_id AS src, b2.vec_id AS dst
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id != b2.vec_id),
nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges
        UNION ALL SELECT dst AS node FROM edges)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1),
s0 AS (SELECT node, CAST(1000000000000 AS BIGINT) // n_nodes AS s0
       FROM nodes, nn),
it0 AS (SELECT node, s0, s0 AS s FROM s0),"""
        + step.format(t=1, p=0)
        + ","
        + step.format(t=2, p=1)
        + ","
        + step.format(t=3, p=2)
        + """
SELECT i.node, coalesce(d.deg, 0) AS deg, CAST(i.s AS BIGINT) AS rank
FROM it3 i LEFT JOIN deg d USING (node)
ORDER BY rank DESC, node LIMIT 100
"""
    )


def emb_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (operators/graph.
    label_propagation) over the seed-42 LSH similarity graph — the
    community structure INSIDE connected components that min-label CC
    can't see (CC answers "same near-dup cluster?"; LPA answers
    "which dense semantic neighborhood?" — the curation signal for
    topic-balanced sampling). 3 synchronous rounds, deterministic
    modal adoption with min-label ties; the oracle replays every
    round's (count DESC, label ASC) election, so the iterative
    algorithm itself value-hashes."""
    from data_lake_demo_spark.operators.graph import label_propagation
    from data_lake_demo_spark.operators.similarity import lsh_signatures

    emb = load_table(spark, sf_dir, "embeddings")
    sig = lsh_signatures(emb, vec_col="embedding", n_planes=8, seed=42).select(
        F.col("vec_id").alias("id"), "lsh_bucket"
    )
    a, b = sig.alias("a").hint("merge"), sig.alias("b")
    edges = a.join(
        b,
        (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
        & (F.col("a.id") != F.col("b.id")),
    ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    return label_propagation(edges, rounds=3).orderBy("node")


def _lpa_oracle(*, rounds: int = 3) -> str:
    """Unrolled synchronous LPA over the same seed-42 LSH graph (keep
    in lockstep with label_propagation: modal neighbor label, ties to
    the smallest label, isolated nodes carry their label)."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 8, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    step = """
l{t} AS (
  SELECT l.node, coalesce(w.label, l.label) AS label
  FROM l{p} l
  LEFT JOIN (
    SELECT node, label FROM (
      SELECT e.dst AS node, p.label, count(*) AS c,
             row_number() OVER (PARTITION BY e.dst
               ORDER BY count(*) DESC, p.label) AS rn
      FROM edges e JOIN l{p} p ON e.src = p.node
      GROUP BY e.dst, p.label) WHERE rn = 1) w USING (node))"""
    chain = ",".join(step.format(t=i, p=i - 1) for i in range(1, rounds + 1))
    return f"""
WITH ev AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
b AS (SELECT vec_id, {bucket} AS bucket FROM ev),
edges AS (
  SELECT a.vec_id AS src, b2.vec_id AS dst
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id != b2.vec_id),
nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges
        UNION ALL SELECT dst AS node FROM edges)),
l0 AS (SELECT node, node AS label FROM nodes),
{chain}
SELECT node, label AS community FROM l{rounds} ORDER BY node
"""


def emb_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.py triangle_count)
    over the UNION of two sign-LSH bucket graphs (seeds 42 and 137) —
    overlapping cliques, so closure is non-trivial. The operator is
    node-iterator++: every edge oriented low-(degree,id) → high, every
    wedge enumerated at its lowest-degree apex (O(m^1.5) candidates,
    hub-proof), one join closes wedges against the oriented edge set.
    Top-20 nodes by triangle participation, the clustering-coefficient
    numerator used as a density/bridge curation signal."""
    from data_lake_demo_spark.operators.graph import triangle_count
    from data_lake_demo_spark.operators.similarity import lsh_signatures

    emb = load_table(spark, sf_dir, "embeddings")

    def edges_for(seed: int) -> DataFrame:
        sig = lsh_signatures(
            emb, vec_col="embedding", n_planes=8, seed=seed
        ).select(F.col("vec_id").alias("id"), "lsh_bucket")
        a, b = sig.alias("a"), sig.alias("b")
        return a.join(
            b,
            (F.col("a.lsh_bucket") == F.col("b.lsh_bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))

    edges = edges_for(42).unionAll(edges_for(137))
    return (
        triangle_count(edges)
        .orderBy(F.desc("triangles"), "node")
        .limit(20)
    )


def _triangles_oracle() -> str:
    """Exact triangle enumeration over the same seed-42 ∪ seed-137
    bucket graph: canonical a<b<c edge triples — algorithm-independent
    ground truth for the oriented-wedge operator."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    def bucket_sql(seed: int) -> str:
        planes = random_hyperplanes(64, 8, seed)
        return " + ".join(
            f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
            for i, p in enumerate(planes)
        )

    return f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
b1 AS (SELECT vec_id, {bucket_sql(42)} AS bucket FROM ev),
b2 AS (SELECT vec_id, {bucket_sql(137)} AS bucket FROM ev),
e AS (
  SELECT DISTINCT u, v FROM (
    SELECT a.vec_id u, b.vec_id v FROM b1 a JOIN b1 b ON a.bucket=b.bucket AND a.vec_id < b.vec_id
    UNION ALL
    SELECT a.vec_id u, b.vec_id v FROM b2 a JOIN b2 b ON a.bucket=b.bucket AND a.vec_id < b.vec_id)),
tri AS (
  SELECT e1.u a, e1.v b, e2.v c
  FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
pernode AS (SELECT unnest([a,b,c]) AS node FROM tri)
SELECT node, count(*) AS triangles FROM pernode GROUP BY 1
ORDER BY triangles DESC, node LIMIT 20
"""


def emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidates,
    exact cosine verification (operators/similarity.py
    embedding_near_dup_pairs). The fixture embeddings are synthetic
    with no true near-dups (max pair cosine ≈ 0.45), so the cut is 0.3
    here to keep the verify tier non-vacuous; production near-dup cuts
    are ≥0.9.

    Oracle-checked: the sign-LSH hyperplane family is deterministic
    literal data (seed 42), so the oracle replicates the SAME buckets
    and exact-cosine verify in SQL — a full value-hash check of the
    query's actual semantics, not just row counts."""
    from data_lake_demo_spark.operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        embedding_near_dup_pairs(emb, threshold=0.3)
        .orderBy("id_a", "id_b")
    )


def _duck_list(vals) -> str:
    """DuckDB list<double> literal (repr round-trips exactly)."""
    return "[" + ",".join(repr(float(x)) for x in vals) + "]"


def _duck_dot(a: str, b: str) -> str:
    """DuckDB dot-product idiom shared by every vector oracle."""
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def _near_dup_oracle() -> str:
    """Replicates embedding_near_dup_pairs: the same 8 seed-42
    hyperplanes as literal lists, the same bucket id (bit i = sign of
    dot with plane i), bucket self-join, exact cosine >= 0.3."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 8, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
scored AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         floor(({_duck_dot('a.v', 'b2.v')}
            / (sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('b2.v', 'b2.v')})))
           * {COS_Q} + 0.5) / {COS_Q} AS cos_sim
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3 ORDER BY id_a, id_b
"""


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23): semantic near-duplicate CLUSTERS,
    one exemplar kept per cluster. Composed entirely from
    oracle-proven stages — LSH-bucketed + exact-cosine near-dup pairs
    (embedding_near_dup_pairs, the emb_near_dups semantics) feed
    connected components (the doc_dedup_components closure), and the
    keep-representative is the minimum id of each component. Output
    labels EVERY vector (rep_id = itself for singletons) with a
    survivor flag, so the downstream filter is a map-side
    ``is_survivor`` test.

    Fully oracle-checked: the hyperplane family is literal data and
    the closure replays as a recursive CTE, so the whole
    pair→component→exemplar pipeline value-hashes against DuckDB."""
    from data_lake_demo_spark.operators.dedup import connected_components
    from data_lake_demo_spark.operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3).select("id_a", "id_b")
    comp = connected_components(pairs)
    return (
        emb.select("vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("rep_id"),
        )
        .withColumn("is_survivor", F.col("vec_id") == F.col("rep_id"))
        .orderBy("vec_id")
    )


def _semantic_dedup_oracle() -> str:
    """The near-dup pair oracle's bucket+verify stages feeding the
    components oracle's recursive closure, then min-id exemplars."""
    from data_lake_demo_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(64, 8, 42)
    bucket = " + ".join(
        f"CAST({_duck_dot('v', _duck_list(p))} > 0 AS BIGINT) * {1 << i}"
        for i, p in enumerate(planes)
    )
    return f"""
WITH RECURSIVE
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
edges AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
  WHERE floor(({_duck_dot('a.v', 'b2.v')}
          / (sqrt({_duck_dot('a.v', 'a.v')}) * sqrt({_duck_dot('b2.v', 'b2.v')})))
        * {COS_Q} + 0.5) / {COS_Q} >= 0.3),
sym AS (SELECT id_a AS u, id_b AS v FROM edges
        UNION SELECT id_b, id_a FROM edges),
reach(u, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT s.u, r.lbl FROM sym s JOIN reach r ON s.v = r.u)
SELECT u AS vec_id, min(lbl) AS rep_id, u = min(lbl) AS is_survivor
FROM reach GROUP BY u ORDER BY vec_id
"""


def emb_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each vector against its label centroid — a grouped
    vector aggregate (array-wise avg), all JVM-side. Oracle-checked:
    pure arithmetic; the 1e-4 fixed-point quantization absorbs
    sum-order FP noise between engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array(F.col("embedding"))
    dim = 64
    sums = [
        F.sum(F.element_at(v, i + 1)).alias(f"s{i}") for i in range(dim)
    ]
    centroids = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .select(
            "label",
            F.array(*[F.col(f"s{i}") / F.col("n") for i in range(dim)]).alias("centroid"),
        )
    )
    joined = emb.join(F.broadcast(centroids), "label")
    # fold cosine: the expanded _cos64 flagged a 1.5x regression at
    # sf0.01 (1.67 s vs 1.09 s lock median) — same broadcast-probe
    # projection shape as emb_ivf_ann_portable; see the note there
    return joined.select(
        "vec_id",
        "label",
        quantize(cosine(v, F.col("centroid")), 10_000).alias("centroid_sim"),
    ).orderBy("vec_id")


def _centroid_sim_oracle() -> str:
    """Per-label centroid as sum/count over dimension indexes (the
    same sum/n the Spark side computes), then quantized cosine."""
    return f"""
WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
cent AS (
  SELECT label, i, sum(v[i]) / count(*) AS c
  FROM e, range(1, 65) AS r(i) GROUP BY label, i),
cv AS (SELECT label, list(c ORDER BY i) AS cen FROM cent GROUP BY label)
SELECT vec_id, e.label AS label,
  floor(({_duck_dot('v', 'cen')}
     / (sqrt({_duck_dot('v', 'v')}) * sqrt({_duck_dot('cen', 'cen')})))
    * 10000 + 0.5) / 10000 AS centroid_sim
FROM e JOIN cv ON e.label = cv.label ORDER BY vec_id
"""


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: explode tokens → per-doc term frequency → document
    frequency → idf join → top-3 terms per doc (first 20 docs).

    Scale shape: two shuffles (groupBy (doc,term), groupBy term); the
    idf table is tiny and broadcast back. ln() on exact integer
    ratios is IEEE-identical across engines; quantized anyway.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-side scalar: metadata-sized
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tfidf = (
        # no hint: vocabulary grows with the corpus; under the
        # threshold this broadcasts anyway, above it the term-keyed
        # shuffle join is the safe shape
        tf.join(df_, "term")
        .withColumn(
            "tfidf",
            quantize(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 1_000_000
            ),
        )
        .filter(F.col("doc_id") < 20)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tfidf.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents),
 tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
 df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
 n AS (SELECT count(*) AS n_docs FROM documents),
 scored AS (
  SELECT tf.doc_id, tf.term,
         floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000 + 0.5)
           / 1000000 AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
  WHERE tf.doc_id < 20)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rk
  FROM scored) t
WHERE rk <= 3 ORDER BY doc_id, rk
"""


def doc_normalize_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization + PII-style scrubbing pass: lowercase,
    digit masking, whitespace collapse — the standard pre-tokenization
    cleanup, all JVM regexp (checked against DuckDB's RE2)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "<num>"),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_digest"),
    ).orderBy("doc_id")


NORMALIZE_SQL = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'),
                           '\\s+', ' ', 'g')) AS clean_text,
       length(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'),
                                  '\\s+', ' ', 'g'))) AS clean_len,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'),
                               '\\s+', ' ', 'g'))) AS clean_digest
FROM documents WHERE doc_id < 100 ORDER BY doc_id
"""


_PII_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (the C4/RefinedWeb pre-release scrub): detect and
    mask emails, phone numbers, and IPv4 addresses with JVM regexp —
    patterns kept to the RE2-compatible subset so the DuckDB oracle
    runs them verbatim. The fixture docs carry no PII, so the query
    wires deterministic synthetic PII into each document first (same
    pattern as doc_scrub_boilerplate's inline corpus); counts + the
    digest of the scrubbed text are value-hash checked."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    wired = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 415-555-"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 4, "0"),
            F.lit(" at 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.7"),
        ),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<email>"),
            _PII_PHONE,
            "<phone>",
        ),
        _PII_IP,
        "<ip>",
    )
    return wired.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).alias("n_emails"),
        # n_phones > 0 is load-bearing: it proves the phone pattern
        # actually fires on the wired corpus (a dead pattern would
        # leave the digest green while silently scrubbing nothing)
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE)).alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(_PII_IP)).alias("n_ips"),
        F.md5(scrubbed.cast("binary")).alias("scrub_digest"),
    ).orderBy("doc_id")


PII_SCRUB_SQL = f"""
WITH wired AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 415-555-' || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0')
              || ' at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7' AS text
  FROM documents WHERE doc_id < 100)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS INT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<email>', 'g'), '{_PII_PHONE}', '<phone>', 'g'),
             '{_PII_IP}', '<ip>', 'g')) AS scrub_digest
FROM wired ORDER BY doc_id
"""


def doc_scrub_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate-line removal (the C4/RefinedWeb
    line-dedup step; operators/corpus.py scrub_boilerplate). The
    fixture documents are single-line, so the query builds a
    multi-line corpus inline: a shared nav header and footer wrap
    each document — exactly the shape the operator targets — and the
    scrub must remove them (plus any full-text planted dup lines)
    while preserving the order and untrimmed form of surviving
    lines."""
    from data_lake_demo_spark.operators.corpus import scrub_boilerplate

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    multi = docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.lit("NAVIGATION MENU HOME ABOUT"),
            F.col("text"),
            F.lit("(c) example.com cookies required"),
        ),
    )
    return (
        scrub_boilerplate(multi)
        .select("doc_id", "text_scrubbed")
        .orderBy("doc_id")
    )


SCRUB_BOILERPLATE_SQL = """
WITH d AS (SELECT doc_id,
  'NAVIGATION MENU HOME ABOUT' || chr(10) || text || chr(10)
    || '(c) example.com cookies required' AS t
  FROM documents WHERE doc_id < 100),
lh AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
docline AS (SELECT DISTINCT doc_id, md5(trim(l)) AS h
            FROM (SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM d)
            WHERE length(trim(l)) >= 1),
boil AS (SELECT coalesce(list(h), []) AS bh
         FROM (SELECT h FROM docline GROUP BY h HAVING count(*) >= 2)),
scrubbed AS (
  SELECT doc_id,
         array_to_string(list_filter(ls, l -> NOT list_contains(bh, md5(trim(l)))),
                         chr(10)) AS text_scrubbed
  FROM lh CROSS JOIN boil)
SELECT doc_id, text_scrubbed FROM scrubbed ORDER BY doc_id
"""


def doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global paragraph-level exact dedup (the Dolma recipe;
    operators/dedup.paragraph_dedup). The fixture documents are
    single-paragraph, so the query builds a multi-paragraph corpus
    inline: a shared subscribe-header and copyright-footer wrap every
    document (planted corpus-wide dups — only doc 0's copies survive)
    around the document's words re-chunked into 15-word paragraphs
    (short tail chunks collide naturally across the word-soup corpus).
    Output is per-document keep/drop counts plus the md5 of the
    rebuilt text, so the oracle hash pins both the election and the
    order-preserving rebuild."""
    from data_lake_demo_spark.operators.dedup import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    cnt = F.greatest(
        ((F.size(words) + F.lit(14)) / F.lit(15)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.array_join(F.slice(words, i * 15 + 1, 15), " "),
    )
    paras = F.concat(
        F.array(F.lit("SUBSCRIBE TO OUR NEWSLETTER FOR UPDATES")),
        chunks,
        F.array(F.lit("COPYRIGHT EXAMPLE CORP ALL RIGHTS RESERVED")),
    )
    multi = docs.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text")
    )
    return (
        paragraph_dedup(multi)
        .select(
            "doc_id",
            "n_paras",
            "n_kept",
            "n_dropped",
            F.md5("text_dedup").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


PARAGRAPH_DEDUP_SQL = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
built AS (
  SELECT doc_id,
    list_concat(list_concat(
      ['SUBSCRIBE TO OUR NEWSLETTER FOR UPDATES'],
      list_transform(
        generate_series(0, greatest(CAST(floor((len(w) + 14) / 15) AS INT), 1) - 1),
        i -> array_to_string(w[i*15+1 : i*15+15], ' '))),
      ['COPYRIGHT EXAMPLE CORP ALL RIGHTS RESERVED']) AS paras
  FROM base),
ex AS (SELECT doc_id, unnest(paras) AS para,
              generate_subscripts(paras, 1) AS idx FROM built),
win AS (SELECT doc_id, idx, para,
               row_number() OVER (PARTITION BY md5(para)
                                  ORDER BY doc_id, idx) AS rn
        FROM ex),
reb AS (SELECT doc_id, count(*) AS n_kept,
               string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text_dedup
        FROM win WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_paras FROM ex GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_paras AS BIGINT) AS n_paras,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(t.n_paras - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       md5(coalesce(r.text_dedup, '')) AS clean_md5
FROM tot t LEFT JOIN reb r USING (doc_id) ORDER BY doc_id
"""


def doc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (the suffix-array family of Lee et
    al. 2022, arXiv:2107.06499; operators/dedup.substring_dedup): every
    token run >= 8 tokens occurring twice anywhere in the corpus is
    located, merged into maximal spans, and scrubbed from the rebuilt
    text. The fixture word-soup rarely repeats 8-gram runs naturally,
    so the query plants both duplication modes the operator must
    catch: a corpus-wide shared passage appended to every third
    document (cross-document dups — the license-block/boilerplate
    case) and the document's own first 10 tokens re-appended to every
    fifth (intra-document repetition). The oracle replays gram
    marking, island merge, and the order-preserving scrub in DuckDB —
    the scrub_md5 column value-hashes the rebuilt text."""
    from data_lake_demo_spark.operators.dedup import substring_dedup, tokens

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_SUBSTR_PHRASE)),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.array_join(F.slice(tokens("text"), 1, 10), " "),
            ),
        ).alias("text"),
    )
    return (
        substring_dedup(planted, min_len=8)
        .select(
            "doc_id",
            "n_spans",
            "dup_tokens",
            "n_tokens",
            F.md5(F.col("text_scrub").cast("binary")).alias("scrub_md5"),
        )
        .orderBy("doc_id")
    )


_SUBSTR_PHRASE = (
    "large language models memorize repeated passages unless "
    "deduplicated carefully at scale"
)

SUBSTRING_DEDUP_SQL = f"""
WITH d0 AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS w0
  FROM documents),
base AS (
  SELECT doc_id, concat_ws(' ', text,
    CASE WHEN doc_id % 3 = 0 THEN '{_SUBSTR_PHRASE}' END,
    CASE WHEN doc_id % 5 = 0 THEN array_to_string(w0[1:10], ' ') END
  ) AS text2
  FROM d0),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text2), '\\s+') AS t FROM base),
tok_rows AS (
  SELECT doc_id, pos, t[pos + 1] AS tok
  FROM (SELECT doc_id, unnest(range(0, len(t))) AS pos, t FROM toks)),
grams AS (
  SELECT doc_id, pos, md5(array_to_string(t[pos + 1 : pos + 8], ' ')) AS dg
  FROM (SELECT doc_id, unnest(range(0, len(t) - 7)) AS pos, t
        FROM toks WHERE len(t) >= 8)),
marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY dg) AS n_occ FROM grams)
  WHERE n_occ >= 2),
isl AS (
  SELECT doc_id, pos,
    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM (
    SELECT doc_id, pos,
      MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 7 AS prev_end
    FROM marked)),
spans AS (
  SELECT doc_id, g, MIN(pos) AS s, MAX(pos) + 7 AS e
  FROM isl GROUP BY doc_id, g),
covered AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM spans),
stats AS (
  SELECT doc_id, count(*) AS n_spans, SUM(e - s + 1) AS dup_tokens
  FROM spans GROUP BY doc_id),
scrub AS (
  SELECT tr.doc_id, string_agg(tr.tok, ' ' ORDER BY tr.pos) AS text_scrub
  FROM tok_rows tr LEFT JOIN covered c
    ON tr.doc_id = c.doc_id AND tr.pos = c.pos
  WHERE c.doc_id IS NULL GROUP BY tr.doc_id),
tot AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
SELECT t.doc_id,
  CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(st.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST(t.n_tokens AS BIGINT) AS n_tokens,
  md5(coalesce(sc.text_scrub, '')) AS scrub_md5
FROM tot t
LEFT JOIN stats st USING (doc_id)
LEFT JOIN scrub sc USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Statistical quality scoring: LM perplexity + DSIR (oracle-checked)
# --------------------------------------------------------------------------


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality filter: bits-per-token of every document
    under an add-one smoothed bigram LM estimated from the corpus
    (Wenzek et al. 2019). The full pipeline — bigram explode, count
    tables, smoothing, fixed-point fold — value-hashes against the
    DuckDB twin."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)


def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights toward the English slice (Xie et
    al. 2023, arXiv:2302.03169): hashed unigram+bigram features,
    per-bucket smoothed log-probability ratio target-vs-raw, per-doc
    sum. Fully relational, so the whole estimator value-hashes."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en")


# --------------------------------------------------------------------------
# Multimodal plumbing (synthetic payloads rebuilt in SQL ⇒ full oracles)
# --------------------------------------------------------------------------


def media_image_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end to end: executor-side BMP *encode* of
    deterministic gradient images (synthetic_media_real), then the
    image_stats mapInPandas stage *decodes* each 24-bit BMP container
    pixel-exact (row padding, bottom-up BGR layout) and computes
    per-channel means + median integer luma. The oracle rebuilds the
    same pixel grid arithmetically in SQL — so a value-hash match
    proves the encode→decode round trip byte-for-byte: any header,
    padding, or channel-order bug shifts the decoded pixels and the
    hash. Means over integer pixels sum exactly in doubles (< 2^53),
    so quantization is belt-and-braces only."""
    from data_lake_demo_spark.operators.multimodal import (
        image_stats,
        synthetic_media_real,
    )

    media = synthetic_media_real(spark, n=24)
    return (
        image_stats(media)
        .select(
            "media_id",
            "width",
            "height",
            quantize(F.col("mean_r"), COS_Q).alias("mean_r"),
            quantize(F.col("mean_g"), COS_Q).alias("mean_g"),
            quantize(F.col("mean_b"), COS_Q).alias("mean_b"),
            quantize(F.col("luma_p50"), COS_Q).alias("luma_p50"),
        )
        .orderBy("media_id")
    )


# gradient images: r = x*255 // (w-1), g = y*255 // (h-1), b = id%256;
# rebuilt as a bounded range() grid (DuckDB range() takes no lateral
# column args, so over-generate to max dims and filter)
MEDIA_IMAGE_STATS_REAL_SQL = f"""
WITH m AS (
  SELECT range * 2 AS media_id,
         16 + (range * 2) % 7 AS w, 12 + (range * 2) % 5 AS h
  FROM range(12)),
px AS (
  SELECT media_id, w, h,
         (xs.range * 255) // (w - 1) AS r,
         (ys.range * 255) // (h - 1) AS g,
         media_id % 256 AS b
  FROM m, range(22) xs, range(16) ys
  WHERE xs.range < w AND ys.range < h)
SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       floor(avg(r) * {COS_Q} + 0.5) / {COS_Q} AS mean_r,
       floor(avg(g) * {COS_Q} + 0.5) / {COS_Q} AS mean_g,
       floor(avg(b) * {COS_Q} + 0.5) / {COS_Q} AS mean_b,
       floor(median((r * 299 + g * 587 + b * 114) // 1000) * {COS_Q} + 0.5)
         / {COS_Q} AS luma_p50
FROM px GROUP BY media_id, w, h ORDER BY media_id
"""


def media_audio_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end to end: executor-side PCM16 WAV *encode*
    of synthesized sine tones, then the audio_features mapInPandas
    stage walks the RIFF chunks, *decodes* sample-exact, and computes
    RMS / peak / robust zero-crossing count (sign changes over nonzero
    samples) / the zero-crossing frequency estimate. The oracle
    re-synthesizes the identical int16 samples in SQL (same IEEE
    expression order; trunc matches numpy's astype toward-zero cast)
    and recomputes every feature — sample sums of s² stay < 2^53 so
    both sides aggregate exactly."""
    from data_lake_demo_spark.operators.multimodal import (
        audio_features,
        synthetic_media_real,
    )

    media = synthetic_media_real(spark, n=24)
    return (
        audio_features(media)
        .select(
            "media_id",
            "n_samples",
            "sample_rate",
            quantize(F.col("rms"), COS_Q).alias("rms"),
            "peak",
            "zero_crossings",
            quantize(F.col("est_freq_hz"), COS_Q).alias("est_freq_hz"),
        )
        .orderBy("media_id")
    )


# tone: trunc(sin(2π·440(1+id%5)·k/8000)·12000) as int16 — the SQL
# multiplies in the same left-assoc IEEE order numpy does, so the
# samples are bit-identical; max 5000 samples (625 ms) bounds range()
MEDIA_AUDIO_FEATURES_REAL_SQL = f"""
WITH m AS (
  SELECT range * 2 + 1 AS media_id,
         250 + ((range * 2 + 1) % 4) * 125 AS ms,
         440.0 * (1 + (range * 2 + 1) % 5) AS freq
  FROM range(12)),
smp AS (
  SELECT media_id, k.range AS k,
         CAST(trunc(sin(2 * pi() * freq * (k.range / 8000.0)) * 12000)
              AS BIGINT) AS s
  FROM m, range(5000) k WHERE k.range < 8000 * ms // 1000),
nz AS (
  SELECT media_id, k, sign(s) AS sg,
         lag(sign(s)) OVER (PARTITION BY media_id ORDER BY k) AS prev
  FROM smp WHERE s != 0),
zc AS (
  SELECT media_id, sum(CASE WHEN prev IS NOT NULL AND sg != prev
                            THEN 1 ELSE 0 END) AS zero_crossings
  FROM nz GROUP BY media_id)
SELECT s.media_id, count(*) AS n_samples, CAST(8000 AS INTEGER) AS sample_rate,
       floor(sqrt(avg(CAST(s * s AS DOUBLE))) * {COS_Q} + 0.5) / {COS_Q} AS rms,
       CAST(max(abs(s)) AS INTEGER) AS peak,
       CAST(z.zero_crossings AS BIGINT) AS zero_crossings,
       floor(z.zero_crossings * 8000 / (2.0 * count(*)) * {COS_Q} + 0.5)
         / {COS_Q} AS est_freq_hz
FROM smp s JOIN zc z USING (media_id)
GROUP BY s.media_id, z.zero_crossings ORDER BY s.media_id
"""


def media_video_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end to end: executor-side uncompressed-DIB AVI
    *encode* of multi-frame gradient videos, then video_frame_stats
    walks the RIFF/hdrl/movi chunks, *decodes* every '00db' frame
    pixel-exact, and emits one stats row per frame — the payload is
    parsed once per video in the Arrow tier, never duplicated by a
    plan-side explode. The oracle rebuilds the per-frame pixel grids
    arithmetically, so a hash match proves the whole container round
    trip (headers, frame chunking, bottom-up BGR rows, padding)."""
    from data_lake_demo_spark.operators.multimodal import (
        synthetic_video_real,
        video_frame_stats,
    )

    media = synthetic_video_real(spark, n=12)
    return (
        video_frame_stats(media)
        .select(
            "media_id",
            "frame_idx",
            "fps",
            "width",
            "height",
            quantize(F.col("mean_r"), COS_Q).alias("mean_r"),
            quantize(F.col("mean_g"), COS_Q).alias("mean_g"),
            quantize(F.col("mean_b"), COS_Q).alias("mean_b"),
            quantize(F.col("luma_p50"), COS_Q).alias("luma_p50"),
        )
        .orderBy("media_id", "frame_idx")
    )


# frame f of video id: r/g gradients over (8 + id%5) × (6 + id%3),
# blue = (id·17 + f·29) % 256, 2 + id%4 frames at 4 fps
MEDIA_VIDEO_FRAMES_REAL_SQL = f"""
WITH m AS (
  SELECT range AS media_id, 8 + range % 5 AS w, 6 + range % 3 AS h,
         2 + range % 4 AS nf
  FROM range(12)),
fr AS (
  SELECT media_id, w, h, fs.range AS frame_idx,
         (media_id * 17 + fs.range * 29) % 256 AS b
  FROM m, range(5) fs WHERE fs.range < nf),
px AS (
  SELECT media_id, frame_idx, w, h, b,
         (xs.range * 255) // (w - 1) AS r,
         (ys.range * 255) // (h - 1) AS g
  FROM fr, range(12) xs, range(8) ys
  WHERE xs.range < w AND ys.range < h)
SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(4 AS INTEGER) AS fps,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       floor(avg(r) * {COS_Q} + 0.5) / {COS_Q} AS mean_r,
       floor(avg(g) * {COS_Q} + 0.5) / {COS_Q} AS mean_g,
       floor(avg(b) * {COS_Q} + 0.5) / {COS_Q} AS mean_b,
       floor(median((r * 299 + g * 587 + b * 114) // 1000) * {COS_Q} + 0.5)
         / {COS_Q} AS luma_p50
FROM px GROUP BY media_id, frame_idx, w, h, b
ORDER BY media_id, frame_idx
"""


def doc_dedup_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL ENGINE PATH under a value-hash oracle: an
    AcidTable is built from the documents fixture in three commits —
    insert even doc_ids, insert odd doc_ids, DELETE doc_id < 100 —
    with streaming/incremental.IncrementalDedupIndex folding the
    change feeds (novel registration, then canonical re-election from
    the pinned snapshot for digests whose first-seen owner was
    deleted). TWO syncs, not three: the CDF is an endpoint NET diff,
    so one sync spanning the insert-odd and delete commits sees odd
    doc_ids < 100 net out entirely and the final report is provably
    identical to syncing each commit (the oracle below is unchanged)
    — while the mixed insert+delete feed exercises the dirty
    re-election and the registration path in ONE merge_apply. The
    final dup_report value-hashes against SQL that replicates the
    full multi-phase semantics: canonical = first-seen min-even if it
    survived, else min live. A green row here certifies CDF diffing,
    merge_apply, the txn ledger, and the dirty re-election join
    end-to-end, not just relational algebra."""
    import shutil
    import tempfile

    from data_lake_demo_spark.streaming.incremental import IncrementalDedupIndex
    from data_lake_demo_spark.tableformat import AcidTable

    # key the index on a 25-char text prefix: the fixture has no
    # byte-exact dup texts at small SFs, but prefix collisions exist
    # at every SF (21/23/237 dup digests at sf0.001/0.01/0.1), so the
    # registration → duplicate-insert → re-election machinery all
    # actually fires
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 25).alias("text")
    ).persist()  # scanned by both parity-split appends
    root = tempfile.mkdtemp(prefix="dedup_idx_query_")
    try:
        base = AcidTable(spark, root + "/docs")
        idx = IncrementalDedupIndex(spark, base, root + "/idx")
        base.append(docs.filter(F.col("doc_id") % 2 == 0))
        idx.sync()
        base.append(docs.filter(F.col("doc_id") % 2 == 1))
        base.delete([("doc_id", "<", 100)])
        idx.sync()
        # bounded materialization: the report is O(duplicate rows) —
        # 237 at sf0.1 — but a pathological all-dups corpus would be
        # O(table); cap it so the driver can never OOM here (a
        # production flow writes the report to a sink instead of
        # collecting — this query collects only because its temp
        # AcidTable dies in the finally below)
        cap = 200_000
        out = (
            idx.dup_report(base.snapshot())
            .orderBy("doc_id")
            .limit(cap + 1)
            .collect()
        )
        if len(out) > cap:
            raise RuntimeError(
                f"dup report exceeds the {cap}-row driver-side bound; "
                "write it to a sink instead of collecting"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    from data_lake_demo_spark.plans.relational import _result_df

    return _result_df(
        spark, out or [], "doc_id long, dup_of long, digest string"
    )


DOC_DEDUP_INDEX_SQL = """
WITH d AS (SELECT doc_id, md5(substr(text, 1, 25)) AS digest FROM documents),
first_seen AS (
  SELECT digest,
         min(CASE WHEN doc_id % 2 = 0 THEN doc_id END) AS c_even,
         min(CASE WHEN doc_id % 2 = 1 THEN doc_id END) AS c_odd,
         min(CASE WHEN doc_id >= 100 THEN doc_id END) AS c_live
  FROM d GROUP BY digest),
canon AS (
  SELECT digest,
         CASE WHEN c_even IS NULL THEN c_odd ELSE c_even END AS c0,
         c_live
  FROM first_seen),
final AS (
  SELECT digest,
         CASE WHEN c0 >= 100 THEN c0 ELSE c_live END AS canonical
  FROM canon WHERE c_live IS NOT NULL)
SELECT d.doc_id, f.canonical AS dup_of, d.digest
FROM d JOIN final f USING (digest)
WHERE d.doc_id >= 100 AND d.doc_id != f.canonical
ORDER BY d.doc_id
"""


def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram PMI collocation mining (operators/textops.py
    pmi_collocations) — the phrase-induction score behind tokenizer
    merge rules and word2vec phrase joining: top-20 adjacent token
    pairs by pointwise mutual information, min bigram count 5. Bigram
    pairing is ``zip_with(slice, slice)`` on the token array — pure
    JVM lambdas, no self-join; totals ride in as broadcast single-row
    crossJoins; the min-count filter precedes the vocabulary joins so
    the probe side is collocations, not the corpus."""
    from data_lake_demo_spark.operators.textops import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    return (
        pmi_collocations(docs, min_count=5)
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


DOC_PMI_SQL = r"""
WITH toks AS (SELECT regexp_split_to_array(trim(text), '\s+') AS arr FROM documents),
uni AS (SELECT unnest(arr) AS w FROM toks),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS n_tokens FROM ucnt),
idx AS (SELECT arr, unnest(generate_series(1, array_length(arr)-1)) AS i FROM toks),
big AS (SELECT arr[i] AS w1, arr[i+1] AS w2 FROM idx),
btot AS (SELECT count(*)::DOUBLE AS n_bigrams FROM big),
bcnt AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1,2 HAVING count(*) >= 5)
SELECT b.w1, b.w2, b.c_ab,
       floor(ln((b.c_ab / t2.n_bigrams) / ((a.c / t.n_tokens) * (c2.c / t.n_tokens))) * 1000000 + 0.5) / 1000000 AS pmi
FROM bcnt b JOIN ucnt a ON b.w1 = a.w JOIN ucnt c2 ON b.w2 = c2.w, tot t, btot t2
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def doc_shard_assign_snake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training-shard assignment (operators/corpus.py
    shard_assign_snake): rank documents by token count descending and
    snake-deal them across 8 shards, then report per-shard doc count,
    token total, and a doc_id checksum that pins the exact membership.
    The global rank is computed DISTRIBUTED — per-size group offsets
    (window over the tiny size table) + within-group row_number
    partitioned by size — never a single-partition Window.orderBy over
    the corpus. Shards land within one document's tokens of each
    other."""
    from data_lake_demo_spark.operators.corpus import shard_assign_snake

    docs = load_table(spark, sf_dir, "documents")
    return (
        shard_assign_snake(docs, n_shards=8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("doc_id").alias("docid_sum"),
        )
        .orderBy("shard")
    )


DOC_SHARD_SNAKE_SQL = r"""
WITH d AS (SELECT doc_id,
                  array_length(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tokens
           FROM documents),
ranked AS (SELECT doc_id, n_tokens,
                  row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rank
           FROM d),
assign AS (SELECT doc_id, n_tokens,
                  CASE WHEN rank % 16 < 8 THEN rank % 16 ELSE 15 - (rank % 16) END AS shard
           FROM ranked)
SELECT shard, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS tokens, sum(doc_id)::BIGINT AS docid_sum
FROM assign GROUP BY 1 ORDER BY 1
"""


def doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction — the physical structure behind
    lexical retrieval (what doc_bm25_retrieval recomputes implicitly):
    one row per high-df term with document frequency, collection
    frequency, and the doc_id:tf posting list SORTED by doc_id and
    serialized to one string, so the entire list value-hashes. Two
    keyed aggregates (term×doc tf, then term); the list is built with
    sort_array over collected structs, deterministic regardless of
    shuffle order — at 100 TB this is the one-pass distributed index
    build, with the term key naturally skew-prone and the df floor
    doubling as the stopword-scale cutoff a real build shards
    separately."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
                    lambda x: F.concat_ws(":", x["doc_id"], x["tf"]),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 10)
        .orderBy("term")
    )


DOC_INVERTED_INDEX_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term HAVING count(*) >= 10 ORDER BY term
"""


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling with Horvitz-Thompson
    inverse weights (operators/corpus.weighted_bernoulli_sample):
    p = min(1, n_chars/3000) against the deterministic md5-radix
    uniform — the one-pass, shuffle-free weighted-sampling primitive
    a 100 TB curation pipeline uses where exact-k reservoir schemes
    (u^(1/w) keys) would need a global top-k and non-portable pow().
    Fully value-hashed: inclusion decisions are exact double
    comparisons of integer-derived operands."""
    from data_lake_demo_spark.operators.corpus import weighted_bernoulli_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        weighted_bernoulli_sample(docs, "n_chars", 3000)
        .select(
            "doc_id",
            "source",
            "n_chars",
            quantize(F.col("p_include"), COS_Q).alias("p_q"),
            quantize(F.col("ht_weight"), COS_Q).alias("ht_q"),
        )
        .orderBy("doc_id")
    )


DOC_WEIGHTED_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         LEAST(CAST(1 AS DOUBLE), n_chars / CAST(3000 AS DOUBLE)) AS p,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
           / CAST(268435456 AS DOUBLE) AS u
  FROM documents)
SELECT doc_id, source, n_chars,
       floor(p * {COS_Q} + 0.5) / {COS_Q} AS p_q,
       floor((CAST(1 AS DOUBLE) / p) * {COS_Q} + 0.5) / {COS_Q} AS ht_q
FROM s WHERE u < p ORDER BY doc_id
"""


def media_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection on REAL decoded video: consecutive-frame
    mean-absolute-difference over the AVI round trip
    (operators/multimodal.video_scene_cuts) — the scene-segmentation
    primitive that splits raw footage into training clips. The
    synthetic videos advance only the blue channel per frame, so the
    oracle derives every pair's MAD arithmetically: a hash match
    proves the decode is pixel-exact AND the temporal pairing/diff
    kernel is right."""
    from data_lake_demo_spark.operators.multimodal import (
        synthetic_video_real,
        video_scene_cuts,
    )

    media = synthetic_video_real(spark, n=12)
    return (
        video_scene_cuts(media, threshold=40.0)
        .select(
            "media_id",
            "pair_idx",
            quantize(F.col("mad"), COS_Q).alias("mad"),
            "max_abs_diff",
            "is_cut",
        )
        .orderBy("media_id", "pair_idx")
    )


# blue(f) = (id*17 + f*29) % 256 is the only channel that moves, so
# MAD = (|Δblue| * w * h) / (w * h * 3) — same two division operands
# as the kernel's int(d.sum()) / d.size
MEDIA_VIDEO_SCENE_CUTS_SQL = f"""
WITH m AS (
  SELECT range AS media_id, 8 + range % 5 AS w, 6 + range % 3 AS h,
         2 + range % 4 AS nf
  FROM range(12)),
p AS (
  SELECT media_id, w, h, fs.range AS pair_idx,
         abs(((media_id * 17 + (fs.range + 1) * 29) % 256)
             - ((media_id * 17 + fs.range * 29) % 256)) AS ab
  FROM m, range(5) fs WHERE fs.range < nf - 1)
SELECT media_id, CAST(pair_idx AS INTEGER) AS pair_idx,
       floor((ab * w * h) / (w * h * 3) * {COS_Q} + 0.5) / {COS_Q} AS mad,
       CAST(ab AS INTEGER) AS max_abs_diff,
       (ab * w * h) / (w * h * 3) > 40.0 AS is_cut
FROM p ORDER BY media_id, pair_idx
"""


def media_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling end to end: JVM-side frame plan (sequence
    + posexplode over duration metadata — no payload touched while
    planning) fanning into the mapInPandas Arrow decode tier, which
    slices a deterministic frame window from the payload and computes
    REAL byte stats per frame. The oracle rebuilds the same synthetic
    payloads, frame fan-out, and slices in SQL — a full value-hash
    check of the plan algebra, Arrow batching, and per-frame kernel."""
    from data_lake_demo_spark.operators.multimodal import (
        sample_frames_and_featurize,
        synthetic_media,
    )

    media = synthetic_media(spark, n=96)
    return (
        sample_frames_and_featurize(media)
        .select(
            "media_id",
            "frame_idx",
            "frame_ts_ms",
            quantize(F.col("mean_byte"), COS_Q).alias("mean_byte"),
            "n_distinct_bytes",
        )
        .orderBy("media_id", "frame_idx")
    )


MEDIA_FRAMES_SQL = f"""
WITH m AS (
  SELECT range AS media_id, sha256(CAST(range AS VARCHAR)) AS hexs,
         (range * 1000) % 60000 AS duration_ms
  FROM range(96) WHERE range % 3 = 2),
fr AS (
  SELECT media_id, hexs,
         unnest(range(0, duration_ms // 1000 + 1)) AS frame_idx
  FROM m),
ch AS (
  SELECT media_id, frame_idx, frame_idx * 1000 AS frame_ts_ms,
         substr(hexs, CAST((frame_idx * 8) % 64 AS INTEGER) + 1, 8) AS chunk
  FROM fr)
SELECT media_id, frame_idx, frame_ts_ms,
       floor(list_avg([ord(substr(chunk, i, 1))
                       FOR i IN range(1, len(chunk) + 1)]) * {COS_Q} + 0.5)
         / {COS_Q} AS mean_byte,
       CAST(len(list_distinct([substr(chunk, i, 1)
                               FOR i IN range(1, len(chunk) + 1)]))
            AS BIGINT) AS n_distinct_bytes
FROM ch ORDER BY media_id, frame_idx
"""


# --------------------------------------------------------------------------
# Corpus preparation: splits / packing / chunking (oracle-checked)
# --------------------------------------------------------------------------


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-bucketed train/val/test split, reported per
    (lang, split) so the check also covers stratification balance."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        split_assign(docs)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .orderBy("lang", "split")
    )


def _split_assign_oracle() -> str:
    t_train, t_val = split_thresholds()
    return f"""
SELECT lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t_train}'
              THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t_val}'
              THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs, avg(n_chars) AS avg_chars
FROM documents GROUP BY lang, split ORDER BY lang, split
"""


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing manifest: per (shard, pack), how many
    documents landed in it, their token total, and the id range — the
    table a shard-writer job would consume."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        pack_sequences(docs, ctx_tokens=2048, n_shards=8)
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


PACK_SEQUENCES_SQL = r"""
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM toks)
SELECT shard, CAST(floor(cum_before / 2048.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM cum GROUP BY shard, pack_id ORDER BY shard, pack_id
"""


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character chunks (200 chars, 50 overlap): one row per
    chunk with its length and md5, so the oracle checks the exact chunk
    boundaries and content, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_documents(docs, chunk_chars=200, overlap_chars=50)
        .select(
            "doc_id",
            "chunk_idx",
            F.length("chunk_text").alias("chunk_chars"),
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


CHUNK_OVERLAP_SQL = r"""
WITH n AS (
  SELECT doc_id, text,
         CASE WHEN length(text) <= 200 THEN 1
              ELSE 1 + CAST(ceil((length(text) - 200) / 150.0) AS BIGINT)
         END AS n_chunks
  FROM documents),
idx AS (
  SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
SELECT doc_id, chunk_idx,
       length(substr(text, CAST(chunk_idx AS INT) * 150 + 1, 200)) AS chunk_chars,
       md5(substr(text, CAST(chunk_idx AS INT) * 150 + 1, 200)) AS chunk_md5
FROM idx ORDER BY doc_id, chunk_idx
"""


def doc_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: per first-failing-reason document counts
    (operators/corpus.py quality_filter_funnel) — the auditable drop
    report a C4-style cleaning pipeline publishes with each corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        quality_filter_funnel(docs)
        .groupBy("filter_reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .orderBy("filter_reason")
    )


QUALITY_FUNNEL_SQL = r"""
WITH f AS (
  SELECT doc_id, length(text) AS n_chars,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
              AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+'))
           AS uniq_frac
  FROM documents)
SELECT CASE WHEN n_tokens < 16 THEN 'too_short'
            WHEN n_chars > 500 THEN 'too_long'
            WHEN uniq_frac < 0.35 THEN 'repetitive'
            ELSE 'kept' END AS filter_reason,
       count(*) AS n_docs, avg(n_chars) AS avg_chars
FROM f GROUP BY 1 ORDER BY filter_reason
"""


def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test 5-gram decontamination report
    (operators/corpus.py contamination_report)."""
    docs = load_table(spark, sf_dir, "documents")
    return contamination_report(docs, ngram=5).orderBy("doc_id")


def _decontaminate_oracle() -> str:
    t_train, t_val = split_thresholds()
    # string-shingle join (exact) vs Spark's xxhash64 join — identical
    # counts barring 64-bit collisions (P ~ n^2/2^65, absent at test SF)
    return f"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t_train}'
                THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t_val}'
                THEN 'val'
              ELSE 'test' END AS split,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, split,
         unnest(CASE WHEN len(t) - 4 <= 0 THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - 3),
                       i -> array_to_string(t[i:i+4], ' ')) END) AS g
  FROM s),
train AS (SELECT doc_id, g FROM sh WHERE split = 'train'),
test AS (SELECT DISTINCT g FROM sh WHERE split = 'test')
SELECT doc_id, count(*) AS n_shared_ngrams
FROM train JOIN test USING (g)
GROUP BY doc_id ORDER BY doc_id
"""


# Domain-mix targets for the showcase query: cap every non-English
# language at a different rate so each CASE branch is exercised.
DOC_MIX_RATES = {"en": 1.0, "es": 0.5, "fr": 0.25, "de": 0.125, "zh": 0.75}


def doc_sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-group deterministic sampling (operators/corpus.py
    sample_k_per_group): exactly 20 documents per source, chosen by
    the md5(doc_id) permutation — the "fixed-size eval slice per
    domain" contract, reproducible across engines because the
    permutation is pure hash arithmetic."""
    from data_lake_demo_spark.operators.corpus import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_k_per_group(docs, "source", 20)
        .select("doc_id", "source", "samp_rank")
        .orderBy("source", "samp_rank")
    )


SAMPLE_K_SQL = """
SELECT doc_id, source, samp_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS samp_rank
  FROM documents) t
WHERE samp_rank <= 20 ORDER BY source, samp_rank
"""


def doc_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing report: per-language corpus size before/after the
    deterministic stratified sample (operators/corpus.py
    stratified_sample). kept_frac converges to the configured rate."""
    docs = load_table(spark, sf_dir, "documents")
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = (
        stratified_sample(docs, DOC_MIX_RATES)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
    return (
        totals.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            n_kept.alias("n_kept"),
            (n_kept / F.col("n_docs")).alias("kept_frac"),
        )
        .orderBy("lang")
    )


def _domain_mix_oracle() -> str:
    case = " ".join(
        f"WHEN '{g}' THEN '{sample_threshold_hex(r)}'"
        for g, r in sorted(DOC_MIX_RATES.items())
    )
    return f"""
WITH t AS (
  SELECT lang, substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h
  FROM documents),
k AS (
  SELECT lang, count(*) AS n_kept FROM t
  WHERE h <= CASE lang {case} ELSE 'ffff' END
  GROUP BY lang),
tot AS (SELECT lang, count(*) AS n_docs FROM t GROUP BY lang)
SELECT lang, n_docs, COALESCE(n_kept, 0) AS n_kept,
       CAST(COALESCE(n_kept, 0) AS DOUBLE) / n_docs AS kept_frac
FROM tot LEFT JOIN k USING (lang) ORDER BY lang
"""


# Token-budget mixture targets: fr is over-weighted relative to its
# token mass so its rate saturates at 1.0 (keeps everything) while the
# other groups genuinely downsample — both branches exercised.
MIX_WEIGHTS = {"en": 0.3, "de": 0.1, "es": 0.1, "fr": 0.4, "zh": 0.1}
MIX_BUDGET_TOKENS = 12_000


def doc_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture report: per-language docs/tokens before and
    after sampling to a target token mix (operators/corpus.py
    token_budget_mix — rate_g = min(1, weight_g·budget/tokens_g),
    deterministic salted-hash keep decision)."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = token_budget_mix(docs, MIX_WEIGHTS, MIX_BUDGET_TOKENS)
    kept_l = F.when(F.col("kept"), F.lit(1)).otherwise(F.lit(0))
    kept_t = F.when(F.col("kept"), F.col("n_tok")).otherwise(F.lit(0))
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("group_tokens"),
            F.sum(kept_l).cast("long").alias("n_docs_kept"),
            F.sum(kept_t).alias("kept_tokens"),
        )
        .orderBy("lang")
    )


def _token_budget_mix_oracle() -> str:
    case = " ".join(
        f"WHEN '{g}' THEN CAST({w} AS DOUBLE)"
        for g, w in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH d AS (
  SELECT lang,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tok,
         substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 4) AS h
  FROM documents),
 r AS (
  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS group_tokens,
         least(CAST(1 AS DOUBLE),
               CASE lang {case} ELSE CAST(0 AS DOUBLE) END
               * CAST({MIX_BUDGET_TOKENS} AS DOUBLE)
               / CAST(sum(n_tok) AS DOUBLE)) AS keep_rate
  FROM d GROUP BY lang),
 k AS (
  SELECT d.lang, d.n_tok,
         (r.keep_rate >= CAST(1 AS DOUBLE) OR
          d.h < lpad(lower(to_hex(CAST(floor(r.keep_rate
                * CAST(65536 AS DOUBLE)) AS BIGINT))), 4, '0')) AS kept
  FROM d JOIN r USING (lang))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS group_tokens,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_kept,
       CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
         AS kept_tokens
FROM k GROUP BY lang ORDER BY lang
"""


def doc_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus build a user actually runs, as ONE composed
    plan: quality filter (kept docs only) → exact dedup (keep-min-id per
    content digest) → deterministic split assignment → per-shard sequence
    packing of the train split → shard manifest. Catalyst fuses the
    row-local stages (filter, digest, split hash) into the scan; the only
    shuffles are the dedup window (digest-keyed) and the per-shard packing
    window — the same two a hand-scheduled pipeline would need."""
    docs = load_table(spark, sf_dir, "documents")
    kept = quality_filter_funnel(docs).filter(F.col("filter_reason") == "kept")
    # every downstream stage needs only (id, digest, token count) —
    # compute the row-local signals in the scan and DROP the text
    # before the first shuffle, so the dedup window and packing window
    # move ~32 bytes/doc instead of the documents themselves
    slim = kept.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("__digest"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "__n_tokens"
        ),
    )
    deduped = (
        slim.withColumn("__keep", F.min("doc_id").over(W.partitionBy("__digest")))
        .filter(F.col("doc_id") == F.col("__keep"))
    )
    train = split_assign(deduped).filter(F.col("split") == "train")
    packed = pack_sequences(
        train, ctx_tokens=2048, n_shards=8, tokens_col="__n_tokens"
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count_distinct("pack_id").alias("n_packs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("shard")
    )


def _training_pipeline_oracle() -> str:
    t_train, _ = split_thresholds()
    return rf"""
WITH f AS (
  SELECT doc_id, text FROM documents
  WHERE NOT (len(regexp_split_to_array(trim(text), '\s+')) < 16)
    AND NOT (length(text) > 500)
    AND NOT (CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
             AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')) < 0.35)),
d AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
    FROM f) WHERE doc_id = keep),
s AS (
  SELECT doc_id, text FROM d
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{t_train}'),
toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM s),
cum AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM toks)
SELECT shard, count(DISTINCT CAST(floor(cum_before / 2048.0) AS BIGINT))
         AS n_packs,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM cum GROUP BY shard ORDER BY shard
"""


def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → mapInPandas featurize stage → per-media
    byte-level features (operators/multimodal.py): Shannon entropy,
    distinct-byte count, mean byte, magic-number prefix. These are
    REAL computations over the binary payload (the codec decode is the
    only remaining stub), and the oracle recomputes every one of them
    from the same synthetic payload in SQL — a full value-hash check
    of the Arrow kernel, batching, and schema plumbing."""
    from data_lake_demo_spark.operators.multimodal import (
        decode_and_featurize,
        synthetic_media,
    )

    media = synthetic_media(spark, n=96)
    feats = decode_and_featurize(media)
    return feats.select(
        "media_id",
        "media_type",
        "byte_len",
        quantize(F.col("entropy"), COS_Q).alias("entropy"),
        "n_distinct_bytes",
        quantize(F.col("mean_byte"), COS_Q).alias("mean_byte"),
        "magic",
    ).orderBy("media_id")


# the synthetic payload is the UTF-8 bytes of sha256(id) hex — exactly
# reproducible in SQL, so the oracle rebuilds payloads and recomputes
# every byte feature independently of the Arrow kernel
MEDIA_FEATURES_SQL = f"""
WITH m AS (
  SELECT range AS media_id,
         ['image','audio','video'][(range % 3) + 1] AS media_type,
         sha256(CAST(range AS VARCHAR)) AS hexs
  FROM range(96)),
chars AS (
  SELECT media_id, media_type, hexs, len(hexs) AS byte_len,
         [ord(substr(hexs, i, 1)) FOR i IN range(1, len(hexs) + 1)] AS bs
  FROM m),
hist AS (
  SELECT media_id, b, count(*) AS c
  FROM (SELECT media_id, unnest(bs) AS b FROM chars) GROUP BY media_id, b),
ent AS (
  SELECT media_id,
         floor((-sum((c * 1.0 / 64) * log2(c * 1.0 / 64))) * {COS_Q} + 0.5)
           / {COS_Q} AS entropy,
         count(*) AS n_distinct_bytes
  FROM hist GROUP BY media_id)
SELECT c.media_id, media_type, CAST(byte_len AS BIGINT) AS byte_len, entropy,
       CAST(n_distinct_bytes AS BIGINT) AS n_distinct_bytes,
       floor(list_avg(bs) * {COS_Q} + 0.5) / {COS_Q} AS mean_byte,
       substr(hexs, 1, 4) AS magic
FROM chars c JOIN ent USING (media_id) ORDER BY media_id
"""


QUERIES = {
    "media_feature_stats": media_feature_stats,
    "media_image_stats_real": media_image_stats_real,
    "media_audio_features_real": media_audio_features_real,
    "media_video_frames_real": media_video_frames_real,
    "media_video_scene_cuts": media_video_scene_cuts,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_inverted_index": doc_inverted_index,
    "doc_dedup_index_incremental": doc_dedup_index_incremental,
    "doc_pmi_collocations": doc_pmi_collocations,
    "doc_shard_assign_snake": doc_shard_assign_snake,
    "doc_tokenizer_fertility": doc_tokenizer_fertility,
    "doc_source_quality_eb": doc_source_quality_eb,
    "media_frame_features": media_frame_features,
    "doc_exact_dedup": doc_exact_dedup,
    "doc_dedup_components": doc_dedup_components,
    "doc_dedup_components_bigstar": doc_dedup_components_bigstar,
    "doc_minhash_near_dups": doc_minhash_near_dups,
    "doc_minhash_dups_portable": doc_minhash_dups_portable,
    "doc_simhash_buckets": doc_simhash_buckets,
    "doc_simhash_buckets_portable": doc_simhash_buckets_portable,
    "doc_ngram_jaccard_dups": doc_ngram_jaccard_dups,
    "doc_token_stats": doc_token_stats,
    "doc_quality_scores": doc_quality_scores,
    "doc_repetition_signals": doc_repetition_signals,
    "doc_length_histogram": doc_length_histogram,
    "doc_bpe_token_counts": doc_bpe_token_counts,
    "doc_bpe_vocab_tokens": doc_bpe_vocab_tokens,
    "doc_lang_id": doc_lang_id,
    "doc_fingerprint_buckets": doc_fingerprint_buckets,
    "doc_winnowing_overlap": doc_winnowing_overlap,
    "doc_tfidf_top_terms": doc_tfidf_top_terms,
    "doc_normalize_scrub": doc_normalize_scrub,
    "doc_scrub_boilerplate": doc_scrub_boilerplate,
    "doc_paragraph_dedup": doc_paragraph_dedup,
    "doc_substring_dedup": doc_substring_dedup,
    "doc_temperature_mix": doc_temperature_mix,
    "emb_hard_negatives": emb_hard_negatives,
    "doc_pii_scrub": doc_pii_scrub,
    "doc_lm_perplexity": doc_lm_perplexity,
    "doc_dsir_weights": doc_dsir_weights,
    "doc_split_assign": doc_split_assign,
    "doc_pack_sequences": doc_pack_sequences,
    "doc_chunk_overlap": doc_chunk_overlap,
    "doc_quality_funnel": doc_quality_funnel,
    "doc_decontaminate": doc_decontaminate,
    "doc_domain_mix": doc_domain_mix,
    "doc_sample_k_per_source": doc_sample_k_per_source,
    "doc_token_budget_mix": doc_token_budget_mix,
    "doc_training_pipeline": doc_training_pipeline,
    "emb_norms": emb_norms,
    "knn_brute_force": knn_brute_force,
    "emb_lsh_ann": emb_lsh_ann,
    "emb_lsh_multiprobe_ann": emb_lsh_multiprobe_ann,
    "emb_sq_ann": emb_sq_ann,
    "doc_retrieval_join": doc_retrieval_join,
    "doc_bm25_retrieval": doc_bm25_retrieval,
    "doc_quality_model_scores": doc_quality_model_scores,
    "doc_quality_model_scores_frozen": doc_quality_model_scores_frozen,
    "emb_pq_ann_portable": emb_pq_ann_portable,
    "emb_ivfpq_ann_portable": emb_ivfpq_ann_portable,
    "emb_ivf_ann_portable": emb_ivf_ann_portable,
    "emb_sq_ann_portable": emb_sq_ann_portable,
    "emb_filtered_ann_portable": emb_filtered_ann_portable,
    "emb_mmr_rerank": emb_mmr_rerank,
    "doc_lsh_recall_eval": doc_lsh_recall_eval,
    "doc_rag_pipeline": doc_rag_pipeline,
    "emb_kmeans_portable": emb_kmeans_portable,
    "emb_cluster_balanced_sample": emb_cluster_balanced_sample,
    "emb_graph_pagerank": emb_graph_pagerank,
    "emb_graph_communities": emb_graph_communities,
    "emb_graph_triangles": emb_graph_triangles,
    "emb_ann_recall_at_k": emb_ann_recall_at_k,
    "doc_compression_signals": doc_compression_signals,
    "doc_compression_portable": doc_compression_portable,
    "emb_ivf_ann": emb_ivf_ann,
    "emb_pq_ann": emb_pq_ann,
    "emb_ivfpq_ann": emb_ivfpq_ann,
    "emb_near_dups": emb_near_dups,
    "emb_semantic_dedup": emb_semantic_dedup,
    "emb_label_centroid_sim": emb_label_centroid_sim,
    "emb_quantize_int8": emb_quantize_int8,
}

ORACLE = {
    "doc_exact_dedup": EXACT_DEDUP_SQL,
    "doc_dedup_components": DEDUP_COMPONENTS_SQL,
    "doc_dedup_components_bigstar": DEDUP_COMPONENTS_SQL,
    "doc_token_stats": TOKEN_STATS_SQL,
    "doc_quality_scores": QUALITY_SQL,
    "doc_compression_portable": COMPRESSION_PORTABLE_SQL,
    "doc_repetition_signals": REPETITION_SQL,
    "doc_length_histogram": LENGTH_HIST_SQL,
    "doc_bpe_token_counts": BPE_COUNT_SQL,
    "doc_lang_id": _lang_id_oracle(),
    "doc_fingerprint_buckets": FINGERPRINT_SQL,
    "doc_winnowing_overlap": WINNOW_SQL,
    "doc_tfidf_top_terms": TFIDF_SQL,
    "doc_normalize_scrub": NORMALIZE_SQL,
    "doc_split_assign": _split_assign_oracle(),
    "doc_pack_sequences": PACK_SEQUENCES_SQL,
    "doc_chunk_overlap": CHUNK_OVERLAP_SQL,
    "doc_quality_funnel": QUALITY_FUNNEL_SQL,
    "doc_decontaminate": _decontaminate_oracle(),
    "doc_domain_mix": _domain_mix_oracle(),
    "doc_sample_k_per_source": SAMPLE_K_SQL,
    "doc_token_budget_mix": _token_budget_mix_oracle(),
    "doc_training_pipeline": _training_pipeline_oracle(),
    "emb_norms": EMB_NORMS_SQL,
    "knn_brute_force": KNN_SQL,
    "emb_quantize_int8": EMB_QUANTIZE_SQL,
    "doc_ngram_jaccard_dups": NGRAM_JACCARD_SQL,
    "doc_minhash_dups_portable": _minhash_portable_oracle(),
    "doc_quality_model_scores_frozen": QUALITY_FROZEN_SQL,
    "emb_pq_ann_portable": _pq_portable_oracle(),
    "emb_ivfpq_ann_portable": _ivfpq_portable_oracle(),
    "emb_ivf_ann_portable": _ivf_flat_portable_oracle(),
    "emb_mmr_rerank": _mmr_oracle(),
    "doc_lsh_recall_eval": _lsh_recall_oracle(),
    "doc_rag_pipeline": _rag_pipeline_oracle(),
    "emb_sq_ann_portable": _sq_portable_oracle(),
    "emb_filtered_ann_portable": _sq_portable_ctes(
        codes_where="WHERE vec_id % 3 = 0"
    )
    + """
SELECT qid, rk, nid,
       floor(adc_score * CAST(1000000 AS DOUBLE) + 0.5)
         / CAST(1000000 AS DOUBLE) AS adc_q
FROM ranked WHERE rk <= 5 ORDER BY qid, rk
""",
    "emb_kmeans_portable": EMB_KMEANS_PORTABLE_SQL,
    "emb_cluster_balanced_sample": EMB_CLUSTER_BALANCED_SAMPLE_SQL,
    "emb_graph_pagerank": _pagerank_oracle(),
    "emb_graph_communities": _lpa_oracle(),
    "emb_graph_triangles": _triangles_oracle(),
    "emb_ann_recall_at_k": _ann_recall_oracle(),
    "doc_simhash_buckets_portable": _simhash_portable_oracle(),
    "doc_scrub_boilerplate": SCRUB_BOILERPLATE_SQL,
    "doc_paragraph_dedup": PARAGRAPH_DEDUP_SQL,
    "doc_substring_dedup": SUBSTRING_DEDUP_SQL,
    "doc_temperature_mix": TEMPERATURE_MIX_SQL,
    "emb_hard_negatives": HARD_NEGATIVES_SQL,
    "doc_pii_scrub": PII_SCRUB_SQL,
    "doc_lm_perplexity": bigram_lm_oracle_sql(),
    "doc_dsir_weights": dsir_oracle_sql("lang = 'en'"),
    "media_feature_stats": MEDIA_FEATURES_SQL,
    "media_image_stats_real": MEDIA_IMAGE_STATS_REAL_SQL,
    "media_audio_features_real": MEDIA_AUDIO_FEATURES_REAL_SQL,
    "media_video_frames_real": MEDIA_VIDEO_FRAMES_REAL_SQL,
    "media_video_scene_cuts": MEDIA_VIDEO_SCENE_CUTS_SQL,
    "doc_weighted_sample": DOC_WEIGHTED_SAMPLE_SQL,
    "doc_inverted_index": DOC_INVERTED_INDEX_SQL,
    "doc_dedup_index_incremental": DOC_DEDUP_INDEX_SQL,
    "doc_pmi_collocations": DOC_PMI_SQL,
    "doc_shard_assign_snake": DOC_SHARD_SNAKE_SQL,
    "doc_tokenizer_fertility": _fertility_oracle(),
    "doc_source_quality_eb": DOC_SOURCE_QUALITY_EB_SQL,
    "media_frame_features": MEDIA_FRAMES_SQL,
    "emb_near_dups": _near_dup_oracle(),
    "emb_semantic_dedup": _semantic_dedup_oracle(),
    "emb_label_centroid_sim": _centroid_sim_oracle(),
    "emb_lsh_ann": _lsh_ann_oracle(),
    "emb_lsh_multiprobe_ann": _lsh_multiprobe_oracle(),
    "doc_retrieval_join": _retrieval_join_oracle(),
    "doc_bm25_retrieval": bm25_oracle_sql(n_query_docs=8, k=5),
    # doc_minhash_near_dups / doc_simhash_buckets / emb_ivf_ann /
    # emb_pq_ann: rows-only (xxhash64 minhash/simhash families and
    # k-means codebooks are engine-side; their exact twins —
    # doc_ngram_jaccard_dups, emb_near_dups, knn_brute_force — are
    # value-hash checked, and emb_lsh_ann's hyperplane family is
    # literal data so it IS value-hash checked).
}
