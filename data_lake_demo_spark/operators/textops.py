"""Text-analysis operators for training-data pipelines.

Everything here is built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python in the hot path. Each op is also
SQL-expressible, so the DuckDB oracle checks it (plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Chosen to be mutually exclusive markers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "fr": [" le ", " la ", " et "],
    "de": [" der ", " und ", " die "],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def word_tokens_bpe_ish(text: Column) -> Column:
    """BPE-ish sub-token segmentation via regex: word pieces, digits,
    and punctuation split into separate tokens (a cheap deterministic
    proxy for a real BPE vocab)."""
    spaced = F.regexp_replace(text, r"([^a-zA-Z0-9\s])", r" $1 ")
    return F.filter(F.split(spaced, r"\s+"), lambda x: x != "")


def stopword_ratio(text: Column, markers: list[str]) -> Column:
    """Fraction of characters covered by marker-stopword occurrences —
    computed with length arithmetic (replace), no regex engine drift."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    total = F.length(padded)
    hits = None
    for m in markers:
        # each removed occurrence shortens the string by len(m)-1 (overlap-free markers)
        h = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(" ")))) / F.lit(
            float(len(m) - 1)
        )
        hits = h if hits is None else hits + h
    return hits / total


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / whitespace / digit features per document —
    the standard cheap quality-filter feature set."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_spaces = (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast("long")
    n_tokens = token_count(t)
    return df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tokens,
            "n_spaces": n_spaces,
            "avg_token_len": (n_chars - n_spaces) / n_tokens,
            "ws_ratio": n_spaces / n_chars,
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: highest marker-stopword density wins;
    'unk' when no marker fires. Pure CASE-WHEN over length arithmetic
    (portable to the SQL oracle verbatim)."""
    t = F.col(text_col)
    scores = {
        lang: stopword_ratio(t, markers) for lang, markers in LANG_MARKERS.items()
    }
    best = None
    for lang, score in scores.items():
        cond = None
        for other, other_score in scores.items():
            if other == lang:
                continue
            c = score > other_score
            cond = c if cond is None else cond & c
        guess = F.when(cond & (score > 0), F.lit(lang))
        best = guess if best is None else best.when(cond & (score > 0), F.lit(lang))
    return df.withColumn("lang_guess", F.coalesce(best, F.lit("unk")))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full md5 digest + a 16-bit rolling-hash
    style bucket (first 4 hex chars) for cheap pre-clustering."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "md5_fp": F.md5(t.cast("binary")),
            "fp_bucket": F.substring(F.md5(t.cast("binary")), 1, 4),
        }
    )


def compression_signals(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document zlib compression ratio — the Gopher/Dolma quality
    signal orthogonal to token statistics: templated or repetitive
    text compresses far below natural prose, and near-random noise
    barely compresses at all. zlib level 6 with a fixed strategy is
    bit-deterministic for a given input, so the ratio is a stable
    pipeline feature (rows-only vs the oracle — DuckDB has no zlib).
    Runs as a map-only Arrow kernel (no shuffle; the same tier as the
    multimodal byte features)."""
    import zlib

    from pyspark.sql import functions as F

    def op(batches):
        import pandas as pd

        for pdf in batches:
            raw, comp = [], []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8", "surrogatepass")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "raw_bytes": raw,
                    "compressed_bytes": comp,
                    "ratio": [
                        (c / r) if r else 1.0 for c, r in zip(comp, raw)
                    ],
                }
            )

    return (
        df.select(F.col(id_col), F.col(text_col))
        .mapInPandas(
            op,
            schema="id long, raw_bytes long, compressed_bytes long, ratio double",
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bigram PMI collocation mining — the phrase-induction signal
    behind tokenizer merge rules and word2vec-style phrase joining
    (Mikolov et al. 2013): score adjacent token pairs by pointwise
    mutual information, ``ln((c_ab / B) / ((c_a / N) * (c_b / N)))``
    where ``N`` is the corpus token count and ``B`` the bigram count.

    Scale shape: bigrams come from ``zip_with(slice, slice)`` on the
    per-document token array (pure JVM lambda functions, no Python and
    no self-join); one shuffle each for the bigram and unigram counts;
    the ``min_count`` filter lands BEFORE the unigram joins so the
    join probe side is the (small) surviving-collocation set, not the
    full bigram table; the two unigram joins key on the word — a
    vocabulary-sized shuffle join that never involves the corpus
    itself. Totals ride in via a broadcast single-row crossJoin, not a
    driver collect. PMI is fixed-point quantized so the value-hash is
    engine-portable (ln on exact integer ratios)."""
    from pyspark.storagelevel import StorageLevel

    # four consumers (unigram counts, bigram counts, and the two
    # single-row totals) would each re-scan + re-split the corpus;
    # persist the token arrays once (ContextCleaner reclaims it when
    # the result's lineage is collected — same policy as the graph
    # operators)
    toks = df.select(
        F.split(F.trim(F.col(text_col)), r"\s+").alias("arr")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    uni = (
        toks.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("arr"), 1, F.size("arr") - 1),
                F.slice(F.col("arr"), 2, F.size("arr") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bcnt = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    totals = uni.agg(F.sum("c").cast("double").alias("n_tokens"))
    btotal = bigrams.agg(F.count(F.lit(1)).cast("double").alias("n_bigrams"))
    scored = (
        bcnt.join(uni.withColumnRenamed("c", "c_a"), bcnt["w1"] == uni["w"])
        .drop("w")
        .join(
            uni.withColumnRenamed("c", "c_b").withColumnRenamed("w", "w_"),
            F.col("w2") == F.col("w_"),
        )
        .drop("w_")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btotal))
        .withColumn(
            "pmi",
            F.floor(
                F.log(
                    (F.col("c_ab") / F.col("n_bigrams"))
                    / (
                        (F.col("c_a") / F.col("n_tokens"))
                        * (F.col("c_b") / F.col("n_tokens"))
                    )
                )
                * scale
                + F.lit(0.5)
            )
            / float(scale),
        )
    )
    return scored.select("w1", "w2", "c_ab", "pmi")


def subword_count(text: Column, chunk: int = 4) -> Column:
    """Deterministic subword-unit count: each whitespace token
    contributes ``ceil(len(token) / chunk)`` units — the fixed-width
    greedy-merge tokenizer proxy (a BPE with all merges up to length
    ``chunk``). Gives a real chars-per-token fertility signal on any
    corpus, including ones with no punctuation for the regex splitter
    to bite on. Pure array-lambda arithmetic, zero shuffle."""
    toks = F.split(F.trim(text), r"\s+")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(float(chunk))).cast("long"),
    )
