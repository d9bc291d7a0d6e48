"""Byte-pair-encoding tokenizer: bounded driver-side training, Arrow
batch application (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units").

The engine's token-counting surface (textops.word_tokens_bpe_ish) is a
regex approximation; this module is the real algorithm, structured
like every other trained operator here (k-means codebooks, OPQ
rotations): TRAIN on a bounded driver sample — the standard recipe;
nobody fits a BPE vocab distributed, HuggingFace trains on a sample
stream too — then APPLY across the cluster in a mapInPandas Arrow
kernel with the merge table broadcast in the closure.

Determinism: merge selection breaks frequency ties lexicographically,
so the same sample yields byte-identical merge tables across runs —
the property every md5-bucketed decision in corpus.py also keeps
(backfill-stable pipelines).

At 100 TB: training reads ``sample_limit`` documents once; apply is
map-only (no shuffle at all) and each Arrow batch amortizes a
per-word memo cache, so the cost is O(unique words) not O(tokens) on
natural text.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker (the original BPE formulation)


@dataclass
class BpeModel:
    """An ordered merge table; rank = priority (lower merges first)."""

    merges: list  # list[tuple[str, str]]

    def to_json(self) -> str:
        return json.dumps({"merges": [list(m) for m in self.merges]})

    @classmethod
    def from_json(cls, s: str) -> BpeModel:
        return cls(merges=[tuple(m) for m in json.loads(s)["merges"]])

    def vocab(self) -> set:
        out = set()
        for a, b in self.merges:
            out.update((a, b, a + b))
        return out


def _word_freqs(texts) -> dict:
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def train_bpe(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 256,
    sample_limit: int = 10_000,
) -> BpeModel:
    """Greedy pair-merge training on a bounded document sample.

    Classic Sennrich: words become char sequences + ``</w>``; each
    round merges the most frequent adjacent symbol pair (ties broken
    lexicographically for determinism) until ``num_merges`` or no
    pair repeats."""
    texts = [
        r[0]
        for r in docs.select(text_col).limit(sample_limit).collect()
        if r[0]
    ]
    freqs = _word_freqs(texts)
    words = {w: tuple(w) + (_EOW,) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        # max frequency, lexicographic tie-break => deterministic table
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = {}
        for w, syms in words.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return BpeModel(merges=merges)


def _segment_word(word: str, ranks: dict) -> list:
    """Apply merges to one word by rank priority (the tokenizer loop
    HuggingFace's BPE uses): repeatedly merge the lowest-rank adjacent
    pair present."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_counts(
    df: DataFrame,
    model: BpeModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) via a map-only Arrow kernel — the
    real-token-budget counterpart of the regex estimate. The merge
    table travels in the closure (KBs); a per-batch word memo makes
    the cost O(unique words)."""
    ranks = {tuple(m): i for i, m in enumerate(model.merges)}

    def op(batches):
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_tokens = [], []
            for t in pdf[text_col]:
                ws = (t or "").split()
                total = 0
                for w in ws:
                    c = memo.get(w)
                    if c is None:
                        c = len(_segment_word(w, ranks))
                        memo[w] = c
                    total += c
                n_words.append(len(ws))
                n_tokens.append(total)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_words": n_words,
                    "n_bpe_tokens": n_tokens,
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        op, schema="id long, n_words long, n_bpe_tokens long"
    )
