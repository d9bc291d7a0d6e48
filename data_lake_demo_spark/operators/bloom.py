"""Bloom-filter semi-join pruning — build a compact bitset from the
dim side's join keys, push it into the fact scan as a map-side
predicate, then exact-verify with a real semi-join.

Why it matters at 100 TB: a plain semi-join shuffles EVERY fact row
to its join partition before any dim key is consulted. The bloom
probe runs inside the fact's scan stage (same task, no exchange), so
only matching rows (plus the bloom's ~1% false positives) ever enter
the shuffle — for a selective dim filter that is a 10-100x cut in
shuffle bytes. The final semi-join removes false positives, so the
operator is EXACT; the bloom only prunes. This is the hand-rolled
twin of Spark's `spark.sql.optimizer.runtimeFilter.bloomFilter.
enabled` (off by default), kept explicit so the plan is deterministic
and testable.

Sizing: with ``n`` dim keys, ``m = bits_per_key * n`` bits and
``k = 5`` hashes give FP ~ (1 - e^(-k*n/m))^k (~0.9% at 10 bits/key).
The bitset lives on the driver and in each task (m/8 bytes: 16 KB at
the default 2^17 bits, ~120 MB at 10^8 keys) — beyond ~10^8 dim keys
skip the bloom and use the plain semi-join.

Hash contract: positions come from ``xxhash64(key, i)`` for seed
i in 0..k-1. xxhash64 is TYPE-sensitive — build and probe key
columns must have the same Spark type (both BIGINT here), and the
seed is an INT literal on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS_DEFAULT = 1 << 17
N_HASHES_DEFAULT = 5


def _sql_long_array(vals: list[int]) -> str:
    """One SQL array literal (a single parse + constant fold) instead
    of per-element F.lit py4j round-trips — see PERF.md 'Driver-side
    expression building'."""
    return "array(" + ",".join(f"{v}L" for v in vals) + ")"


def build_bloom(
    keys: DataFrame,
    key_col: str,
    n_bits: int = N_BITS_DEFAULT,
    n_hashes: int = N_HASHES_DEFAULT,
) -> list[int]:
    """Aggregate the key set into a bloom bitset (list of 64-bit
    blocks). One narrow aggregation: k positions per key via
    xxhash64(key, seed), OR-combined per block with ``bit_or`` —
    partial (map-side) combine applies, and only ``n_bits/64`` longs
    reach the driver."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    pos = F.pmod(F.xxhash64(F.col(key_col), F.col("__seed")), F.lit(n_bits))
    blocks = (
        keys.select(
            F.col(key_col),
            F.explode(F.expr(f"sequence(0, {n_hashes - 1})")).alias("__seed"),
        )
        .select(pos.alias("__pos"))
        .select(
            F.expr("CAST(__pos DIV 64 AS INT)").alias("__block"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))").alias(
                "__mask"
            ),
        )
        .groupBy("__block")
        .agg(F.expr("bit_or(__mask)").alias("__bits"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in blocks:
        out[r["__block"]] = r["__bits"]
    return out


def bloom_probe_filter(
    df: DataFrame,
    key_col: str,
    blocks: list[int],
    n_hashes: int = N_HASHES_DEFAULT,
    *,
    max_literal_bits: int = 1 << 20,
) -> DataFrame:
    """Keep rows whose key MIGHT be in the bloom (no false negatives).

    Two physical strategies behind one contract:

    - **Literal path** (bitsets up to ``max_literal_bits``, default
      2^20 bits = 128 KiB): the bitset is one constant-folded array
      literal; each of the k checks indexes it with element_at — all
      JVM-side, no UDF, runs in the scan stage. Beyond ~1 MB the
      serialized literal bloats every task's plan and parse time —
      do NOT raise the cap past that.
    - **Broadcast path** (larger bitsets): positions are still
      computed JVM-side (the xxhash64 hash contract must match the
      build side exactly), but the bitset ships as a Spark BROADCAST
      (one copy per executor, not per-plan-copy) and an
      Arrow-vectorized pandas UDF tests all k bits per batch with
      numpy — still map-side inside the scan stage, no shuffle.
    """
    n_bits = len(blocks) * 64
    if n_bits <= max_literal_bits:
        checks = " AND ".join(
            f"(element_at(__bloom, "
            f"CAST(pmod(xxhash64({key_col}, {i}), {n_bits}) DIV 64 AS INT) + 1) "
            f"& shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64({key_col}, {i}), {n_bits}) % 64 AS INT))) != 0"
            for i in range(n_hashes)
        )
        return (
            df.withColumn("__bloom", F.expr(_sql_long_array(blocks)))
            .filter(F.expr(checks))
            .drop("__bloom")
        )

    bits = np.array(blocks, dtype=np.int64).view(np.uint64)
    bcast = df.sparkSession.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def __bloom_hit(positions: pd.Series) -> pd.Series:
        b = bcast.value
        arr = np.asarray(positions.tolist(), dtype=np.int64)
        if arr.size == 0:
            return pd.Series([], dtype=bool)
        word = b[arr >> 6]
        mask = np.uint64(1) << (arr & np.int64(63)).astype(np.uint64)
        return pd.Series(((word & mask) != 0).all(axis=1))

    pos = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(F.xxhash64(F.col(key_col), i), F.lit(n_bits)),
    )
    return (
        df.withColumn("__pos", pos)
        .filter(__bloom_hit(F.col("__pos")))
        .drop("__pos")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = N_BITS_DEFAULT,
    n_hashes: int = N_HASHES_DEFAULT,
) -> DataFrame:
    """Exact semi-join with bloom pre-pruning: bloom-filter the fact
    side map-side, then left_semi against the dim keys to drop false
    positives. Result is identical to ``fact JOIN dim_keys`` semi —
    only the shuffle volume changes."""
    blocks = build_bloom(dim_keys, dim_key, n_bits, n_hashes)
    pruned = bloom_probe_filter(fact, fact_key, blocks, n_hashes)
    # no .distinct(): left_semi already emits each fact row at most once
    dim = dim_keys.select(F.col(dim_key).alias(fact_key))
    return pruned.join(dim, fact_key, "left_semi")
