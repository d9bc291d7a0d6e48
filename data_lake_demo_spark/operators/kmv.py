"""KMV (k-minimum-values) distinct sketches — the bottom-k theta
sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-Value
Synopses"): keep the k smallest hash values of a key set. Unlike HLL
(union-only), KMV sketches support SET-EXPRESSION estimates — union,
and via the shared-minima Jaccard, INTERSECTION — which is what
retention/overlap questions actually need.

Everything is built on the repo's portable md5 radix hash (14 hex
chars → a uniform 56-bit integer both engines compute identically),
so sketch contents, thresholds, and estimates are all DETERMINISTIC:
the driver value-hash holds exactly, with no RNG and no float
summation anywhere (the two estimator divisions are single IEEE ops
on exactly-representable integers).

Scale shape: the k smallest hashes per group are found in TWO window
tiers — first within (group, salt) over ``n_salts`` buckets, then
over the ≤ k·n_salts survivors per group. Each salt keeps its own k
smallest, a superset of the global k smallest that fall in that salt,
so the composition is EXACT while no window partition ever sees more
than its salt's share of the group (a billion-user day never funnels
through one task). Estimator: ``floor((k-1) * 2^56 / h_k)`` on the
k-th smallest hash (the standard unbiased KMV form on the unit
interval, scaled to the hash domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

HASH_BITS = 56
HASH_SPACE = 1 << HASH_BITS


def kmv_hash(col: str) -> Column:
    """Portable uniform 56-bit hash: first 14 hex chars of md5, radix
    parsed (Spark ``conv`` ≡ DuckDB ``CAST('0x' || _ AS BIGINT)``).
    56 bits keeps ``(k-1) * 2^56`` exactly representable as a double
    (6 significant bits × a power of two) and far from int64 overflow,
    so the estimator arithmetic is engine-identical."""
    # hash the STRING form (ints render identically in both engines;
    # ANSI mode forbids a direct bigint→binary cast anyway)
    return F.expr(
        f"cast(conv(substring(md5(cast(cast({col} as string) as binary)),"
        " 1, 14), 16, 10) as bigint)"
    )


def kmv_hash_oracle(col: str) -> str:
    """DuckDB twin of ``kmv_hash`` — MUST stay in lockstep."""
    return f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR))::VARCHAR, 1, 14)) AS BIGINT)"


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    k: int = 64,
    n_salts: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: ``(group_cols..., kmv array<bigint>,
    n_keys bigint)`` where ``kmv`` is the sorted k smallest distinct
    key hashes and ``n_keys`` the sketch size (< k means the group's
    true distinct count is exact)."""
    h = (
        df.select(*group_cols, kmv_hash(key_col).alias("h"))
        .dropDuplicates([*group_cols, "h"])
        .withColumn("_salt", F.pmod(F.col("h"), F.lit(n_salts)))
    )
    w1 = W.partitionBy(*group_cols, "_salt").orderBy("h")
    tier1 = (
        h.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_r", "_salt")
    )
    w2 = W.partitionBy(*group_cols).orderBy("h")
    return (
        tier1.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )


def kmv_distinct_est(kmv: Column, n_keys: Column, k: int) -> Column:
    """Distinct-count estimate: exact when the sketch is unsaturated,
    else ``floor((k-1) * 2^56 / h_k)`` — the numerator is exact in a
    double and the single division rounds identically in any IEEE
    engine, so the floored estimate value-hashes."""
    h_k = F.element_at(kmv, k)
    return F.when(n_keys < k, n_keys.cast("bigint")).otherwise(
        F.floor(F.lit(float((k - 1) * HASH_SPACE)) / h_k)
    ).cast("bigint")


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Union sketch: the k smallest of the merged distinct hash sets
    (array ops only — sketches merge without touching the data)."""
    return F.slice(F.sort_array(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_intersect_est(a: Column, b: Column, k: int) -> Column:
    """Intersection estimate: Jaccard over the union sketch's shared
    minima, scaled by the union estimate — ``floor(|K(a∪b) ∩ a ∩ b|
    * union_est / k')`` with k' the union sketch size; exact when both
    sides are unsaturated. Deterministic double arithmetic on exact
    integers (see kmv_distinct_est)."""
    u = F.sort_array(F.array_distinct(F.concat(a, b)))
    uk = F.slice(u, 1, k)
    n_u = F.least(F.size(u), F.lit(k))
    shared = F.size(
        F.filter(uk, lambda h: F.array_contains(a, h) & F.array_contains(b, h))
    )
    saturated = F.size(u) >= k
    union_est = F.when(
        saturated,
        F.lit(float((k - 1) * HASH_SPACE)) / F.element_at(uk, k),
    ).otherwise(F.size(u).cast("double"))
    return F.floor(shared * union_est / n_u).cast("bigint")
