"""Codegen-friendly expansions of the vector fold primitives.

``functions.vector`` computes dot/norm/distance with higher-order
functions (``aggregate``/``zip_with``/``transform``). HOFs are
``CodegenFallback`` expressions in Spark — every element evaluation
interprets a lambda closure with boxing, which measured ~7 µs per
element-op on the bench host (emb_cluster_balanced_sample: 7.5 s for
2,000 rows × 8 centroids × 64 dims). This module builds the SAME
arithmetic as explicit expression trees — ``(0D + t0) + t1 + …`` —
which whole-stage codegen compiles to straight-line Java.

Bit-exactness contract (the reason these helpers may replace the
folds under the driver's value-hash oracle): every expansion keeps

- the double promotion point (each element cast to double BEFORE any
  multiply, exactly where ``to_double_array`` cast it),
- the left-to-right fold order INCLUDING the leading ``0.0`` init
  (``aggregate``'s ``acc`` starts at 0D; ``0.0 + x`` differs from
  ``x`` only at ``x = -0.0``, so the init is kept, not simplified),
- literal doubles rendered with ``repr`` (round-trips exactly).

IEEE-754 double addition/multiplication at the same operand order is
deterministic, so the expanded expression produces the identical bit
pattern to the fold — verified by the full-registry DuckDB parity
suite and a quantized-sum A/B at sf0.1 (see OPTIMIZATION_r11.md).

Expressions are built as SQL STRINGS parsed by one ``F.expr`` call:
building 64-term trees with Column operators would cost hundreds of
py4j round-trips per call site (PERF.md: 16×64 ``F.lit`` centroids =
~3 s of driver time), while one parse is milliseconds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit(x: float) -> str:
    return f"{float(x)!r}D"


def _chain(terms: list[str]) -> str:
    """((0D + t0) + t1) + … — aggregate's left fold, init included."""
    acc = "0D"
    for t in terms:
        acc = f"({acc} + {t})"
    return acc


def dot_ll_sql(vec: str, lits: list[float], dim: int | None = None) -> str:
    """Σ cast(vec[i] as double) * litᵢ as SQL text.

    Matches ``dot(to_double_array(col), literal_array)``: the cast
    happens before the multiply, products accumulate left-to-right.
    """
    n = len(lits) if dim is None else dim
    return _chain(
        [
            f"(CAST({vec}[{i}] AS DOUBLE) * {_lit(lits[i])})"
            for i in range(n)
        ]
    )


def dot_cols_sql(a: str, b: str, dim: int, *, cast: bool = True) -> str:
    """Σ aᵢ·bᵢ over two array columns as SQL text.

    ``cast=True`` promotes each element (array<float> inputs);
    ``cast=False`` assumes the arrays are already double (e.g. a
    staged unit-vector column) — matching ``dot(a, b)`` on arrays
    that ``to_double_array`` already produced.
    """
    if cast:
        terms = [
            f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))"
            for i in range(dim)
        ]
    else:
        terms = [f"({a}[{i}] * {b}[{i}])" for i in range(dim)]
    return _chain(terms)


def sq_norm_sql(vec: str, dim: int, *, cast: bool = True) -> str:
    """Σ vᵢ² (the ``dot(v, v)`` shape) as SQL text."""
    if cast:
        terms = [
            f"(CAST({vec}[{i}] AS DOUBLE) * CAST({vec}[{i}] AS DOUBLE))"
            for i in range(dim)
        ]
    else:
        terms = [f"({vec}[{i}] * {vec}[{i}])" for i in range(dim)]
    return _chain(terms)


def sq_dist_lit_sql(
    vec: str, centroid: list[float], dim: int | None = None
) -> str:
    """Σ (vᵢ - cᵢ)² against a literal centroid — ``_sq_l2``'s fold
    (``zip_with(u, c, (a,b) -> (a-b)*(a-b))`` then left-sum) with the
    subtraction on ALREADY-double elements (no cast: callers stage
    the unit vector as array<double>, exactly like the HOF path)."""
    n = len(centroid) if dim is None else dim
    terms = [
        f"(({vec}[{i}] - {_lit(centroid[i])}) * ({vec}[{i}] - {_lit(centroid[i])}))"
        for i in range(n)
    ]
    return _chain(terms)


def unit_vector_sql(vec: str, dim: int) -> str:
    """array(cast(v[0] as double)/nrm, …) — ``transform(v, x -> x /
    sqrt(Σx²))``'s result as an expanded array constructor. The norm
    subtree repeats per element in the SQL text; codegen's
    subexpression elimination evaluates it once per row."""
    nrm = f"SQRT({sq_norm_sql(vec, dim)})"
    elems = ", ".join(
        f"(CAST({vec}[{i}] AS DOUBLE) / {nrm})" for i in range(dim)
    )
    return f"array({elems})"


def cosine_cols_sql(a: str, b: str, dim: int, *, cast: bool = True) -> str:
    """dot(a,b) / (norm(a) * norm(b)) — ``cosine``'s exact expression
    shape (norms as sqrt-of-self-dot, norm(a) first in the product).
    ``cast=True`` is a no-op on array<double> inputs, so it is safe
    (and bit-identical) for every staged column the registry uses."""
    return (
        f"({dot_cols_sql(a, b, dim, cast=cast)}"
        f" / (SQRT({sq_norm_sql(a, dim, cast=cast)})"
        f" * SQRT({sq_norm_sql(b, dim, cast=cast)})))"
    )


def cosine_cols(a: str, b: str, dim: int, *, cast: bool = True) -> Column:
    return F.expr(cosine_cols_sql(a, b, dim, cast=cast))


def dot_ll(vec: str, lits: list[float]) -> Column:
    return F.expr(dot_ll_sql(vec, lits))


def dot_cols(a: str, b: str, dim: int, *, cast: bool = True) -> Column:
    return F.expr(dot_cols_sql(a, b, dim, cast=cast))


def sq_norm(vec: str, dim: int, *, cast: bool = True) -> Column:
    return F.expr(sq_norm_sql(vec, dim, cast=cast))


def sig_agreement_sql(a: str, b: str, n: int) -> str:
    """Σ CAST(a[i] = b[i] AS INT) — the MinHash signature-agreement
    count (operators/dedup.minhash_lsh_candidates and the streaming
    near-dup kernel), i.e. the fold
    ``aggregate(zip_with(a, b, (x,y) -> int(x==y)), 0, acc + x)``
    as one codegen integer chain with the fold's operand order.
    Integer addition is exact at any order; null propagation matches
    the fold (a null element nulls its term, and null + x = null
    sticks), so the expansion is value-identical on the fixed-length
    signature arrays both call sites produce."""
    acc = "0"
    for i in range(n):
        acc = f"({acc} + CAST(({a}[{i}] = {b}[{i}]) AS INT))"
    return acc


def sig_agreement(a: str, b: str, n: int) -> Column:
    return F.expr(sig_agreement_sql(a, b, n))
