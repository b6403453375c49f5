"""Dense-vector scalar functions as native Catalyst higher-order expressions.

The reference's cosine scoring lives inside Chroma/hnswlib (C++,
``micro-infobot/app.py:130, 143, 223, 312`` implicitly). Here it is a pure
Spark SQL expression over ``ARRAY<FLOAT>`` — no Python boundary, fully
codegen'd, broadcast-join friendly. Elements are cast FLOAT→DOUBLE before
arithmetic so results are bit-reproducible across engines (float→double is
exact; the left-fold order of ``aggregate`` is the array order).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_double(x: float) -> str:
    """One double as a Spark SQL literal token. ``repr`` round-trips
    finite doubles exactly and the ``D`` suffix pins the type; the
    non-finite values have no numeric-literal spelling in Spark SQL
    (``repr`` gives 'nan'/'inf', which would ParseException), so they
    go through the documented string casts instead."""
    xd = float(x)
    if math.isfinite(xd):
        return repr(xd) + "D"
    if math.isnan(xd):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'-' if xd < 0 else ''}Infinity' AS DOUBLE)"


def lit_doubles(vals: list[float]) -> Column:
    """``array<double>`` literal built in ONE py4j round-trip.

    Classic PySpark's ``F.lit(list)`` / ``F.array(*[F.lit(x) ...])``
    issue one py4j call per element (~4 ms each) — a 256×64 codebook
    is 16k calls ≈ 60+ s of driver time per plan (measured on the
    1M-vector serving path). One ``F.expr`` string is a single round
    trip, parsed JVM-side in ms. Values are bit-identical to the
    F.lit form (see _sql_double)."""
    if not vals:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ",".join(_sql_double(x) for x in vals) + ")")


def lit_double_matrix(mat: list[list[float]]) -> Column:
    """``array<array<double>>`` literal in one py4j round-trip. Empty
    matrices and empty rows are pinned to the DOUBLE element type with
    explicit casts (a bare ``array()`` would type as array<string>)."""
    if not mat:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    rows = [
        "array(" + ",".join(_sql_double(x) for x in row) + ")"
        if row
        else "CAST(array() AS ARRAY<DOUBLE>)"
        for row in mat
    ]
    return F.expr("array(" + ",".join(rows) + ")")


def lit_longs(vals: list[int]) -> Column:
    """``array<bigint>`` literal in one py4j round-trip."""
    if not vals:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in vals) + ")")


def lit_ints(vals: list[int]) -> Column:
    """``array<int>`` literal in one py4j round-trip. The explicit cast
    keeps the element type INT even when a value would otherwise promote
    the bare SQL literal array to bigint, so joins/lookups against
    stored ARRAY<INT> columns keep their key type."""
    body = ",".join(str(int(x)) for x in vals)
    return F.expr(f"CAST(array({body}) AS ARRAY<INT>)")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-fold in array order (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda s, x: s + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine(a, b); a zero-norm operand yields NULL, not an error.

    ``try_divide`` matches the DuckDB oracle exactly (DuckDB DOUBLE
    division by zero is NULL, not ±inf), and NULL sorts LAST under the
    ``score DESC`` orderings every top-k entry uses — on both engines.
    Under plain ANSI division a single zero vector anywhere in a 100 TB
    corpus would abort the whole job with DIVIDE_BY_ZERO (found by
    tools/parity_fuzz.py's edge profile); undefined-similarity rows
    ranking last is the contract a serving pipeline actually wants.
    The arithmetic is unchanged for every nonzero denominator: same
    folds, same single correctly-rounded IEEE division."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_staged(
    vec_col: Column, qvec_col: Column, vnorm_col: Column, qnorm_col: Column
) -> Column:
    """cosine(v, q) with BOTH norms pre-staged as per-row columns — a
    bit-exact re-grouping of cosine_similarity(v, q): same dot fold,
    same |v| and |q| folds (computed once per row/side via l2_norm in a
    projection BELOW the join instead of once per PAIR inside the score
    expression), same multiply order (vnorm * qnorm), same try_divide.
    HOF folds evaluate interpreted (outside codegen), so an N x M scorer
    paying 3 folds per pair spends ~2/3 of its CPU re-deriving norms the
    pair join already knows — staging them is the r10 fix for the
    N x M hot paths (knn_join, lsh_topk, the IVF rerank, the reference
    1 x N family)."""
    return F.try_divide(dot(vec_col, qvec_col), vnorm_col * qnorm_col)


def const_l2_norm(vec: list[float]) -> float:
    """Driver-side |v| for a LITERAL vector, with the EXACT fold
    l2_norm() uses (s=0; s+=xᵢ² left-to-right; sqrt) — Python doubles
    are the same IEEE-754 ops, so the constant is bit-identical to
    evaluating l2_norm on the engine. Lets literal-query/codebook
    scoring drop one 64-element HOF fold per row without perturbing
    oracle parity."""
    s = 0.0
    for x in vec:
        xd = float(x)
        s += xd * xd
    return math.sqrt(s)


def cosine_to_literal(vec_col: Column, query_vec: list[float]) -> Column:
    """cosine(v, q) for a literal q — bit-exact re-grouping of
    cosine_similarity(v, lit(q)): same dot fold, same |v| fold, |q| as
    a driver-computed constant (const_l2_norm) in the same position of
    the same expression tree."""
    qcol = lit_doubles(query_vec)
    return F.try_divide(
        dot(vec_col, qcol),
        l2_norm(vec_col) * F.lit(const_l2_norm(query_vec)),
    )


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_sq(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as a left-fold in array order — the PQ training/ADC
    metric. Same determinism contract as dot(): FLOAT→DOUBLE casts are
    exact, subtraction/multiply/add are correctly-rounded IEEE ops, and
    the fold order is the array order on every engine."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda s, x: s + x)


# DuckDB-oracle mirrors of the expressions above (same fold order, same
# float→double casts) — used by __spark_entry__.oracle_sql().
def duck_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')"
    )


def duck_norm(a: str) -> str:
    return (
        f"sqrt(list_aggregate(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"


def duck_l2_sq(a: str, b: str) -> str:
    """DuckDB mirror of l2_sq (same fold order, same casts)."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) "
        f"* (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))), 'sum')"
    )


# --- int8 scalar quantization -------------------------------------------
# The standard 4× memory compression for billion-vector stores: per-vector
# symmetric scale s = max|v|/127, q_i = floor(v_i/s + 0.5). The quantized
# dot product is EXACT integer arithmetic (no float fold-order concerns);
# only the final rescale multiplies doubles — bit-reproducible across
# engines. At 100 TB the index scan reads int8 arrays (4× less IO) and
# rescales per pair.

def abs_max(a: Column) -> Column:
    """max|aᵢ| guarded away from zero (an all-zero vector quantizes to
    all-zero codes instead of NaN) — the guard lives HERE, mirroring
    duck_abs_max, so no call site can forget it."""
    return F.greatest(
        F.aggregate(
            a, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x.cast("double")))
        ),
        F.lit(1e-30),
    )


def quantize_i8(a: Column, scale: Column) -> Column:
    """int8-range codes as ARRAY<LONG> (stored as bytes at rest); scale
    is abs_max(a), already zero-guarded."""
    return F.transform(
        a,
        lambda x: F.floor(x.cast("double") * 127.0 / scale + F.lit(0.5)),
    )


def int_dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def duck_abs_max(a: str) -> str:
    return (
        f"greatest(list_aggregate(list_transform({a}, "
        f"x -> abs(CAST(x AS DOUBLE))), 'max'), 1e-30)"
    )


def duck_quantize_i8(a: str, scale: str) -> str:
    return (
        f"list_transform({a}, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 "
        f"/ {scale} + 0.5) AS BIGINT))"
    )


def duck_int_dot(qa: str, qb: str) -> str:
    return (
        f"CAST(list_aggregate(list_transform(list_zip({qa}, {qb}), "
        f"z -> z[1] * z[2]), 'sum') AS BIGINT)"
    )
