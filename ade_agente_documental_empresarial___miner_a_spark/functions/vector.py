"""Dense-vector scalar functions as native Catalyst higher-order expressions.

The reference's cosine scoring lives inside Chroma/hnswlib (C++,
``micro-infobot/app.py:130, 143, 223, 312`` implicitly). Here it is a pure
Spark SQL expression over ``ARRAY<FLOAT>`` — no Python boundary, fully
codegen'd, broadcast-join friendly. Elements are cast FLOAT→DOUBLE before
arithmetic so results are bit-reproducible across engines (float→double is
exact; the left-fold order of ``aggregate`` is the array order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-fold in array order (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda s, x: s + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


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
