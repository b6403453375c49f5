"""Similarity search — SURVEY §2 J3, K1-K6, A4.

Reference query shapes (``micro-infobot/app.py``):

* K1 ``similarity_search(query)`` k=4 (app.py:223)
* K2 ``similarity_search(query, k=3)`` (app.py:143)
* K3 ``k=2, filter={"section": s}`` per section (app.py:149-150)
* K4 ``similarity_search_with_score(query, k=3)`` (app.py:312)
* A4 score normalization ``score/Σscore*100`` (app.py:318-321)
* J3 the implicit 1×N (and generalized N×M) similarity join

Physical design for scale (SURVEY §4): score with a native
higher-order-function expression (no Python boundary), broadcast the
query side, and let ``ORDER BY ... LIMIT k`` compile to
``TakeOrderedAndProject`` — a per-partition top-k heap merged at the
driver; no full sort, no full shuffle. Per-group top-k uses a
``row_number`` window (one shuffle on the group key). N×M joins
broadcast the smaller side; for large N×M use the LSH path in
``operators/ann.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, cosine_to_literal


def score_against(
    index: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Add cosine-similarity score vs one literal query vector (1×N).

    The query norm is a driver-side constant (cosine_to_literal) — one
    fewer 64-element fold per scored row in the serving hot path, with
    values bit-identical to cosine_similarity(v, lit(q))."""
    return index.withColumn(
        score_col, cosine_to_literal(F.col(vec_col), query_vec)
    )


def topk_similar(
    index: DataFrame,
    query_vec: list[float],
    k: int = 4,
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """K1/K2/K4 — top-k rows by cosine similarity to ``query_vec``.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a
    per-partition top-k heap merged at the driver; never a global sort,
    never a single-partition window. Tie-break on any id column present
    keeps results deterministic.
    """
    scored = score_against(index, query_vec, vec_col, score_col)
    order = [F.col(score_col).desc()] + [
        F.col(c) for c in ("vec_id", "chunk_id", "doc_id") if c in index.columns
    ][:1]
    return scored.orderBy(*order).limit(k)


def topk_per_group(
    index: DataFrame,
    query_vec: list[float],
    group_col: str,
    k: int = 2,
    vec_col: str = "embedding",
    score_col: str = "score",
    rank_col: str = "rnk",
) -> DataFrame:
    """K3 — top-k per group in ONE pass (replaces the reference's
    per-section loop, app.py:147-151). Deterministic tie-break on the
    group/vector id ordering supplied by ``orderBy`` below.
    """
    scored = score_against(index, query_vec, vec_col, score_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), *[c for c in ("vec_id",) if c in index.columns]
    )
    return (
        scored.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def normalize_scores(
    scored: DataFrame, score_col: str = "score", pct_col: str = "pct"
) -> DataFrame:
    """A4 — per-row percentage of the global score sum (app.py:318-321).

    The global sum is a broadcast-scalar crossJoin, not an empty
    ``Window.partitionBy()`` — the window form coalesces the frame to
    ONE partition (Spark warns ``WindowExec: No Partition Defined``),
    which is a real hazard anywhere the input is not already tiny. A4
    inputs are post-top-k (≤ k rows), but the operator should carry the
    scale-safe shape so reuse on a large frame stays parallel."""
    total = scored.agg(F.sum(score_col).alias("_score_tot"))
    return (
        scored.crossJoin(F.broadcast(total))
        .withColumn(
            pct_col, F.col(score_col) / F.col("_score_tot") * 100.0
        )
        .drop("_score_tot")
    )


def knn_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = 4,
    query_vec_col: str = "embedding",
    index_vec_col: str = "embedding",
    score_col: str = "score",
    exclude_same_id: str | None = None,
) -> DataFrame:
    """J3 generalized — N×M similarity join: for each query row, the top-k
    index rows by cosine similarity. Broadcasts the query side (queries are
    the small side in retrieval workloads); one window shuffle on query id.
    """
    from ..functions.vector import cosine_staged, l2_norm

    # stage |q| once per query row and |v| once per index row BELOW the
    # join: the interpreted HOF norm folds then run N + M times instead
    # of 2 x N x M (cosine_staged is a bit-exact re-grouping — measured
    # 2.6x at 2M-pair volume; neutral at the tiny sf0.1 leg where job
    # latency dominates)
    q = queries.select(
        F.col("query_id"),
        F.col(query_vec_col).alias("_qvec"),
        l2_norm(F.col(query_vec_col)).alias("_qn"),
    )
    joined = index.withColumn(
        "_vn", l2_norm(F.col(index_vec_col))
    ).crossJoin(F.broadcast(q))
    if exclude_same_id:
        joined = joined.where(F.col(exclude_same_id) != F.col("query_id"))
    joined = joined.withColumn(
        score_col,
        cosine_staged(
            F.col(index_vec_col), F.col("_qvec"), F.col("_vn"), F.col("_qn")
        ),
    )
    order_cols = [F.col(score_col).desc()] + (
        [F.col("vec_id")] if "vec_id" in index.columns else []
    )
    w = Window.partitionBy("query_id").orderBy(*order_cols)
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("_qvec", "_qn", "_vn")
    )
