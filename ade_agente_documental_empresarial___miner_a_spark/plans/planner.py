"""Physical-strategy selection — SURVEY §4's optional optimizer work,
expressed at the PySpark level (a true Catalyst rule needs Scala; the
decision logic is identical).

``adaptive_topk`` picks between the exact scan (TakeOrderedAndProject —
always correct, best for small/medium indexes) and LSH bucket pruning
(scans ~1/2^planes of the index) using Catalyst's own logical-plan size
estimate, which is free — no count() job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import ann
from ..operators.similarity import topk_similar

# beyond ~1 GiB of index bytes per query, prune via LSH buckets
DEFAULT_EXACT_BYTES = 1 << 30


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst logical-plan size estimate (no job)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def adaptive_topk(
    index: DataFrame,
    query_vec: list[float],
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exact_threshold_bytes: int = DEFAULT_EXACT_BYTES,
) -> tuple[DataFrame, str]:
    """Top-k by cosine similarity with automatic exact/ANN choice.

    Returns (result, strategy) where strategy is 'exact' or 'lsh'.
    """
    size = estimated_size_bytes(index)
    if size <= exact_threshold_bytes:
        return topk_similar(index, query_vec, k, vec_col=vec_col), "exact"

    from pyspark.sql import functions as F

    planes = ann.hyperplanes()
    spark = index.sparkSession
    q = spark.createDataFrame(
        [(-1, [float(x) for x in query_vec])],
        f"{id_col} long, {vec_col} array<float>",
    )
    out = ann.lsh_topk(
        q, index, k=k, vec_col=vec_col, id_col=id_col, planes=planes
    )
    return out.drop("query_id"), "lsh"
