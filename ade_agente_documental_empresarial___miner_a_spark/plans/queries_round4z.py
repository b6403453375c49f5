"""Round-4 catalog additions, twenty-sixth batch — retrieval-metric
semantics:

* MIPS vs cosine divergence (maximum-inner-product and cosine ranking
  disagree exactly where vector norms vary — the report that tells a
  retrieval team whether their index metric matches their training
  objective before anything ships).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine_similarity,
    cosine_staged,
    duck_cosine,
    duck_dot,
    l2_norm,
)
from .catalog import register, table

_MIPS_ANCHORS = 32
_MIPS_CANDS = 256


# ---------------------------------------------------------------------------
# MIPS vs cosine — per anchor, the top-1 candidate under raw inner
# product AND under cosine, plus whether they agree. Embedding models
# trained with normalized objectives retrieve by cosine; indexes often
# serve raw dot product — when norms vary the two rankings diverge,
# and THIS query measures how often. Both argmaxes rank by
# (score DESC, id) inside the anchor partition — WindowGroupLimit
# twice over one scored join; doubles are fold-order-identical across
# engines (functions/vector.py expressions), ids break exact ties.
@register(
    "emb_mips_vs_cosine",
    f"""WITH scored AS (
  SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
         {duck_dot("a.embedding", "b.embedding")} AS dot,
         {duck_cosine("a.embedding", "b.embedding")} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {_MIPS_ANCHORS} AND b.vec_id < {_MIPS_CANDS}),
ranked AS (
  SELECT anchor_id, cand_id, dot, cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY dot DESC, cand_id) AS rn_dot,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, cand_id) AS rn_cos
  FROM scored),
tops AS (
  SELECT anchor_id,
         max(CASE WHEN rn_dot = 1 THEN cand_id END) AS top_mips,
         max(CASE WHEN rn_cos = 1 THEN cand_id END) AS top_cosine
  FROM ranked GROUP BY anchor_id)
SELECT anchor_id, top_mips, top_cosine,
       top_mips = top_cosine AS metrics_agree
FROM tops""",
)
def emb_mips_vs_cosine(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import dot

    emb = table(spark, sf, "embeddings")
    a = emb.where(F.col("vec_id") < _MIPS_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("va"),
        # norms staged once per side below the pair join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.where(F.col("vec_id") < _MIPS_CANDS).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    scored = a.join(
        b, F.col("anchor_id") != F.col("cand_id")
    ).select(
        "anchor_id",
        "cand_id",
        dot(F.col("va"), F.col("vb")).alias("dot"),
        cosine_staged(
            F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
        ).alias("cos"),
    )
    wd = Window.partitionBy("anchor_id").orderBy(
        F.col("dot").desc(), "cand_id"
    )
    wc = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), "cand_id"
    )
    ranked = scored.select(
        "anchor_id",
        "cand_id",
        F.row_number().over(wd).alias("rn_dot"),
        F.row_number().over(wc).alias("rn_cos"),
    )
    tops = ranked.groupBy("anchor_id").agg(
        F.max(
            F.when(F.col("rn_dot") == 1, F.col("cand_id"))
        ).alias("top_mips"),
        F.max(
            F.when(F.col("rn_cos") == 1, F.col("cand_id"))
        ).alias("top_cosine"),
    )
    return tops.select(
        "anchor_id",
        "top_mips",
        "top_cosine",
        (F.col("top_mips") == F.col("top_cosine")).alias(
            "metrics_agree"
        ),
    )
