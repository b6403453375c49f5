"""Round-4 catalog additions, twenty-fifth batch — contrastive-training
data prep:

* hard-negative mining (per anchor, the most-similar vector with a
  DIFFERENT label — the pair constructor contrastive embedding
  training feeds on; easy negatives teach nothing);
* per-group quantile normalization (rank-based feature rescaling to
  [0,1] within each source — robust to arbitrary monotone score
  distortions, the standard cross-batch score calibration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_staged, duck_cosine, l2_norm
from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table

_ANCHOR_CAP = 64
_CAND_CAP = 512


# ---------------------------------------------------------------------------
# Hard-negative mining — for each anchor vector, the single most
# cosine-similar candidate with a DIFFERENT label (the "hardest"
# negative): rank by (cos DESC, cand id) inside the anchor partition
# and keep row 1 (WindowGroupLimit). Cosine doubles are identical
# across engines (same fold order, functions/vector.py), so the argmax
# is deterministic; the id tiebreak covers exact score ties. Both caps
# push into the parquet scan, so the quadratic term is bounded no
# matter the corpus size — the full-corpus path scores inside IVF
# cells (dedup_semantic's blocking) with this same ranking.
@register(
    "emb_hard_negatives",
    f"""WITH scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS neg_id,
         {duck_cosine("a.embedding", "b.embedding")} AS cos
  FROM embeddings a JOIN embeddings b
    ON b.label <> a.label
  WHERE a.vec_id < {_ANCHOR_CAP} AND b.vec_id < {_CAND_CAP}),
ranked AS (
  SELECT anchor_id, anchor_label, neg_id, cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, neg_id) AS rn
  FROM scored)
SELECT anchor_id, anchor_label, neg_id,
       round(cos * 1e9) / 1e9 AS hardness
FROM ranked WHERE rn = 1""",
)
def emb_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    a = emb.where(F.col("vec_id") < _ANCHOR_CAP).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("va"),
        # norms staged once per side below the pair join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.where(F.col("vec_id") < _CAND_CAP).select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    scored = a.join(
        b, F.col("neg_label") != F.col("anchor_label")
    ).withColumn(
        "cos",
        cosine_staged(F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")),
    )
    rn = F.row_number().over(
        Window.partitionBy("anchor_id").orderBy(
            F.col("cos").desc(), "neg_id"
        )
    )
    return (
        scored.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            dblround(F.col("cos"), 9).alias("hardness"),
        )
    )


# ---------------------------------------------------------------------------
# Per-group quantile normalization — map each document's length to its
# quantile position within its source: (rank − 1) / (n − 1) over the
# (n_chars, doc_id) TOTAL order, stated as explicit row_number/count
# arithmetic on both engines (percent_rank's tie semantics never enter:
# the total order has no ties). Rank-based rescaling survives arbitrary
# monotone distortions of the raw score — why cross-batch quality
# calibration uses it. The windows are per-SOURCE (parallel), not
# global; single-doc groups pin 0 via the nullif guard.
@register(
    "rel_quantile_normalize",
    f"""WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars NULLS FIRST, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT doc_id, source,
       {halfup_ratio_duck("rn - 1", "n - 1", 9)} AS len_quantile
FROM r""",
)
def rel_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    # explicit NULLS FIRST — Spark's asc default, DuckDB's is
    # NULLS LAST (edge-fuzz NULL-text catch, r9)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc_nulls_first(), "doc_id"
    )
    cw = Window.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    return r.select(
        "doc_id",
        "source",
        halfup_ratio("rn - 1", "n - 1", 9).alias("len_quantile"),
    )
