"""Round-4 catalog additions, thirty-seventh batch — the contrastive
triplet constructor and operational lead-time analytics:

* training triplets (anchor / same-label positive / different-label
  hard negative per anchor vector — the complete contrastive example
  constructor, closing the loop that emb_hard_negatives opened with
  the negative half);
* order lead time (order-date → ship-date latency percentiles per
  priority class — the operational SLA readout, and a second use of
  date arithmetic over the TPC-H-ish schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_staged, duck_cosine, l2_norm
from ..functions.exactmath import dblround
from .catalog import register, table

_TRIPLET_ANCHORS = 48
_TRIPLET_CANDS = 384


# ---------------------------------------------------------------------------
# Training triplets — per anchor: the nearest SAME-label candidate
# (positive: representation should pull together) and the nearest
# DIFFERENT-label candidate (hard negative: should push apart), plus
# the triplet margin (pos_cos − neg_cos; negative margin = the anchor
# currently violates the metric, exactly the examples a trainer wants
# most). One scored join, two label-filtered ranked windows, ids break
# exact ties — the same determinism discipline as emb_hard_negatives.
@register(
    "emb_training_triplets",
    f"""WITH scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS cand_id, b.label AS cand_label,
         {duck_cosine("a.embedding", "b.embedding")} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {_TRIPLET_ANCHORS} AND b.vec_id < {_TRIPLET_CANDS}),
pos AS (
  SELECT anchor_id, cand_id AS positive_id, cos AS pos_cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, cand_id) AS rn
  FROM scored WHERE cand_label = anchor_label),
neg AS (
  SELECT anchor_id, cand_id AS negative_id, cos AS neg_cos,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, cand_id) AS rn
  FROM scored WHERE cand_label <> anchor_label)
SELECT p.anchor_id, p.positive_id, n.negative_id,
       round(p.pos_cos * 1e9) / 1e9 AS pos_cos,
       round(n.neg_cos * 1e9) / 1e9 AS neg_cos,
       round((p.pos_cos - n.neg_cos) * 1e9) / 1e9 AS margin
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
WHERE p.rn = 1 AND n.rn = 1""",
)
def emb_training_triplets(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    a = emb.where(F.col("vec_id") < _TRIPLET_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.where(F.col("vec_id") < _TRIPLET_CANDS).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    scored = a.join(
        b, F.col("anchor_id") != F.col("cand_id")
    ).select(
        "anchor_id",
        "anchor_label",
        "cand_id",
        "cand_label",
        # norms staged once per side (bit-exact re-grouping —
        # functions/vector.cosine_staged)
        cosine_staged(
            F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
        ).alias("cos"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), "cand_id"
    )
    pos = (
        scored.where(F.col("cand_label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("positive_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    neg = (
        scored.where(F.col("cand_label") != F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("negative_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "positive_id",
        "negative_id",
        dblround(F.col("pos_cos"), 9).alias("pos_cos"),
        dblround(F.col("neg_cos"), 9).alias("neg_cos"),
        dblround(F.col("pos_cos") - F.col("neg_cos"), 9).alias("margin"),
    )


# ---------------------------------------------------------------------------
# Order lead time — days from order date to each line's ship date,
# rolled to exact percentiles per priority class (the SLA readout:
# "urgent orders ship p90 within N days"). Day difference is exact
# integer date arithmetic; percentile interpolation halves are exact
# binary fractions; one join on the orderkey the schema always pays,
# one 5-group aggregate.
@register(
    "rel_order_lead_time",
    """SELECT o_orderpriority,
       count(*) AS n_lines,
       quantile_cont(CAST(date_diff('day',
           CAST(o_orderdate AS TIMESTAMP),
           CAST(l_shipdate AS TIMESTAMP)) AS DOUBLE), 0.5)
         AS p50_days,
       quantile_cont(CAST(date_diff('day',
           CAST(o_orderdate AS TIMESTAMP),
           CAST(l_shipdate AS TIMESTAMP)) AS DOUBLE), 0.9)
         AS p90_days,
       CAST(max(date_diff('day',
           CAST(o_orderdate AS TIMESTAMP),
           CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) AS max_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",
)
def rel_order_lead_time(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    days = F.datediff(
        F.to_date("l_shipdate"), F.to_date("o_orderdate")
    ).cast("double")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.percentile(days, F.lit(0.5)).alias("p50_days"),
        F.percentile(days, F.lit(0.9)).alias("p90_days"),
        F.max(days).cast("long").alias("max_days"),
    )
