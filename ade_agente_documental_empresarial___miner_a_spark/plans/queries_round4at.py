"""Round-4 catalog additions, forty-sixth batch — graded retrieval
evaluation:

* nDCG@5 for the IVF index (recall says WHETHER the right ids came
  back; nDCG says whether they came back IN THE RIGHT ORDER, with
  graded credit discounted by position — the metric retrieval teams
  actually report next to recall).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table
from .queries_round4e import _EVAL_K, _EVAL_NPROBE

# ideal DCG for graded relevance (K, K-1, …, 1) in ideal order — a
# CONSTANT, precomputed once with each term quantized exactly like the
# live terms, and embedded as the same literal on both engines.
_IDCG = round(
    sum(
        round((_EVAL_K + 1 - p) / math.log2(p + 1), 9)
        for p in range(1, _EVAL_K + 1)
    ),
    9,
)


def _ndcg_sql() -> str:
    from ..functions.vector import duck_cosine
    from .queries_ext import _DUCK_IVF_CODEBOOK

    return f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
queries AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id % 64 = 3),
qc AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("c.cvec", "q.qvec")} DESC,
                                       c.cid DESC) AS rn
    FROM cent c CROSS JOIN queries q)
  WHERE rn <= {_EVAL_NPROBE}),
ivf5 AS (
  SELECT qid, vec_id, rn AS pos FROM (
    SELECT q.qid, ce.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("ce.embedding", "q.qvec")} DESC,
                                       ce.vec_id) AS rn
    FROM cells ce JOIN qc ON ce.cell = qc.cid
    JOIN queries q ON q.qid = qc.qid)
  WHERE rn <= {_EVAL_K}),
exact5 AS (
  SELECT qid, vec_id, rn AS exact_rank FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("e.embedding", "q.qvec")} DESC,
                                       e.vec_id) AS rn
    FROM embeddings e CROSS JOIN queries q)
  WHERE rn <= {_EVAL_K}),
terms AS (
  SELECT i.qid,
         CAST(round((({_EVAL_K} + 1 - e.exact_rank)
                    / log2(i.pos + 1)) * 1e9) / 1e9
              AS DECIMAL(20,9)) AS term
  FROM ivf5 i JOIN exact5 e
    ON e.qid = i.qid AND e.vec_id = i.vec_id)
SELECT q.qid,
       CAST(count(t.term) AS BIGINT) AS n_graded,
       round(CAST(coalesce(sum(t.term), 0) AS DOUBLE), 9) AS dcg,
       {halfup_ratio_duck(
           "coalesce(sum(t.term), CAST(0 AS DECIMAL(20,9)))",
           f"CAST('{_IDCG:.9f}' AS DECIMAL(20,9))", 9, 9, 9)}
         AS ndcg
FROM queries q LEFT JOIN terms t ON t.qid = q.qid
GROUP BY q.qid"""


@register("sim_ivf_ndcg", _ndcg_sql())
def sim_ivf_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.vector import cosine_staged, l2_norm
    from ..operators.ann import (
        _cell_scores,
        ivf_assign_arrow,
        lloyd_refine_codebook,
    )

    emb = table(spark, sf, "embeddings")
    cents = lloyd_refine_codebook(emb, 16, iters=1)
    assigned = ivf_assign_arrow(emb, 16, cents=cents)
    probed = F.slice(
        F.sort_array(_cell_scores(F.col("qvec"), cents), asc=False),
        1,
        _EVAL_NPROBE,
    )
    queries = (
        emb.where(F.col("vec_id") % 64 == 3)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            # norms staged once per side below the joins (bit-exact
            # re-grouping — functions/vector.cosine_staged)
            l2_norm(F.col("embedding")).alias("_qn"),
        )
        .withColumn(
            "_cells", F.transform(probed, lambda s: s["cid"].cast("long"))
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")
    ivf5 = (
        assigned.withColumn("_vn", l2_norm(F.col("embedding")))
        .join(
            F.broadcast(queries),
            F.array_contains(F.col("_cells"), F.col("cell")),
        )
        .select(
            "qid",
            "vec_id",
            cosine_staged(
                F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
            ).alias(
                "score"
            ),
        )
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= _EVAL_K)
        .select("qid", "vec_id", "pos")
    )
    exact5 = (
        emb.withColumn("_vn", l2_norm(F.col("embedding")))
        .crossJoin(F.broadcast(queries.select("qid", "qvec", "_qn")))
        .select(
            "qid",
            "vec_id",
            cosine_staged(
                F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
            ).alias(
                "score"
            ),
        )
        .withColumn("exact_rank", F.row_number().over(w))
        .where(F.col("exact_rank") <= _EVAL_K)
        .select("qid", "vec_id", "exact_rank")
    )
    terms = ivf5.join(exact5, ["qid", "vec_id"]).select(
        "qid",
        dblround(
            (_EVAL_K + 1 - F.col("exact_rank"))
            / F.log2(F.col("pos") + 1),
            9,
        )
        .cast("decimal(20,9)")
        .alias("term"),
    )
    return (
        queries.select("qid")
        .join(terms, "qid", "left")
        .groupBy("qid")
        .agg(
            F.count("term").alias("n_graded"),
            F.round(
                F.coalesce(F.sum("term"), F.lit(0)).cast("double"), 9
            ).alias("dcg"),
            # integer-exact HALF_UP ratio of the 9-dp decimal fold
            # over the 9-dp IDCG constant (ROUND8 §12 class; r9 audit)
            halfup_ratio(
                "coalesce(sum(term), CAST(0 AS DECIMAL(20,9)))",
                f"CAST('{_IDCG:.9f}' AS DECIMAL(20,9))",
                9,
                9,
                9,
            ).alias("ndcg"),
        )
    )
