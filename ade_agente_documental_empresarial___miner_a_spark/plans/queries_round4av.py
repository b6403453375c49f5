"""Round-4 catalog additions, forty-eighth batch — diversified
retrieval and count-model diagnostics:

* MMR re-ranking (maximal marginal relevance: greedily pick the next
  result balancing query relevance against similarity to what's
  already picked — the diversity pass RAG retrieval runs so the top-k
  isn't five paraphrases of one chunk; greedy steps are UNROLLED in
  the oracle exactly like Bellman-Ford's rounds);
* purchase dispersion (variance-to-mean of per-user purchase counts —
  the overdispersion diagnostic that decides Poisson vs negative
  binomial before anyone fits a count model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_staged, duck_cosine, l2_norm
from ..functions.exactmath import dblround
from .catalog import register, table

_MMR_QUERY_ID = 3
_MMR_POOL = 20
_MMR_K = 4
_MMR_LAMBDA = 0.7
_MMR_CAND_CAP = 256


# ---------------------------------------------------------------------------
# MMR — pool = top-20 by relevance; step 1 picks max relevance; step
# k>1 picks argmax of λ·rel − (1−λ)·max(sim to already-picked), ids
# breaking exact ties. The oracle unrolls the K greedy steps as
# chained CTEs (sel1 ⊂ sel2 ⊂ …); the Spark side runs the same K
# small-frame iterations. MMR scores quantize round(·,9) BEFORE the
# argmax comparison on both engines so the greedy path can never
# diverge on a last-bit difference. Pool and pairwise-sim matrices
# are bounded (20 rows / 400 pairs) — at serving scale the pool comes
# from the ANN index and K stays single-digit, so the greedy cost is
# O(K·pool), never corpus-shaped.
def _mmr_oracle() -> str:
    rel = duck_cosine("e.embedding", "q.qvec")
    sim = duck_cosine("a.embedding", "b.embedding")
    steps = [
        """sel1 AS (
  SELECT vec_id, 1 AS step, round(rel * 1e9) / 1e9 AS mmr_score
  FROM pool WHERE prank = 1)"""
    ]
    for k in range(2, _MMR_K + 1):
        prev = f"sel{k - 1}"
        steps.append(
            f"""pick{k} AS (
  SELECT p.vec_id,
         round(({_MMR_LAMBDA} * p.rel - {round(1 - _MMR_LAMBDA, 9)}
               * (SELECT max(s.sim) FROM sims s
                  WHERE s.a_id = p.vec_id
                    AND s.b_id IN (SELECT vec_id FROM {prev}))) * 1e9)
           / 1e9 AS mmr_score
  FROM pool p
  WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})),
sel{k} AS (
  SELECT vec_id, step, mmr_score FROM {prev}
  UNION ALL
  SELECT vec_id, {k} AS step, mmr_score FROM (
    SELECT vec_id, mmr_score,
           row_number() OVER (ORDER BY mmr_score DESC, vec_id) AS rn
    FROM pick{k}) WHERE rn = 1)"""
        )
    return f"""WITH q AS (
  SELECT embedding AS qvec FROM embeddings
  WHERE vec_id = {_MMR_QUERY_ID}),
pool AS (
  SELECT vec_id, embedding, rel,
         row_number() OVER (ORDER BY rel DESC, vec_id) AS prank
  FROM (
    SELECT e.vec_id, e.embedding, {rel} AS rel
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id < {_MMR_CAND_CAP}
      AND e.vec_id <> {_MMR_QUERY_ID})
  QUALIFY prank <= {_MMR_POOL}),
sims AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, {sim} AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
{", ".join(steps)}
SELECT step, vec_id, mmr_score FROM sel{_MMR_K}"""


@register("sim_mmr_rerank", _mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("_qn"),
    )
    cands = (
        emb.where(
            (F.col("vec_id") < _MMR_CAND_CAP)
            & (F.col("vec_id") != _MMR_QUERY_ID)
        )
        # norms staged once per side below the join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        .withColumn("_vn", l2_norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            cosine_staged(
                F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
            ).alias("rel"),
        )
    )
    pool = (
        cands.withColumn(
            "prank",
            F.row_number().over(
                Window.orderBy(F.col("rel").desc(), "vec_id")
            ),
        )
        .where(F.col("prank") <= _MMR_POOL)
        .localCheckpoint(eager=True)
    )
    a = pool.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = pool.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    sims = (
        a.join(b, F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            cosine_staged(
                F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    selected = pool.where(F.col("prank") == 1).select(
        "vec_id",
        F.lit(1).alias("step"),
        dblround(F.col("rel"), 9).alias("mmr_score"),
    )
    for k in range(2, _MMR_K + 1):
        chosen = selected.select("vec_id")
        max_sim = (
            sims.join(
                chosen.withColumnRenamed("vec_id", "b_id"), "b_id"
            )
            .groupBy("a_id")
            .agg(F.max("sim").alias("max_sim"))
        )
        remaining = pool.join(chosen, "vec_id", "left_anti")
        scored = remaining.join(
            max_sim, remaining["vec_id"] == max_sim["a_id"]
        ).select(
            "vec_id",
            dblround(
                _MMR_LAMBDA * F.col("rel")
                - round(1 - _MMR_LAMBDA, 9) * F.col("max_sim"),
                9,
            ).alias("mmr_score"),
        )
        pick = (
            scored.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.col("mmr_score").desc(), "vec_id")
                ),
            )
            .where(F.col("rn") == 1)
            .select("vec_id", F.lit(k).alias("step"), "mmr_score")
        )
        selected = selected.unionByName(pick).localCheckpoint(
            eager=True
        )
    return selected.select("step", "vec_id", "mmr_score")


# ---------------------------------------------------------------------------
# Purchase dispersion — per-user purchase counts reduced to mean,
# variance (exact integer power sums), and the dispersion index
# var/mean: ≈1 is Poisson-like, >1 overdispersed (negative binomial
# territory), <1 underdispersed. One groupBy for the counts, one
# 1-row reduce for the moments — the five-minute check that saves a
# week of fitting the wrong count model.
@register(
    "rel_purchase_dispersion",
    """WITH ev AS (SELECT user_id, event_type FROM events),
counts AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases
  FROM ev GROUP BY user_id),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(n_purchases) AS DOUBLE) AS s1,
         CAST(sum(n_purchases * n_purchases) AS DOUBLE) AS s2
  FROM counts)
SELECT CAST(n AS BIGINT) AS n_users,
       round((s1 / n) * 1e9) / 1e9 AS mean_purchases,
       round((s2 / n - (s1 / n) * (s1 / n)) * 1e9) / 1e9
         AS var_purchases,
       round(((s2 / n - (s1 / n) * (s1 / n)) / nullif(s1 / n, 0.0))
             * 1e9) / 1e9 AS dispersion_index
FROM m""",
)
def rel_purchase_dispersion(spark: SparkSession, sf: str) -> DataFrame:
    from .catalog import events_table

    ev = events_table(spark, sf).select("user_id", "event_type")
    counts = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_purchases")
    )
    m = counts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("n_purchases").cast("double").alias("s1"),
        F.sum(F.col("n_purchases") * F.col("n_purchases"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        dblround(mean, 9).alias("mean_purchases"),
        dblround(var, 9).alias("var_purchases"),
        dblround(var / F.nullif(mean, F.lit(0.0)), 9).alias(
            "dispersion_index"
        ),
    )
