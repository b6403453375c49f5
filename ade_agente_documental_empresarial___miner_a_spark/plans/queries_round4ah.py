"""Round-4 catalog additions, thirty-fourth batch — deterministic
thinning and graph symmetry:

* Bresenham sampling (APPLY the mixture rates: select every doc whose
  scaled rank crosses an integer boundary — exact proportional
  thinning with zero RNG, the line-drawing algorithm repurposed as a
  sampler; selected counts are within 1 of rate×n per group BY
  CONSTRUCTION, not in expectation);
* trade-graph reciprocity (share of directed nation→nation edges whose
  reverse edge also exists — the symmetry statistic that says whether
  "A buys from B" implies "B buys from A").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import halfup_ratio, halfup_ratio_duck
from .catalog import register, table
from .queries_round4l import _EDGES_SQL


# ---------------------------------------------------------------------------
# Bresenham sampling — the deterministic way to take "37.4% of each
# language": rank docs within the group by a total order, keep row rn
# iff floor(rn·rate) > floor((rn−1)·rate). Every group's selected
# count is floor(n·rate) EXACTLY (the integer-boundary crossings in
# (0, n·rate]), evenly spread through the rank order — no RNG, no
# hash bias, reproducible on any engine/partitioning. The rate here is
# cur_mixture_weights' uniform-target rate, so this entry is the
# APPLY step of that plan. round(·,6)-quantized rate on both engines
# keeps the floor comparisons bit-identical.
@register(
    "cur_bresenham_sample",
    f"""WITH avail AS (
  SELECT lang,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS n_langs,
         CAST(sum(n_tokens) AS BIGINT) AS ti,
         CAST(count(*) AS BIGINT) AS li
  FROM avail),
rates AS (
  SELECT lang,
         least(1.0, {halfup_ratio_duck("ti", "li * n_tokens", 6)})
           AS rate
  FROM avail CROSS JOIN tot),
ranked AS (
  SELECT d.doc_id, d.lang, r.rate,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY d.doc_id) AS rn
  FROM documents d JOIN rates r USING (lang)),
kept AS (
  SELECT lang, rate, doc_id
  FROM ranked
  WHERE floor(rn * rate) > floor((rn - 1) * rate))
SELECT lang, count(*) AS n_kept,
       CAST(min(doc_id) AS BIGINT) AS first_kept,
       CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
FROM kept GROUP BY lang""",
)
def cur_bresenham_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ", -1)))
        .cast("long")
        .alias("n_tokens")
    )
    tot = avail.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_langs"),
        F.sum("n_tokens").alias("ti"),
        F.count(F.lit(1)).alias("li"),
    )
    # integer-exact HALF_UP rate (ROUND8 §12 class; r9 audit) — the
    # rate feeds floor() selection, so its last digit must be
    # cross-engine exact; least(1, halfup(x)) == halfup(least(1, x))
    # because halfup is monotone and fixes 1.0
    rates = avail.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0), halfup_ratio("ti", "li * n_tokens", 6)
        ).alias("rate"),
    )
    ranked = docs.join(F.broadcast(rates), "lang").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("doc_id")
        ),
    )
    kept = ranked.where(
        F.floor(F.col("rn") * F.col("rate"))
        > F.floor((F.col("rn") - 1) * F.col("rate"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").cast("long").alias("first_kept"),
        F.sum("doc_id").cast("long").alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Trade-graph reciprocity — of the distinct directed customer-nation →
# supplier-nation edges (self-loops excluded), how many have their
# reverse edge present? One distinct edge list, one self-join on the
# swapped key, two counts and a ratio — the graph-level symmetry
# statistic (1.0 = every trade relation is mutual).
@register(
    "graph_reciprocity",
    f"""WITH {_EDGES_SQL},
dir AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
recip AS MATERIALIZED (
  SELECT a.src, a.dst
  FROM dir a JOIN dir b ON b.src = a.dst AND b.dst = a.src)
SELECT (SELECT count(*) FROM dir) AS n_directed_edges,
       (SELECT count(*) FROM recip) AS n_reciprocated,
       {halfup_ratio_duck("(SELECT count(*) FROM recip)",
                           "(SELECT count(*) FROM dir)", 9)} AS reciprocity
""",
)
def graph_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = edges.intersect(rev)
    n_dir = edges.agg(F.count(F.lit(1)).alias("n"))
    n_rec = recip.agg(F.count(F.lit(1)).alias("n"))
    return (
        n_dir.crossJoin(n_rec.withColumnRenamed("n", "nr"))
        .select(
            F.col("n").alias("n_directed_edges"),
            F.col("nr").alias("n_reciprocated"),
            # integer-exact HALF_UP ratio (ROUND8 §12 class; r9 audit)
            halfup_ratio("nr", "n", 9).alias("reciprocity"),
        )
    )
