"""Round-4 catalog additions, forty-fifth batch — revenue analytics
composites:

* cohort LTV curves (cumulative value per signup-cohort × age — the
  money companion to retention: "how much has the January-week-1
  cohort spent by week 3", the payback-period input);
* ABC classification (A = parts covering the top 80% of revenue,
  B = next 15%, C = tail — the inventory-policy cut, a running-share
  sweep over the revenue ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Cohort LTV — cohort = user's first active week (Monday date), age =
# weeks since; per (cohort, age): active users, period value, and the
# cumulative value along age (one cohort-partitioned running sum over
# the small rollup). Exact decimals to the end. Reading a row:
# "cohort W had n users at age k who have produced cum_value so far".
@register(
    "rel_cohort_ltv",
    f"""WITH {DUCK_EVENTS},
firstw AS (
  SELECT user_id,
         CAST(min(date_trunc('week', ts)) AS DATE) AS cohort
  FROM ev GROUP BY user_id),
act AS (
  SELECT f.cohort,
         CAST((CAST(date_trunc('week', e.ts) AS DATE) - f.cohort) / 7
              AS BIGINT) AS age_weeks,
         e.user_id,
         CAST(e.value AS DECIMAL(18,6)) AS vd
  FROM ev e JOIN firstw f ON f.user_id = e.user_id),
per AS (
  SELECT cohort, age_weeks,
         count(DISTINCT user_id) AS n_active,
         CAST(sum(vd) AS DECIMAL(20,6)) AS period_value
  FROM act GROUP BY cohort, age_weeks)
SELECT CAST(cohort AS TIMESTAMP) AS cohort, age_weeks, n_active,
       CAST(period_value AS DOUBLE) AS period_value,
       CAST(sum(period_value) OVER (
         PARTITION BY cohort ORDER BY age_weeks
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS cum_value
FROM per""",
)
def rel_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    firstw = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).cast("date").alias("cohort")
    )
    act = ev.join(firstw, "user_id").select(
        "cohort",
        (
            F.datediff(
                F.date_trunc("week", "ts").cast("date"), F.col("cohort")
            )
            / 7
        )
        .cast("long")
        .alias("age_weeks"),
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("vd"),
    )
    per = act.groupBy("cohort", "age_weeks").agg(
        F.count_distinct("user_id").alias("n_active"),
        F.sum("vd").cast("decimal(20,6)").alias("period_value"),
    )
    run = Window.partitionBy("cohort").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        # output pinned to TIMESTAMP on both engines (gate-mimic
        # date-vs-timestamp hazard class; UTC session -> midnight UTC)
        F.col("cohort").cast("timestamp").alias("cohort"),
        "age_weeks",
        "n_active",
        F.col("period_value").cast("double").alias("period_value"),
        F.sum("period_value").over(run).cast("double").alias("cum_value"),
    )


# ---------------------------------------------------------------------------
# ABC classification — parts ranked by revenue; the running revenue
# share over the (revenue DESC, partkey) total order assigns
# A (≤ 80%), B (≤ 95%), C (rest) using the share BEFORE this part, so
# the part that crosses a boundary still belongs to the class it
# completes — the convention that keeps class A's revenue ≥ 80%.
# Same running-share machinery as cur_vocab_coverage, pointed at
# inventory policy; the window is over the aggregated PART table.
@register(
    "rel_abc_classification",
    """WITH rev AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS revenue
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(revenue) AS DOUBLE) AS total FROM rev),
ranked AS (
  SELECT partkey, revenue,
         CAST(sum(revenue) OVER (ORDER BY revenue DESC, partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS DOUBLE) AS share_before
  FROM rev),
classed AS (
  SELECT partkey, revenue,
         CASE WHEN coalesce(share_before, 0.0) / total < 0.80 THEN 'A'
              WHEN coalesce(share_before, 0.0) / total < 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked CROSS JOIN tot)
SELECT abc, count(*) AS n_parts,
       CAST(sum(revenue) AS DOUBLE) AS class_revenue
FROM classed GROUP BY abc""",
)
def rel_abc_classification(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(24,2)")
        .alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").cast("double").alias("total"))
    before = Window.orderBy(
        F.col("revenue").desc(), "partkey"
    ).rowsBetween(Window.unboundedPreceding, -1)
    ranked = rev.withColumn(
        "share_before", F.sum("revenue").over(before).cast("double")
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "partkey",
        "revenue",
        F.when(
            F.coalesce(F.col("share_before"), F.lit(0.0))
            / F.col("total")
            < 0.80,
            "A",
        )
        .when(
            F.coalesce(F.col("share_before"), F.lit(0.0))
            / F.col("total")
            < 0.95,
            "B",
        )
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").cast("double").alias("class_revenue"),
    )
