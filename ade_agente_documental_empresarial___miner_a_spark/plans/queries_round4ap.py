"""Round-4 catalog additions, forty-second batch — growth accounting:

* the four-quadrant weekly user decomposition (new / retained /
  resurrected / churned) — the PM-facing identity every activity
  dashboard reduces to: actives(w) = new + retained + resurrected,
  and churned(w) = actives(w−1) − retained(w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import DUCK_EVENTS, events_table, register


# ---------------------------------------------------------------------------
# Growth accounting — distinct (user, week) activity, then one lag per
# user classifies each active week: NEW (no prior week), RETAINED
# (active the immediately previous week), RESURRECTED (active before,
# but not last week). CHURNED for week w is derived per week:
# actives(w−1) − retained(w) — computed by joining the weekly rollup
# to itself on the calendar (one small-side join over ~weeks rows, not
# users). weekofyear is calendar arithmetic identical on both engines
# for the fixture's single-month span; the week key is the MONDAY date
# (date_trunc 'week'), not an integer week number, so year boundaries
# can't alias.
@register(
    "rel_growth_accounting",
    f"""WITH {DUCK_EVENTS},
uw AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS week
  FROM ev),
flagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
  FROM uw),
classed AS (
  SELECT week,
         CASE WHEN prev_week IS NULL THEN 'new'
              WHEN week - prev_week = 7 THEN 'retained'
              ELSE 'resurrected' END AS klass
  FROM flagged),
weekly AS (
  SELECT week,
         CAST(sum(CASE WHEN klass = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN klass = 'retained' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN klass = 'resurrected' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected,
         count(*) AS n_active
  FROM classed GROUP BY week)
SELECT CAST(w.week AS TIMESTAMP) AS week,
       w.n_new, w.n_retained, w.n_resurrected, w.n_active,
       CAST(coalesce(p.n_active, 0) - w.n_retained AS BIGINT)
         AS n_churned_from_prev
FROM weekly w LEFT JOIN weekly p ON p.week = w.week - 7""",
)
def rel_growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    uw = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    flagged = uw.withColumn("prev_week", F.lag("week").over(w))
    classed = flagged.select(
        "week",
        F.when(F.col("prev_week").isNull(), "new")
        .when(F.datediff("week", "prev_week") == 7, "retained")
        .otherwise("resurrected")
        .alias("klass"),
    )
    weekly = classed.groupBy("week").agg(
        F.sum(F.when(F.col("klass") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("klass") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("klass") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
        F.count(F.lit(1)).alias("n_active"),
    )
    cur = weekly.alias("w")
    prev = weekly.alias("p")
    return cur.join(
        prev,
        F.col("p.week") == F.date_sub(F.col("w.week"), 7),
        "left",
    ).select(
        # DATE surfaces as datetime.date objects through Spark->pandas
        # but datetime64 through DuckDB->pandas (gate-mimic
        # date-vs-timestamp hazard class) — the output column is pinned
        # to TIMESTAMP on both engines (UTC session, so midnight UTC)
        F.col("w.week").cast("timestamp").alias("week"),
        F.col("w.n_new").alias("n_new"),
        F.col("w.n_retained").alias("n_retained"),
        F.col("w.n_resurrected").alias("n_resurrected"),
        F.col("w.n_active").alias("n_active"),
        (
            F.coalesce(F.col("p.n_active"), F.lit(0))
            - F.col("w.n_retained")
        )
        .cast("long")
        .alias("n_churned_from_prev"),
    )
