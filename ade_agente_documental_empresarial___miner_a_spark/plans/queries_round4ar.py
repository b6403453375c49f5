"""Round-4 catalog additions, forty-fourth batch — survival analysis:

* Kaplan-Meier retention curve (time-to-churn with right-censoring:
  users still active at the observation edge are censored, not
  churned — ignoring censoring biases every retention number
  downward, which is exactly the mistake the KM estimator exists to
  prevent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register

# users whose last activity falls in the final _CENSOR_DAYS of the
# observation window are right-censored (we cannot know they churned)
_CENSOR_DAYS = 3


# ---------------------------------------------------------------------------
# Kaplan-Meier — per user: lifetime = last_day − first_day; churn
# event if the user went quiet before the censor edge, censored
# otherwise. At each distinct lifetime t: d_t churn events, n_t at
# risk (lifetime ≥ t, computed as a reverse running sum — no per-t
# rescan); S(t) = Π_{u≤t} (1 − d_u/n_u), evaluated as
# exp(Σ round(ln(1−d/n), 9)) so the product becomes an
# order-insensitive DECIMAL sum under the engine-shared ln
# quantization (the trigram discipline applied to survival). The
# curve rides ONE window over ~distinct-lifetime rows — survival at
# corpus scale is an aggregate problem, not a per-user one.
@register(
    "rel_survival_km",
    f"""WITH {DUCK_EVENTS},
span AS (
  SELECT user_id,
         CAST(min(CAST(ts AS DATE)) AS DATE) AS first_day,
         CAST(max(CAST(ts AS DATE)) AS DATE) AS last_day
  FROM ev GROUP BY user_id),
edge AS (SELECT max(last_day) AS end_day FROM span),
life AS (
  SELECT user_id,
         CAST(last_day - first_day AS BIGINT) AS lifetime,
         last_day > end_day - {_CENSOR_DAYS} AS censored
  FROM span CROSS JOIN edge),
tbl AS (
  SELECT lifetime,
         CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS DOUBLE)
           AS d,
         CAST(count(*) AS DOUBLE) AS arrivals
  FROM life GROUP BY lifetime),
risk AS (
  SELECT lifetime, d,
         sum(arrivals) OVER (ORDER BY lifetime DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS n_at_risk
  FROM tbl),
terms AS (
  SELECT lifetime, d, n_at_risk,
         CAST(CASE WHEN d > 0 AND d < n_at_risk
                   THEN round(ln(1.0 - d / n_at_risk) * 1e9) / 1e9
                   ELSE 0.0 END AS DECIMAL(20,9)) AS logterm,
         CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS hit_zero
  FROM risk)
SELECT CAST(lifetime AS BIGINT) AS lifetime_days,
       CAST(d AS BIGINT) AS n_churned,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CASE WHEN sum(hit_zero) OVER (
              ORDER BY lifetime
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
            THEN 0.0
            ELSE round(exp(CAST(sum(logterm) OVER (
              ORDER BY lifetime
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE)) * 1e9) / 1e9 END AS survival
FROM terms""",
)
def rel_survival_km(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    edge = span.agg(F.max("last_day").alias("end_day"))
    life = span.crossJoin(F.broadcast(edge)).select(
        "user_id",
        F.datediff("last_day", "first_day").cast("long").alias(
            "lifetime"
        ),
        (
            F.col("last_day")
            > F.date_sub(F.col("end_day"), _CENSOR_DAYS)
        ).alias("censored"),
    )
    tbl = life.groupBy("lifetime").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0))
        .cast("double")
        .alias("d"),
        F.count(F.lit(1)).cast("double").alias("arrivals"),
    )
    desc = Window.orderBy(F.col("lifetime").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = tbl.select(
        "lifetime",
        "d",
        F.sum("arrivals").over(desc).alias("n_at_risk"),
    )
    # d == n_at_risk (everyone at risk churns — always true at the max
    # uncensored lifetime of a fully-churned cohort) sends the log-sum
    # form to ln(0): DuckDB errors, Spark NULLs (parity_fuzz, tiny).
    # KM's real value there is EXACTLY 0 from that t onward, so the
    # zero crossing is tracked as a flag and survival pinned to 0.0 —
    # identical on both engines, value-neutral when no group hits zero.
    logterm = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
        dblround(F.log(1.0 - F.col("d") / F.col("n_at_risk")), 9),
    ).otherwise(F.lit(0.0)).cast("decimal(20,9)")
    hit_zero = F.when(
        F.col("d") >= F.col("n_at_risk"), F.lit(1)
    ).otherwise(F.lit(0))
    terms = risk.select(
        "lifetime", "d", "n_at_risk",
        logterm.alias("logterm"), hit_zero.alias("hit_zero"),
    )
    asc = Window.orderBy("lifetime").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return terms.select(
        F.col("lifetime").cast("long").alias("lifetime_days"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.when(F.sum("hit_zero").over(asc) > 0, F.lit(0.0))
        .otherwise(
            dblround(
                F.exp(F.sum("logterm").over(asc).cast("double")), 9
            )
        )
        .alias("survival"),
    )
