"""Round-4 catalog additions, fiftieth batch — change detection and
term burstiness:

* CUSUM changepoint (the monitoring classic: cumulative deviation from
  the series mean peaks AT the level shift — the day the metric
  changed, not just that it changed);
* term burstiness (Church & Gale: P(term repeats in a doc | it appears
  at all) — topical words burst, function words don't; document
  frequency alone cannot tell them apart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import (
    dblround,
    halfup_ratio,
    halfup_ratio_duck,
)
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# CUSUM changepoint — daily value totals x_t; S_t = Σ_{i≤t}(x_i − x̄)
# peaks in magnitude at the most likely single level shift. Daily
# totals are exact decimals; x̄ rides a 1-row broadcast; the running
# sum is one window over ~days rows; the argmax day takes a
# (|S| DESC, day) total order. Output: the changepoint day, its
# |CUSUM| magnitude, and the before/after daily means that describe
# the shift.
@register(
    "rel_cusum_changepoint",
    f"""WITH {DUCK_EVENTS},
daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(20,6)) AS x
  FROM ev GROUP BY d),
m AS (SELECT CAST(avg(CAST(x AS DOUBLE)) AS DOUBLE) AS xbar,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily),
cusum AS (
  SELECT d, x, n_days,
         sum(CAST(x AS DOUBLE) - xbar) OVER (
           ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS s
  FROM daily CROSS JOIN m),
pick AS (
  SELECT d AS change_day, s, n_days,
         row_number() OVER (ORDER BY abs(s) DESC, d) AS rn
  FROM cusum)
SELECT CAST(p.change_day AS TIMESTAMP) AS change_day,
       CAST(p.n_days AS BIGINT) AS n_days,
       round(abs(p.s) * 1e6) / 1e6 AS cusum_magnitude,
       round((SELECT avg(CAST(x AS DOUBLE)) FROM daily
              WHERE d <= p.change_day) * 1e6) / 1e6 AS mean_before,
       round((SELECT avg(CAST(x AS DOUBLE)) FROM daily
              WHERE d > p.change_day) * 1e6) / 1e6 AS mean_after
FROM pick p WHERE p.rn = 1""",
)
def rel_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(20,6)")
        .alias("x")
    )
    m = daily.agg(
        F.avg(F.col("x").cast("double")).alias("xbar"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = daily.crossJoin(F.broadcast(m)).withColumn(
        "s",
        F.sum(F.col("x").cast("double") - F.col("xbar")).over(run),
    )
    pick = (
        cusum.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.abs(F.col("s")).desc(), "d")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("d").alias("change_day"),
            "s",
            "n_days",
        )
        .localCheckpoint(eager=True)
    )
    before = (
        daily.join(
            F.broadcast(pick.select("change_day")),
            daily["d"] <= F.col("change_day"),
        )
        .agg(F.avg(F.col("x").cast("double")).alias("mean_before"))
    )
    after = (
        daily.join(
            F.broadcast(pick.select("change_day")),
            daily["d"] > F.col("change_day"),
        )
        .agg(F.avg(F.col("x").cast("double")).alias("mean_after"))
    )
    return (
        pick.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            # output pinned to TIMESTAMP on both engines (gate-mimic
            # date-vs-timestamp hazard class; UTC -> midnight UTC)
            F.col("change_day").cast("timestamp").alias("change_day"),
            F.col("n_days").cast("long").alias("n_days"),
            dblround(F.abs("s"), 6).alias("cusum_magnitude"),
            dblround(F.col("mean_before"), 6).alias("mean_before"),
            dblround(F.col("mean_after"), 6).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# Term burstiness — for the 50 highest-df terms: df (docs containing
# the term), burst_docs (docs containing it at least TWICE), and
# burstiness = burst_docs/df. Function words appear everywhere but
# seldom twice in these short docs; topical terms cluster. Per-doc
# term counts are one explode + one (doc, term) aggregate; the rest
# rides the aggregated term table.
_BURST_TOP = 50


@register(
    "text_term_burstiness",
    f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents),
dt AS (
  SELECT doc_id, w, count(*) AS k FROM tok
  WHERE w <> '' GROUP BY doc_id, w),
term AS (
  SELECT w, count(*) AS df,
         CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS burst_docs
  FROM dt GROUP BY w),
top AS (
  SELECT w, df, burst_docs,
         row_number() OVER (ORDER BY df DESC, w) AS rn
  FROM term)
SELECT w AS term, df, burst_docs,
       {halfup_ratio_duck("burst_docs", "df", 9)} AS burstiness
FROM top WHERE rn <= {_BURST_TOP}""",
)
def text_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("w")
    ).where(F.col("w") != "")
    dt = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("k")
    )
    term = dt.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.when(F.col("k") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("burst_docs"),
    )
    top = term.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("df").desc(), "w")
        ),
    ).where(F.col("rn") <= _BURST_TOP)
    return top.select(
        F.col("w").alias("term"),
        "df",
        "burst_docs",
        halfup_ratio("burst_docs", "df", 9).alias("burstiness"),
    )
