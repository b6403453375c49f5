"""Round-4 catalog additions, twenty-first batch — attribution, feature
scaling, and local-time analytics:

* linear multi-touch attribution (each conversion's value split equally
  across its trailing-window touchpoints — the credit-assignment join
  marketing analytics actually runs, built on the interval-join shape);
* per-dimension embedding statistics (the StandardScaler fit step:
  exact mean/std per vector position — what feature normalization
  broadcasts before training);
* local-timezone rollup (UTC facts grouped by a business timezone's
  local date — the reporting-boundary conversion; the fixture window
  contains no DST transition, noted, but the offset path is the same
  code that crosses one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_mean, halfup_mean_duck
from .catalog import events_table, register, table

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value FROM events)"
)


# ---------------------------------------------------------------------------
# Linear multi-touch attribution — the interval join (purchase ←
# trailing-hour views, stream_interval_join's shape) extended with
# credit assignment: each purchase's value splits 1/n across its n
# touching views, and per-view credit sums across purchases. Division
# creates non-terminating decimals, so each share is round(·,9)-
# quantized BEFORE the DECIMAL sum — the one rounding point both
# engines state identically (the EWMA/trigram discipline). Views that
# touched no purchase simply don't appear; purchases with no views keep
# their value unattributed (reported in the unit test, not this
# per-view frame).
@register(
    "rel_multitouch_attribution",
    f"""WITH {_DUCK_EV},
v AS (SELECT user_id, ts AS v_ts, event_id AS view_id FROM ev
      WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id,
             CAST(value AS DECIMAL(18,6)) AS pv
      FROM ev WHERE event_type = 'purchase'),
j AS (
  SELECT p.purchase_id, p.pv, v.view_id,
         count(*) OVER (PARTITION BY p.purchase_id) AS n_touch
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR),
credits AS (
  SELECT view_id,
         CAST({halfup_mean_duck("pv", "n_touch", 9)} AS DECIMAL(20,9))
           AS credit
  FROM j)
SELECT view_id, count(*) AS n_conversions,
       CAST(sum(credit) AS DOUBLE) AS credit_total
FROM credits GROUP BY view_id""",
)
def rel_multitouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf)
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").cast("decimal(18,6)").alias("pv"),
    )
    cond = (
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
    )
    j = p.join(v, cond).withColumn(
        "n_touch",
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")),
    )
    # the 1/n share is a round(value/count) quotient — integer-exact
    # HALF_UP before the decimal fold (ROUND8 §12 class; r9 audit catch)
    credits = j.select(
        "view_id",
        halfup_mean("pv", "n_touch", 9)
        .cast("decimal(20,9)")
        .alias("credit"),
    )
    return credits.groupBy("view_id").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("credit").cast("double").alias("credit_total"),
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics — the StandardScaler FIT step:
# exact mean and (population) std per vector position, the
# dims×2 doubles a 100 TB training job broadcasts to normalize
# features. posexplode is map-side; the aggregate is dim-keyed (64
# groups) with map-side partials; float32 values promote to DOUBLE
# before squaring, sums quantize through DECIMAL so partition fold
# order can't smear bits (std's sqrt is correctly-rounded IEEE on the
# one final double).
@register(
    "emb_dim_stats",
    f"""WITH ex AS (
  SELECT unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(embedding) AS x
  FROM embeddings)
SELECT CAST(pos AS INT) AS dim, count(*) AS n,
       {halfup_mean_duck(
           "sum(CAST(round(CAST(x AS DOUBLE) * 1e9) / 1e9"
           " AS DECIMAL(20,9)))",
           "count(*)", 9)}
         AS dim_mean,
       round(sqrt(greatest(
         CAST(sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e9)
                       / 1e9 AS DECIMAL(25,9))) AS DOUBLE) / count(*)
         - pow(CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e9) / 1e9
                             AS DECIMAL(20,9))) AS DOUBLE) / count(*), 2),
         0.0)) * 1e9) / 1e9 AS dim_std
FROM ex GROUP BY pos""",
)
def emb_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").select("embedding")
    ex = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    )
    xd = dblround(F.col("x").cast("double"), 9).cast("decimal(20,9)")
    x2d = dblround(
        F.col("x").cast("double") * F.col("x").cast("double"), 9
    ).cast("decimal(25,9)")
    sums = ex.groupBy(F.col("pos").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("s1d"),
        F.sum(x2d).cast("double").alias("s2"),
    )
    # dim_mean is a round(sum/count) mean over an exact-decimal fold —
    # integer-exact HALF_UP (ROUND8 §12 class; r9 audit catch). dim_std
    # stays double math: the sqrt/pow path has no exact restatement.
    mean = F.col("s1d").cast("double") / F.col("n")
    var = F.greatest(
        F.col("s2") / F.col("n") - F.pow(mean, 2), F.lit(0.0)
    )
    return sums.select(
        "dim",
        "n",
        halfup_mean("s1d", "n", 9).alias("dim_mean"),
        dblround(F.sqrt(var), 9).alias("dim_std"),
    )


# ---------------------------------------------------------------------------
# Local-timezone rollup — facts land in UTC; the business reports on
# America/New_York local days, so the day boundary moves 5 hours into
# the previous UTC evening. Spark: from_utc_timestamp → local wall
# clock; DuckDB: naive-UTC → timestamptz → timezone() wall clock — two
# different APIs stating the same IANA conversion, which is exactly
# what the parity check certifies. The fixture's January window has no
# DST transition (noted); the conversion path is the one that handles
# it, and the tzdb is pinned by the runtimes on both sides.
_REPORT_TZ = "America/New_York"


@register(
    "rel_local_time_rollup",
    f"""WITH {_DUCK_EV},
loc AS (
  SELECT CAST(timezone('{_REPORT_TZ}',
              CAST(ts AS TIMESTAMPTZ)) AS DATE) AS local_date,
         event_type,
         CAST(value AS DECIMAL(18,6)) AS vd
  FROM ev)
SELECT local_date, event_type, count(*) AS n_events,
       CAST(sum(vd) AS DOUBLE) AS total_value
FROM loc GROUP BY local_date, event_type""",
)
def rel_local_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    loc = ev.select(
        F.to_date(
            F.from_utc_timestamp("ts", _REPORT_TZ)
        ).alias("local_date"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("vd"),
    )
    return loc.groupBy("local_date", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vd").cast("double").alias("total_value"),
    )
