"""Round-4 catalog additions, fifty-first batch — representation and
seasonality diagnostics:

* embedding isotropy (mean/std of pairwise cosines over a bounded
  sample — anisotropic collapse, where every vector points roughly the
  same way, silently ruins cosine retrieval; this is the two-number
  screen for it);
* weekday seasonality index (per-weekday activity relative to the
  overall daily mean — the deseasonalization factors a forecast
  divides by before modeling trend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_staged, duck_cosine, l2_norm
from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table

_ISO_CAP = 128


# ---------------------------------------------------------------------------
# Isotropy — all pairwise cosines among the first 128 vectors (8 128
# pairs, a<b): healthy isotropic embeddings center near 0; a mean
# pushed toward 1 is the anisotropy pathology (dominant direction)
# that makes cosine ranking meaningless. Mean and std from quantized
# decimal folds of cos and cos² (the moments discipline on similarity
# space). The cap pushes into both scans; at corpus scale the sample
# is a deterministic hash slice, same math.
@register(
    "emb_isotropy",
    f"""WITH pairs AS (
  SELECT {duck_cosine("a.embedding", "b.embedding")} AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < {_ISO_CAP} AND b.vec_id < {_ISO_CAP}),
q AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(round(c * 1e9) / 1e9 AS DECIMAL(20,9)))
              AS DOUBLE) AS s1,
         CAST(sum(CAST(round(c * c * 1e9) / 1e9 AS DECIMAL(20,9)))
              AS DOUBLE) AS s2
  FROM pairs)
SELECT CAST(n AS BIGINT) AS n_pairs,
       round((s1 / n) * 1e9) / 1e9 AS mean_cosine,
       round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) * 1e9)
         / 1e9 AS std_cosine
FROM q""",
)
def emb_isotropy(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").where(
        F.col("vec_id") < _ISO_CAP
    )
    a = emb.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        # norms staged once per side below the pair join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        cosine_staged(
            F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
        ).alias("c")
    )
    q = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dblround(F.col("c"), 9).cast("decimal(20,9)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            dblround(F.col("c") * F.col("c"), 9).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    return q.select(
        F.col("n").cast("long").alias("n_pairs"),
        dblround(mean, 9).alias("mean_cosine"),
        dblround(
            F.sqrt(
                F.greatest(
                    F.col("s2") / F.col("n") - mean * mean, F.lit(0.0)
                )
            ),
            9,
        ).alias("std_cosine"),
    )


# ---------------------------------------------------------------------------
# Weekday seasonality index — per ISO weekday: that weekday's average
# daily event count relative to the overall average daily count. An
# index of 1.2 for Monday means Mondays run 20% hot; a forecaster
# divides the series by these factors before fitting trend. Daily
# counts are exact; the two averages and the ratio are one fixed
# double expression.
@register(
    "rel_seasonality_index",
    f"""WITH {DUCK_EVENTS},
daily AS (
  SELECT CAST(ts AS DATE) AS d, isodow(CAST(ts AS DATE)) AS dow,
         count(*) AS n
  FROM ev GROUP BY d, dow),
overall AS (SELECT CAST(avg(CAST(n AS DOUBLE)) AS DOUBLE) AS mean_daily
            FROM daily)
SELECT CAST(dow AS INT) AS iso_weekday,
       count(*) AS n_days,
       round(avg(CAST(n AS DOUBLE)) * 1e9) / 1e9 AS mean_events,
       round((avg(CAST(n AS DOUBLE)) / mean_daily) * 1e9) / 1e9
         AS seasonality_index
FROM daily CROSS JOIN overall
GROUP BY dow, mean_daily""",
)
def rel_seasonality_index(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    daily = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.dayofweek("ts").alias("spark_dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # Spark dayofweek: Sunday=1..Saturday=7; ISO dow: Monday=1..Sunday=7
    daily = daily.withColumn(
        "dow",
        F.when(F.col("spark_dow") == 1, 7).otherwise(
            F.col("spark_dow") - 1
        ),
    )
    overall = daily.agg(
        F.avg(F.col("n").cast("double")).alias("mean_daily")
    )
    return (
        daily.crossJoin(F.broadcast(overall))
        .groupBy(
            F.col("dow").cast("int").alias("iso_weekday"),
            "mean_daily",
        )
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            dblround(F.avg(F.col("n").cast("double")), 9).alias(
                "mean_events"
            ),
            dblround(
                F.avg(F.col("n").cast("double")) / F.col("mean_daily"),
                9,
            ).alias("seasonality_index"),
        )
        .drop("mean_daily")
    )
