"""Round-4 catalog additions, twenty-second batch — windowed exact
statistics, conversion latency, and cross-engine file interop:

* rolling correlation (7-day windowed Pearson between click and view
  daily totals — the exact-moments discipline lifted into a window
  frame: DECIMAL power sums per frame, ONE double formula per row);
* time-to-convert (per purchase, the latency since the user's nearest
  preceding view — the as-of shape feeding exact latency percentiles);
* CSV interop roundtrip (Spark WRITES csv with quoting/escaping
  exercised by injected delimiters/quotes; reading it back must equal
  the parquet source the oracle states — a file a Spark job writes must
  mean the same thing to every other reader).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import events_table, register, table

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value FROM events)"
)


# ---------------------------------------------------------------------------
# Rolling correlation — daily click/view value totals per day, then a
# 7-day trailing Pearson correlation AT each day. The builtin corr()
# over a window would fold doubles in frame order (stable, but its
# variance form differs between engines); instead the frame aggregates
# exact DECIMAL power sums (Σx, Σy, Σx², Σy², Σxy over the ≤7 daily
# pairs) and ONE double formula per row converts them — windowed
# rel_regression_moments. Daily totals are exact decimals; rows with
# <2 frame days or zero variance yield NULL via nullif, identically on
# both engines.
@register(
    "rel_rolling_corr",
    f"""WITH {_DUCK_EV},
daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CASE WHEN event_type = 'click'
                       THEN CAST(value AS DECIMAL(18,6)) END)
              AS DECIMAL(14,6)) AS cx,
         CAST(sum(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(18,6)) END)
              AS DECIMAL(14,6)) AS vy
  FROM ev GROUP BY d),
pairs AS (SELECT d, cx, vy FROM daily
          WHERE cx IS NOT NULL AND vy IS NOT NULL),
framed AS (
  SELECT d,
         CAST(count(*) OVER w AS DOUBLE) AS n,
         CAST(sum(cx) OVER w AS DOUBLE) AS sx,
         CAST(sum(vy) OVER w AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(cx AS DECIMAL(19,6)) * CAST(cx AS DECIMAL(19,6)) AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(vy AS DECIMAL(19,6)) * CAST(vy AS DECIMAL(19,6)) AS DECIMAL(38,12))) OVER w AS DOUBLE) AS syy,
         CAST(sum(CAST(CAST(cx AS DECIMAL(19,6)) * CAST(vy AS DECIMAL(19,6)) AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxy
  FROM pairs
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT d, CAST(n AS BIGINT) AS n_days,
       round(((sxy - sx * sy / n)
             / nullif(sqrt(greatest(sxx - sx * sx / n, 0.0)
                           * greatest(syy - sy * sy / n, 0.0)),
                      0.0)) * 1e9) / 1e9 AS corr_7d
FROM framed""",
)
def rel_rolling_corr(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    vd = F.col("value").cast("decimal(18,6)")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", vd))
        .cast("decimal(14,6)")
        .alias("cx"),
        F.sum(F.when(F.col("event_type") == "view", vd))
        .cast("decimal(14,6)")
        .alias("vy"),
    )
    pairs = daily.where(
        F.col("cx").isNotNull() & F.col("vy").isNotNull()
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    framed = pairs.select(
        "d",
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("cx").over(w).cast("double").alias("sx"),
        F.sum("vy").over(w).cast("double").alias("sy"),
        F.sum((F.col("cx") * F.col("cx")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("vy") * F.col("vy")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("syy"),
        F.sum((F.col("cx") * F.col("vy")).cast("decimal(38,12)"))
        .over(w)
        .cast("double")
        .alias("sxy"),
    )
    # greatest(·, 0): FP cancellation in E[x²]−E[x]² can go a hair
    # NEGATIVE when a variance is truly ~0 — unclamped, DuckDB's sqrt
    # ERRORS on the negative product while Spark's returns NaN
    # (parity_fuzz, random profile). Clamping each factor identically
    # on both engines turns the degenerate window into NULL via the
    # existing nullif, and is value-neutral wherever variance > 0.
    corr = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / F.nullif(
        F.sqrt(
            F.greatest(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
                F.lit(0.0),
            )
            * F.greatest(
                F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"),
                F.lit(0.0),
            )
        ),
        F.lit(0.0),
    )
    return framed.select(
        "d",
        F.col("n").cast("long").alias("n_days"),
        dblround(corr, 9).alias("corr_7d"),
    )


# ---------------------------------------------------------------------------
# Time-to-convert — per purchase, seconds since the SAME user's nearest
# preceding view (unbounded lookback: the as-of join), rolled up into
# exact latency quartiles per user cohort (user_id % 4 here as the
# deterministic cohort stand-in). The as-of is a last_value window over
# the unioned event stream — one user-partitioned window, no range
# join; purchases with no prior view drop out (count them upstream, not
# here). Latency is integer seconds (exact); percentile interpolation
# halves are exact binary fractions.
@register(
    "rel_time_to_convert",
    f"""WITH {_DUCK_EV},
tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM ev WHERE event_type IN ('view', 'purchase')),
filled AS (
  SELECT user_id, ts, event_id, event_type,
         max(view_ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS last_view_ts
  FROM tagged),
lat AS (
  SELECT CAST(user_id % 4 AS INT) AS cohort,
         CAST(date_diff('second', last_view_ts, ts) AS BIGINT) AS sec
  FROM filled
  WHERE event_type = 'purchase' AND last_view_ts IS NOT NULL)
SELECT cohort, count(*) AS n_conversions,
       quantile_cont(CAST(sec AS DOUBLE), 0.25) AS p25_sec,
       quantile_cont(CAST(sec AS DOUBLE), 0.5) AS p50_sec,
       quantile_cont(CAST(sec AS DOUBLE), 0.75) AS p75_sec
FROM lat GROUP BY cohort""",
)
def rel_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    tagged = ev.where(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias(
            "view_ts"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "last_view_ts", F.max("view_ts").over(w)
    )
    lat = filled.where(
        (F.col("event_type") == "purchase")
        & F.col("last_view_ts").isNotNull()
    ).select(
        (F.col("user_id") % 4).cast("int").alias("cohort"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts")
        ).alias("sec"),
    )
    return lat.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.percentile(F.col("sec").cast("double"), F.lit(0.25)).alias(
            "p25_sec"
        ),
        F.percentile(F.col("sec").cast("double"), F.lit(0.5)).alias(
            "p50_sec"
        ),
        F.percentile(F.col("sec").cast("double"), F.lit(0.75)).alias(
            "p75_sec"
        ),
    )


# ---------------------------------------------------------------------------
# CSV interop roundtrip — a Spark job's CSV export must mean the same
# thing to every downstream reader. The entry injects the three
# classically mis-handled shapes into the text (field delimiters,
# double quotes, leading/trailing spaces — fixture text has no
# newlines, FIXTURES.md), writes with Spark's csv sink (RFC-4180-style
# quoting), reads it back with an explicit schema, and parity against
# the parquet-derived oracle certifies the quote/escape cycle is
# lossless. A quoting bug shows up as a column shift or a mangled
# string — both hash-visible.
def _csv_dir(sf: str) -> str:
    import tempfile

    from .queries_round4 import _source_tag

    # v2: cache key includes the export FORMAT version — the round-7
    # writer-option change (no whitespace trim) must not silently reuse
    # an export written under the old options
    return os.path.join(
        tempfile.gettempdir(),
        f"ade_csv_interop_v2_{_source_tag(sf, 'documents')}",
    )


_SPIKE = (
    "REPLACE(REPLACE(text, ' the ', ', \"the\" ,'), ' a ', ' ,a, ')"
)


@register(
    "s18_csv_interop",
    f"""SELECT doc_id, lang,
       {_SPIKE} AS spiked,
       length({_SPIKE}) AS n_chars
FROM documents""",
)
def s18_csv_interop(spark: SparkSession, sf: str) -> DataFrame:
    out = _csv_dir(sf)
    spiked = F.regexp_replace(
        F.regexp_replace("text", " the ", ', "the" ,'), " a ", " ,a, "
    )
    src = table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        spiked.alias("spiked"),
        F.length(spiked).alias("n_chars"),
    )
    # Lossless cycle on adversarial text (parity_fuzz edge profile):
    # - writer: disable the DEFAULT leading/trailing whitespace trim
    #   (it silently rewrites " " → "" on export);
    # - reader: multiLine=True so quoted embedded newlines stay one
    #   record (costs intra-file split parallelism — at 100 TB bound
    #   export file sizes with maxRecordsPerFile so files, not splits,
    #   carry the parallelism);
    # - reader: nullValue="\N" (never written) so the writer's
    #   null ↔ unquoted-empty vs "" ↔ quoted-"" distinction survives
    #   the read instead of both collapsing to NULL. Residual known
    #   ambiguity: a field whose VALUE is the two chars \N would read
    #   back as NULL — the one shape RFC-4180 quoting can't disambiguate
    #   without a writer-side escape convention.
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            src.write.mode("overwrite")
            .option("header", True)
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(out)
        )
    return (
        spark.read.schema(
            "doc_id long, lang string, spiked string, n_chars long"
        )
        .option("header", True)
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(out)
    )
