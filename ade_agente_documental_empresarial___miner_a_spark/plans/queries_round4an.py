"""Round-4 catalog additions, fortieth batch — series risk and
distribution stability:

* maximum drawdown (peak-to-trough decline of each user's cumulative
  value series — the risk statistic that, unlike variance, reads in
  the same units as the series and only ever looks backward, so it is
  window-expressible);
* population stability index (per-source PSI of the length-decile
  distribution vs the corpus — the industry-standard drift score with
  its conventional 0.1/0.25 action thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Max drawdown — cumulative value per user over the (ts, event_id)
# total order; drawdown_t = cum_t − max(cum_{≤t}); max drawdown is the
# most negative. Every frame is backward-looking (running sum, running
# max, running min) so three stacked windows over ONE user-partitioned
# sort compute it — no self-join, no iteration. Sums stay DECIMAL to
# the end; the reported numbers divide/round once.
@register(
    "rel_max_drawdown",
    f"""WITH {DUCK_EVENTS},
series AS (
  SELECT user_id, ts, event_id,
         sum(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM ev),
dd AS (
  SELECT user_id,
         cum - max(cum) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS drawdown,
         cum
  FROM series)
SELECT user_id,
       CAST(max(cum) AS DOUBLE) AS peak_value,
       CAST(min(drawdown) AS DOUBLE) AS max_drawdown
FROM dd GROUP BY user_id""",
)
def rel_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(run)
        .alias("cum"),
    )
    dd = series.select(
        "user_id",
        "cum",
        (F.col("cum") - F.max("cum").over(run)).alias("drawdown"),
    )
    return dd.groupBy("user_id").agg(
        F.max("cum").cast("double").alias("peak_value"),
        F.min("drawdown").cast("double").alias("max_drawdown"),
    )


# ---------------------------------------------------------------------------
# Population stability index — per source, PSI of its document-length
# decile distribution against the corpus: Σ (p_src − p_corp) ·
# ln(p_src/p_corp) over the corpus's own decile bins (so bins are
# equal-mass by construction and p_corp ≈ 0.1 each). Add-one-style
# smoothing (half a document) keeps empty cells finite; every ln is
# round(·,9)-quantized before the DECIMAL fold (the KL/trigram
# discipline). Convention: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
# act — a source that only publishes long docs lights up here before
# it skews the training mix.
_PSI_BINS = 10


@register(
    "cur_psi_sources",
    f"""WITH edges AS (
  SELECT ntile({_PSI_BINS}) OVER (
           ORDER BY n_chars NULLS FIRST, doc_id) AS bin,
         doc_id, source
  FROM documents),
corp AS (
  SELECT bin, CAST(count(*) AS DOUBLE) AS n_corp FROM edges GROUP BY bin),
src AS (
  SELECT source, bin, CAST(count(*) AS DOUBLE) AS n_src
  FROM edges GROUP BY source, bin),
grid AS (
  SELECT s.source, c.bin, c.n_corp,
         coalesce(x.n_src, 0.0) AS n_src,
         s.n_total
  FROM (SELECT source, CAST(count(*) AS DOUBLE) AS n_total
        FROM edges GROUP BY source) s
  CROSS JOIN corp c
  LEFT JOIN src x ON x.source = s.source AND x.bin = c.bin),
terms AS (
  SELECT source,
         CAST(round(
           (((n_src + 0.5) / (n_total + {_PSI_BINS} * 0.5)
            - (n_corp + 0.5)
              / ((SELECT sum(n_corp) FROM corp) + {_PSI_BINS} * 0.5))
           * (round(ln(((n_src + 0.5) / (n_total + {_PSI_BINS} * 0.5))
                 / ((n_corp + 0.5)
                    / ((SELECT sum(n_corp) FROM corp)
                       + {_PSI_BINS} * 0.5))) * 1e9) / 1e9)) * 1e9) / 1e9
           AS DECIMAL(20,9)) AS term
  FROM grid)
SELECT source, round(CAST(sum(term) AS DOUBLE), 9) AS psi,
       CAST(sum(CASE WHEN term <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_active_bins
FROM terms GROUP BY source""",
)
def cur_psi_sources(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranking import global_ntile

    docs = table(spark, sf, "documents")
    # equi-depth bins over EVERY document — an unbounded global rank,
    # so the distributed exact ntile (operators/ranking.py), not a
    # partition-less window
    edges = global_ntile(
        docs, _PSI_BINS, ["n_chars", "doc_id"], bucket_col="bin"
    ).select("source", "doc_id", "bin")
    corp = edges.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("n_corp")
    )
    n_corp_total = corp.agg(
        F.sum("n_corp").alias("corp_total")
    )
    src = edges.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("double").alias("n_src")
    )
    totals = edges.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_total")
    )
    grid = (
        totals.crossJoin(F.broadcast(corp))
        .join(src, ["source", "bin"], "left")
        .na.fill({"n_src": 0.0})
        .crossJoin(F.broadcast(n_corp_total))
    )
    smooth = _PSI_BINS * 0.5
    p_src = (F.col("n_src") + 0.5) / (F.col("n_total") + smooth)
    p_corp = (F.col("n_corp") + 0.5) / (F.col("corp_total") + smooth)
    term = (
        dblround(
            (p_src - p_corp) * dblround(F.log(p_src / p_corp), 9), 9
        )
    ).cast("decimal(20,9)")
    terms = grid.select("source", term.alias("term"))
    return terms.groupBy("source").agg(
        F.round(F.sum("term").cast("double"), 9).alias("psi"),
        F.sum(F.when(F.col("term") != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_active_bins"),
    )
