"""Round-4 catalog additions, twenty-fourth batch — corpus health and
split hygiene:

* Zipf slope (the log-log rank/frequency regression over the term
  distribution — natural corpora sit near −1; a synthetic or
  over-deduplicated corpus drifts, making this a one-number corpus
  health check);
* grouped k-fold assignment (leakage-safe cross-validation: every
  document of a source lands in the SAME fold — row-hash splits leak
  near-duplicates across train/eval, group-hash splits cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import register, table


# ---------------------------------------------------------------------------
# Zipf slope — regress ln(freq) on ln(rank) over the top-200 terms:
# exact OLS from quantized log sums (the rel_regression_moments
# discipline: each ln is round(·,9)-quantized, sums fold in
# DECIMAL, ONE double formula at the end). Rank comes from a
# (cnt DESC, token) total order, so both engines rank ties
# identically; the 200-row regression itself is a single reduce. A
# healthy natural-language corpus lands near slope −1 (Zipf's law);
# the fixture's synthetic vocabulary lands where it lands — the PIN is
# cross-engine equality, the SIGNAL is drift round-over-round.
_ZIPF_TOP = 200


@register(
    "text_zipf_slope",
    f"""WITH terms AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
freq AS (
  SELECT w, count(*) AS cnt FROM terms WHERE w <> '' GROUP BY w),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rnk
  FROM freq),
top AS (
  SELECT CAST(round(ln(rnk) * 1e9) / 1e9 AS DECIMAL(20,9)) AS x,
         CAST(round(ln(cnt) * 1e9) / 1e9 AS DECIMAL(20,9)) AS y
  FROM ranked WHERE rnk <= {_ZIPF_TOP}),
sums AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
  FROM top)
SELECT CAST(n AS BIGINT) AS n_terms,
       round(((sxy - sx * sy / n) / (sxx - sx * sx / n)) * 1e9) / 1e9
         AS zipf_slope,
       round((sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n))
             * sx / n) * 1e9) / 1e9 AS intercept
FROM sums""",
)
def text_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    terms = docs.select(
        F.explode(F.split("text", " ", -1)).alias("w")
    ).where(F.col("w") != "")
    freq = terms.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = freq.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "w"))
        .alias("rnk"),
    ).where(F.col("rnk") <= _ZIPF_TOP)
    top = ranked.select(
        dblround(F.log("rnk"), 9).cast("decimal(20,9)").alias("x"),
        dblround(F.log("cnt"), 9).cast("decimal(20,9)").alias("y"),
    )
    sums = top.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    return sums.select(
        F.col("n").cast("long").alias("n_terms"),
        dblround(slope, 9).alias("zipf_slope"),
        dblround(
            F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 9
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Grouped k-fold — the leakage-safe split: the fold is a function of
# the GROUP (source), not the row, so near-duplicate documents from
# one source can never straddle train/eval. fold = md5(source) mod 5 —
# same deterministic-hash discipline as cur_hash_split, one level up.
# The audit output proves the invariant: per (fold, source) the whole
# source's count, and per source exactly ONE fold (pinned by the
# oracle's count and the test's distinct check). Map-only.
_K_FOLDS = 5


@register(
    "cur_group_kfold",
    f"""WITH assigned AS (
  SELECT source, doc_id,
         CAST(CAST(('0x' || substr(md5(source), 1, 6)) AS INTEGER)
              % {_K_FOLDS} AS INT) AS fold
  FROM documents)
SELECT fold, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM (SELECT a.fold, a.source, a.doc_id, d.n_chars
      FROM assigned a JOIN documents d ON a.doc_id = d.doc_id)
GROUP BY fold, source""",
)
def cur_group_kfold(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    fold = (
        F.conv(F.substring(F.md5("source"), 1, 6), 16, 10).cast("int")
        % _K_FOLDS
    ).cast("int")
    return docs.groupBy(
        fold.alias("fold"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
