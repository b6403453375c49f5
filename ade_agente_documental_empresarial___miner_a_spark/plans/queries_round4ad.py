"""Round-4 catalog additions, thirtieth batch — similarity coefficients
and label-agreement measurement:

* set-similarity battery (Jaccard, Dice, and overlap coefficients over
  word sets for a bounded pair block — three normalizations of one
  intersection, each preferred by a different dedup/retrieval
  tradition, stated side by side);
* annotator agreement (Cohen's kappa between two REAL quality signals
  already in the engine — the heuristic quality gate and the
  trigram-LM perplexity decile — the chance-corrected agreement number
  a labeling pipeline reports before trusting either signal alone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table

_PAIR_CAP = 25


# ---------------------------------------------------------------------------
# Set-similarity battery — one intersection, three normalizations:
# Jaccard |A∩B|/|A∪B| (symmetric, the dedup standard), Dice
# 2|A∩B|/(|A|+|B|) (the F1 of sets), overlap |A∩B|/min(|A|,|B|)
# (containment-biased — near 1 when one doc embeds the other, which
# Jaccard dilutes). Word sets are array_distinct over the whitespace
# split; all counts exact integers, each ratio one division, round 9.
# The pair block is the bounded same-lang a<b slice used by
# text_edit_distance — at corpus scale the block comes from LSH
# candidates, not enumeration.
@register(
    "text_set_similarity_battery",
    f"""WITH w AS (
  SELECT doc_id, lang,
         list_distinct(string_split(text, ' ')) AS ws
  FROM documents WHERE doc_id < {_PAIR_CAP} AND text IS NOT NULL),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS n_inter,
         CAST(len(a.ws) AS BIGINT) AS n_a,
         CAST(len(b.ws) AS BIGINT) AS n_b
  FROM w a JOIN w b ON a.lang = b.lang AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, n_inter,
       {halfup_ratio_duck("n_inter", "n_a + n_b - n_inter", 9)}
         AS jaccard,
       {halfup_ratio_duck("2 * n_inter", "n_a + n_b", 9)} AS dice,
       {halfup_ratio_duck("n_inter", "least(n_a, n_b)", 9)}
         AS overlap_coef
FROM pairs""",
)
def text_set_similarity_battery(spark: SparkSession, sf: str) -> DataFrame:
    # NULL-text docs are excluded on BOTH engines: DuckDB's
    # list_intersect(NULL, x) yields 0 while Spark's array_intersect
    # propagates NULL (edge-fuzz NULL-text catch, r9)
    docs = table(spark, sf, "documents").where(
        (F.col("doc_id") < _PAIR_CAP) & F.col("text").isNotNull()
    )
    w = docs.select(
        "doc_id",
        "lang",
        F.array_distinct(F.split("text", " ", -1)).alias("ws"),
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("ws").alias("wa"),
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("ws").alias("wb"),
    )
    pairs = a.join(
        b,
        (F.col("lang_a") == F.col("lang_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    ).select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("wa", "wb")).cast("long").alias(
            "n_inter"
        ),
        F.size("wa").cast("long").alias("n_a"),
        F.size("wb").cast("long").alias("n_b"),
    )
    # integer-exact HALF_UP ratios (ROUND8 §12 class; r9 audit)
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_inter",
        halfup_ratio("n_inter", "n_a + n_b - n_inter", 9).alias(
            "jaccard"
        ),
        halfup_ratio("2 * n_inter", "n_a + n_b", 9).alias("dice"),
        halfup_ratio("n_inter", "least(n_a, n_b)", 9).alias(
            "overlap_coef"
        ),
    )


# ---------------------------------------------------------------------------
# Annotator agreement — Cohen's kappa between two quality signals the
# engine already computes: A = the heuristic quality score ≥ 0.45 (the
# gate's threshold), B = the perplexity-filter keep flag (not in the
# worst trigram-LM decile). The 2×2 confusion counts are exact
# integers from one join; kappa = (p_o − p_e)/(1 − p_e) is one double
# formula, nullif-guarded when chance agreement is exact. Kappa is what
# tells a labeling pipeline whether two cheap signals are redundant
# (κ→1), independent (κ→0), or contradictory (κ<0) — before anyone
# trusts a voting ensemble of them.
def _kappa_oracle() -> str:
    from ..operators.textstats import STOPWORDS
    from .queries_ext import _duck_in_list
    from .queries_round3 import _DUCK_QUALITY
    from .queries_round4c import TRIGRAM_SCORES_SQL

    return f"""WITH scored AS ({TRIGRAM_SCORES_SQL}),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY avg_logp, doc_id) AS rn,
         count(*) OVER () AS n
  FROM scored),
b AS (
  SELECT doc_id, rn > CAST(ceil(0.1 * n) AS BIGINT) AS keep_b
  FROM r),
w AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ({_duck_in_list(STOPWORDS)}))) AS DOUBLE)
           AS stop_hits
  FROM documents),
a AS (SELECT doc_id, {_DUCK_QUALITY} >= 0.45 AS keep_a FROM w),
conf AS (
  SELECT CAST(sum(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END) AS DOUBLE) AS tt,
         CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS DOUBLE) AS tf,
         CAST(sum(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END) AS DOUBLE) AS ft,
         CAST(sum(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS DOUBLE) AS ff
  FROM a JOIN b USING (doc_id))
SELECT CAST(tt AS BIGINT) AS both_keep, CAST(tf AS BIGINT) AS a_only,
       CAST(ft AS BIGINT) AS b_only, CAST(ff AS BIGINT) AS both_drop,
       round((((tt + ff) / (tt + tf + ft + ff)
              - ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff))
                / ((tt + tf + ft + ff) * (tt + tf + ft + ff)))
             / nullif(1.0
              - ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff))
                / ((tt + tf + ft + ff) * (tt + tf + ft + ff)), 0.0))
             * 1e9) / 1e9
         AS kappa
FROM conf"""


@register("cur_labeler_agreement", _kappa_oracle())
def cur_labeler_agreement(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.textstats import quality_expr
    from .queries_round4n import cur_perplexity_filter

    docs = table(spark, sf, "documents")
    a = docs.select(
        "doc_id", (quality_expr(F.col("text")) >= 0.45).alias("keep_a")
    )
    b = cur_perplexity_filter(spark, sf).select(
        "doc_id", F.col("keep").alias("keep_b")
    )
    j = a.join(b, "doc_id")
    conf = j.agg(
        F.sum(F.when(F.col("keep_a") & F.col("keep_b"), 1).otherwise(0))
        .cast("double")
        .alias("tt"),
        F.sum(F.when(F.col("keep_a") & ~F.col("keep_b"), 1).otherwise(0))
        .cast("double")
        .alias("tf"),
        F.sum(F.when(~F.col("keep_a") & F.col("keep_b"), 1).otherwise(0))
        .cast("double")
        .alias("ft"),
        F.sum(
            F.when(~F.col("keep_a") & ~F.col("keep_b"), 1).otherwise(0)
        )
        .cast("double")
        .alias("ff"),
    )
    n = F.col("tt") + F.col("tf") + F.col("ft") + F.col("ff")
    po = (F.col("tt") + F.col("ff")) / n
    pe = (
        (F.col("tt") + F.col("tf")) * (F.col("tt") + F.col("ft"))
        + (F.col("ft") + F.col("ff")) * (F.col("tf") + F.col("ff"))
    ) / (n * n)
    return conf.select(
        F.col("tt").cast("long").alias("both_keep"),
        F.col("tf").cast("long").alias("a_only"),
        F.col("ft").cast("long").alias("b_only"),
        F.col("ff").cast("long").alias("both_drop"),
        dblround((po - pe) / F.nullif(1.0 - pe, F.lit(0.0)), 9).alias(
            "kappa"
        ),
    )
