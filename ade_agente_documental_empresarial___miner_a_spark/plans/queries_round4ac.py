"""Round-4 catalog additions, twenty-ninth batch — experimentation and
sentence-level text stats:

* two-proportion z-test (the A/B conversion readout: cohort conversion
  rates, pooled z-score, significance flag — exact counts in, one
  double formula out);
* sentence statistics (deterministic sentence segmentation over
  punctuation injected via replace() — the fixture corpus has no
  punctuation, FIXTURES.md — yielding per-doc sentence counts and
  average sentence length, the readability signal quality gates use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_mean, halfup_mean_duck
from .catalog import events_table, register, table


# ---------------------------------------------------------------------------
# Two-proportion z-test — cohorts by user_id parity, conversion = the
# user recorded ≥1 purchase. All inputs are exact integers (per-user
# flags via one groupBy, cohort rollup via one more); the z-score is
# ONE double formula evaluated in identical op order on both engines,
# round(·,9). The 1.96 threshold flag states the standard 95% two-sided
# readout. At 100 TB nothing changes: two map-side-combinable
# aggregates and a 2-row reduce.
@register(
    "rel_abtest_ztest",
    """WITH ev AS (SELECT user_id, event_type FROM events),
users AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS cohort,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM ev GROUP BY user_id),
c AS (
  SELECT cohort, count(*) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM users GROUP BY cohort),
wide AS (
  SELECT max(CASE WHEN cohort = 0 THEN n_users END) AS n0,
         max(CASE WHEN cohort = 0 THEN n_converted END) AS c0,
         max(CASE WHEN cohort = 1 THEN n_users END) AS n1,
         max(CASE WHEN cohort = 1 THEN n_converted END) AS c1
  FROM c)
SELECT n0, c0, n1, c1,
       round(((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 0.0)) * 1e9) / 1e9
         AS z_score,
       coalesce(abs((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
           / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                  * (1.0 / n0 + 1.0 / n1)), 0.0)) > 1.96, false)
         AS significant
FROM wide""",
)
def rel_abtest_ztest(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("cohort"),
        "converted",
    )
    c = users.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("cohort") == 0, F.col("n_converted"))).alias(
            "c0"
        ),
        F.max(F.when(F.col("cohort") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_converted"))).alias(
            "c1"
        ),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    # a degenerate pool (everyone or no one converts) has zero pooled
    # variance: z is NULL, not an error/inf — identical on both engines
    z = (p1 - p0) / F.nullif(
        F.sqrt(
            pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        ),
        F.lit(0.0),
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        dblround(z, 9).alias("z_score"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Sentence statistics — the fixture text carries no punctuation
# (FIXTURES.md), so sentence boundaries are INJECTED deterministically
# via literal replace() stated identically on both engines (the
# sectioning-query discipline), then split on '[.!?] ' — no lookbehind
# (RE2 rejects it; func_regexp_battery's portability rule). Per doc:
# sentence count, average words per sentence (exact integer division,
# round 9), and the longest sentence's word count — the readability
# trio a quality gate thresholds on.
_SENT_SPIKE_SQL = (
    "REPLACE(REPLACE(text, ' table ', '. Table '), "
    "' spark ', '! Spark ')"
)

# avg words/sentence is a round(sum/count) mean — stated integer-exact
# on both engines (ROUND8 §12: round(double, 9) splits at half
# boundaries; at n_sentences = 5120 with an adversarial word total the
# exact rational lands within an ulp of a half — pinned in
# tests/test_half_boundary.py)
_AVG_WORDS_DUCK = halfup_mean_duck(
    "sum(n_words)", "count(*)", 9, integral_sum=True
)


@register(
    "text_sentence_stats",
    f"""WITH spiked AS (
  SELECT doc_id, {_SENT_SPIKE_SQL} AS t FROM documents),
sents AS (
  SELECT doc_id, s
  FROM (SELECT doc_id,
               unnest(string_split_regex(t, '[.!?] ')) AS s
        FROM spiked)
  WHERE length(s) > 0),
words AS (
  SELECT doc_id, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_words
  FROM sents)
SELECT doc_id, count(*) AS n_sentences,
       {_AVG_WORDS_DUCK} AS avg_sentence_words,
       CAST(max(n_words) AS BIGINT) AS longest_sentence_words
FROM words GROUP BY doc_id""",
)
def text_sentence_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    spiked = F.replace(
        F.replace(F.col("text"), F.lit(" table "), F.lit(". Table ")),
        F.lit(" spark "),
        F.lit("! Spark "),
    )
    sents = docs.select(
        "doc_id",
        F.explode(F.split(spiked, r"[.!?] ")).alias("s"),
    ).where(F.length("s") > 0)
    words = sents.select(
        "doc_id",
        F.size(F.split("s", " ", -1)).cast("long").alias("n_words"),
    )
    return words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        halfup_mean("sum(n_words)", "count(1)", 9, integral_sum=True).alias(
            "avg_sentence_words"
        ),
        F.max("n_words").cast("long").alias("longest_sentence_words"),
    )
