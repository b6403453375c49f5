"""Round-4 catalog additions, thirty-sixth batch — blocklist hygiene
and readability:

* blocklist filter (word-boundary vs substring matching side by side —
  the Scunthorpe problem made measurable: the substring form flags
  innocent supersets ('bat' inside 'batch'), and the disagreement
  column counts exactly the docs a naive filter would wrongly drop);
* Flesch-Kincaid grade (the classic readability formula from words,
  sentences, and vowel-group syllable approximation — deterministic,
  pure-SQL, the third member of the quality-signal family next to the
  heuristic score and the trigram LM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import register, table

# 'bat' is a substring of the fixture's frequent 'batch' — the
# engineered Scunthorpe collision; 'slow' appears as a real word.
_BLOCKLIST = ["bat", "slow"]


# ---------------------------------------------------------------------------
# Blocklist filter — both match disciplines on the same list:
# substring (LIKE %term%) and word-boundary (\bterm\b). The substring
# form flags every doc containing 'batch'; the boundary form flags
# only true 'bat'/'slow' words. `scunthorpe` marks docs the naive
# filter would wrongly drop — on a 100 TB corpus that column is the
# difference between trimming toxicity and deleting the cooking
# section. Patterns stay in the Java/RE2 common subset (\b, literal
# terms); map-only scan.
def _blocklist_sql() -> str:
    sub = " OR ".join(f"text LIKE '%{t}%'" for t in _BLOCKLIST)
    bound = " OR ".join(
        rf"regexp_matches(text, '\b{t}\b')" for t in _BLOCKLIST
    )
    return f"""SELECT doc_id,
       ({sub}) AS flagged_substr,
       ({bound}) AS flagged_word,
       ({sub}) AND NOT ({bound}) AS scunthorpe
FROM documents"""


@register("cur_blocklist_filter", _blocklist_sql())
def cur_blocklist_filter(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    sub = None
    bound = None
    for t in _BLOCKLIST:
        s_t = F.col("text").contains(t)
        b_t = F.col("text").rlike(rf"\b{t}\b")
        sub = s_t if sub is None else (sub | s_t)
        bound = b_t if bound is None else (bound | b_t)
    return docs.select(
        "doc_id",
        sub.alias("flagged_substr"),
        bound.alias("flagged_word"),
        (sub & ~bound).alias("scunthorpe"),
    )


# ---------------------------------------------------------------------------
# Flesch-Kincaid grade — 0.39·(words/sentences) + 11.8·(syllables/
# words) − 15.59, with syllables approximated by vowel groups
# ([aeiouy]+ runs per word — the standard cheap proxy) and sentences
# from the injected-punctuation convention (text_sentence_stats'
# spike). All three inputs are exact integers from one scan; the grade
# is one double formula, round(·,9). Readability belongs in the
# quality family because instruction-tuning mixes target a band — too
# low reads like noise, too high like a patent filing.
_FK_SPIKE_SQL = (
    "REPLACE(REPLACE(text, ' table ', '. Table '), "
    "' spark ', '! Spark ')"
)


@register(
    "text_readability_fk",
    rf"""WITH spiked AS (
  SELECT doc_id, {_FK_SPIKE_SQL} AS t FROM documents),
counts AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(t, '[.!?] '),
                              s -> length(s) > 0)) AS BIGINT)
           AS n_sentences,
         CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(t, '[aeiouyAEIOUY]+'))
              AS BIGINT) AS n_syllables
  FROM spiked)
SELECT doc_id, n_sentences, n_words, n_syllables,
       round((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
             - 15.59) * 1e9) / 1e9 AS fk_grade
FROM counts""",
)
def text_readability_fk(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    spiked = F.replace(
        F.replace(F.col("text"), F.lit(" table "), F.lit(". Table ")),
        F.lit(" spark "),
        F.lit("! Spark "),
    )
    n_sentences = F.size(
        F.filter(
            F.split(spiked, r"[.!?] "), lambda s: F.length(s) > 0
        )
    ).cast("long")
    n_words = F.size(F.split(spiked, " ", -1)).cast("long")
    n_syllables = F.size(
        F.regexp_extract_all(spiked, F.lit(r"[aeiouyAEIOUY]+"), 0)
    ).cast("long")
    counts = docs.select(
        "doc_id",
        n_sentences.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syllables.alias("n_syllables"),
    )
    return counts.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        # try_divide: an empty/punctuation-only document has zero
        # sentences (or zero words) — its FK grade is NULL, matching
        # the oracle's x/0 → NULL, instead of aborting the job
        dblround(
            0.39
            * F.try_divide(
                F.col("n_words").cast("double"), F.col("n_sentences")
            )
            + 11.8
            * F.try_divide(
                F.col("n_syllables").cast("double"), F.col("n_words")
            )
            - 15.59,
            9,
        ).alias("fk_grade"),
    )
