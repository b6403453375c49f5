"""Text-analysis operators — EXT surface (language ID, quality scoring,
token counting, fingerprinting) over the ``documents`` table.

All pure Catalyst expressions (no UDFs): these run in whole-stage codegen
and scale as map-only work — no shuffle at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "de"],
    "fr": ["le", "la", "les", "et"],
}

# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(t, " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_expr(t):
    """Heuristic quality score expression (see ``quality_scores``) —
    exposed so composites (e.g. ``curation.quality_gate``) can reuse the
    exact formula in a single scan instead of re-joining operator outputs."""
    words = F.split(t, " ")
    n_words = F.size(words).cast("double")
    n_chars = F.length(t).cast("double")
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    ).cast("double")
    stop_ratio = stop_hits / n_words
    len_component = F.lit(0.4) * F.least(F.lit(1.0), n_words / 100.0)
    stop_component = F.least(F.lit(0.3), F.lit(0.3) * stop_ratio * 3.0)
    wl_dev = F.abs(avg_word_len - 5.0) / 5.0
    wl_component = F.lit(0.3) * F.greatest(
        F.lit(0.0), F.lit(1.0) - F.least(F.lit(1.0), wl_dev)
    )
    return len_component + stop_component + wl_component


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score from length / stopword ratio / word length.

    score = 0.4·min(1, n_words/100) + 0.3·stopword_ratio·3 (capped 0.3)
          + 0.3·(1 − |avg_word_len − 5|/5 clamped to [0,1])
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("double")
    n_chars = F.length(t).cast("double")
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    ).cast("double")
    stop_ratio = stop_hits / n_words
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        quality_expr(t).alias("quality"),
    )


def pred_lang_expr(t):
    """Language-ID argmax expression (see ``language_id``), reusable in
    single-scan composites. Ties break in marker-list order."""
    words = F.split(t, " ")
    hit_cols = {
        lang: F.size(F.filter(words, lambda w: w.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = hit_cols[langs[0]]
    for lang in langs[1:]:
        best = F.greatest(best, hit_cols[lang])
    pred = F.lit("unk")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("unk")), best


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID with deterministic argmax tie-break
    (marker-list order). Returns (doc_id, pred_lang, best_hits)."""
    pred, best = pred_lang_expr(F.col(text_col))
    return docs.select(
        "doc_id", pred.alias("pred_lang"), best.alias("best_hits")
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact (lowered text) and bag-of-words
    (sorted word multiset) md5 digests."""
    lowered = F.lower(F.col(text_col))
    bag = F.array_join(F.array_sort(F.split(lowered, " ")), " ")
    return docs.select(
        "doc_id",
        F.md5(lowered).alias("fp_exact"),
        F.md5(bag).alias("fp_bag"),
    )
