"""Corpus-curation operators — the training-data-pipeline surface that
sits between raw ingestion and dedup/embedding (no reference counterpart;
generalizes micro-infobot/app.py:191-205's clean-before-index step the way
a 100 TB pretraining pipeline would need).

All four are shuffle-minimal by design:

* ``pii_scrub`` — pure regexp map work, whole-stage codegen, zero shuffle.
* ``repetition_signals`` — Gopher-style repetition stats; one explode per
  granularity feeding ``groupBy(doc_id, term)`` → re-aggregate. The input
  is hash-partitioned by doc_id (``spread``), so the exploded token table
  never re-shuffles.
* ``hash_split`` — deterministic md5-bucket train/valid/test assignment:
  map-only, reproducible across runs/engines, no RNG state. The standard
  scale-safe alternative to ``randomSplit`` (which reshuffles lineage and
  is not stable under retries).
* ``contamination_pairs`` — benchmark decontamination: corpus shingles
  joined against a BROADCAST benchmark shingle set (eval suites are tiny
  relative to the corpus), then an output-sensitive overlap count. The
  100 TB cost is one map-side hash join over the exploded corpus — no
  corpus-side shuffle until the (small) overlap aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import spread, word_shingles

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"555-[0-9]{4}"


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails/phones and count hits per doc. Map-only codegen work;
    patterns are RE2-compatible so oracles can reproduce them exactly."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def word_ngrams(text_col, n: int):
    """Positional (NON-distinct) n-word grams — frequency-preserving
    sibling of ``dedup.word_shingles`` (which dedups for set semantics)."""
    def grams_of(w):
        idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
        return F.when(
            F.size(w) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", *[
                F.element_at(w, (i + j).cast("int")) for j in range(n)
            ])),
        ).otherwise(F.array().cast("array<string>"))

    wrapped = F.transform(F.array(F.split(text_col, " ")), grams_of)
    return F.element_at(wrapped, 1)


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition stats per doc (Rae et al. 2021, public):
    distinct-word ratio, top-word fraction, top-bigram fraction, plus a
    composite keep flag. Tokens are lowercased whitespace words (same
    convention as the t5 embedding histogram)."""
    lower_t = F.lower(F.col(text_col))
    base = spread(docs, id_col)
    words = base.select(
        F.col(id_col), F.explode(F.split(lower_t, " ")).alias("w")
    )
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = wc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_word_n"),
    )
    bigrams = base.select(
        F.col(id_col), F.explode(word_ngrams(lower_t, 2)).alias("g")
    )
    bc = bigrams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    bigram_stats = bc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.max("c").cast("long").alias("top_bigram_n"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    out = word_stats.join(bigram_stats, id_col, "left").select(
        F.col(id_col),
        "n_words",
        "n_distinct",
        (dbl("n_distinct") / dbl("n_words")).alias("distinct_ratio"),
        (dbl("top_word_n") / dbl("n_words")).alias("top_word_frac"),
        F.coalesce(dbl("top_bigram_n") / dbl("n_bigrams"), F.lit(0.0)).alias(
            "top_bigram_frac"
        ),
    )
    keep = (
        (F.col("distinct_ratio") >= 0.2)
        & (F.col("top_word_frac") <= 0.2)
        & (F.col("top_bigram_frac") <= 0.1)
    )
    return out.withColumn("keep", keep)


# 4 leading md5 hex chars of "split:<id>" → 0..65535, then % 100: a
# deterministic, engine-portable percentile bucket.
SPLIT_SALT = "split:"
TRAIN_PCT, VALID_PCT = 80, 10


def _hexval(h, pos: int):
    return F.instr(F.lit("0123456789abcdef"), F.substring(h, pos, 1)) - 1


def split_bucket(id_col):
    h = F.md5(F.concat(F.lit(SPLIT_SALT), id_col.cast("string")))
    val = (
        ((_hexval(h, 1) * 16 + _hexval(h, 2)) * 256
         + (_hexval(h, 3) * 16 + _hexval(h, 4))).cast("long")
    )
    return val % 100


def hash_split(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign train/valid/test deterministically from an md5 bucket of the
    id — stable under retries, re-runs, and engine changes (unlike
    ``randomSplit``). Adds ``bucket`` and ``split`` columns."""
    b = split_bucket(F.col(id_col))
    split = (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )
    return docs.withColumn("bucket", b).withColumn("split", split)


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: (corpus doc, benchmark doc) pairs sharing
    >= min_overlap distinct lowercased n-gram shingles.

    The benchmark side is broadcast (eval sets are tiny vs. the corpus),
    so the corpus-side exploded shingles join map-side with NO shuffle;
    only the output-sensitive overlap counts aggregate. Corpus shingles
    are hash-partitioned by doc_id, so that final groupBy is co-located
    too when min_overlap filtering happens after it."""
    def shingled(df, out_id):
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(
                word_shingles(F.lower(F.col(text_col)), shingle_n)
            ).alias("shingle"),
        )

    # spread() (doc_id hash partitioning) only on the corpus side — it keeps
    # the explode co-partitioned for the groupBy below. The benchmark side
    # is about to be broadcast-collected, so repartitioning it first would
    # be a wasted shuffle.
    corpus_sh = shingled(spread(corpus, id_col), "doc_id_out")
    bench_sh = shingled(benchmark, "bench_id")
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .where(F.col("doc_id_out") != F.col("bench_id"))
        .groupBy("doc_id_out", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
        .select(
            F.col("doc_id_out").alias("doc_id"), "bench_id",
            F.col("n_overlap").cast("long").alias("n_overlap"),
        )
    )


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.45,
    min_tokens: int = 5,
    max_tokens: int = 5000,
) -> DataFrame:
    """Corpus admission gate — the filter stage every training-data
    pipeline runs before tokenization: known language AND heuristic
    quality above threshold AND token count in bounds.

    One map-only scan: the language/quality/token expressions come from
    ``textstats`` expression builders, so this does NOT re-join three
    operator outputs (three scans + two shuffles at 100 TB) — it is a
    single projection, fully codegen'd. Returns per-doc pass flags plus
    the combined verdict so downstream can either filter (``passes``) or
    audit rejection reasons.
    """
    from .textstats import pred_lang_expr, quality_expr

    t = F.col(text_col)
    pred, _best = pred_lang_expr(t)
    quality = quality_expr(t)
    n_tokens = F.size(F.split(t, " ")).cast("long")
    pass_lang = pred != "unk"
    pass_quality = quality >= min_quality
    pass_len = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        quality.alias("quality"),
        n_tokens.alias("n_tokens"),
        pass_lang.alias("pass_lang"),
        pass_quality.alias("pass_quality"),
        pass_len.alias("pass_len"),
        (pass_lang & pass_quality & pass_len).alias("passes"),
    )
