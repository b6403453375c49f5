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


QUOTA_SALT = "quota:"
SAMPLE_SALT = "sample:"


def source_quota(
    docs: DataFrame,
    quota: int = 15,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain representation cap — the curation step that stops a
    handful of crawl domains from dominating the training mix: rank each
    domain's docs in a deterministic md5 order and keep the first
    ``quota``. Hash order (not ingestion order) makes the kept subset a
    uniform sample of the domain, stable across runs and engines.

    Adds ``rk`` (1-based within-domain rank) and ``kept``. Scale: one
    window shuffling on the domain key. A mega-domain (the classic skew
    case) serializes through one task's sort; since only the first
    ``quota`` ranks matter, pre-filter with a per-partition local
    row_number cap (quota per partition) before the global window when a
    domain exceeds task memory — same output, bounded sort.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(QUOTA_SALT), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(h, F.col(id_col))
    return docs.withColumn("rk", F.row_number().over(w)).withColumn(
        "kept", F.col("rk") <= quota
    )


def stratified_sample(
    docs: DataFrame,
    pct_by_stratum: dict[str, int],
    default_pct: int = 100,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling — rebalance the
    language (or any stratum) mix by keeping ``pct_by_stratum[s]`` percent
    of each stratum, selected by a salted md5 bucket of the id. Unlike
    ``DataFrame.sample`` this is reproducible across runs, retries, and
    engines, and needs no RNG state. Map-only, zero shuffle.

    Adds ``sample_bucket`` (0-99) and ``sampled``.
    """
    h = F.md5(F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string")))
    bucket = (
        ((_hexval(h, 1) * 16 + _hexval(h, 2)) * 256
         + (_hexval(h, 3) * 16 + _hexval(h, 4))).cast("long") % 100
    )
    rate = F.lit(default_pct)
    for stratum, pct in sorted(pct_by_stratum.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return docs.withColumn("sample_bucket", bucket).withColumn(
        "sampled", F.col("sample_bucket") < rate
    )


def length_bucket_batches(
    docs: DataFrame,
    bucket_chars: int = 128,
    batch_size: int = 8,
    len_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assignment — group docs of similar length so
    fixed-shape training batches waste minimal padding: bucket by
    ``len_col // bucket_chars``, deterministically order within the
    bucket (md5 of id), and cut into batches of ``batch_size``.

    Adds ``len_bucket``, ``batch_id`` (0-based within bucket). The
    padding economics: a batch costs batch_rows x max(len) after padding;
    bucketing bounds the max-min spread per batch by ``bucket_chars``.
    Scale: one window shuffling on ``len_bucket`` — at 100 TB use a
    composite key (len_bucket, split_bucket(id) % K) so each window
    partition stays task-sized; batches never need to be globally
    contiguous, only length-homogeneous.
    """
    from pyspark.sql import Window

    bucket = (F.col(len_col).cast("long") / F.lit(bucket_chars)).cast("long")
    h = F.md5(F.concat(F.lit(QUOTA_SALT), F.col(id_col).cast("string")))
    w = Window.partitionBy("len_bucket").orderBy(h, F.col(id_col))
    return (
        docs.withColumn("len_bucket", bucket)
        .withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / F.lit(batch_size)).cast("long"),
        )
    )


def expectations(
    docs: DataFrame,
    rules: dict[str, "Column"] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Data-quality expectations (the DLT/Great-Expectations stage):
    evaluate a named rule set per row, emit per-row pass/fail flags
    plus the failed-rule list. One map-only projection — rules are
    pure column predicates, so the whole check rides the scan with
    zero extra passes regardless of rule count; the caller splits
    pass/quarantine or aggregates violation counts downstream.

    Default rules for the documents schema: key present, text
    non-empty, recorded n_chars consistent with the text, lang in the
    supported set.
    """
    t = F.col(text_col)
    if rules is None:
        # NULL rule (edge-fuzz NULL-text catch, r9), stated identically
        # in the cur_expectations oracle: text_nonempty and
        # lang_supported treat NULL as a VIOLATION (absent data cannot
        # pass a presence/allowlist gate); n_chars_consistent treats a
        # NULL comparison as vacuously consistent (the NULL text is
        # already reported by text_nonempty — double-counting the same
        # root cause would be noise).
        rules = {
            "doc_id_present": F.col("doc_id").isNotNull(),
            "text_nonempty": t.isNotNull() & (F.length(t) > 0),
            "n_chars_consistent": ~F.coalesce(
                F.col("n_chars") != F.length(t), F.lit(False)
            ),
            # supported-language gate: the fixture's zh slice is the
            # deliberate quarantine population for a Latin-script-only
            # downstream stage
            "lang_supported": F.col("lang").isin(
                "en", "es", "fr", "de"
            ),
        }
    checks = [
        F.when(expr, F.lit(None)).otherwise(F.lit(name))
        for name, expr in rules.items()
    ]
    failed = F.array_compact(F.array(*checks))
    return docs.withColumn("failed_rules", failed).withColumn(
        "passed", F.size(F.col("failed_rules")) == 0
    )
