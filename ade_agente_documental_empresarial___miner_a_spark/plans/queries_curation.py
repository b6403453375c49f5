"""Curation queries — PII scrubbing, repetition filtering, deterministic
splits, benchmark decontamination (the pre-dedup corpus-curation stage of
an LLM training-data pipeline; no reference counterpart — extends
micro-infobot/app.py:191-205's clean-before-index step to corpus scale).

Same conventions as ``queries_ext``: every Spark callable paired with a
bit-exact DuckDB oracle; BIGINT integer surface, identical float fold
order, RE2-compatible regexes shared verbatim by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.curation import (
    EMAIL_PATTERN,
    PHONE_PATTERN,
    contamination_pairs,
    hash_split,
    pii_scrub,
    repetition_signals,
)
from .catalog import register, table

# ---------------------------------------------------------------------------
# cur_pii_scrub — the fixture corpus carries no PII, so both engines inject
# the same deterministic email+phone prefix per doc; the scrub machinery
# (patterns, global replace, counting) is then exercised for real.

_DUCK_INJECT = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text"
)


@register(
    "cur_pii_scrub",
    f"""WITH injected AS (
  SELECT doc_id, {_DUCK_INJECT} AS text FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_PATTERN}')) AS BIGINT) AS n_phones,
       substr(regexp_replace(regexp_replace(text, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                             '{PHONE_PATTERN}', '<PHONE>', 'g'), 1, 80) AS preview
FROM injected""",
)
def cur_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    injected = table(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )
    return pii_scrub(injected).select(
        "doc_id", "n_emails", "n_phones",
        F.substring("scrubbed", 1, 80).alias("preview"),
    )


# ---------------------------------------------------------------------------
# cur_repetition_signals — Gopher-style repetition stats + keep flag.

@register(
    "cur_repetition_signals",
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS w FROM w),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                  CAST(count(*) AS BIGINT) AS n_distinct,
                  CAST(max(c) AS BIGINT) AS top_word_n
           FROM wc GROUP BY doc_id),
bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                                            i -> ws[i] || ' ' || ws[i+1])) AS g
       FROM w WHERE len(ws) >= 2),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(max(c) AS BIGINT) AS top_bigram_n
           FROM bc GROUP BY doc_id)
SELECT s.doc_id, n_words, n_distinct,
       CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_ratio,
       CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
       coalesce(CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 0.0)
           AS top_bigram_frac,
       (CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.2
        AND CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.2
        AND coalesce(CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 0.0)
            <= 0.1) AS keep
FROM wstats s LEFT JOIN bstats b USING (doc_id)""",
)
def cur_repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    return repetition_signals(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# cur_hash_split — deterministic md5-bucket split, summarized per
# (lang, split) with within-lang fractions.

_DUCK_HV = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"


def _duck_bucket() -> str:
    hv = [_DUCK_HV.format(p=p) for p in (1, 2, 3, 4)]
    return (
        f"((({hv[0]} * 16 + {hv[1]}) * 256 + ({hv[2]} * 16 + {hv[3]})) % 100)"
    )


@register(
    "cur_hash_split",
    f"""WITH h AS (
  SELECT lang, md5('split:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
b AS (SELECT lang, {_duck_bucket()} AS bucket FROM h),
s AS (SELECT lang, CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'valid'
                        ELSE 'test' END AS split FROM b)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS DOUBLE)
       / CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE) AS frac
FROM s GROUP BY lang, split""",
)
def cur_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    split = hash_split(table(spark, sf, "documents"))
    counts = split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.withColumn(
        "frac",
        F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast("double"),
    )


# ---------------------------------------------------------------------------
# cur_decontaminate — docs sharing >= 2 distinct 3-gram shingles with the
# deterministic "benchmark" slice (doc_id % 97 == 0). The benchmark side is
# broadcast; the corpus side never shuffles before the overlap aggregate.

@register(
    "cur_decontaminate",
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
sh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       FROM w WHERE len(ws) >= 3)
SELECT a.doc_id, b.doc_id AS bench_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM sh a
JOIN sh b ON a.shingle = b.shingle AND b.doc_id % 97 = 0
         AND a.doc_id <> b.doc_id
WHERE a.doc_id % 97 <> 0
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2""",
)
def cur_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    return contamination_pairs(
        corpus, benchmark, shingle_n=3, min_overlap=2
    )


# ---------------------------------------------------------------------------
# cur_pack_sequences — sequence packing for pretraining: contiguous-fill
# ("concat then chunk") assignment of docs to fixed CTX-token training
# sequences. True greedy packing is inherently sequential; the standard
# distributed design packs within (source, hash-bucket) shards — each shard
# is one window partition, so parallelism = sources x buckets and no shard
# ever sees the whole corpus. Output: per-sequence fill statistics.

PACK_CTX, PACK_BUCKETS = 2048, 8


@register(
    "cur_pack_sequences",
    f"""WITH t AS (
  SELECT source, doc_id, doc_id % {PACK_BUCKETS} AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT source, bucket, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source, bucket ORDER BY doc_id) AS cum
  FROM t)
SELECT source, CAST(bucket AS BIGINT) AS bucket,
       CAST((cum - n_tokens) // {PACK_CTX} AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM c GROUP BY source, bucket, seq_id""",
)
def cur_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source", "bucket").orderBy("doc_id")
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "seq_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(PACK_CTX)),
    )
    return packed.groupBy(
        "source", F.col("bucket").cast("long").alias("bucket"), "seq_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("seq_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# cur_dataset_card — per-(source, lang) corpus summary composing the
# curation signals: doc/token counts, exact-dup rate, repetition keep rate.
# Integer aggregates throughout (order-insensitive); the only doubles are
# two final divisions of BIGINTs — bit-exact on both engines.

@register(
    "cur_dataset_card",
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS w FROM w),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                  CAST(count(*) AS BIGINT) AS n_distinct,
                  CAST(max(c) AS BIGINT) AS top_word_n
           FROM wc GROUP BY doc_id),
bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                                            i -> ws[i] || ' ' || ws[i+1])) AS g
       FROM w WHERE len(ws) >= 2),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(max(c) AS BIGINT) AS top_bigram_n
           FROM bc GROUP BY doc_id),
keepf AS (
  SELECT s.doc_id,
         (CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.2
          AND CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.2
          AND coalesce(CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE),
                       0.0) <= 0.1) AS keep
  FROM wstats s LEFT JOIN bstats b USING (doc_id)),
d AS (SELECT doc_id, source, lang, md5(trim(lower(text))) AS th,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT th) AS BIGINT) AS n_unique,
       1.0 - CAST(count(DISTINCT th) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS dup_rate,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
       / CAST(count(*) AS DOUBLE) AS keep_rate
FROM d JOIN keepf USING (doc_id)
GROUP BY source, lang""",
)
def cur_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    keep = repetition_signals(docs).select("doc_id", "keep")
    base = docs.select(
        "doc_id", "source", "lang",
        F.md5(F.trim(F.lower(F.col("text")))).alias("th"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    agg = base.join(keep, "doc_id").groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("th").cast("long").alias("n_unique"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_keep"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return agg.select(
        "source", "lang", "n_docs", "n_tokens", "n_unique",
        (F.lit(1.0) - dbl("n_unique") / dbl("n_docs")).alias("dup_rate"),
        (dbl("n_keep") / dbl("n_docs")).alias("keep_rate"),
    )
