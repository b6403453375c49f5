"""Round-4 catalog additions, third batch — substring-level dedup (the
suffix-array family re-expressed for a cluster), incremental corpus
dedup, text normalization, cohort retention analytics, and JSON prop
extraction.

Conventions follow the rest of the catalog: every aggregate/computed
column is aliased identically in the Spark plan and the DuckDB oracle;
integer-backed sums are cast to BIGINT on the DuckDB side (its
sum(INTEGER) widens to HUGEINT); fold-order-sensitive float math is
avoided (counts + one terminal round(÷, 9) only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_dedup, substring_duplicate_spans
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Substring-level exact dedup — the third granularity tier after document
# (dedup_exact) and paragraph (dedup_paragraph): the fraction of each
# doc's 8-word windows (stride 1) that occur verbatim in >= 1 OTHER doc.
# Distributed stand-in for suffix-array substring dedup (Lee et al.,
# arXiv:2107.06499) — any shared run of >= 8 words is covered by a shared
# window. Plan: map-side explode -> one partial-agg'd hash aggregate on
# md5-uniform gram keys -> co-partitioned gram join -> per-doc rollup on
# the spread(doc_id) partitioning (no re-shuffle of the exploded side).
@register(
    "dedup_substring",
    """WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS gram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM words WHERE len(w) >= 8)),
gd AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
       round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / count(*), 9)
         AS dup_frac
FROM grams g JOIN gd USING (gram)
GROUP BY g.doc_id""",
)
def dedup_substring(spark: SparkSession, sf: str) -> DataFrame:
    return substring_duplicate_spans(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Incremental ingestion dedup — nightly-batch shape: classify NEW docs
# (doc_id % 5 == 0 models the arriving batch) against the already-
# ingested corpus (the other 80%) without re-deduplicating history.
# Statuses: dup_historic (hash already ingested), dup_in_batch (an
# earlier row of the same batch has it), new. The historic side reduces
# to DISTINCT hashes — too big to broadcast at 100 TB, so it is a
# shuffle LEFT join on uniform md5 keys; Spark's runtime bloom-filter
# injection pre-filters the probe when the batch is small vs history.
@register(
    "dedup_incremental",
    """WITH hashed AS (
  SELECT doc_id, md5(trim(lower(text))) AS text_hash FROM documents),
hist AS (SELECT DISTINCT text_hash FROM hashed WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, text_hash FROM hashed WHERE doc_id % 5 = 0)
SELECT b.doc_id, b.text_hash,
  CASE WHEN h.text_hash IS NOT NULL THEN 'dup_historic'
       WHEN row_number() OVER (PARTITION BY b.text_hash ORDER BY b.doc_id)
            > 1 THEN 'dup_in_batch'
       ELSE 'new' END AS status
FROM batch b LEFT JOIN hist h ON b.text_hash = h.text_hash""",
)
def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    historic = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    return incremental_dedup(batch, historic)


# ---------------------------------------------------------------------------
# Text normalization — the canonicalization pass every curation pipeline
# runs before hashing/dedup: accent fold (explicit translate map — the
# SAME table on both engines, no locale/ICU dependence), casefold,
# whitespace collapse, trim. Output is the per-doc normalization record
# (hash of the canonical form + before/after lengths + changed flag).
# Map-only: zero shuffles at any scale.
_ACCENTS_FROM = "áàâäãåéèêëíìîïóòôöõúùûüñçýÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÑÇÝ"
_ACCENTS_TO = "aaaaaaeeeeiiiiooooouuuuncyAAAAAAEEEEIIIIOOOOOUUUUNCY"


@register(
    "text_normalize",
    f"""SELECT doc_id,
  md5(norm) AS norm_hash,
  length(text) AS n_chars_raw,
  length(norm) AS n_chars_norm,
  (norm <> text) AS changed
FROM (
  SELECT doc_id, text,
    trim(regexp_replace(
      translate(lower(text), '{_ACCENTS_FROM.lower()}', '{_ACCENTS_TO.lower()}'),
      '\\s+', ' ', 'g')) AS norm
  FROM documents)""",
)
def text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.translate(
                F.lower(F.col("text")), _ACCENTS_FROM.lower(), _ACCENTS_TO.lower()
            ),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length("text").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention — the product-analytics staple the events
# fixture supports but the catalog lacked: users grouped by first-active
# week (cohort), counted per subsequent active week offset. Two hash
# aggregates (distinct user-weeks; per-user min) + one join on user_id —
# all three share the user_id partitioning, so AQE plans a single
# exchange chain; weeks are Monday-truncated DATEs on both engines.
@register(
    "rel_cohort_retention",
    f"""WITH {DUCK_EVENTS},
wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
       FROM ev),
first AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       count(*) AS users
FROM wk JOIN first USING (user_id)
GROUP BY cohort_week, week_offset""",
)
def rel_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON extraction — events.props is a JSON string column
# (the open-schema attribute bag every event pipeline carries). Typed
# extraction (get_json_object / json_extract_string) + per-type rollup.
# At scale the extraction is map-side; only the 5-key rollup shuffles.
@register(
    "rel_json_props",
    """SELECT event_type,
  count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_sum,
  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_min,
  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_max
FROM events
GROUP BY event_type""",
)
def rel_json_props(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )
