"""Round-4 catalog additions, twenty-third batch — release governance
and portability corners:

* k-anonymity audit (the privacy gate before a data release: how many
  quasi-identifier groups are smaller than k — every row in such a
  group is re-identifiable to within its group size);
* release manifest (per-shard integrity record: counts, token mass,
  and an order-canonical content digest — what a reproducible dataset
  release publishes next to the shards);
* unicode battery (codepoint-vs-byte semantics across engines: length,
  octet_length, case mapping, and codepoint-boundary substr over
  multibyte text — the corner ingestion pipelines quietly corrupt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# k-anonymity audit — group the release candidate by its
# quasi-identifiers (language × length-centile-bucket here: the
# attributes an adversary can observe) and report, per language, the
# group count, how many groups fall below k=5, and the minimum group
# size. A release passes when n_below_k is 0; the per-language rollup
# names WHERE generalization is needed. One aggregate over the QI key,
# one rollup — both map-side-combinable.
_K_ANON = 5


@register(
    "cur_k_anonymity",
    f"""WITH qi AS (
  SELECT lang, CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
         count(*) AS group_n
  FROM documents GROUP BY lang, len_bucket)
SELECT lang,
       count(*) AS n_groups,
       CAST(sum(CASE WHEN group_n < {_K_ANON} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below_k,
       CAST(min(group_n) AS BIGINT) AS min_group_size
FROM qi GROUP BY lang""",
)
def cur_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    qi = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / 100.0).cast("long").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).alias("group_n"))
    return qi.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(
            F.when(F.col("group_n") < _K_ANON, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_below_k"),
        F.min("group_n").cast("long").alias("min_group_size"),
    )


# ---------------------------------------------------------------------------
# Release manifest — the integrity record a reproducible dataset
# release ships: per source shard, document count, token mass, id
# range, and a CONTENT DIGEST that any consumer can recompute —
# md5 over the doc_ids concatenated in a canonical (sorted) order, so
# the digest is independent of partitioning, scan order, and engine.
# The ordered listagg inside md5 is the same WITHIN GROUP machinery as
# rel_string_agg; at 100 TB the digest hashes per-doc md5s instead of
# raw ids and merges via XOR (order-free), noted — the canonical-order
# contract is identical.
@register(
    "cur_release_manifest",
    """SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS content_digest
FROM documents GROUP BY source""",
)
def cur_release_manifest(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ", -1)))
        .cast("long")
        .alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.md5(
            F.expr(
                "listagg(CAST(doc_id AS STRING), ',') "
                "WITHIN GROUP (ORDER BY doc_id)"
            ).cast("binary")
        ).alias("content_digest"),
    )


# ---------------------------------------------------------------------------
# Unicode battery — the codepoint-vs-byte corners, pinned on literal
# multibyte rows (the parquet fixtures are ASCII; the VALUES rows are
# the adversarial input): length() counts CODEPOINTS on both engines,
# octet_length counts UTF-8 bytes, substr slices at codepoint
# boundaries (never mid-sequence), and upper() maps é→É identically.
# What is deliberately ABSENT: locale-sensitive case folding (Turkish
# dotless-i differs by collation — rel_collation_ci territory) and
# grapheme clusters (a skin-tone emoji is >1 codepoint on BOTH engines;
# consumers needing grapheme semantics segment in the application
# layer). The portability rule this entry states: pipelines may rely on
# codepoint+byte semantics, never on grapheme or locale behavior.
_UNI_ROWS = [
    (1, "plain ascii"),
    (2, "café crème"),
    (3, "naïve — em"),
    (4, "日本語テキスト"),
    (5, "mixed русский text"),
]


def _uni_values_sql() -> str:
    rows = ", ".join(f"({i}, '{s}')" for i, s in _UNI_ROWS)
    return f"(VALUES {rows}) t(row_id, s)"


@register(
    "func_unicode_battery",
    f"""SELECT row_id,
       CAST(length(s) AS INT) AS n_codepoints,
       CAST(octet_length(encode(s)) AS INT) AS n_bytes,
       upper(s) AS upped,
       substr(s, 2, 5) AS mid_slice
FROM {_uni_values_sql()}""",
)
def func_unicode_battery(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(_UNI_ROWS, "row_id int, s string")
    return df.select(
        "row_id",
        F.length("s").cast("int").alias("n_codepoints"),
        F.octet_length("s").cast("int").alias("n_bytes"),
        F.upper("s").alias("upped"),
        F.substring("s", 2, 5).alias("mid_slice"),
    )
