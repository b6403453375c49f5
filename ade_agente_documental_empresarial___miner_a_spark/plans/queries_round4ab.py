"""Round-4 catalog additions, twenty-eighth batch — nearest-in-time
alignment, novelty scoring, and the compressibility signal:

* nearest-event join (align each purchase to the temporally CLOSEST
  view, before or after — sensor-fusion/as-of semantics where
  direction is not known a priori; backward-only is rel_asof_join);
* n-gram novelty (share of a document's trigrams that exist nowhere
  else in the corpus — the memorization/novelty axis that separates
  boilerplate from unique content);
* compression ratio (zlib bytes-out/bytes-in per document — the
  classic Gopher-style quality signal: highly repetitive text
  compresses far below prose; genuinely non-SQL, so this entry is
  rows-only by the driver contract and value-pinned in unit tests
  against the reference zlib).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import halfup_mean, halfup_mean_duck
from .catalog import events_table, register, table

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type FROM events)"
)


# ---------------------------------------------------------------------------
# Nearest-event join — per purchase, the temporally closest view by
# the SAME user in EITHER direction. Stated as the union of the two
# as-of directions (running max of view times = nearest before;
# running min over the reversed frame = nearest after), then one
# CASE picks the smaller absolute gap — ties break toward the earlier
# (before) candidate, deterministically on both engines. Two windows
# over one user-partitioned sort; no range join, no self-join.
@register(
    "rel_nearest_event_join",
    f"""WITH {_DUCK_EV},
tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM ev WHERE event_type IN ('view', 'purchase')),
filled AS (
  SELECT user_id, ts, event_id, event_type,
         max(view_ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS before_ts,
         min(view_ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN CURRENT ROW
                                     AND UNBOUNDED FOLLOWING) AS after_ts
  FROM tagged),
pur AS (
  SELECT event_id AS purchase_id, user_id, ts, before_ts, after_ts
  FROM filled WHERE event_type = 'purchase'
    AND (before_ts IS NOT NULL OR after_ts IS NOT NULL))
SELECT purchase_id, user_id,
       CASE WHEN after_ts IS NULL THEN 'before'
            WHEN before_ts IS NULL THEN 'after'
            WHEN date_diff('second', before_ts, ts)
                 <= date_diff('second', ts, after_ts) THEN 'before'
            ELSE 'after' END AS direction,
       CAST(CASE WHEN after_ts IS NULL
                 THEN date_diff('second', before_ts, ts)
                 WHEN before_ts IS NULL
                 THEN date_diff('second', ts, after_ts)
                 WHEN date_diff('second', before_ts, ts)
                      <= date_diff('second', ts, after_ts)
                 THEN date_diff('second', before_ts, ts)
                 ELSE date_diff('second', ts, after_ts) END
            AS BIGINT) AS gap_sec
FROM pur""",
)
def rel_nearest_event_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    tagged = ev.where(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias(
            "view_ts"
        ),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    before = F.max("view_ts").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    after = F.min("view_ts").over(
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        before.alias("before_ts"),
        after.alias("after_ts"),
    )
    pur = filled.where(
        (F.col("event_type") == "purchase")
        & (F.col("before_ts").isNotNull() | F.col("after_ts").isNotNull())
    )
    gap_before = F.unix_timestamp("ts") - F.unix_timestamp("before_ts")
    gap_after = F.unix_timestamp("after_ts") - F.unix_timestamp("ts")
    prefer_before = F.col("after_ts").isNull() | (
        F.col("before_ts").isNotNull() & (gap_before <= gap_after)
    )
    return pur.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(prefer_before, "before").otherwise("after").alias(
            "direction"
        ),
        F.when(prefer_before, gap_before)
        .otherwise(gap_after)
        .cast("long")
        .alias("gap_sec"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty — per document, the share of its DISTINCT character
# trigrams found in no other document: novelty 1.0 is wholly unique
# content, novelty ~0 is boilerplate. Corpus document frequency comes
# from one distinct + one groupBy over the exploded grams (the
# text_trigram_lm shapes); the per-doc rollup divides two exact
# integers once.
@register(
    "text_ngram_novelty",
    f"""WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, i, 3) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 2)) AS i
        FROM documents WHERE length(text) >= 3)),
df AS (SELECT g, count(*) AS doc_freq FROM grams GROUP BY g)
SELECT doc_id,
       count(*) AS n_distinct_grams,
       CAST(sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_grams,
       {halfup_mean_duck("sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END)",
                         "count(*)", 9, integral_sum=True)} AS novelty
FROM grams JOIN df USING (g)
GROUP BY doc_id""",
)
def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    grams = (
        docs.where(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("text") - 2),
                    lambda i: F.col("text").substr(i, F.lit(3)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("doc_freq"))
    joined = grams.join(df, "g")
    # novelty is a round(sum/count) ratio of exact integers —
    # integer-exact HALF_UP (ROUND8 §12 class; r9 audit catch)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.sum(F.when(F.col("doc_freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_unique_grams"),
        halfup_mean(
            "sum(CASE WHEN doc_freq = 1 THEN 1 ELSE 0 END)",
            "count(1)",
            9,
            integral_sum=True,
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# Compression ratio — zlib(level 6) bytes-out / bytes-in per document:
# repetitive text compresses far below natural prose, making this the
# cheap repetition detector Gopher-style pipelines gate on. zlib is
# genuinely outside SQL, so this is the sanctioned-Arrow-lane shape
# (mapInPandas, batch-at-a-time, level pinned for determinism) and the
# entry is ROWS-ONLY by the driver contract; unit tests pin exact
# ratios against the reference zlib and the repetitive≪prose ordering.
_ZLIB_LEVEL = 6


def compression_ratio(docs: DataFrame) -> DataFrame:
    """(doc_id, n_raw_bytes, n_zlib_bytes, ratio) via Arrow batches."""
    import pandas as pd

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            nraw = raw.str.len().astype("int64")
            nz = raw.map(
                lambda b: len(zlib.compress(b, _ZLIB_LEVEL))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw_bytes": nraw,
                    "n_zlib_bytes": nz,
                    "ratio": (nz / nraw.where(nraw > 0)).round(9),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        score,
        "doc_id long, n_raw_bytes long, n_zlib_bytes long, ratio double",
    )


@register("text_compression_ratio")  # rows-only: zlib is not SQL
def text_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    return compression_ratio(table(spark, sf, "documents"))
