"""Round-4 catalog additions, twenty-seventh batch — sequence modeling
and release diffing:

* event transition matrix (first-order Markov estimation over per-user
  event sequences: the bigram counts + row-normalized probabilities
  that behavioral models, session simulators, and anomaly baselines
  all start from);
* dataset version diff (the release audit between corpus v1 and v2:
  added / removed / changed / unchanged doc counts and the token
  delta — what a data changelog entry actually contains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import halfup_ratio, halfup_ratio_duck
from .catalog import events_table, register, table

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type FROM events)"
)


# ---------------------------------------------------------------------------
# Event transition matrix — lag(event_type) over each user's
# (ts, event_id) total order gives the bigram stream; counting (prev →
# next) pairs and row-normalizing estimates the first-order Markov
# kernel. One user-partitioned window + one aggregate — the same
# shuffle budget as sessionization. The probability divides two exact
# integers once, round(·,9) on both engines.
@register(
    "rel_event_transitions",
    f"""WITH {_DUCK_EV},
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM ev),
bi AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type),
tot AS (
  SELECT prev_type, sum(n) AS row_total FROM bi GROUP BY prev_type)
SELECT bi.prev_type, bi.next_type, CAST(bi.n AS BIGINT) AS n_transitions,
       {halfup_ratio_duck("bi.n", "tot.row_total", 9)}
         AS p_transition
FROM bi JOIN tot ON tot.prev_type = bi.prev_type""",
)
def rel_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    bi = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = bi.groupBy("prev_type").agg(
        F.sum("n").alias("row_total")
    )
    return bi.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n_transitions"),
        # integer-exact HALF_UP ratio (ROUND8 §12 class; r9 audit)
        halfup_ratio("n", "row_total", 9).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# Dataset version diff — the changelog between corpus v1 (documents as
# shipped) and a deterministic v2 (every 7th doc dropped, every 11th
# non-dropped doc re-generated with doubled text, every doc_id≡3 mod 13
# added as a new doc in a disjoint id space): one FULL OUTER join on
# doc_id classifies added / removed / changed / unchanged, with doc
# counts and the signed token delta per class. This is rel_upsert_merge
# pointed at corpus release management — the numbers a dataset
# changelog publishes so downstream consumers know whether re-training
# is warranted.
_V2_ADD_SHIFT = 1_000_000


@register(
    "cur_dataset_diff",
    f"""WITH v1 AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' ' || text
              ELSE text END AS text,
         CAST(len(string_split(
           CASE WHEN doc_id % 11 = 0 THEN text || ' ' || text
                ELSE text END, ' ')) AS BIGINT) AS toks
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + {_V2_ADD_SHIFT} AS doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents WHERE doc_id % 13 = 3),
m AS (
  SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
              WHEN v2.doc_id IS NULL THEN 'removed'
              WHEN v1.text <> v2.text THEN 'changed'
              ELSE 'unchanged' END AS change,
         coalesce(v2.toks, 0) - coalesce(v1.toks, 0) AS tok_delta
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
SELECT change, count(*) AS n_docs,
       CAST(sum(tok_delta) AS BIGINT) AS token_delta
FROM m GROUP BY change""",
)
def cur_dataset_diff(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("doc_id", "text")
    toks = F.size(F.split("text", " ", -1)).cast("long")
    v1 = docs.select("doc_id", "text", toks.alias("toks"))
    modified = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat_ws(" ", "text", "text"),
    ).otherwise(F.col("text"))
    v2_kept = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select("doc_id", modified.alias("text"))
        .select(
            "doc_id",
            "text",
            F.size(F.split("text", " ", -1)).cast("long").alias("toks"),
        )
    )
    v2_added = docs.where(F.col("doc_id") % 13 == 3).select(
        (F.col("doc_id") + _V2_ADD_SHIFT).alias("doc_id"),
        "text",
        toks.alias("toks"),
    )
    v2 = v2_kept.unionByName(v2_added)
    m = (
        v1.alias("a")
        .join(v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
        .select(
            F.when(F.col("a.doc_id").isNull(), "added")
            .when(F.col("b.doc_id").isNull(), "removed")
            .when(F.col("a.text") != F.col("b.text"), "changed")
            .otherwise("unchanged")
            .alias("change"),
            (
                F.coalesce(F.col("b.toks"), F.lit(0))
                - F.coalesce(F.col("a.toks"), F.lit(0))
            ).alias("tok_delta"),
        )
    )
    return m.groupBy("change").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_delta").cast("long").alias("token_delta"),
    )
