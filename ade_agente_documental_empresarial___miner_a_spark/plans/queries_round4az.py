"""Round-4 catalog additions, fifty-second batch — capacity
distributions and smoothed language models:

* concurrency percentiles (the full distribution behind
  rel_peak_concurrency's max: p50/p90/p99 of simultaneously-open
  intervals — capacity planning provisions for a percentile, not the
  all-time peak);
* backoff bigram LM (Katz-style: bigram probability where the bigram
  was seen, discounted unigram where it wasn't — the smoothing step
  between raw counts and usable per-doc scores, extending the
  trigram-LM family with the OOV-handling discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Concurrency percentiles — the boundary sweep from
# rel_peak_concurrency, kept at the running-sum stage and reduced to
# exact percentiles per event type instead of just the max. The
# distribution is what a capacity plan provisions against (p99), what
# an autoscaler targets (p90), and what the peak alone always
# overstates. Integer open-counts ⇒ exact interpolation halves.
@register(
    "rel_concurrency_percentiles",
    f"""WITH {DUCK_EVENTS},
bounds AS (
  SELECT event_type, ts AS bts, 1 AS delta, event_id FROM ev
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE, -1, event_id FROM ev),
running AS (
  SELECT event_type,
         CAST(sum(delta) OVER (PARTITION BY event_type
                               ORDER BY bts, delta, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS DOUBLE)
           AS open_now
  FROM bounds)
SELECT event_type,
       quantile_cont(open_now, 0.5) AS p50_open,
       quantile_cont(open_now, 0.9) AS p90_open,
       quantile_cont(open_now, 0.99) AS p99_open,
       CAST(max(open_now) AS BIGINT) AS peak_open
FROM running GROUP BY event_type""",
)
def rel_concurrency_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    starts = ev.select(
        "event_type",
        F.col("ts").alias("bts"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("bts"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bts", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = starts.unionByName(ends).select(
        "event_type",
        F.sum("delta").over(w).cast("double").alias("open_now"),
    )
    return running.groupBy("event_type").agg(
        F.percentile("open_now", F.lit(0.5)).alias("p50_open"),
        F.percentile("open_now", F.lit(0.9)).alias("p90_open"),
        F.percentile("open_now", F.lit(0.99)).alias("p99_open"),
        F.max("open_now").cast("long").alias("peak_open"),
    )


# ---------------------------------------------------------------------------
# Backoff bigram LM — word bigrams over the corpus: P(w2|w1) =
# 0.9·count(w1 w2)/count(w1 ·) where the bigram exists, else
# 0.1·P_unigram(w2) (absolute interpolation with fixed weights — the
# simplest Katz-flavored backoff that still handles unseen pairs).
# Per-doc mean log-prob under the corpus model, same round(·,9)
# quantize-then-decimal-fold discipline as the trigram entry; the
# bigram→model join co-partitions on the bigram key, the unigram
# fallback is a broadcast-sized table at fixture scale and a
# co-partitioned join at 100 TB.
#
# Known cross-engine residual (whole LM family): ln() is not correctly
# rounded in either engine's libm, so on identical inputs the two
# doubles can differ by 1 ulp — when such a value sits exactly on a
# round(·,9) boundary the quantizations split (observed ONCE at
# sf0.001: row 475, 1e-9 diff; docs/ROUND6.md §10). The gate SF is
# deterministic-green; the discipline bounds any divergence to 1e-9 on
# isolated rows rather than letting fold-order noise compound.
@register(
    "text_bigram_backoff_lm",
    """WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bi AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - 1)) AS i
        FROM tok WHERE len(ws) >= 2)),
bcnt AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
u1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
uni AS (
  SELECT w2, count(*) AS cu FROM bi GROUP BY w2),
tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS total FROM uni),
scored AS (
  SELECT b.doc_id,
         CAST(round(ln(0.9 * (CAST(m.c2 AS DOUBLE) / u.c1)
                       + 0.1 * (CAST(un.cu AS DOUBLE) / t.total))
                    * 1e9) / 1e9
              AS DECIMAL(20,9)) AS logp
  FROM bi b
  JOIN bcnt m ON m.w1 = b.w1 AND m.w2 = b.w2
  JOIN u1 u ON u.w1 = b.w1
  JOIN uni un ON un.w2 = b.w2
  CROSS JOIN tot t)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(CASE WHEN sum(logp) < 0 THEN -1 ELSE 1 END
            * ((2 * CAST(abs(sum(logp)) * 1000000000 AS HUGEINT) + count(*))
               // (2 * count(*))) AS DOUBLE) / 1e9 AS avg_logp
FROM scored GROUP BY doc_id""",
)
def text_bigram_backoff_lm(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    tok = docs.select("doc_id", F.split("text", " ", -1).alias("ws"))
    bi = tok.where(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 2),
                lambda i: F.struct(
                    F.element_at("ws", i + 1).alias("w1"),
                    F.element_at("ws", i + 2).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    u1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("cu"))
    tot = uni.agg(F.sum("cu").cast("double").alias("total"))
    scored = (
        bi.join(bcnt, ["w1", "w2"])
        .join(u1, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            dblround(
                F.log(
                    0.9 * (F.col("c2").cast("double") / F.col("c1"))
                    + 0.1 * (F.col("cu").cast("double") / F.col("total"))
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("logp"),
        )
    )
    # integer-exact HALF_UP mean — see text_trigram_lm for the full
    # rationale (round(double,9) is not cross-engine stable at half
    # boundaries; parity_fuzz chunk/s2 caught exactly that here)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.expr(
                "CAST(CASE WHEN sum(logp) < 0 THEN -1 ELSE 1 END"
                " * ((2 * CAST(abs(sum(logp)) * 1000000000 AS"
                " DECIMAL(38,0)) + count(1)) div (2 * count(1)))"
                " AS DOUBLE)"
            )
            / F.lit(1e9)
        ).alias("avg_logp"),
    )
