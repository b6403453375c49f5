"""Round-4 catalog additions, forty-first batch — payment forensics and
sequence auditing:

* duplicate-payment detection (same user, same amount, within a short
  window — the double-charge heuristic every billing system runs
  nightly; lag-based, so no self-join);
* missing-sequence audit (gaps in a supposedly-dense key sequence —
  "which invoice numbers never arrived": the completeness check for
  ingested feeds with monotonic ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import DUCK_EVENTS, events_table, register, table

_DUP_WINDOW_MIN = 5


# ---------------------------------------------------------------------------
# Duplicate payments — purchases by the same user for the same amount
# within 5 minutes: lag over the (user, amount) partition ordered by
# time turns the pairwise question into a per-row predicate — no
# self-join, one shuffle on (user, amount). Emits the SECOND event of
# each suspicious pair (the one to hold), with the gap for triage.
@register(
    "rel_duplicate_payments",
    f"""WITH {DUCK_EVENTS},
p AS (SELECT event_id, ts, user_id, value FROM ev
      WHERE event_type = 'purchase'),
lagged AS (
  SELECT event_id, user_id, value, ts,
         lag(ts) OVER (PARTITION BY user_id, value
                       ORDER BY ts, event_id) AS prev_ts,
         lag(event_id) OVER (PARTITION BY user_id, value
                             ORDER BY ts, event_id) AS prev_event
  FROM p)
SELECT event_id AS suspect_event, prev_event AS original_event,
       user_id, CAST(value AS DOUBLE) AS amount,
       CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_sec
FROM lagged
WHERE prev_ts IS NOT NULL
  AND ts <= prev_ts + INTERVAL {_DUP_WINDOW_MIN} MINUTE""",
)
def rel_duplicate_payments(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    w = Window.partitionBy("user_id", "value").orderBy("ts", "event_id")
    lagged = p.select(
        "event_id",
        "user_id",
        "value",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lag("event_id").over(w).alias("prev_event"),
    )
    return lagged.where(
        F.col("prev_ts").isNotNull()
        & (
            F.col("ts")
            <= F.col("prev_ts")
            + F.expr(f"INTERVAL {_DUP_WINDOW_MIN} MINUTES")
        )
    ).select(
        F.col("event_id").alias("suspect_event"),
        F.col("prev_event").alias("original_event"),
        "user_id",
        F.col("value").cast("double").alias("amount"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
        ).alias("gap_sec"),
    )


# ---------------------------------------------------------------------------
# Missing-sequence audit — for a key that should be dense (invoice/
# order numbers), each sorted-adjacent pair with a gap names a missing
# range [prev+1, next−1]. One lead() over the sorted distinct keys —
# 100 TB cost is the sort, and the output is only the GAPS (tiny),
# never the dense expansion. The fixture's orderkeys are sparse by
# TPC-H construction, so the entry reports real ranges plus the
# totals an auditor reconciles against the expected count.
@register(
    "rel_missing_sequence",
    """WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
gaps AS (
  SELECT key AS gap_after,
         lead(key) OVER (ORDER BY key) AS next_key
  FROM k)
SELECT CAST(gap_after + 1 AS BIGINT) AS missing_from,
       CAST(next_key - 1 AS BIGINT) AS missing_to,
       CAST(next_key - gap_after - 1 AS BIGINT) AS n_missing
FROM gaps
WHERE next_key IS NOT NULL AND next_key - gap_after > 1""",
)
def rel_missing_sequence(spark: SparkSession, sf: str) -> DataFrame:
    k = table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("key")
    ).distinct()
    w = Window.orderBy("key")
    gaps = k.select(
        F.col("key").alias("gap_after"),
        F.lead("key").over(w).alias("next_key"),
    )
    return gaps.where(
        F.col("next_key").isNotNull()
        & (F.col("next_key") - F.col("gap_after") > 1)
    ).select(
        (F.col("gap_after") + 1).cast("long").alias("missing_from"),
        (F.col("next_key") - 1).cast("long").alias("missing_to"),
        (F.col("next_key") - F.col("gap_after") - 1)
        .cast("long")
        .alias("n_missing"),
    )
