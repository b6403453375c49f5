"""Round-4 catalog additions, thirty-first batch — order-dependent
folds and concurrency analysis:

* capped running sum (balance that can never go negative — an
  ORDER-DEPENDENT recurrence no window frame can express: each step's
  clamp feeds the next, so it runs as a per-key sequential fold in the
  grouped-pandas lane; the oracle states the same recurrence as a
  recursive CTE);
* peak concurrency (maximum simultaneously-open intervals via the
  classic +1/−1 boundary sweep — capacity planning's favorite number).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import events_table, register

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value FROM events)"
)


# ---------------------------------------------------------------------------
# Capped running sum — balance_t = max(0, balance_{t-1} + delta_t):
# the clamp makes each row depend on the PREVIOUS ROW'S OUTPUT, so no
# window frame computes it (a running sum then clamp is a DIFFERENT
# function — the clamp must apply inside every step). This is the
# canonical case for the grouped sequential fold: applyInPandas per
# user over the (ts, event_id) total order, a 5-line numpy-free loop
# per group, state one float. Deltas: clicks earn +value, purchases
# spend −value; quantized to DECIMAL(14,4)-equivalent cents so the
# fold is exact integer arithmetic in disguise and the recursive-CTE
# oracle (same recurrence, rn+1 joins) matches bit-for-bit. At 100 TB
# this is one shuffle on user_id and a linear per-key scan — the same
# cost as sessionization, just forced through the Python lane by the
# semantics.
@register(
    "rel_capped_running_sum",
    f"""WITH RECURSIVE {_DUCK_EV},
seq AS (
  SELECT user_id,
         CAST(round(CASE WHEN event_type = 'purchase'
                         THEN -CAST(value AS DOUBLE)
                         ELSE CAST(value AS DOUBLE) END * 1e4) / 1e4
              AS DECIMAL(18,4)) AS delta,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM ev WHERE event_type IN ('click', 'purchase')),
fold AS (
  SELECT user_id, rn, delta,
         CAST(greatest(CAST(0 AS DECIMAL(18,4)), delta)
              AS DECIMAL(18,4)) AS balance
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.delta,
         CAST(greatest(CAST(0 AS DECIMAL(18,4)), f.balance + s.delta)
              AS DECIMAL(18,4)) AS balance
  FROM fold f JOIN seq s
    ON s.user_id = f.user_id AND s.rn = f.rn + 1)
SELECT user_id,
       CAST(max(rn) AS BIGINT) AS n_steps,
       CAST(max(CASE WHEN rn = mx THEN balance END) AS DOUBLE)
         AS final_balance,
       CAST(max(balance) AS DOUBLE) AS peak_balance,
       CAST(sum(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_floored
FROM (SELECT *, max(rn) OVER (PARTITION BY user_id) AS mx FROM fold)
GROUP BY user_id""",
)
def rel_capped_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).where(
        F.col("event_type").isin("click", "purchase")
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        dblround(
            F.when(
                F.col("event_type") == "purchase",
                -F.col("value").cast("double"),
            ).otherwise(F.col("value").cast("double")),
            4,
        )
        .cast("decimal(18,4)")
        .alias("delta"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # exact integer arithmetic: decimal(18,4) deltas as scaled ints
        bal = 0
        peak = 0
        floored = 0
        for d in (pdf["delta"] * 10_000).round().astype("int64"):
            bal = max(0, bal + int(d))
            peak = max(peak, bal)
            if bal == 0:
                floored += 1
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_steps": [len(pdf)],
                "final_balance": [bal / 10_000.0],
                "peak_balance": [peak / 10_000.0],
                "n_floored": [floored],
            }
        )

    return seq.groupBy("user_id").applyInPandas(
        fold,
        "user_id long, n_steps long, final_balance double, "
        "peak_balance double, n_floored long",
    )


# ---------------------------------------------------------------------------
# Peak concurrency — each event opens a 10-minute interval; the maximum
# number simultaneously open is the +1/−1 boundary sweep: union the
# (start, +1) and (end, −1) boundaries, running-sum over the
# (boundary_ts, delta, event_id) total order (ends sort BEFORE starts
# at the same instant via delta ASC — touching intervals don't
# overlap), take the max per event type. One window over the boundary
# stream — 2N rows, no interval self-join.
@register(
    "rel_peak_concurrency",
    f"""WITH {_DUCK_EV},
bounds AS (
  SELECT event_type, ts AS bts, 1 AS delta, event_id FROM ev
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS bts, -1 AS delta,
         event_id
  FROM ev),
running AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type
                          ORDER BY bts, delta, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS open_now
  FROM bounds)
SELECT event_type, CAST(max(open_now) AS BIGINT) AS peak_concurrent
FROM running GROUP BY event_type""",
)
def rel_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
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
    bounds = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bts", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = bounds.select(
        "event_type", F.sum("delta").over(w).alias("open_now")
    )
    return running.groupBy("event_type").agg(
        F.max("open_now").cast("long").alias("peak_concurrent")
    )
