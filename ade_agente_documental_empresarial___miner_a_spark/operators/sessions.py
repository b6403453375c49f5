"""Batch sessionization — gaps-and-islands over an event log.

The streaming engine has native session windows
(``streaming/chat_stream.py::session_metrics``); this is the BATCH mirror
a training-data pipeline runs over historical logs: order each user's
events by time, open a new session when the gap to the previous event
exceeds ``gap``, then aggregate per session.

Scale shape: one window over ``partitionBy(user)`` (the natural shuffle
key — skew only if one user dominates, which salting or AQE handles), a
running sum for session ids in the same window, one groupBy per
(user, session). No self-join, no cross product — this is the canonical
lag+cumsum rewrite of the quadratic "events within gap of each other"
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_session_ids(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """The gaps-and-islands stage alone: every input row, plus a
    ``session_id`` column (1-based per user). Exposed so composites can
    aggregate arbitrary per-event measures within sessions (for example
    chat cost rollups) without a session⋈event range join — both the
    lag and the running sum share ONE user-partitioned window.
    ``id_col`` breaks same-timestamp ordering ties deterministically."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000).cast("long")
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = F.when(
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id", F.sum(new_session).over(w).cast("long")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids and aggregate: returns one row per session
    (user, session_id, n_events, start_ts, end_ts, duration_s)."""
    with_ids = with_session_ids(events, user_col, ts_col, id_col, gap_minutes)
    return with_ids.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            (
                F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
            ).cast("double")
            / 1_000_000.0
        ).alias("duration_s"),
    )
