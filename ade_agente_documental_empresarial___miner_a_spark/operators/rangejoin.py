"""Bucketized range join — the scalable form of a time-window theta join.

A naive ``l.ts BETWEEN r.ts - w AND r.ts`` join is a non-equi join:
Spark falls back to BroadcastNestedLoopJoin (O(N·M) comparisons, driver
OOM for big sides). The standard rewrite buckets time into ``window``-
sized cells and equi-joins on (key, bucket), probing each left row's
bucket and its predecessor, then applies the exact range predicate —
turning the theta join into 2 equi-join probes per row with a narrow
shuffle. Same trick Databricks' range-join hints and TimescaleDB chunk
exclusion use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_recent(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_right",
) -> DataFrame:
    """All (left, right) pairs with the same key where
    ``left_ts - window_seconds <= right_ts <= left_ts`` (right events in
    the trailing window of each left event). Inner-join semantics."""
    w_us = int(window_seconds) * 1_000_000
    lb = (F.unix_micros(F.col(left_ts)) / w_us).cast("long").alias("_bucket")
    rbucket = (F.unix_micros(F.col(right_ts)) / w_us).cast("long")

    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on,)]
    l = left.select(
        F.col(on), *[F.col(c) for c in lcols if c != on], lb
    )
    # probe the row's bucket and its predecessor (a trailing window of
    # length w spans at most 2 cells of width w)
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        F.explode(F.array(rbucket, rbucket + 1)).alias("_bucket"),
    )
    joined = l.join(r, [on, "_bucket"])
    lt = F.unix_micros(F.col(left_ts))
    rt = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    return (
        joined.where((rt <= lt) & (rt >= lt - w_us))
        .drop("_bucket")
    )
