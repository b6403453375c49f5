"""Round-4 catalog additions, sixteenth batch — co-located storage joins
and the outer stream-stream join:

* bucketed zero-shuffle join (both fact tables pre-bucketed on the join
  key → SortMergeJoin with NO Exchange: the co-located-join layout that
  removes the dominant shuffle from a 100 TB recurring join);
* LEFT OUTER stream-stream interval join (unmatched purchases
  null-extend only after the watermark passes — the semantics that make
  outer stream joins need a watermark at all), batch-mirrored with a
  live test counterpart.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import events_table, register, table
from .queries_round4 import _source_tag


# ---------------------------------------------------------------------------
# Bucketed co-located join — the storage-level answer to "this join
# runs every hour on 100 TB": write BOTH sides bucketed on the join key
# (8 buckets here; thousands at scale), and every future join on that
# key plans as SortMergeJoin over matching bucket files with NO
# Exchange on either side — the shuffle is paid once at write time,
# then amortized over every recurring read. The entry builds the
# bucketed tables once per fixture generation (cache keyed on the
# source parquet's identity), joins them under a no-broadcast conf
# window (so the bucket path, not a broadcast, carries the join at
# fixture scale), and restores confs after an eager materialization.
# The unit test pins "no Exchange below the join"; parity pins values
# against the plain join.
_BUCKETS = 8


def _bucketed_table(
    spark: SparkSession, sf: str, name: str, key: str
) -> str:
    tag = hashlib.md5(_source_tag(sf, name).encode()).hexdigest()[:10]
    tbl = f"ade_bkt_{name}_{tag}"
    if not spark.catalog.tableExists(tbl):
        import tempfile

        path = os.path.join(tempfile.gettempdir(), f"{tbl}_data")
        (
            table(spark, sf, name)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(tbl)
        )
    return tbl


def _bucketed_join_plan(spark: SparkSession, sf: str) -> DataFrame:
    o_tbl = _bucketed_table(spark, sf, "orders", "o_orderkey")
    li_tbl = _bucketed_table(spark, sf, "lineitem", "l_orderkey")
    o = spark.table(o_tbl).select("o_orderkey", "o_orderpriority")
    li = spark.table(li_tbl).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,6)"))
            ).cast("decimal(24,8)")
        )
        .cast("double")
        .alias("revenue"),
    )


_NO_BROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@register(
    "rel_bucketed_join",
    """SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,6)))
                     AS DECIMAL(24,8))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",
)
def rel_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    prev = {k: spark.conf.get(k) for k in _NO_BROADCAST}
    for k, v in _NO_BROADCAST.items():
        spark.conf.set(k, v)
    try:
        return _bucketed_join_plan(spark, sf).localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# LEFT OUTER stream-stream interval join, batch-mirrored (live path:
# streaming/chat_stream.py::interval_join_outer, live-tested in
# tests/test_streaming.py): every purchase emits — with its trailing-
# hour view count, or null-extended (n_views=0, first_view_id NULL)
# when no view preceded it. In the live run the null extension waits
# for the watermark to pass the purchase's event time; in batch all
# data is in, so the LEFT JOIN states the same final result the stream
# converges to — exactly the property the live test pins.
@register(
    "stream_interval_join_outer",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
v AS (SELECT user_id, ts AS v_ts, event_id AS view_id FROM ev WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id FROM ev WHERE event_type = 'purchase'),
j AS (
  SELECT p.user_id, p.purchase_id, v.view_id
  FROM p LEFT JOIN v ON v.user_id = p.user_id
   AND v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR)
SELECT user_id, purchase_id,
       count(view_id) AS n_views,
       CAST(min(view_id) AS BIGINT) AS first_view_id
FROM j GROUP BY user_id, purchase_id""",
)
def stream_interval_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.chat_stream import interval_join_outer

    ev = events_table(spark, sf)
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")
    joined = interval_join_outer(views, buys)
    return joined.groupBy("user_id", "purchase_id").agg(
        F.count("view_id").alias("n_views"),
        F.min("view_id").cast("long").alias("first_view_id"),
    )
