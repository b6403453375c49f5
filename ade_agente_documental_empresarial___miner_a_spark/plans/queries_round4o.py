"""Round-4 catalog additions, fifteenth batch — windowed distinct
counting, lake compaction, and robust value clipping:

* running DISTINCT count over a window (Spark has no
  count(DISTINCT) OVER — the scalable form is the first-occurrence
  flag + running sum, identical semantics, linear state);
* small-file compaction (the lake-maintenance primitive: fragment a
  table into hundreds of tiny files, compact to bounded file count,
  prove the bytes are the same table);
* winsorization (per-group p05/p95 clipping — the outlier-capping
  sibling of the quality gate's hard filters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_mean, halfup_mean_duck
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Running distinct-user count per event type — "how many unique users
# had we seen as of each event". Spark (and most engines) reject
# count(DISTINCT) OVER; the scalable equivalent is the first-occurrence
# flag (row_number over (type, user) == 1) summed over the event-time
# running frame. Both engines state the SAME construction over the SAME
# total order (ts, event_id), so the result is deterministic — and the
# window state is one counter per partition instead of a distinct-set
# per row, which is what makes it viable at 100 TB (the naive
# collect_set-over-window holds every user id in every row's frame).
@register(
    "rel_window_distinct_running",
    f"""WITH {DUCK_EVENTS},
flagged AS (
  SELECT event_type, event_id, ts,
         CASE WHEN row_number() OVER (
                PARTITION BY event_type, user_id
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM ev)
SELECT event_type, event_id,
       CAST(sum(first_seen) OVER (
         PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS distinct_users_so_far
FROM flagged""",
)
def rel_window_distinct_running(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    first_w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    running_w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.when(F.row_number().over(first_w) == 1, 1)
        .otherwise(0)
        .alias("first_seen"),
    )
    return flagged.select(
        "event_type",
        "event_id",
        F.sum("first_seen")
        .over(running_w)
        .cast("long")
        .alias("distinct_users_so_far"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction — the lake-maintenance job every 100 TB
# deployment schedules: streaming/incremental writers fragment a table
# into thousands of KB-sized files (here: orders written across 128
# parts), and the compactor rewrites it to a bounded file count
# (repartition to ceil(bytes/target)) without changing a row. The entry
# certifies "same table" the strong way — row count plus an order-
# insensitive content checksum (sum of per-key multiplicative hashes,
# plus the exact decimal price total) computed on
# the COMPACTED layout; the oracle computes the same checksum from the
# source table directly, so any dropped/duplicated/mutated row breaks
# parity. File-count bounds are pinned in the unit test (file listings
# aren't SQL).
_COMPACT_FRAGMENT_PARTS = 128


def _compact_dirs(sf: str) -> tuple[str, str]:
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"ade_compaction_{os.path.basename(os.path.normpath(sf))}",
    )
    return os.path.join(base, "fragmented"), os.path.join(base, "compacted")


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_file_bytes: int
) -> int:
    """Rewrite parquet directory ``src`` to ``dst`` with files sized
    ~``target_file_bytes``: partition count = ceil(input_bytes /
    target). Returns the partition count chosen. Input size comes from
    the file listing (what a table format would read from manifest
    metadata)."""
    import glob

    n_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src, "*.parquet"))
    )
    n_parts = max(1, -(-n_bytes // target_file_bytes))
    (
        spark.read.parquet(src)
        .repartition(n_parts)
        .write.mode("overwrite")
        .parquet(dst)
    )
    return n_parts


@register(
    "s16_compaction",
    """SELECT count(*) AS n_rows,
       CAST(sum(CAST(o_orderkey AS BIGINT) * 2654435761 % 1000000007)
            AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_total
FROM orders""",
)
def s16_compaction(spark: SparkSession, sf: str) -> DataFrame:
    frag_dir, compact_dir = _compact_dirs(sf)
    orders = table(spark, sf, "orders")
    # fragment: the pathology a streaming writer produces
    (
        orders.repartition(_COMPACT_FRAGMENT_PARTS)
        .write.mode("overwrite")
        .parquet(frag_dir)
    )
    compact_parquet(
        spark, frag_dir, compact_dir, target_file_bytes=8 * 1024 * 1024
    )
    compacted = spark.read.parquet(compact_dir)
    return compacted.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.col("o_orderkey").cast("long") * 2654435761 % 1000000007
        )
        .cast("long")
        .alias("key_checksum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("price_total"),
    )


# ---------------------------------------------------------------------------
# Winsorization — cap per-language document lengths at the group's
# [p05, p95] before computing the mean: the standard outlier treatment
# when hard-dropping (quality gate) is too aggressive. Exact
# percentiles per group (percentile ≡ quantile_cont: same linear
# interpolation on both engines; n_chars is integer so the interpolated
# bounds are exact binary fractions), broadcast join-back, map-only
# clip, and a round(·,6)-quantized DECIMAL mean so the fold order can't
# smear the last bit. At 100 TB the exact per-group percentile becomes
# approx_percentile with the contract entry's error pin
# (rel_approx_percentile_contract) — the clip/mean pipeline is
# unchanged.
@register(
    "cur_winsorize",
    f"""WITH bounds AS (
  SELECT lang,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS lo,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS hi
  FROM documents GROUP BY lang),
clipped AS (
  SELECT d.lang,
         CAST(round(least(greatest(CAST(n_chars AS DOUBLE), lo), hi)
                    * 1e6) / 1e6 AS DECIMAL(18,6)) AS v
  FROM documents d JOIN bounds USING (lang))
SELECT lang, count(*) AS n_docs,
       {halfup_mean_duck("sum(v)", "count(*)", 6)} AS winsorized_mean
FROM clipped GROUP BY lang""",
)
def cur_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("v_raw")
    )
    bounds = docs.groupBy("lang").agg(
        F.percentile("v_raw", F.lit(0.05)).alias("lo"),
        F.percentile("v_raw", F.lit(0.95)).alias("hi"),
    )
    clipped = docs.join(F.broadcast(bounds), "lang").select(
        "lang",
        dblround(F.least(F.greatest("v_raw", F.col("lo")), F.col("hi")), 6)
        .cast("decimal(18,6)")
        .alias("v"),
    )
    # v carries exactly 6 decimals -> integer-exact HALF_UP mean
    # (ROUND8 §12: round(double, 6) splits at half boundaries)
    return clipped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        halfup_mean("sum(v)", "count(1)", 6).alias("winsorized_mean"),
    )
