"""Round-4 catalog additions, thirty-fifth batch — single-pass
multi-predicate scans and lake layout migration:

* multi-band counts (the TPC-DS Q88 shape: many banded predicates
  answered by ONE scan with conditional aggregates — the naive form is
  eight scans or eight subqueries; the single-pass form is what a
  columnar engine should be handed);
* layout migration (repartition a daily-partitioned lake to monthly —
  the partition-granularity change every aging deployment eventually
  schedules — proving row preservation per target partition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value FROM events)"
)


# ---------------------------------------------------------------------------
# Multi-band counts — eight hour-band × value-band cells in ONE scan:
# each band is a conditional aggregate (sum of CASE), so the fact table
# is read once and every cell fills from the same pass. The
# anti-pattern this replaces — one subquery per cell, TPC-DS Q88's
# literal SQL — scans the table 8×; Catalyst folds this form into a
# single HashAggregate over one scan, which .explain confirms and the
# 100 TB cost model demands.
_BANDS = [
    ("h8_11_low", 8, 12, 0.0, 50.0),
    ("h8_11_high", 8, 12, 50.0, 1e18),
    ("h12_15_low", 12, 16, 0.0, 50.0),
    ("h12_15_high", 12, 16, 50.0, 1e18),
    ("h16_19_low", 16, 20, 0.0, 50.0),
    ("h16_19_high", 16, 20, 50.0, 1e18),
    ("h20_23_low", 20, 24, 0.0, 50.0),
    ("h20_23_high", 20, 24, 50.0, 1e18),
]


def _band_sql() -> str:
    cells = ",\n       ".join(
        f"CAST(sum(CASE WHEN extract(hour FROM ts) >= {h0} "
        f"AND extract(hour FROM ts) < {h1} "
        f"AND value >= {lo} AND value < {hi} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS {name}"
        for name, h0, h1, lo, hi in _BANDS
    )
    return f"""WITH {_DUCK_EV}
SELECT count(*) AS n_total,
       {cells}
FROM ev"""


@register("rel_multiband_counts", _band_sql())
def rel_multiband_counts(spark: SparkSession, sf: str) -> DataFrame:
    from .catalog import events_table

    ev = events_table(spark, sf)
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for name, h0, h1, lo, hi in _BANDS:
        cond = (
            (F.hour("ts") >= h0)
            & (F.hour("ts") < h1)
            & (F.col("value") >= lo)
            & (F.col("value") < hi)
        )
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0))
            .cast("long")
            .alias(name)
        )
    return ev.agg(*aggs)


# ---------------------------------------------------------------------------
# Layout migration — the daily-partitioned events lake (the DPP
# entry's fixture) re-laid-out by MONTH: at 100 TB, daily partitions
# that made sense at ingest (small, prunable backfills) age into a
# directory-count problem, and the monthly rewrite is one
# repartition-by-the-new-key write. The entry runs the real migration
# (read daily layout → write monthly layout → read back) and returns
# per-month row counts + exact value totals; the oracle computes the
# same from the raw events, so a row lost or duplicated by the rewrite
# breaks parity.
def _monthly_dir(sf: str) -> str:
    import tempfile

    from .queries_round4 import _source_tag

    return os.path.join(
        tempfile.gettempdir(),
        f"ade_monthly_events_{_source_tag(sf, 'events')}",
    )


@register(
    "s19_layout_migration",
    f"""WITH {_DUCK_EV}
SELECT strftime(CAST(ts AS DATE), '%Y-%m') AS event_month,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM ev GROUP BY event_month""",
)
def s19_layout_migration(spark: SparkSession, sf: str) -> DataFrame:
    from .queries_round4 import _ensure_partitioned_events

    daily_path = _ensure_partitioned_events(spark, sf)
    monthly_path = _monthly_dir(sf)
    if not os.path.exists(os.path.join(monthly_path, "_SUCCESS")):
        daily = spark.read.parquet(daily_path)
        monthly = daily.withColumn(
            "event_month", F.date_format("event_date", "yyyy-MM")
        )
        (
            monthly.repartition("event_month")
            .write.mode("overwrite")
            .partitionBy("event_month")
            .parquet(monthly_path)
        )
    migrated = spark.read.parquet(monthly_path)
    return migrated.groupBy("event_month").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
