"""The queries()/oracle_sql() catalog — SURVEY.md §2 operator inventory.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with a DuckDB-runnable SQL oracle over the same parquet fixtures. Column
names/aliases match exactly on both sides (driver hashes values after
sorting columns by name). Entries without an oracle are rows-only checked.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load():
    global _LOADED
    if _LOADED:
        return
    from . import queries_reference  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_ingest  # noqa: F401
    from . import queries_curation  # noqa: F401

    _LOADED = True


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..session import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet reader
# rejects. Read it with an explicit INT64 schema (physical type matches) and
# convert nanos → microsecond timestamps. The DuckDB oracle mirrors this with
# CAST(ts AS TIMESTAMP) (ns→us truncation matches integer `div 1000`).
_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)

DUCK_EVENTS = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..session import ensure_package_shipped

    ensure_package_shipped(spark)
    raw = spark.read.schema(_EVENTS_SCHEMA).parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
