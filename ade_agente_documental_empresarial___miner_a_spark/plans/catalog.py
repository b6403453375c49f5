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


# The driver's correctness harness checks only the first ~50 entries of
# queries(), in iteration order. Names below already have a green row in a
# recorded CORRECTNESS_r{N}.json (r01/r02 — identical 50-entry files), so we
# rotate them to the BACK of the catalog: everything not yet driver-checked
# surfaces first and lands inside the next round's 50-entry window. Append to
# this set each round as new CORRECTNESS rows land.
_DRIVER_GREEN = frozenset(
    {
        "f1_title_filter", "t1_paragraph_split", "t2_section_assign",
        "j2_section_semi_join", "a1_distinct_sections", "a2_group_by_section",
        "a3_chunk_count", "k1_topk_search", "k2_topk_titles",
        "k3_topk_per_section", "k4_a4_topk_normalized", "k5_head_limit",
        "k6_enumerate_rank", "a6_result_union", "e2_hierarchical_search",
        "t6_context_concat", "t7_prompt_assemble", "a5_token_cost_agg",
        "d2_legacy_corpus_concat", "f3_nonempty_guards", "f5_truncate_preview",
        "j1_zip_join", "t4_doc_construct", "s28_scalar_fns",
        "t3_chunk_pipeline", "t3b_chunk_long_docs", "t5_embed_histogram",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_lsh_verified", "dedup_embedding_cosine",
        "dedup_clusters", "dedup_embedding_lsh", "sim_knn_bruteforce",
        "sim_lsh_bucketed", "text_token_count", "text_quality_score",
        "text_lang_id", "text_fingerprint", "mm_binary_meta",
        "rel_q1_pricing", "rel_q3_shipping", "rel_q5_region_revenue",
        "rel_window_running", "rel_rollup_orders", "rel_cube_events",
        "rel_set_ops", "rel_join_family",
    }
)


def _ordered(mapping: dict) -> dict:
    unchecked = {k: v for k, v in mapping.items() if k not in _DRIVER_GREEN}
    checked = {k: v for k, v in mapping.items() if k in _DRIVER_GREEN}
    return {**unchecked, **checked}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)


_LOADED = False


def _load():
    global _LOADED
    if _LOADED:
        return
    from . import queries_reference  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_ingest  # noqa: F401
    from . import queries_curation  # noqa: F401
    from . import queries_round3  # noqa: F401

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
