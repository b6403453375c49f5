"""Adaptive top-k planner + range join unit tests."""

import datetime as dt

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.rangejoin import (
    range_join_recent,
)
from ade_agente_documental_empresarial___miner_a_spark.plans.planner import (
    adaptive_topk,
    estimated_size_bytes,
)


def test_adaptive_topk_exact_small(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    out, strategy = adaptive_topk(emb, list(q), k=4)
    assert strategy == "exact"
    rows = out.collect()
    assert len(rows) == 4 and rows[0].vec_id == 0


def test_adaptive_topk_lsh_when_forced(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    out, strategy = adaptive_topk(emb, list(q), k=4, exact_threshold_bytes=1)
    assert strategy == "lsh"
    rows = out.collect()
    assert 0 < len(rows) <= 4
    # LSH candidates come from the query's bucket; scores are real cosines
    assert all(-1.0 <= r.score <= 1.0 + 1e-9 for r in rows)


def test_size_estimate_positive(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert estimated_size_bytes(emb) > 0


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), 1), (2, ts("2024-01-01T11:00:00"), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01T09:40:00"), 1),  # 20min before left#1 ✓
            (11, ts("2024-01-01T10:00:00"), 1),  # same instant as left#1 ✓
            (12, ts("2024-01-01T09:20:00"), 1),  # 40min before left#1 ✗ (>30m)
            (13, ts("2024-01-01T10:59:00"), 1),  # 1min before left#2 ✓
            (14, ts("2024-01-01T10:30:00"), 2),  # other user ✗
        ],
        "r_event_id long, r_ts timestamp, user_id long",
    )
    out = range_join_recent(
        left, right, on="user_id", window_seconds=1800,
        left_ts="ts", right_ts="r_ts",
    )
    pairs = {(r.event_id, r.r_event_id_right) for r in out.collect()}
    # naive reference: inequality join
    naive = {
        (l.event_id, r.r_event_id)
        for l in left.collect()
        for r in right.collect()
        if l.user_id == r.user_id
        and r.r_ts <= l.ts
        and (l.ts - r.r_ts).total_seconds() <= 1800
    }
    assert pairs == naive
    assert (1, 10) in pairs and (1, 11) in pairs and (2, 13) in pairs
    assert (1, 12) not in pairs
