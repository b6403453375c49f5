"""Similarity/top-k invariants (SURVEY §5.4) + embedder↔histogram tie."""

import math

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.embedding import (
    embed_one,
)
from ade_agente_documental_empresarial___miner_a_spark.operators.similarity import (
    knn_join,
    normalize_scores,
    topk_per_group,
    topk_similar,
)


def emb_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_topk_monotone_scores(spark, sf_dir):
    emb = emb_df(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    rows = topk_similar(emb, list(q), k=4).collect()
    assert len(rows) == 4
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # self-match ranks first with score ~1
    assert rows[0].vec_id == 0 and abs(rows[0].score - 1.0) < 1e-9


def test_normalize_pct_sums_to_100(spark, sf_dir):
    emb = emb_df(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 3).collect()[0].embedding
    rows = normalize_scores(topk_similar(emb, list(q), k=3)).collect()
    assert abs(sum(r.pct for r in rows) - 100.0) < 1e-9


def test_topk_per_group_k_bound(spark, sf_dir):
    emb = emb_df(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 2).collect()[0].embedding
    rows = topk_per_group(emb, list(q), "label", k=2).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        assert len(rs) <= 2
        assert [r.rnk for r in sorted(rs, key=lambda x: x.rnk)] == list(
            range(1, len(rs) + 1)
        )


def test_knn_join_excludes_self(spark, sf_dir):
    emb = emb_df(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = knn_join(queries, emb, k=5, exclude_same_id="vec_id").collect()
    assert all(r.vec_id != r.query_id for r in rows)
    assert len(rows) == 15


def test_embed_one_matches_histogram_semantics():
    """embed_one() == normalize(md5 bucket/sign histogram) — the exact
    relationship the t5_embed_histogram oracle checks in SQL."""
    import hashlib

    text = "the quick brown the fox jumps over the lazy dog"
    hist: dict[int, int] = {}
    for tok in text.lower().split():
        h = hashlib.md5(f"42:{tok}".encode()).digest()
        idx = int.from_bytes(h[:4], "little") % 64
        sign = 1 if h[4] & 1 else -1
        hist[idx] = hist.get(idx, 0) + sign
    norm = math.sqrt(sum(v * v for v in hist.values()))
    vec = embed_one(text, dim=64, seed=42)
    for idx, w in hist.items():
        assert abs(vec[idx] - w / norm) < 1e-6
    assert abs(sum(x * x for x in vec) - 1.0) < 1e-5


def test_embed_empty_text_zero_vector():
    vec = embed_one("", dim=16)
    assert vec == [0.0] * 16
