"""Tier-boundary contracts of HnswServingIndex (ADVICE r9 #5).

One object serves two tiers: ``topk``/``topk_batch`` through the
approximate HNSW graph, ``search_hierarchy`` through the EXACT scan
(the graph is global — a per-label beam search has no recall bound).
These pins make the boundary, and the zero-norm score difference
between the tiers, an explicit tested contract instead of an
inheritance accident.
"""

from __future__ import annotations

import numpy as np

from ade_agente_documental_empresarial___miner_a_spark.operators.serving import (
    HnswServingIndex,
    RamServingIndex,
)


def _corpus(n: int = 40, dim: int = 16, zero_row: bool = True):
    rng = np.random.default_rng(11)
    vecs = rng.uniform(-0.5, 0.5, (n, dim))
    if zero_row:
        vecs[5] = 0.0  # the NULL-score contract carrier
    ids = np.arange(n, dtype=np.int64)
    texts = [f"chunk {i}" for i in range(n)]
    labels = [f"lab{i % 3}" for i in range(n)]
    return ids, texts, vecs, labels


def test_search_hierarchy_is_the_exact_tier():
    ids, texts, vecs, labels = _corpus()
    exact = RamServingIndex(ids, texts, vecs, labels)
    hnsw = HnswServingIndex(ids, list(texts), vecs, list(labels))
    q = list(np.random.default_rng(3).uniform(-0.5, 0.5, 16))
    got = hnsw.search_hierarchy(q, per_label_k=2)
    want = exact.search_hierarchy(q, per_label_k=2)
    assert got == want  # bit-identical: hierarchy never goes approximate


def test_zero_norm_contract_differs_by_tier_as_documented():
    ids, texts, vecs, labels = _corpus(n=8)
    exact = RamServingIndex(ids, texts, vecs, labels)
    hnsw = HnswServingIndex(ids, list(texts), vecs, list(labels))
    q = list(np.random.default_rng(4).uniform(-0.5, 0.5, 16))
    # exact tier: the zero-norm row surfaces with score=None, last
    ex_hits = exact.topk(q, k=8)
    ex_by_id = {h.chunk_id: h.score for h in ex_hits}
    assert ex_by_id[5] is None
    assert ex_hits[-1].chunk_id == 5
    # HNSW tier: if the zero-norm row is returned at all, its score is
    # a float 0.0 — never None (the documented difference)
    hn_hits = hnsw.topk(q, k=8)
    for h in hn_hits:
        assert h.score is not None
        if h.chunk_id == 5:
            assert h.score == 0.0


def test_topk_batch_is_graph_served_and_batch_equals_single():
    ids, texts, vecs, labels = _corpus(n=60, zero_row=False)
    hnsw = HnswServingIndex(ids, list(texts), vecs, list(labels))
    qs = np.random.default_rng(5).uniform(-0.5, 0.5, (4, 16))
    # topk_batch delegates per query -> bit-identical to single calls,
    # i.e. it serves the SAME (graph) tier as topk, not the exact scan
    got = hnsw.topk_batch([list(q) for q in qs], k=3)
    want = [hnsw.topk(list(q), k=3) for q in qs]
    assert got == want
