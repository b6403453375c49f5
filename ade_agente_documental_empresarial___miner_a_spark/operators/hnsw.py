"""HNSW graph index — the serving-tier ANN the reference actually runs.

The reference's vector store is Chroma, whose index is hnswlib's HNSW
graph (``micro-infobot/app.py:130``; hnswlib via requirements.txt:6),
queried CLIENT-side per chat turn. Rounds 2–7 substituted cluster-
friendly ANN (hyperplane LSH, IVF/int8 — the shapes that scale on
executors) and judged HNSW not-required-for-parity; this module closes
that last named residual where it architecturally belongs: the
driver-resident serving tier, next to ``RamServingIndex`` (which is
the exact-scan baseline). A graph walk is a pointer-chasing loop — it
does not map to Spark's execution model, which is exactly why the
reference runs it client-side too.

From-scratch implementation of Malkov & Yashunin 2016 ("Efficient and
robust approximate nearest neighbor search using Hierarchical
Navigable Small World graphs", arXiv:1603.09320), simplified the way
hnswlib defaults behave:

- similarity = cosine via pre-normalized float64 vectors (dot = cos);
  zero-norm vectors normalize to the zero vector and score 0 against
  everything — they join the graph but lose every comparison, the
  serving analogue of the engine's try_divide-NULL-ranks-last rule.
- level assignment is floor(-ln(u) · mL), mL = 1/ln(M) — but ``u``
  comes from md5(id), NOT an RNG stream, so the graph is a pure
  function of (ids, vectors, M): build it twice, byte-identical; build
  it on another machine, byte-identical. Same determinism discipline
  as the engine's hyperplanes/codebooks.
- neighbor selection is the simple nearest-M heuristic; degree caps
  M (upper layers) / 2M (layer 0) with re-prune on overflow, as in
  hnswlib.
- search is the standard two-phase walk: greedy ef=1 descent from the
  entry point through upper layers, then a best-first beam of size
  ``ef`` at layer 0; final top-k ties break on id ascending (the
  engine's ordering discipline).

Scale posture: this is a PER-REPLICA index for bounded shards (same
``max_rows`` guard philosophy as RamServingIndex); the distributed
tier stays IVF/LSH. Recall is measured, not assumed — see
tests/test_hnsw.py (recall@10 vs the exact kernel on the fixture
embeddings) and the ``serving_hnsw_ram`` bench leg.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np

from pyspark.sql import DataFrame


def _level_for(node_id: int, m: int, seed: int = 42) -> int:
    """Deterministic HNSW level: u ~ U(0,1) from md5(seed:id), level =
    floor(-ln(u) * mL). md5's 64-bit slice is uniform; u is kept away
    from 0 so the log is finite."""
    h = hashlib.md5(f"{seed}:{node_id}".encode()).digest()
    u = (int.from_bytes(h[:8], "little") + 1) / (2**64 + 1)
    ml = 1.0 / math.log(m)
    return int(-math.log(u) * ml)


class HnswIndex:
    """Deterministic in-RAM HNSW over (ids, vectors), cosine metric."""

    def __init__(
        self,
        ids: np.ndarray,
        vectors: np.ndarray,
        m: int = 8,
        ef_construction: int = 64,
        seed: int = 42,
    ) -> None:
        if vectors.ndim != 2 or len(ids) != vectors.shape[0]:
            raise ValueError("ids/vectors row counts must agree")
        if m < 2:
            raise ValueError("m must be >= 2")
        self._ids = np.asarray(ids, dtype=np.int64)
        v = np.asarray(vectors, dtype=np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            self._v = np.where(norms[:, None] > 0.0, v / norms[:, None], 0.0)
        self.m = m
        self.ef_construction = ef_construction
        self.seed = seed
        # adjacency per layer: list[dict[node, list[neighbor]]]
        self._layers: list[dict[int, list[int]]] = []
        self._node_level: list[int] = []
        self._entry: int | None = None
        for i in range(self._v.shape[0]):
            self._insert(i)

    # -- construction ---------------------------------------------------
    def _sim(self, i: int, j: int) -> float:
        return float(self._v[i] @ self._v[j])

    def _sim_to(self, q: np.ndarray, i: int) -> float:
        return float(self._v[i] @ q)

    def _insert(self, i: int) -> None:
        level = _level_for(int(self._ids[i]), self.m, self.seed)
        self._node_level.append(level)
        while len(self._layers) <= level:
            self._layers.append({})
        for lv in range(level + 1):
            self._layers[lv][i] = []
        if self._entry is None:
            self._entry = i
            return
        q = self._v[i]
        ep = self._entry
        top = self._node_level[self._entry]
        # phase 1: greedy descent through layers above the new node
        for lv in range(top, level, -1):
            ep = self._greedy_step(q, ep, lv)
        # phase 2: beam search + connect from min(level, top) down to 0
        for lv in range(min(level, top), -1, -1):
            cands = self._search_layer(q, ep, lv, self.ef_construction)
            neighbors = [
                n
                for n, _ in sorted(
                    cands, key=lambda t: (-t[1], self._ids[t[0]])
                )[: self.m]
            ]
            self._layers[lv][i] = list(neighbors)
            cap = self.m * 2 if lv == 0 else self.m
            for n in neighbors:
                links = self._layers[lv][n]
                links.append(i)
                if len(links) > cap:
                    # re-prune to the cap nearest (ties: smaller id)
                    links.sort(
                        key=lambda x, n=n: (-self._sim(n, x), self._ids[x])
                    )
                    del links[cap:]
            if cands:
                ep = max(
                    cands, key=lambda t: (t[1], -int(self._ids[t[0]]))
                )[0]
        if level > top:
            self._entry = i

    def _greedy_step(self, q: np.ndarray, ep: int, lv: int) -> int:
        cur, cur_sim = ep, self._sim_to(q, ep)
        improved = True
        while improved:
            improved = False
            for n in self._layers[lv].get(cur, ()):
                s = self._sim_to(q, n)
                if s > cur_sim or (s == cur_sim and self._ids[n] < self._ids[cur]):
                    cur, cur_sim = n, s
                    improved = True
        return cur

    def _search_layer(
        self, q: np.ndarray, ep: int, lv: int, ef: int
    ) -> list[tuple[int, float]]:
        """Best-first beam of size ef; returns [(node, sim)]."""
        ep_sim = self._sim_to(q, ep)
        visited = {ep}
        # max-heap of candidates by sim; min-heap of results by sim
        cand = [(-ep_sim, int(self._ids[ep]), ep)]
        res: list[tuple[float, int, int]] = [(ep_sim, -int(self._ids[ep]), ep)]
        while cand:
            neg_s, _, c = heapq.heappop(cand)
            worst = res[0][0] if len(res) >= ef else -math.inf
            if -neg_s < worst and len(res) >= ef:
                break
            fresh = [
                n for n in self._layers[lv].get(c, ()) if n not in visited
            ]
            if not fresh:
                continue
            visited.update(fresh)
            # one matvec for the whole neighbor list instead of per-
            # neighbor Python dots — the walk's hot loop
            sims = self._v[fresh] @ q
            for n, s in zip(fresh, sims):
                s = float(s)
                if len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, int(self._ids[n]), n))
                    heapq.heappush(res, (s, -int(self._ids[n]), n))
                    if len(res) > ef:
                        heapq.heappop(res)
        return [(n, s) for s, _, n in res]

    # -- queries ---------------------------------------------------------
    def search(
        self, query_vec: list[float], k: int = 10, ef: int | None = None
    ) -> list[tuple[int, float]]:
        """Approximate top-k by cosine: [(id, score)] sorted score desc,
        ties id asc. ``ef`` defaults to max(4k, ef_construction) and is
        clamped to >= k (hnswlib's rule — a smaller beam than k would
        silently return fewer than k results)."""
        if self._entry is None or k <= 0:
            return []
        q = np.asarray(query_vec, dtype=np.float64)
        qn = float(np.sqrt(q @ q))
        q = q / qn if qn > 0.0 else q * 0.0
        ef = max(ef or max(4 * k, self.ef_construction), k)
        ep = self._entry
        for lv in range(self._node_level[self._entry], 0, -1):
            ep = self._greedy_step(q, ep, lv)
        cands = self._search_layer(q, ep, 0, ef)
        top = sorted(cands, key=lambda t: (-t[1], self._ids[t[0]]))[:k]
        return [(int(self._ids[n]), s) for n, s in top]

    def __len__(self) -> int:
        return self._v.shape[0]

    @property
    def max_level(self) -> int:
        return len(self._layers) - 1

    def graph_signature(self) -> str:
        """md5 over the full adjacency — the determinism pin: two builds
        of the same (ids, vectors, m, seed) must agree byte-for-byte."""
        h = hashlib.md5()
        for lv, layer in enumerate(self._layers):
            for node in sorted(layer):
                h.update(
                    f"{lv}:{self._ids[node]}:"
                    f"{[int(self._ids[n]) for n in layer[node]]};".encode()
                )
        return h.hexdigest()

    @classmethod
    def from_frame(
        cls,
        emb: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        m: int = 8,
        ef_construction: int = 64,
        max_rows: int = 200_000,
    ) -> "HnswIndex":
        """Build from a DataFrame with the same bounded-collect guard as
        RamServingIndex (fail fast past the per-replica budget). Rows
        are sorted by id AFTER the bounded collect (driver-side, cheap)
        — insertion order shapes the graph, and a scan's row order is
        plan-dependent, so without the sort two builds of the same
        table could disagree."""
        rows = emb.select(id_col, vec_col).limit(max_rows + 1).collect()
        rows.sort(key=lambda r: r[0])
        if len(rows) > max_rows:
            raise ValueError(
                f"HNSW shard exceeds max_rows={max_rows}; shard the "
                f"frame or raise the guard explicitly"
            )
        if not rows:
            return cls(
                np.empty(0, dtype=np.int64),
                np.empty((0, 0), dtype=np.float64),
                m=m,
                ef_construction=ef_construction,
            )
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        vecs = np.array([list(r[1]) for r in rows], dtype=np.float64)
        return cls(ids, vecs, m=m, ef_construction=ef_construction)
