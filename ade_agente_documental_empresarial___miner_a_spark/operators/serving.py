"""Driver-resident serving tier for bounded retrieval indexes.

The reference serves every chat turn from a RAM-resident vector index
queried client-side (Chroma collection, ``micro-infobot/app.py:130``;
``similarity_search`` at ``app.py:223``) — no cluster round-trip is on
its per-turn hot path. The engine's analytics tier keeps retrieval
distributed (``operators/similarity.topk_similar`` — broadcast literal
query, TakeOrderedAndProject), but a SERVING deployment asking one
top-k question per chat turn pays ~100 ms of plan-build + scheduling
per query for work that touches a few MB of cached vectors.

``RamServingIndex`` is the engine analogue of the reference's client
index: built ONCE from the distributed frame (the build stays a Spark
scan; at 100 TB the index itself is produced by the distributed
pipeline and sharded so each serving replica loads one bounded shard),
bounded by an explicit row guard (the collect is capped with
``limit(max_rows+1)`` so an oversized frame fails fast instead of
materializing), and queried per turn with a numpy kernel that is
BIT-IDENTICAL to the Spark expression it mirrors.

Bit-exactness: ``topk_similar`` scores with ``cosine_to_literal`` —
dot(v, q) as a left fold in array order over per-element
double-rounded products, divided by (left-fold |v|) * (driver-constant
|q|). The kernel reproduces every rounding step: accumulating
``s += M[:, j] * q[j]`` over dimensions j in order performs, per row,
exactly that product-then-add sequence in IEEE-754 doubles (numpy
ufuncs round each op separately — no FMA), so scores, and therefore
rankings, match the JVM bit for bit. Ties break on the id column
ascending, the same order ``topk_similar`` requests. Zero-norm vectors
raise, mirroring the engine's ANSI divide-by-zero contract (Spark 4
default): a zero-norm INDEX row fails the build fast (under ANSI every
query that scores it would raise), a zero-norm QUERY fails ``topk``.
NaN-valued embeddings score NaN (NaN divisor is not ANSI zero) and
rank FIRST under descending order, Spark's NaN-greatest semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from pyspark.sql import DataFrame

from ..functions.vector import const_l2_norm


class ServingHit(NamedTuple):
    chunk_id: int
    text: str
    score: float


class RamServingIndex:
    """Bounded driver-RAM cosine top-k index over (id, text, embedding).

    Use ``from_frame`` to build from any DataFrame carrying an id
    column, a text payload column, and an ``array<float>`` embedding
    column. Query with ``topk`` — results are bit-identical to
    ``topk_similar(frame, q, k).collect()`` on the same rows (pinned
    by tests/test_serving_ram.py).
    """

    def __init__(
        self,
        ids: np.ndarray,
        texts: list[str],
        vectors: np.ndarray,
    ) -> None:
        if vectors.ndim != 2 or not (
            len(ids) == len(texts) == vectors.shape[0]
        ):
            raise ValueError("ids/texts/vectors row counts must agree")
        self._ids = ids
        self._texts = texts
        # float32 → float64 is exact, matching the engine's FLOAT→DOUBLE
        # cast before arithmetic
        self._m = np.ascontiguousarray(vectors, dtype=np.float64)
        # |v| per row with the exact l2_norm fold: square each element
        # (one rounding), then add in array order (one rounding per step)
        n2 = np.zeros(self._m.shape[0], dtype=np.float64)
        for j in range(self._m.shape[1]):
            col = self._m[:, j]
            n2 += col * col
        self._norms = np.sqrt(n2)
        if np.any(self._norms == 0.0):
            bad = self._ids[np.nonzero(self._norms == 0.0)[0][:5]]
            raise ArithmeticError(
                "zero-norm embedding rows (ids "
                f"{bad.tolist()}...): under the engine's ANSI contract "
                "every cosine query against them raises DIVIDE_BY_ZERO, "
                "so the build fails fast instead"
            )

    def __len__(self) -> int:
        return self._m.shape[0]

    @property
    def nbytes(self) -> int:
        return int(self._m.nbytes + self._norms.nbytes + self._ids.nbytes)

    @classmethod
    def from_frame(
        cls,
        chunks: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "chunk_id",
        text_col: str = "text",
        max_rows: int = 1_000_000,
    ) -> "RamServingIndex":
        """One bounded Spark job: ``limit(max_rows + 1)`` caps the
        materialization BEFORE it reaches the driver, so an index frame
        past the guard raises instead of OOMing. A deployment with more
        vectors than one replica's guard shards the frame (e.g. by IVF
        cell or hash range) and loads one shard per replica — the guard
        is the per-replica budget, not an engine limit."""
        rows = (
            chunks.select(id_col, text_col, vec_col)
            .limit(max_rows + 1)
            .collect()
        )
        if len(rows) > max_rows:
            raise ValueError(
                f"serving index exceeds max_rows={max_rows}; shard the "
                f"frame (one RamServingIndex per serving replica) or "
                f"raise the guard explicitly"
            )
        if not rows:
            return cls(
                np.empty(0, dtype=np.int64),
                [],
                np.empty((0, 0), dtype=np.float64),
            )
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        texts = [r[1] for r in rows]
        vectors = np.array([r[2] for r in rows], dtype=np.float64)
        return cls(ids, texts, vectors)

    def topk(self, query_vec: list[float], k: int = 4) -> list[ServingHit]:
        """Top-k by cosine(v, q), descending, ties by id ascending —
        the exact ordering ``topk_similar`` compiles to."""
        if len(self) == 0 or k <= 0:
            return []
        q = np.asarray(query_vec, dtype=np.float64)
        if q.shape[0] != self._m.shape[1]:
            raise ValueError(
                f"query dim {q.shape[0]} != index dim {self._m.shape[1]}"
            )
        # dot(v, q) with cosine_to_literal's exact fold: per dimension,
        # round the product, then round the running add
        s = np.zeros(self._m.shape[0], dtype=np.float64)
        for j in range(q.shape[0]):
            s += self._m[:, j] * q[j]
        qn = const_l2_norm([float(x) for x in query_vec])
        if qn == 0.0:
            raise ArithmeticError(
                "zero-norm query vector: cosine is undefined "
                "(engine ANSI contract raises DIVIDE_BY_ZERO)"
            )
        scores = s / (self._norms * qn)
        # Spark sorts NaN as GREATEST (NaN-valued embeddings score NaN;
        # a NaN divisor is not ANSI zero): under score-descending order
        # a NaN row ranks first. Map NaN→+inf for the sort key only.
        key = np.where(np.isnan(scores), np.inf, scores)
        order = np.lexsort((self._ids, -key))[:k]
        return [
            ServingHit(
                int(self._ids[i]), self._texts[i], float(scores[i])
            )
            for i in order
        ]
