"""One-off 1M-vector RAM-serving-tier experiment (docs/SCALING.md).

Loads the same deterministic 1M×64 corpus as tools/scale_ann_1m.py
(reusing its cache), builds a RamServingIndex shard from it, and
measures: Arrow-path load time, resident bytes, and steady-state
per-query exact top-k latency of the bit-exact kernel. This is the
upper bound for a serving replica at the guard's default budget — a
deployment with more vectors shards by IVF cell / hash range and runs
one replica per shard (operators/serving.py docstring).

Usage: python tools/scale_serving_1m.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.operators.embedding import (  # noqa: E402
    embed_one,
)
from ade_agente_documental_empresarial___miner_a_spark.operators.serving import (  # noqa: E402
    RamServingIndex,
)
from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402

N_QUERIES = 20
K = 10


def main() -> None:
    spark = get_spark("ade-scale-serving1m")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_ann_1m import ensure_corpus

    path = ensure_corpus(spark)
    emb = spark.read.parquet(path)

    t0 = time.time()
    idx = RamServingIndex.from_frame(
        emb, vec_col="embedding", id_col="vec_id", text_col="label"
    )
    load_s = round(time.time() - t0, 2)

    queries = [
        embed_one(f"scale serving probe query number {i}")
        for i in range(N_QUERIES)
    ]
    idx.topk(queries[0], k=K)  # warm-up (page in the matrix)
    lat = []
    for q in queries:
        t0 = time.time()
        hits = idx.topk(q, k=K)
        lat.append(time.time() - t0)
        assert len(hits) == K
    lat.sort()

    print(
        json.dumps(
            {
                "n_vectors": len(idx),
                "resident_mb": round(idx.nbytes / 1e6, 1),
                "load_s": load_s,
                "query_p50_ms": round(lat[len(lat) // 2] * 1000, 1),
                "query_min_ms": round(lat[0] * 1000, 1),
                "query_max_ms": round(lat[-1] * 1000, 1),
                "k": K,
                "n_queries": N_QUERIES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
