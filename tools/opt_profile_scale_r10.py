"""Optimization r10 — decompose the expensive scale10x legs into phases
so the optimization targets the phase that actually costs (guide §1).
Times use the noop sink; each phase best-of-N with job descriptions.

Usage: python tools/opt_profile_scale_r10.py [leg ...]
Legs: lsh, clusters, ivf, pagerank
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed(spark, name, df, reps=2, action="noop"):
    spark.sparkContext.setJobDescription(f"opt-prof {name}")
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"# {name}: {best:.3f}s", file=sys.stderr)
    return round(best, 3)


def main() -> None:
    legs = sys.argv[1:] or ["lsh", "clusters", "ivf", "pagerank"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ade-opt-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import bench

    scale_dir = bench.ensure_scale_corpus(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
    docs.count()  # warm scan

    out: dict[str, float] = {}

    if "lsh" in legs:
        from ade_agente_documental_empresarial___miner_a_spark.operators.dedup import (
            lsh_candidate_pairs,
            lsh_verified_pairs,
            minhash_signatures,
            spread,
            word_shingles,
        )
        from pyspark.sql import functions as F

        # phase 0: the exploded shingle table alone (explode cost, no md5)
        sh = spread(docs, "doc_id").select(
            F.col("doc_id"),
            F.explode(word_shingles(F.col("text"), 2)).alias("shingle"),
        )
        out["lsh.shingles_explode"] = timed(spark, "lsh.shingles_explode", sh)
        # phase 1: 32-perm signatures (explode + 32 md5-mins per shingle)
        sigs = minhash_signatures(docs, num_perm=32)
        out["lsh.signatures32"] = timed(spark, "lsh.signatures32", sigs)
        # phase 2: candidate pairs (signatures + band self-join)
        cands = lsh_candidate_pairs(docs, num_perm=32, bands=8)
        out["lsh.candidates"] = timed(spark, "lsh.candidates", cands)
        # phase 3: the full verified path
        full = lsh_verified_pairs(docs, num_perm=32, bands=8, threshold=0.3)
        out["lsh.full_verified"] = timed(spark, "lsh.full_verified", full)
        # how many candidates / verified pairs?
        n_c = cands.count()
        n_v = full.count()
        print(f"# lsh: {n_c} candidates -> {n_v} verified", file=sys.stderr)

    if "clusters" in legs:
        from ade_agente_documental_empresarial___miner_a_spark.operators.dedup import (
            connected_components,
            lsh_verified_pairs,
        )

        pairs = lsh_verified_pairs(docs, num_perm=32, bands=8, threshold=0.3)
        t0 = time.time()
        cc = connected_components(pairs)
        n = cc.count()
        out["clusters.full"] = round(time.time() - t0, 3)
        print(f"# clusters.full: {out['clusters.full']}s ({n} rows)", file=sys.stderr)

    if "ivf" in legs:
        from ade_agente_documental_empresarial___miner_a_spark.operators.ann import (
            _assigner,
            _centroid_rows,
            ivf_topk,
            lloyd_refine_codebook,
        )

        emb = spark.read.parquet(os.path.join(scale_dir, "embeddings.parquet"))
        emb.count()
        for impl in ("arrow", "hof"):
            t0 = time.time()
            cents = _centroid_rows(emb, 64, "embedding", "vec_id")
            out[f"ivf.{impl}.seed_collect"] = round(time.time() - t0, 3)
            t0 = time.time()
            cents_r = lloyd_refine_codebook(
                emb, 64, "embedding", "vec_id", iters=1, impl=impl
            )
            out[f"ivf.{impl}.lloyd1"] = round(time.time() - t0, 3)
            print(f"# ivf.{impl}.lloyd1: {out[f'ivf.{impl}.lloyd1']}s", file=sys.stderr)
            assigned = _assigner(impl)(
                emb, 64, "embedding", "vec_id", cents=cents_r
            )
            out[f"ivf.{impl}.assign"] = timed(spark, f"ivf.{impl}.assign", assigned)
            t0 = time.time()
            ivf_topk(emb, query_id=7, k=10, nprobe=8, n_centroids=64, impl=impl).count()
            out[f"ivf.{impl}.full"] = round(time.time() - t0, 3)
            print(f"# ivf.{impl}.full: {out[f'ivf.{impl}.full']}s", file=sys.stderr)

    if "pagerank" in legs:
        from ade_agente_documental_empresarial___miner_a_spark.operators.graph import (
            pagerank,
            synthetic_edge_graph,
        )

        edges = synthetic_edge_graph(spark, n_edges=1_000_000, n_nodes=100_000)
        t0 = time.time()
        n = pagerank(edges, iters=5, checkpoint_every=2).count()
        out["pagerank.full"] = round(time.time() - t0, 3)
        print(f"# pagerank.full: {out['pagerank.full']}s ({n})", file=sys.stderr)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
