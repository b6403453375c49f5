"""Arrow-vectorized IVF assignment (`ivf_assign_arrow`) — the opt-in
production-scale twin of the bit-exact HOF kernel.

The contract is AGREEMENT, not shared code paths: the numpy matmul may
differ from the HOF's sequential fold in the last ulp of each dot, so an
assignment flip would need two centroid scores within ~1 ulp of each
other. These tests pin exact agreement on the fixtures (measured 0
disagreements at 100k vectors too — docs/ROUND5.md §6c) and that the
refined codebook, which only depends on assignments + exact integer
means, is bit-identical under either kernel.
"""

import os

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.ann import (
    _centroid_rows,
    ivf_assign,
    ivf_assign_arrow,
    ivf_topk,
    lloyd_refine_codebook,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_arrow_assignment_matches_hof_exactly(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = _centroid_rows(emb, 16, "embedding", "vec_id")
    hof = ivf_assign(emb, 16, cents=cents).select("vec_id", "cell")
    arrow = ivf_assign_arrow(emb, 16, cents=cents).select(
        "vec_id", F.col("cell").alias("cell2")
    )
    joined = hof.join(arrow, "vec_id")
    assert joined.count() == emb.count()
    assert joined.where("cell <> cell2").count() == 0


def test_arrow_refined_codebook_bit_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    hof = lloyd_refine_codebook(emb, 16, iters=1, impl="hof")
    arrow = lloyd_refine_codebook(emb, 16, iters=1, impl="arrow")
    assert hof == arrow


def test_arrow_ivf_topk_identical_results(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    hof = ivf_topk(emb, query_id=7, k=5, nprobe=4, n_centroids=16).collect()
    arrow = ivf_topk(
        emb, query_id=7, k=5, nprobe=4, n_centroids=16, impl="arrow"
    ).collect()
    assert hof == arrow


def test_arrow_assign_does_not_mutate_input_schema(spark, sf_dir):
    # StructType.add mutates in place and df.schema is cached on the
    # DataFrame — a naive schema extension corrupts the input's column
    # list for every later use of the same df (regression)
    emb = _emb(spark, sf_dir)
    cols_before = list(emb.columns)
    ivf_assign_arrow(emb, 16)
    assert list(emb.columns) == cols_before
    assert "cell" not in emb.columns


def test_arrow_assign_rejects_unknown_impl(spark, sf_dir):
    import pytest

    emb = _emb(spark, sf_dir)
    with pytest.raises(ValueError, match="unknown IVF assignment impl"):
        ivf_topk(emb, query_id=7, impl="simd")


def test_exact_score_ties_resolve_to_larger_cid_on_both_kernels(spark):
    # two centroids with IDENTICAL vectors force bit-exact equal scores:
    # the HOF struct-max order (score, then cid) picks the larger cid,
    # and the arrow kernel's cid-descending scan + argmax-first-max must
    # match it exactly
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 1.0])]
    emb = spark.createDataFrame(
        [(10, [0.0, 1.0]), (11, [1.0, 0.0]), (12, [0.6, 0.8])],
        "vec_id long, embedding array<float>",
    )
    hof = {
        r.vec_id: r.cell
        for r in ivf_assign(emb, cents=cents).collect()
    }
    arrow = {
        r.vec_id: r.cell
        for r in ivf_assign_arrow(emb, cents=cents).collect()
    }
    assert hof == arrow == {10: 2, 11: 0, 12: 2}
