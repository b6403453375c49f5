"""Arrow-vectorized IVF assignment (`ivf_assign_arrow`) — since round 8
the DEFAULT bulk-build lane; `impl="hof"` is the bit-exact opt-out.

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
    hof = ivf_topk(
        emb, query_id=7, k=5, nprobe=4, n_centroids=16, impl="hof"
    ).collect()
    arrow = ivf_topk(
        emb, query_id=7, k=5, nprobe=4, n_centroids=16, impl="arrow"
    ).collect()
    assert hof == arrow


def test_default_impl_is_arrow_and_matches_hof(spark, sf_dir):
    # the production default (no impl kwarg) must be the arrow lane and
    # must return exactly what the HOF opt-out returns on the fixtures
    emb = _emb(spark, sf_dir)
    default = ivf_topk(emb, query_id=7, k=5, nprobe=4, n_centroids=16)
    hof = ivf_topk(
        emb, query_id=7, k=5, nprobe=4, n_centroids=16, impl="hof"
    )
    # the default plan routes assignment through the Arrow kernel
    # (MapInPandas node present), the opt-out does not
    assert "MapInPandas" in default._jdf.queryExecution().toString()
    assert "MapInPandas" not in hof._jdf.queryExecution().toString()
    assert default.collect() == hof.collect()


def test_degenerate_norms_match_hof_null_semantics(spark):
    # zero VECTOR → every score NULL on the HOF path → struct-max falls
    # through to the largest cid; zero CENTROID → that one score NULL →
    # it must lose to any real score. The arrow kernel reproduces both
    # via the NaN→-inf mask (without it, numpy argmax treats NaN as
    # maximal and a zero centroid would capture every vector).
    cents = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(
        [
            (10, [0.0, 0.0, 0.0]),   # zero vector: all-NULL → max cid
            (11, [1.0, 0.0, 0.0]),   # real winner despite NULL vs cent 0
            (12, [0.5, 0.5, 0.0]),   # exact tie c1/c2 → larger cid
            (13, [-1.0, 0.0, 0.0]),  # negative best: score 0 beats -1
        ],
        "vec_id long, embedding array<double>",
    )
    hof = {r.vec_id: r.cell for r in ivf_assign(emb, cents=cents).collect()}
    arrow = {
        r.vec_id: r.cell
        for r in ivf_assign_arrow(emb, cents=cents).collect()
    }
    assert hof == arrow == {10: 2, 11: 1, 12: 2, 13: 2}


def test_malformed_and_nonfinite_inputs_match_hof(spark):
    # the full degenerate matrix the arrow DEFAULT must survive exactly
    # like the HOF opt-out (code-review r8 findings): NULL embeddings
    # and ragged lengths (HOF zip_with pads with nulls → all-NULL score
    # → largest cid; a naive np.stack would kill the job), NaN operands
    # with nonzero norms (HOF score is genuinely NaN and Spark sorts
    # NaN GREATEST — distinct from try_divide-NULL, which LOSES), and a
    # NaN centroid capturing rows via that NaN-greatest rule.
    nan = float("nan")
    cents = [
        (0, [1.0, 0.0, 0.0]),
        (1, [nan, 1.0, 0.0]),   # NaN centroid: NaN score sorts GREATEST
        (2, [0.0, 1.0, 0.0]),
    ]
    rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),
        (12, None),                   # NULL embedding
        (13, [1.0, 0.0]),             # ragged short
        (14, [nan, 0.5, 0.0]),        # NaN vector
        (15, [0.0, 0.0, 0.0]),        # zero-norm vs a NaN centroid
        (16, [1.0, 0.0, 0.0, 5.0]),   # ragged long
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    hof = {r.vec_id: r.cell for r in ivf_assign(emb, cents=cents).collect()}
    arrow = {
        r.vec_id: r.cell
        for r in ivf_assign_arrow(emb, cents=cents).collect()
    }
    assert hof == arrow
    # the malformed rows fall through to the largest cid, like all-NULL
    assert hof[12] == 2 and hof[13] == 2 and hof[16] == 2


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


def test_lloyd_fused_partials_update_matches_hof_on_edges(spark):
    # r10 optimization pin: the arrow lane's fused mapInArrow centroid
    # update (assignment + map-side integer partial sums,
    # _lloyd_partials_arrow) must refine BIT-IDENTICAL codebooks to the
    # all-Spark posexplode+agg path across the full edge surface: NULL
    # vectors (contribute nothing), NULL elements (counted, code NULL),
    # ragged short/long rows (quantized over their actual length),
    # NaN/inf rows (floor(NaN)=0, floor(+-inf)=Long.MAX/MIN), zero
    # vectors and sub-1e-30 values (the abs_max guard). Iteration 2
    # starts from an adversarially RAGGED refined codebook, which must
    # route through the HOF fallback on the arrow lane too.
    from ade_agente_documental_empresarial___miner_a_spark.operators.ann import (
        lloyd_refine_codebook,
    )

    rows = [
        (0, [0.1] * 8),
        (1, [0.2] * 8),
        (2, [-0.9] * 8),
        (3, [0.5, -0.5, 0.25, -0.25, 0.125, 1.0, -1.0, 0.0]),
        (12, None),
        (13, [0.3] * 7),
        (14, [0.1] * 8 + [0.5]),
        (15, [None] + [0.4] * 7),
        (16, [float("nan")] + [1.0] * 7),
        (17, [float("inf")] + [1.0] * 7),
        (18, [0.0] * 8),
        (19, [1e-32] * 8),
        (20, [-0.7] * 8),
        (21, [float("-inf")] * 8),
        (22, [None] * 8),
    ]
    edge = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    a = lloyd_refine_codebook(edge, 4, iters=2, impl="arrow")
    h = lloyd_refine_codebook(edge, 4, iters=2, impl="hof")
    assert a == h
