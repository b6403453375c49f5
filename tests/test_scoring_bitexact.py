"""Bit-exactness of the r05 scoring re-groupings.

`cosine_to_literal` (constant |q|) and `_cell_scores` (staged per-row
|v| + constant |c|) claim to be IEEE-identical re-groupings of
`cosine_similarity` — the property every DuckDB oracle depends on. These
tests evaluate BOTH expression forms over the same seeded random vectors
in one job and assert exact (==, not approx) equality per cell, including
float32-quantized inputs, zero vectors, negatives, and large magnitudes.
"""

import random

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from ade_agente_documental_empresarial___miner_a_spark.functions.vector import (
    const_l2_norm,
    cosine_similarity,
    cosine_to_literal,
    l2_norm,
)

DIM = 16


def _vectors(n, seed, scale=1.0):
    rng = random.Random(seed)
    vecs = [
        [rng.uniform(-scale, scale) for _ in range(DIM)] for _ in range(n)
    ]
    # adversarial rows: all-zero is EXCLUDED (cosine is 0/0 = NaN on
    # both forms — NaN != NaN would fail the == assertion vacuously),
    # but near-zero, constant, single-spike, and huge-magnitude are in
    vecs += [
        [1e-30] * DIM,
        [1.0] * DIM,
        [0.0] * (DIM - 1) + [1.0],
        [1e18, -1e18] * (DIM // 2),
    ]
    return vecs


def _as_float_df(spark, vecs):
    """array<float> like the embeddings fixture — float32 quantization
    happens at ingest, then both scorings see identical floats."""
    schema = StructType([StructField("v", ArrayType(FloatType()))])
    return spark.createDataFrame([(v,) for v in vecs], schema)


def test_cosine_to_literal_bit_equals_cosine_similarity(spark):
    vecs = _vectors(300, seed=7)
    q = _vectors(1, seed=99)[0]
    df = _as_float_df(spark, vecs)
    qcol = F.array(*[F.lit(float(x)) for x in q])
    rows = df.select(
        cosine_similarity(F.col("v"), qcol).alias("a"),
        cosine_to_literal(F.col("v"), q).alias("b"),
    ).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        assert r.a == r.b, (r.a, r.b, r.a - r.b)


def test_const_l2_norm_bit_equals_engine_l2_norm(spark):
    vecs = _vectors(50, seed=13, scale=1e6)
    df = _as_float_df(spark, vecs)
    rows = df.select(
        F.posexplode(F.array(F.col("v"))).alias("i", "vv")
    ).select(l2_norm(F.col("vv")).alias("n")).collect()
    # driver-side constant must match the engine fold per vector: the
    # engine sees float32-quantized values, so quantize the same way
    import struct

    for r, v in zip(rows, vecs):
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        assert const_l2_norm(v32) == r.n


def test_cell_scores_staged_norm_bit_equals_direct_cosine(spark):
    from ade_agente_documental_empresarial___miner_a_spark.operators.ann import (
        _cell_scores,
    )

    vecs = _vectors(200, seed=21)
    cents = [(i, _vectors(1, seed=100 + i)[0]) for i in range(16)]
    df = _as_float_df(spark, vecs).withColumn("_vn", l2_norm(F.col("v")))
    scored = df.select(
        _cell_scores(F.col("v"), cents, vnorm=F.col("_vn")).alias("s"),
        F.array(
            *[
                cosine_similarity(
                    F.col("v"), F.array(*[F.lit(float(x)) for x in cvec])
                )
                for _, cvec in cents
            ]
        ).alias("ref"),
    ).collect()
    for r in scored:
        got = [e["score"] for e in r.s]
        assert got == list(r.ref), [
            (a, b) for a, b in zip(got, r.ref) if a != b
        ]
