"""The one-round-trip literal builders must be value-identical to the
per-element F.lit form they replaced (functions/vector.py::lit_doubles /
lit_double_matrix / lit_longs) — including doubles whose SQL-text round
trip is the risky part: subnormals, huge magnitudes, negative zero,
shortest-repr artifacts like 0.1."""

import math

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.functions.vector import (
    lit_double_matrix,
    lit_doubles,
    lit_ints,
    lit_longs,
)

HARD_DOUBLES = [
    0.0,
    -0.0,
    0.1,
    -1.5,
    math.pi,
    1e-300,
    5e-324,          # smallest subnormal
    -5e-324,
    1.7976931348623157e308,   # DBL_MAX
    -1.7976931348623157e308,
    2.2250738585072014e-308,  # smallest normal
    1 / 3,
    123456789.123456789,
    6.02214076e23,
]


def test_lit_doubles_bit_identical_to_flit(spark):
    flit = F.array(*[F.lit(float(x)) for x in HARD_DOUBLES])
    row = spark.range(1).select(
        lit_doubles(HARD_DOUBLES).alias("a"), flit.alias("b")
    ).collect()[0]
    # compare via repr (exact round-trip) so -0.0 vs 0.0 is caught too
    assert [repr(x) for x in row.a] == [repr(x) for x in row.b]
    assert math.copysign(1.0, row.a[1]) == -1.0  # -0.0 preserved


def test_lit_double_matrix_and_longs(spark):
    mat = [HARD_DOUBLES[:5], HARD_DOUBLES[5:10]]
    longs = [0, -1, 7, 2**62, -(2**62)]
    row = spark.range(1).select(
        lit_double_matrix(mat).alias("m"),
        lit_longs(longs).alias("l"),
        lit_doubles([]).alias("e"),
    ).collect()[0]
    assert [[repr(x) for x in r] for r in row.m] == [
        [repr(float(x)) for x in r] for r in mat
    ]
    assert list(row.l) == longs
    assert list(row.e) == []


def test_lit_doubles_type_is_double(spark):
    df = spark.range(1).select(lit_doubles([1.5, 2.5]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<double>"


def test_lit_doubles_nonfinite(spark):
    """NaN/±Inf have no numeric-literal spelling in Spark SQL — the
    builder must route them through string casts instead of emitting
    repr()'s 'nan'/'inf' (which ParseException at plan build)."""
    vals = [float("nan"), float("inf"), float("-inf"), 1.5]
    flit = F.array(*[F.lit(x) for x in vals])
    row = spark.range(1).select(
        lit_doubles(vals).alias("a"), flit.alias("b")
    ).collect()[0]
    assert [repr(x) for x in row.a] == [repr(x) for x in row.b]


def test_lit_matrix_empty_inputs_keep_double_type(spark):
    df = spark.range(1).select(
        lit_double_matrix([]).alias("m0"),
        lit_double_matrix([[], [1.5]]).alias("m1"),
    )
    assert df.schema["m0"].dataType.simpleString() == "array<array<double>>"
    assert df.schema["m1"].dataType.simpleString() == "array<array<double>>"
    row = df.collect()[0]
    assert list(row.m0) == []
    assert [list(r) for r in row.m1] == [[], [1.5]]


def test_lit_ints_pinned_int_type(spark):
    df = spark.range(1).select(
        lit_ints([0, 7, 255]).alias("a"),
        lit_ints([]).alias("e"),
    )
    assert df.schema["a"].dataType.simpleString() == "array<int>"
    assert df.schema["e"].dataType.simpleString() == "array<int>"
    assert list(df.collect()[0].a) == [0, 7, 255]
