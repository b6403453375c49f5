"""Salted join / two-phase agg equivalence tests."""

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.skew import (
    _row_salt,
    salted_join,
    two_phase_agg,
)


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(k % 3, i) for i, k in enumerate(range(100))], "k int, v int"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt_buckets=4).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k int, v int")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    out = salted_join(big, small, "k", salt_buckets=3, how="left").collect()
    by_k = {r.k: r.name for r in out}
    assert by_k == {1: "x", 2: "y", 9: None}
    assert len(out) == 3


def test_two_phase_agg_matches_groupby(spark):
    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(1000)], "k int, x double"
    )
    expected = {
        r.k: r.total
        for r in df.groupBy("k").agg(F.sum("x").alias("total")).collect()
    }
    got = {r.k: r.total for r in two_phase_agg(df, "k", "x").collect()}
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6


def test_hot_key_identical_values_still_fan_out(spark):
    # The classic skew case: one hot key, every row carrying the SAME value.
    # A value-derived salt would map all rows to one bucket; the row-unique
    # salt must spread them across at least half the buckets.
    buckets = 16
    hot = spark.createDataFrame(
        [("hot", 1.0)] * 2000, "k string, x double"
    ).repartition(8)
    n_buckets = (
        hot.withColumn("_salt", _row_salt(buckets))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets >= buckets // 2

    got = {r.k: r.total for r in two_phase_agg(hot, "k", "x").collect()}
    assert got == {"hot": 2000.0}


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE runtime re-plan evidence: with shuffle.partitions=32 but tiny
    post-shuffle data, the final plan must read a COALESCED shuffle —
    the runtime fix for over-partitioned small stages (and the reason
    shuffle.partitions can be sized for the large stages at 100 TB
    without penalizing the small ones)."""
    from tests.conftest import SF001_DIR

    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        events_table,
    )

    df = events_table(spark, SF001_DIR).groupBy("event_type").count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
