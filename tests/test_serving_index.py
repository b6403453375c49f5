"""persist_serving_index — data-sized partitioning for the RAM-resident
serving copy of an index (plans/pipeline.py).

The contract is the FORMULA, not the small-SF outcome: partitions =
ceil(rows / rows_per_partition), never widened by coalesce, values and
schema untouched, frame persisted + materialized on return.
"""

import pytest
from pyspark import StorageLevel

from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
    persist_serving_index,
)


@pytest.fixture()
def small_index(spark):
    df = spark.range(0, 5000).selectExpr(
        "id AS chunk_id", "CAST(id % 7 AS DOUBLE) AS score"
    ).repartition(32)
    yield df


def test_small_index_collapses_to_one_partition(spark, small_index):
    served = persist_serving_index(small_index)
    try:
        assert served.rdd.getNumPartitions() == 1
        assert served.count() == 5000
        assert served.storageLevel != StorageLevel.NONE
    finally:
        served.unpersist()


def test_partition_formula_is_ceil(spark):
    df = spark.range(0, 1001).repartition(16)
    served = persist_serving_index(df, rows_per_partition=500)
    try:
        # ceil(1001/500) = 3
        assert served.rdd.getNumPartitions() == 3
    finally:
        served.unpersist()


def test_never_widens_a_narrow_input(spark):
    df = spark.range(0, 100).coalesce(1)
    served = persist_serving_index(df, rows_per_partition=10)
    try:
        # formula asks for 10, but coalesce cannot widen 1 -> stays 1
        assert served.rdd.getNumPartitions() == 1
        assert served.count() == 100
    finally:
        served.unpersist()


def test_values_and_schema_unchanged(spark, small_index):
    served = persist_serving_index(small_index)
    try:
        assert served.schema == small_index.schema
        a = sorted(r.chunk_id for r in served.collect())
        assert a == list(range(5000))
    finally:
        served.unpersist()


def test_empty_index_is_one_partition(spark):
    df = spark.range(0, 0).repartition(8)
    served = persist_serving_index(df)
    try:
        assert served.rdd.getNumPartitions() == 1
        assert served.count() == 0
    finally:
        served.unpersist()
