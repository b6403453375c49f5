"""global_row_number must be bit-identical to the partition-less
row_number window it replaces — including ties on the leading order
column (broken by the unique key), descending orders, and frames
smaller than the partition count — while its physical plan contains no
partition-less window."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.ranking import (
    global_ntile,
    global_row_number,
)


def _reference(df, order_cols):
    w = Window.orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w).cast("long"))


def _assert_same(spark, rows, order_cols, num_partitions=None):
    df = spark.createDataFrame(rows, "k double, id long").repartition(8)
    got = {
        r.id: r.rn
        for r in global_row_number(
            df, order_cols, num_partitions=num_partitions
        ).collect()
    }
    want = {r.id: r.rn for r in _reference(df, order_cols).collect()}
    assert got == want


def test_matches_reference_with_ties(spark):
    rng = random.Random(7)
    rows = [(float(rng.randint(0, 20)), i) for i in range(500)]
    _assert_same(spark, rows, ["k", "id"])


def test_descending_and_column_exprs(spark):
    rng = random.Random(11)
    rows = [(rng.uniform(-5, 5), i) for i in range(300)]
    _assert_same(spark, rows, [F.desc("k"), F.col("id")])


def test_tiny_frame_and_explicit_partitions(spark):
    rows = [(3.0, 1), (1.0, 2), (2.0, 3)]
    _assert_same(spark, rows, ["k", "id"], num_partitions=16)


def test_global_ntile_matches_spark_ntile(spark):
    rng = random.Random(3)
    for n_rows, k in [(500, 10), (37, 4), (3, 10), (10, 10), (101, 7)]:
        rows = [(float(rng.randint(0, 9)), i) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "k double, id long").repartition(8)
        got = {
            r.id: r.bucket
            for r in global_ntile(df, k, ["k", "id"]).collect()
        }
        w = Window.orderBy("k", "id")
        want = {
            r.id: r.bucket
            for r in df.withColumn("bucket", F.ntile(k).over(w)).collect()
        }
        assert got == want, f"n_rows={n_rows} k={k}"


def test_no_partitionless_window_in_plan(spark):
    df = spark.range(1000).select(
        (F.col("id") % 13).cast("double").alias("k"), F.col("id")
    )
    plan = global_row_number(df, ["k", "id"])._jdf.queryExecution().toString()
    # every windowspecdefinition in the plan must carry a partition key
    for frag in plan.split("windowspecdefinition(")[1:]:
        assert frag.startswith("_gpid"), f"partition-less window: {frag[:80]}"
