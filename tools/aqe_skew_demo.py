"""AQE skew-join evidence (VERDICT r9 task 3, docs/SHUFFLES.md).

Builds a Zipf-headed fact table from the sf0.1 lineitem (the hot key
owns ~60% of rows — the `zipf` fuzz profile's shape at bench scale),
writes it as a multi-file parquet (mapper granularity is what AQE
splits a skewed reduce partition BY — a single-split input leaves the
rule nothing to cut), sort-merge-joins it against a dim too big to
broadcast, and prints the ADAPTIVE final plan twice: AQE skew-join OFF
vs ON. With it on, the plan's SortMergeJoin carries the ``(skew=true)``
marker and the shuffle read shows ``skewed`` — Spark split the
oversized partition into parallel per-mapper sub-reads. The same
mechanism is what carries every shuffle-keyed entry in this engine
(groupBys, window partitions, LSH band buckets) through a Zipfian
100 TB corpus without manual salting; the salted variants
(skew_salted_agg / skew_salted_join_rev) remain the belt-and-braces
path for keys so hot even a split partition is one task's worth.

Found while building: TWO silent no-op conditions worth knowing at
100 TB — (1) the join keys must already be the same type (a
``cast(k AS bigint)`` on one side does not block the rule, but a
single-mapper child gives it nothing to split); (2) thresholds are on
COMPRESSED shuffle bytes, so local demos need them scaled down.

Usage: python tools/aqe_skew_demo.py [sf_dir]
Prints a summary + the marker-bearing plan lines; exits 1 if the ON
run shows no skew handling (regression guard for docs/SHUFFLES.md).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _session(skew_on: bool) -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName(f"aqe-skew-{skew_on}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # thresholds scaled down so the ~2M-row local fact exhibits
        # what a 100 TB partition would: any post-shuffle partition
        # over 128 KiB compressed and 1.2x the median is "skewed"
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "131072",
        )
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        # dim must NOT broadcast, or there is no shuffled join to skew
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run(sf_dir: str, skew_on: bool, workdir: str) -> str:
    spark = _session(skew_on)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        # Zipf head: ~60% of fact rows collapse onto one BIGINT join
        # key; repartition(16) gives the skew rule mapper granularity
        fact = (
            li.select(
                F.when(F.rand(7) < 0.6, F.lit(0))
                .otherwise(
                    F.abs(F.hash("l_orderkey", "l_linenumber")) % 1000
                )
                .cast("bigint")
                .alias("k"),
                F.col("l_extendedprice").alias("v"),
            )
            .repartition(16)
        )
        fact_path = os.path.join(workdir, "fact")
        fact.write.mode("overwrite").parquet(fact_path)
        dim = spark.range(0, 1000, 1, 8).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim_payload_" * 40), F.col("id")).alias("pad"),
        )
        dim_path = os.path.join(workdir, "dim")
        dim.write.mode("overwrite").parquet(dim_path)

        joined = spark.read.parquet(fact_path).join(
            spark.read.parquet(dim_path), "k"
        )
        joined.collect()  # executes; AQE finalizes the plan
        return joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.stop()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    with tempfile.TemporaryDirectory(prefix="aqe_skew_") as workdir:
        plan_off = run(sf_dir, False, workdir)
        plan_on = run(sf_dir, True, workdir)
    off_has = "skew=true" in plan_off
    on_has = "skew=true" in plan_on
    print(f"skewJoin OFF: skew markers present = {off_has}")
    print(f"skewJoin ON : skew markers present = {on_has}")
    for line in plan_on.splitlines():
        ls = line.strip()
        if "skew=true" in ls or "skewed" in ls:
            print("plan:", ls[:160])
            if "== Initial Plan ==" in ls:
                break
    if not on_has or off_has:
        print("FAIL: expected skew split only in the ON run")
        return 1
    print("OK: AQE split the Zipf-headed partition (see docs/SHUFFLES.md)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
