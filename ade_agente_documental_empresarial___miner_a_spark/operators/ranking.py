"""Distributed exact global ranking — the scale-safe replacement for
``row_number() OVER (ORDER BY ...)`` with no partition key.

A partition-less window physically coalesces the ENTIRE frame into one
partition (Spark logs ``WindowExec: No Partition Defined``) — fine for
the post-top-k / post-aggregation frames most rank sites operate on,
fatal for a rank over raw per-document rows at 100 TB. This operator
computes the IDENTICAL row numbers with no single-partition stage:

1. ``repartitionByRange`` on the order columns — rows land in range
   partitions that respect the global order (boundaries come from
   sampling, which affects partition SIZES only, never the result);
2. ``row_number`` within each range partition (ordinary partitioned
   window, parallel);
3. per-partition row counts (tiny frame, one row per partition) are
   turned into cumulative offsets with a triangular self-join — P² pairs
   over at most a few thousand partition rows, no global window — and
   broadcast-joined back.

Exactness requires the order columns to form a TOTAL order (include a
unique tie-break column, as every call site in this repo already does);
with ties across a range boundary the within-tie order would otherwise
be partition-placement dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list,
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rn_col`` = 1-based global row number under the total order
    ``order_cols`` (strings or Columns; pass F.desc(...) for descending).
    Bit-identical to ``F.row_number().over(Window.orderBy(*order_cols))``
    cast to long, without coalescing the frame to one partition."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    staged = ranged.withColumn("_gpid", F.spark_partition_id())
    w_local = Window.partitionBy("_gpid").orderBy(*cols)
    local = staged.withColumn("_lrn", F.row_number().over(w_local))
    counts = local.groupBy("_gpid").agg(F.count(F.lit(1)).alias("_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col("b._gpid") < F.col("a._gpid"), "left")
        .groupBy(F.col("a._gpid").alias("_gpid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_gpid")
        .withColumn(rn_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_gpid", "_lrn", "_off")
    )


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed exact ``ntile(n) OVER (ORDER BY …)``: Spark's ntile
    assigns the first ``n_rows % n`` buckets one extra row, which is a
    pure function of (global row number, total count) — both available
    without a single-partition window (global_row_number + a broadcast
    scalar). Bit-identical to F.ntile under a TOTAL order (include a
    unique tie-break, as ntile's own determinism already requires)."""
    ranked = global_row_number(
        df, order_cols, rn_col="_gnt_rn", num_partitions=num_partitions
    )
    total = df.agg(F.count(F.lit(1)).alias("_gnt_n"))
    rn, n = F.col("_gnt_rn"), F.col("_gnt_n")
    k = F.lit(int(n_buckets))
    q = (n / k).cast("long")  # base bucket size
    r = n % k                 # first r buckets take one extra row
    cut = r * (q + 1)         # rows covered by the size-(q+1) buckets
    bucket = F.when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - cut - 1) / q) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("_gnt_rn", "_gnt_n")
    )
