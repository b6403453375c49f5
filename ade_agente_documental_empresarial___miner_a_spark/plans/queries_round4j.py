"""Round-4 catalog additions, tenth batch — lakehouse semantics:
parquet schema evolution (mergeSchema across snapshot generations +
unionByName(allowMissingColumns)) and the FULL OUTER join family
(both-sides-unmatched coalesce, completing queries_ext's
inner/left/semi/anti single-pass family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Schema evolution — the data-lake staple: generation v1 writes a
# narrow schema, a later generation v2 adds a column; a mergeSchema
# read unions the footers and back-fills the missing column with NULL.
# The per-generation null accounting below is exactly the audit a
# migration runs ("which rows predate the field?"). At 100 TB
# mergeSchema=true costs a footer read per file — keep generation
# counts bounded (compaction) and pin the merged schema in the table
# catalog once it stabilizes; unionByName(allowMissingColumns=True) is
# the same semantics for in-flight frames.
def _evolution_dirs(spark: SparkSession, sf: str) -> tuple[str, str]:
    import hashlib
    import tempfile

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"ade_evo_{tag}")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    if not (
        os.path.exists(os.path.join(v1, "_SUCCESS"))
        and os.path.exists(os.path.join(v2, "_SUCCESS"))
    ):
        orders = table(spark, sf, "orders")
        orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).write.mode("overwrite").parquet(v1)
        orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        ).write.mode("overwrite").parquet(v2)
    return v1, v2


@register(
    "s13_schema_evolution",
    """SELECT o_orderstatus AS status,
       count(*) AS n,
       CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
         AS n_with_priority,
       CAST(count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS BIGINT)
         AS n_legacy
FROM orders
GROUP BY o_orderstatus""",
)
def s13_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    v1, v2 = _evolution_dirs(spark, sf)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").cast("long").alias(
            "n_with_priority"
        ),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_legacy"),
    )


# ---------------------------------------------------------------------------
# FULL OUTER join — both-sides-unmatched semantics with coalesce over
# the join key (the reconciliation-report shape: entities present in
# either system). queries_ext's join family reads inner/left/semi/anti
# off one pass; FULL OUTER is the remaining flavor, and its
# null-extension on BOTH sides is what coalesce(key_l, key_r) exists
# for. Derived sides: per-nation counts of high-balance customers vs
# high-balance suppliers — cardinalities differ per nation, so both
# unmatched directions actually occur on the fixture.
@register(
    "rel_full_outer_family",
    """WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
s AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
       (c.nk IS NOT NULL AND s.nk IS NOT NULL) AS in_both
FROM c FULL OUTER JOIN s ON c.nk = s.nk""",
)
def rel_full_outer_family(spark: SparkSession, sf: str) -> DataFrame:
    cust = (
        table(spark, sf, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(supp, cust["c_nk"] == supp["s_nk"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_nk"), F.col("s_nk"))
        .cast("int")
        .alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).cast("long").alias(
            "n_cust"
        ),
        F.coalesce(F.col("n_supp"), F.lit(0)).cast("long").alias(
            "n_supp"
        ),
        (F.col("c_nk").isNotNull() & F.col("s_nk").isNotNull()).alias(
            "in_both"
        ),
    )
