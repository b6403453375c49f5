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


# ---------------------------------------------------------------------------
# Expectations summary — the data-quality report over
# operators/curation.expectations: per-rule violation counts plus the
# corpus pass count, long-form. The rule evaluation is one map-only
# projection (rules ride the scan); this rollup explodes the per-row
# failed-rule lists and adds the passed row — the DLT-style quality
# dashboard a 100 TB ingest runs per batch.
@register(
    "cur_expectations",
    """WITH checks AS (
  SELECT CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END AS v_doc_id,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END
           AS v_text,
         CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END AS v_chars,
         CASE WHEN lang NOT IN ('en','es','fr','de') THEN 1 ELSE 0 END
           AS v_lang
  FROM documents)
SELECT 'doc_id_present' AS rule, CAST(sum(v_doc_id) AS BIGINT) AS n
FROM checks
UNION ALL
SELECT 'text_nonempty', CAST(sum(v_text) AS BIGINT) FROM checks
UNION ALL
SELECT 'n_chars_consistent', CAST(sum(v_chars) AS BIGINT) FROM checks
UNION ALL
SELECT 'lang_supported', CAST(sum(v_lang) AS BIGINT) FROM checks
UNION ALL
SELECT 'passed_all',
       CAST(sum(CASE WHEN v_doc_id + v_text + v_chars + v_lang = 0
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM checks""",
)
def cur_expectations(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.curation import expectations

    checked = expectations(table(spark, sf, "documents"))
    viols = (
        checked.select(
            F.explode("failed_rules").alias("rule")
        )
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # rules with zero violations still get a row (the report contract)
    all_rules = spark.createDataFrame(
        [
            ("doc_id_present",),
            ("text_nonempty",),
            ("n_chars_consistent",),
            ("lang_supported",),
        ],
        "rule string",
    )
    full = all_rules.join(viols, "rule", "left").select(
        "rule", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )
    passed = checked.agg(
        F.sum(F.col("passed").cast("long")).cast("long").alias("n")
    ).select(F.lit("passed_all").alias("rule"), "n")
    return full.unionByName(passed)
