"""Round-4 catalog additions, thirty-second batch — integrity auditing
and script detection:

* referential-integrity audit (orphan counts for every FK relation in
  the star schema — the constraint check engines without enforced FKs
  must run as a job, and the first thing a 100 TB migration validates);
* unicode script mix (per-row share of Latin/Cyrillic/Han characters —
  the script-level sibling of language-ID, over literal multibyte rows
  since the fixtures are ASCII; the portability lesson is the PROPERTY
  NAME: Java regex spells it ``\\p{IsCyrillic}``, RE2 spells it
  ``\\p{Cyrillic}`` — same semantics, different surface, so each engine
  states its own spelling and parity certifies the meaning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Referential-integrity audit — for each FK edge of the star schema,
# total child rows and orphan rows (left-anti against the parent). A
# healthy lake reports zeros; a broken backfill shows up as a nonzero
# orphan count naming the edge. Each check is one anti-join that
# broadcasts the parent's key column when small — at 100 TB the big
# edges (lineitem→orders) shuffle on the key, which is exactly the
# join the schema already pays for.
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(
            f"""SELECT '{child}.{ck}' AS fk_edge,
       (SELECT count(*) FROM {child}) AS n_child_rows,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{ck})) AS n_orphans"""
        )
    return "\nUNION ALL\n".join(parts)


@register("rel_referential_audit", _fk_oracle())
def rel_referential_audit(spark: SparkSession, sf: str) -> DataFrame:
    # one lazy 1-row aggregate per edge, unioned — no driver-side
    # counts; each LEFT join marks parent hits and the agg counts nulls
    out = None
    for child, ck, parent, pk in _FK_EDGES:
        c = table(spark, sf, child).select(F.col(ck).alias("_ck"))
        p = (
            table(spark, sf, parent)
            .select(F.col(pk).alias("_pk"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        j = c.join(F.broadcast(p), c["_ck"] == p["_pk"], "left")
        row = j.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        ).select(
            F.lit(f"{child}.{ck}").alias("fk_edge"),
            "n_child_rows",
            "n_orphans",
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Unicode script mix — character counts per script over literal
# multibyte rows (fixtures are ASCII; func_unicode_battery's VALUES
# idiom). The SAME Unicode property is spelled differently per engine —
# Java ``\p{IsLatin}`` / RE2 ``\p{Latin}`` — so unlike
# func_regexp_battery (whose rule is "identical pattern text"), this
# entry's rule is "engine-local spelling, parity-certified meaning".
_SCRIPT_ROWS = [
    (1, "hello world"),
    (2, "привет мир"),
    (3, "日本語 text"),
    (4, "mixed: abcабв日本 12"),
    (5, ""),
]


def _script_values_sql() -> str:
    rows = ", ".join(f"({i}, '{s}')" for i, s in _SCRIPT_ROWS)
    return f"(VALUES {rows}) t(row_id, s)"


@register(
    "text_script_mix",
    rf"""SELECT row_id,
       CAST(len(regexp_extract_all(s, '\p{{Latin}}')) AS INT)
         AS n_latin,
       CAST(len(regexp_extract_all(s, '\p{{Cyrillic}}')) AS INT)
         AS n_cyrillic,
       CAST(len(regexp_extract_all(s, '\p{{Han}}')) AS INT) AS n_han,
       CAST(len(regexp_extract_all(s, '[0-9]')) AS INT) AS n_digit
FROM {_script_values_sql()}""",
)
def text_script_mix(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(_SCRIPT_ROWS, "row_id int, s string")

    def n_matches(pattern: str):
        return F.size(F.regexp_extract_all("s", F.lit(pattern), 0)).cast(
            "int"
        )

    return df.select(
        "row_id",
        n_matches(r"\p{IsLatin}").alias("n_latin"),
        n_matches(r"\p{IsCyrillic}").alias("n_cyrillic"),
        n_matches(r"\p{IsHan}").alias("n_han"),
        n_matches(r"[0-9]").alias("n_digit"),
    )
