"""Round-4 catalog additions, thirty-eighth batch — forensic audits:

* Benford first-digit audit (natural multiplicative quantities follow
  log10(1+1/d); a fabricated or truncated column drifts — the
  financial-forensics classic, run against order totals);
* template families (documents sharing a long common prefix — the
  boilerplate/template detector that catches mail-merge duplicates
  exact-hash dedup misses by one token later in the text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import register, table


# ---------------------------------------------------------------------------
# Benford audit — first significant digit of o_totalprice vs the
# Benford expectation log10(1+1/d). The digit comes from the string
# form (first char of the integer part — exact; no float log games on
# the extraction path); expected shares are literal doubles identical
# on both engines; deviation = |observed − expected| round(·,9). One
# map + one 9-group aggregate. The use: a column that should be
# Benford-ish and isn't was truncated, capped, or invented somewhere
# upstream.
@register(
    "rel_benford_audit",
    """WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT digit, n AS n_orders,
       round((n / total) * 1e9) / 1e9 AS observed_share,
       round(log10(1.0 + 1.0 / digit) * 1e9) / 1e9 AS benford_share,
       round(abs(n / total - log10(1.0 + 1.0 / digit)) * 1e9) / 1e9
         AS abs_deviation
FROM c CROSS JOIN tot""",
)
def rel_benford_audit(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders").where(
        F.col("o_totalprice") >= 1
    )
    d = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").cast("double").alias("total"))
    obs = F.col("n") / F.col("total")
    ben = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").alias("n_orders"),
        dblround(obs, 9).alias("observed_share"),
        dblround(ben, 9).alias("benford_share"),
        dblround(F.abs(obs - ben), 9).alias("abs_deviation"),
    )


# ---------------------------------------------------------------------------
# Template families — md5 of the first 64 characters groups documents
# into shared-prefix families; families of size >1 are template
# candidates (the mail-merge shape: identical opening, one changed
# name halfway through — invisible to whole-doc exact dedup, caught
# here). Per family: size, the keeper (min doc_id — first occurrence,
# dedup_exact's convention), and the id list ordered for determinism.
# One map + one groupBy; at 100 TB the prefix hash is the shuffle key
# and families are tiny.
_PREFIX_LEN = 64


@register(
    "text_template_families",
    f"""WITH fam AS (
  SELECT md5(substr(text, 1, {_PREFIX_LEN})) AS family,
         doc_id
  FROM documents)
SELECT family,
       count(*) AS family_size,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS member_ids
FROM fam GROUP BY family
HAVING count(*) > 1""",
)
def text_template_families(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    fam = docs.select(
        F.md5(F.substring("text", 1, _PREFIX_LEN)).alias("family"),
        "doc_id",
    )
    grouped = fam.groupBy("family").agg(
        F.count(F.lit(1)).alias("family_size"),
        F.min("doc_id").cast("long").alias("keeper_id"),
        F.expr(
            "listagg(CAST(doc_id AS STRING), ',') "
            "WITHIN GROUP (ORDER BY doc_id)"
        ).alias("member_ids"),
    )
    return grouped.where(F.col("family_size") > 1)
