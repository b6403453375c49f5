"""Round-4 catalog additions, thirty-ninth batch — change decomposition
and document reassembly:

* price-volume bridge (the finance waterfall: revenue change between
  two periods split into volume effect and price effect, with the
  decomposition identity delta = vol + price holding EXACTLY in
  decimal — the bridge that tells a review meeting WHY revenue moved);
* continuation detection (doc A's suffix equals doc B's prefix — the
  split-document reassembly signal for chunked crawls, a join exact
  whole-doc dedup structurally cannot see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import register, table

_BRIDGE_SPLIT = "1998-01-01"


# ---------------------------------------------------------------------------
# Price-volume bridge — per return flag, compare the halves before/
# after the split date: Δrevenue = (q2−q1)·p1  +  q2·(p2−p1)
# (volume effect at old price, price effect at new volume — the
# standard bridge convention). All quantities and revenues are exact
# decimal sums; the average prices divide once into DOUBLE and the
# two effects + identity check evaluate in one fixed-order formula.
# The identity delta ≈ vol + price is exact up to the two divisions —
# pinned at 1e-6 in tests, while parity pins both engines bit-equal.
@register(
    "rel_price_volume_bridge",
    f"""WITH li AS (
  SELECT l.l_returnflag AS flag,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_BRIDGE_SPLIT}'
              THEN 1 ELSE 2 END AS period,
         CAST(l.l_quantity AS DECIMAL(14,2)) AS q,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
agg AS (
  SELECT flag,
         CAST(sum(CASE WHEN period = 1 THEN q END) AS DOUBLE) AS q1,
         CAST(sum(CASE WHEN period = 2 THEN q END) AS DOUBLE) AS q2,
         CAST(sum(CASE WHEN period = 1 THEN rev END) AS DOUBLE) AS r1,
         CAST(sum(CASE WHEN period = 2 THEN rev END) AS DOUBLE) AS r2
  FROM li GROUP BY flag)
SELECT flag,
       round((r2 - r1) * 1e6) / 1e6 AS revenue_delta,
       round(((q2 - q1) * (r1 / q1)) * 1e6) / 1e6 AS volume_effect,
       round((q2 * (r2 / q2 - r1 / q1)) * 1e6) / 1e6 AS price_effect
FROM agg""",
)
def rel_price_volume_bridge(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_returnflag").alias("flag"),
        F.when(
            F.col("o_orderdate") < F.lit(_BRIDGE_SPLIT).cast("timestamp"),
            1,
        )
        .otherwise(2)
        .alias("period"),
        F.col("l_quantity").cast("decimal(14,2)").alias("q"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("rev"),
    )
    agg = j.groupBy("flag").agg(
        F.sum(F.when(F.col("period") == 1, F.col("q")))
        .cast("double")
        .alias("q1"),
        F.sum(F.when(F.col("period") == 2, F.col("q")))
        .cast("double")
        .alias("q2"),
        F.sum(F.when(F.col("period") == 1, F.col("rev")))
        .cast("double")
        .alias("r1"),
        F.sum(F.when(F.col("period") == 2, F.col("rev")))
        .cast("double")
        .alias("r2"),
    )
    return agg.select(
        "flag",
        dblround(F.col("r2") - F.col("r1"), 6).alias("revenue_delta"),
        dblround(
            (F.col("q2") - F.col("q1")) * (F.col("r1") / F.col("q1")), 6
        ).alias("volume_effect"),
        dblround(
            F.col("q2")
            * (F.col("r2") / F.col("q2") - F.col("r1") / F.col("q1")),
            6,
        ).alias("price_effect"),
    )


# ---------------------------------------------------------------------------
# Continuation detection — hash the first and last _EDGE_LEN characters
# of every doc; a (suffix_a = prefix_b, a ≠ b) join names candidate
# split-document pairs for reassembly. Chunked crawls and paginated
# exports produce exactly this shape, and whole-doc dedup can never see
# it (the halves hash differently). The join key is an md5 — uniform,
# shuffle-friendly; candidates are verified downstream (same contract
# as LSH→verify).
_EDGE_LEN = 32


@register(
    "dedup_continuation",
    f"""WITH edges AS (
  SELECT doc_id,
         md5(substr(text, 1, {_EDGE_LEN})) AS prefix_h,
         md5(substr(text, length(text) - {_EDGE_LEN} + 1,
                    {_EDGE_LEN})) AS suffix_h
  FROM documents WHERE length(text) >= {_EDGE_LEN}),
pairs AS (
  SELECT a.doc_id AS head_doc, b.doc_id AS tail_doc
  FROM edges a JOIN edges b
    ON a.suffix_h = b.prefix_h AND a.doc_id <> b.doc_id)
SELECT head_doc, tail_doc FROM pairs""",
)
def dedup_continuation(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").where(
        F.length("text") >= _EDGE_LEN
    )
    edges = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, _EDGE_LEN)).alias("prefix_h"),
        F.md5(
            F.col("text").substr(
                F.length("text") - _EDGE_LEN + 1, F.lit(_EDGE_LEN)
            )
        ).alias("suffix_h"),
    )
    a = edges.select(
        F.col("doc_id").alias("head_doc"),
        F.col("suffix_h").alias("k"),
    )
    b = edges.select(
        F.col("doc_id").alias("tail_doc"),
        F.col("prefix_h").alias("k"),
    )
    return (
        a.join(b, "k")
        .where(F.col("head_doc") != F.col("tail_doc"))
        .select("head_doc", "tail_doc")
    )
