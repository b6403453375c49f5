"""Round-4 catalog additions, forty-ninth batch — concentration
diagnostics:

* Herfindahl-Hirschman index (supplier revenue concentration per
  nation — the antitrust-grade concentration number: Σ share², 1/N at
  perfect balance, 1.0 at monopoly);
* mixture entropy (source-mix Shannon entropy per language, with its
  normalized form — the one-number balance check on a training mix:
  0 = single-source, 1 = perfectly even).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table


# ---------------------------------------------------------------------------
# HHI — per nation: supplier revenue shares squared and summed. Exact
# decimal revenue sums; the share division and square run as one
# fixed-order double expression per supplier, quantized round(·,9)
# into a DECIMAL fold so partition order can't smear the last bit
# (the chi2-cells discipline). n_eff = 1/HHI is the "effective number
# of suppliers" reading.
@register(
    "rel_hhi_concentration",
    f"""WITH rev AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
              AS DECIMAL(24,2)) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey),
tot AS (
  SELECT nationkey, CAST(sum(r) AS DOUBLE) AS total
  FROM rev GROUP BY nationkey),
shares AS (
  SELECT rev.nationkey,
         CAST(round((CAST(r AS DOUBLE) / total)
                    * (CAST(r AS DOUBLE) / total) * 1e9) / 1e9
              AS DECIMAL(20,9)) AS sh2
  FROM rev JOIN tot ON tot.nationkey = rev.nationkey)
SELECT nationkey,
       count(*) AS n_suppliers,
       round(CAST(sum(sh2) AS DOUBLE), 9) AS hhi,
       {halfup_ratio_duck("1", "sum(sh2)", 9, 0, 9)} AS n_effective
FROM shares GROUP BY nationkey""",
)
def rel_hhi_concentration(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(24,2)")
            .alias("r")
        )
    )
    tot = rev.groupBy("nationkey").agg(
        F.sum("r").cast("double").alias("total")
    )
    share = F.col("r").cast("double") / F.col("total")
    shares = rev.join(F.broadcast(tot), "nationkey").select(
        "nationkey",
        dblround(share * share, 9).cast("decimal(20,9)").alias("sh2"),
    )
    return shares.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("sh2").cast("double"), 9).alias("hhi"),
        # integer-exact HALF_UP ratio over the 9-dp decimal fold
        # (ROUND8 §12 class; r9 audit)
        halfup_ratio("1", "sum(sh2)", 9, 0, 9).alias("n_effective"),
    )


# ---------------------------------------------------------------------------
# Mixture entropy — per language: Shannon entropy of the source mix
# (nats), its normalized form H/ln(n_sources), and the max-share
# sanity column. Quantized-ln decimal fold as everywhere; the single
# number a mix review reads first: normalized 1.0 means every source
# contributes evenly, values near 0 mean one source dominates.
@register(
    "cur_mix_entropy",
    f"""WITH c AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
  FROM documents GROUP BY lang, source),
t AS (SELECT lang, CAST(sum(n) AS DOUBLE) AS total,
             count(*) AS n_sources
      FROM c GROUP BY lang),
terms AS (
  SELECT c.lang, t.n_sources, n / total AS p,
         CAST(round(-(n / total) * ln(n / total) * 1e9) / 1e9
              AS DECIMAL(20,9)) AS h_term
  FROM c JOIN t ON t.lang = c.lang)
SELECT lang,
       CAST(max(n_sources) AS BIGINT) AS n_sources,
       round(CAST(sum(h_term) AS DOUBLE), 9) AS entropy_nats,
       {halfup_ratio_duck(
           "sum(h_term)",
           "CAST(round(ln(CAST(max(n_sources) AS DOUBLE)) * 1e9)"
           " / 1e9 AS DECIMAL(20,9))",
           9, 9, 9)}
         AS entropy_normalized,
       round(max(p) * 1e9) / 1e9 AS max_source_share
FROM terms GROUP BY lang""",
)
def cur_mix_entropy(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.groupBy("lang").agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    p = F.col("n") / F.col("total")
    terms = c.join(F.broadcast(t), "lang").select(
        "lang",
        "n_sources",
        p.alias("p"),
        dblround(-p * F.log(p), 9).cast("decimal(20,9)").alias("h_term"),
    )
    return terms.groupBy("lang").agg(
        F.max("n_sources").cast("long").alias("n_sources"),
        F.round(F.sum("h_term").cast("double"), 9).alias(
            "entropy_nats"
        ),
        # a language with ONE source has log(1)=0 in the denominator —
        # normalized entropy is undefined (NULL, the try_divide
        # contract, stated inside halfup_ratio). The quotient itself is
        # the integer-exact HALF_UP of two 9-decimal values (ROUND8 §12
        # class; r9 audit catch): casting the round(ln,9) double to
        # DECIMAL(20,9) is loss-free on both engines because the double
        # sits within ~1e-25 of a 9-dp decimal, far from any midpoint.
        halfup_ratio(
            "sum(h_term)",
            "CAST(round(ln(CAST(max(n_sources) AS DOUBLE)) * 1e9)"
            " / 1e9 AS DECIMAL(20,9))",
            9,
            9,
            9,
        ).alias("entropy_normalized"),
        dblround(F.max("p"), 9).alias("max_source_share"),
    )
