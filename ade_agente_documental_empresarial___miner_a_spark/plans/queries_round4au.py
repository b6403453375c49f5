"""Round-4 catalog additions, forty-seventh batch — piecewise pricing
and bitext curation:

* tiered pricing (marginal-band fee computation — the billing/tax
  shape where each band taxes only ITS slice: fee(v) = Σ rate_i ·
  clamp(v − lo_i, 0, hi_i − lo_i); getting this wrong as a flat CASE
  on the whole value is the classic billing bug);
* bitext length-ratio filter (the parallel-corpus gate: candidate
  sentence pairs whose length ratio falls outside the band are
  misalignments — the first and cheapest filter in every MT data
  pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactmath import halfup_ratio, halfup_ratio_duck
from .catalog import register, table

# (lower bound, rate) — each band taxes the slice above its bound up
# to the next bound; rates in basis points to stay in exact decimal
_TIERS = [(0, 100), (100_000, 50), (200_000, 10)]  # bp of the slice


# ---------------------------------------------------------------------------
# Tiered pricing — marginal bands, not flat CASE: an order of 250k
# pays 1% of its first 100k + 0.5% of the next 100k + 0.1% of the
# last 50k. Each band's slice is least(v, hi) − lo clamped at 0 —
# exact DECIMAL arithmetic end to end (rates are integer basis
# points, so slice·rate/10000 stays a terminating decimal); the flat
# misread (rate of the WHOLE value by final band) is what the unit
# test disproves. One map + one aggregate per priority.
def _fee_sql() -> str:
    slices = []
    for i, (lo, bp) in enumerate(_TIERS):
        hi = _TIERS[i + 1][0] if i + 1 < len(_TIERS) else None
        capped = (
            f"least(v, {hi})" if hi is not None else "v"
        )
        slices.append(
            f"CAST(greatest({capped} - {lo}, 0) AS DECIMAL(20,2))"
            f" * {bp}"
        )
    return "(" + " + ".join(slices) + ") / 10000"


@register(
    "rel_tiered_pricing",
    f"""WITH o AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST({_fee_sql()} AS DECIMAL(24,6))) AS DOUBLE)
         AS total_fees
FROM o GROUP BY o_orderpriority""",
)
def rel_tiered_pricing(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    fee = None
    for i, (lo, bp) in enumerate(_TIERS):
        hi = _TIERS[i + 1][0] if i + 1 < len(_TIERS) else None
        capped = (
            F.least(F.col("v"), F.lit(hi)) if hi is not None else F.col("v")
        )
        part = (
            F.greatest(capped - lo, F.lit(0)).cast("decimal(20,2)") * bp
        )
        fee = part if fee is None else (fee + part)
    fee = (fee / 10000).cast("decimal(24,6)")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(fee).cast("double").alias("total_fees"),
    )


def tiered_fee_py(v: float) -> float:
    """Reference implementation for tests."""
    fee = 0.0
    for i, (lo, bp) in enumerate(_TIERS):
        hi = _TIERS[i + 1][0] if i + 1 < len(_TIERS) else None
        capped = min(v, hi) if hi is not None else v
        fee += max(capped - lo, 0) * bp
    return fee / 10000


# ---------------------------------------------------------------------------
# Bitext length-ratio filter — candidate en↔de pairs (here: rank-
# aligned within each language, the deterministic stand-in for an
# aligner's output) gated on the character-length ratio band
# [0.5, 2.0]: outside it, the pair is almost surely a misalignment.
# Reports both sides' lengths, the ratio, and the keep flag — one
# rank window per language, one join on the rank, map-only math.
@register(
    "cur_bitext_ratio_filter",
    f"""WITH en AS (
  SELECT row_number() OVER (ORDER BY doc_id) AS rnk,
         doc_id AS en_id, length(text) AS en_len
  FROM documents WHERE lang = 'en'),
de AS (
  SELECT row_number() OVER (ORDER BY doc_id) AS rnk,
         doc_id AS de_id, length(text) AS de_len
  FROM documents WHERE lang = 'de')
SELECT en_id, de_id,
       CAST(en_len AS BIGINT) AS en_len,
       CAST(de_len AS BIGINT) AS de_len,
       {halfup_ratio_duck("en_len", "de_len", 9)} AS len_ratio,
       CAST(en_len AS DOUBLE) / de_len BETWEEN 0.5 AND 2.0 AS keep
FROM en JOIN de USING (rnk)""",
)
def cur_bitext_ratio_filter(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")

    def side(lang: str, id_alias: str, len_alias: str) -> DataFrame:
        from ..operators.ranking import global_row_number

        # position pairing ranks EVERY doc of the language — unbounded
        # global rank → the distributed exact form
        return global_row_number(
            docs.where(F.col("lang") == lang), ["doc_id"], rn_col="rnk"
        ).select(
            "rnk",
            F.col("doc_id").alias(id_alias),
            F.length("text").alias(len_alias),
        )

    en = side("en", "en_id", "en_len")
    de = side("de", "de_id", "de_len")
    # try_divide: a pair whose de side is EMPTY (length 0) has an
    # undefined ratio — NULL ratio and NULL keep on both engines
    # (DuckDB x/0 → NULL; NULL BETWEEN → NULL), instead of ANSI
    # aborting the job (parity_fuzz edge, seed 2)
    ratio = F.try_divide(F.col("en_len").cast("double"), F.col("de_len"))
    return en.join(de, "rnk").select(
        "en_id",
        "de_id",
        F.col("en_len").cast("long").alias("en_len"),
        F.col("de_len").cast("long").alias("de_len"),
        # integer-exact HALF_UP ratio; NULL on de_len = 0 keeps the
        # r7 try_divide contract (ROUND8 §12 class; r9 audit)
        halfup_ratio("en_len", "de_len", 9).alias("len_ratio"),
        ratio.between(0.5, 2.0).alias("keep"),
    )
