"""Round-4 catalog additions, thirty-third batch — confidence-aware
language routing:

* language-ID margin (best-vs-second marker score gap per document —
  the confidence signal that decides whether a doc routes on the cheap
  n-gram classifier or escalates to a heavier model; an argmax without
  its margin is a guess wearing a costume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import LANG_MARKERS, pred_lang_expr
from .catalog import register, table


# ---------------------------------------------------------------------------
# Language-ID margin — the per-lang marker hit counts sorted
# descending give (top1, top2); margin = top1 − top2 is tie-robust by
# construction (a tied argmax has margin 0 without naming which lang
# "won"). `confident` gates on margin ≥ 2 AND a nonzero best — the
# routing rule: confident docs take the cheap classifier's label,
# the rest escalate. Sorting a 4-element array per row is whole-stage
# codegen; pred_lang reuses the shared argmax expression so the label
# agrees with text_lang_id exactly.
_MARGIN_MIN = 2


def _margin_oracle() -> str:
    from .queries_ext import _BEST, _HIT_EXPRS, _PRED

    hits_list = ", ".join(f"hits_{lang}" for lang in LANG_MARKERS)
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
h AS (SELECT doc_id, {_HIT_EXPRS} FROM w),
s AS (
  SELECT doc_id,
         CASE WHEN {_BEST} > 0 THEN {_PRED} ELSE 'unk' END AS pred_lang,
         list_sort([{hits_list}], 'DESC') AS sorted_hits
  FROM h)
SELECT doc_id, pred_lang,
       sorted_hits[1] AS best_hits,
       sorted_hits[2] AS second_hits,
       sorted_hits[1] - sorted_hits[2] AS margin,
       sorted_hits[1] > 0
         AND sorted_hits[1] - sorted_hits[2] >= {_MARGIN_MIN}
         AS confident
FROM s"""


@register("text_lang_margin", _margin_oracle())
def text_lang_margin(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    words = F.split("text", " ")
    def _hits(markers):
        # closure factory: F.filter treats a 2-arg lambda as
        # (element, index) — bind the marker list outside instead
        return F.size(
            F.filter(words, lambda w: w.isin(*markers))
        ).cast("long")

    hits = [_hits(markers) for markers in LANG_MARKERS.values()]
    sorted_hits = F.sort_array(F.array(*hits), asc=False)
    pred, _best = pred_lang_expr(F.col("text"))
    top1 = sorted_hits.getItem(0)
    top2 = sorted_hits.getItem(1)
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        top1.alias("best_hits"),
        top2.alias("second_hits"),
        (top1 - top2).alias("margin"),
        ((top1 > 0) & (top1 - top2 >= _MARGIN_MIN)).alias("confident"),
    )
