"""Round-8 entries — multimodal header decode (VERDICT r7 task 3).

``mm_header_decode`` certifies the tier-2 stdlib header parsers
(``sources/media_headers.py``) end-to-end across all five buildable
image/audio container formats: each document becomes a GENUINELY VALID
PNG / GIF / BMP / JPEG / WAV (cycled by doc_id % 5) whose header
carries md5(text)-derived dimensions/duration; the query pipes the
binaries through ``extract_media_features`` and returns what the PARSER
read back. The DuckDB oracle replays only the md5 construction
arithmetic — it never sees the bytes — so a hash match proves the parse
path recovered exactly the values the headers encode (the tier-3 fake
would seed from md5(payload bytes) and diverge).

Construction rides the ONE shared producer
(``multimodal.synth_media_from_docs`` with ``fmt_col``), so the
md5→parameter arithmetic cannot drift between this entry and the
mm_resize/frame/audio entries (code-review r8 finding).

Reference anchor: the reference has no media handling at all
(micro-infobot/app.py is text-only RAG); this is EXT training-data
surface per the brief, with decode stubs documented in
sources/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table

_HEXPOS = "'0123456789abcdef'"


def _hexval(pos: int) -> str:
    return f"(strpos({_HEXPOS}, substr(h, {pos}, 1)) - 1)"


_B0 = f"({_hexval(1)} * 16 + {_hexval(2)})"
_B1 = f"({_hexval(3)} * 16 + {_hexval(4)})"
_B2 = f"({_hexval(5)} * 16 + {_hexval(6)})"
_B3 = f"({_hexval(7)} * 16 + {_hexval(8)})"

_FMTS = ("png", "gif", "bmp", "jpeg", "wav")
_FMT_CASE = (
    "CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'"
    " WHEN 3 THEN 'jpeg' ELSE 'wav' END"
)


@register(
    "mm_header_decode",
    f"""WITH m AS (
  SELECT doc_id AS media_id, {_FMT_CASE} AS fmt, md5(text) AS h
  FROM documents)
SELECT media_id, fmt,
       CAST(CASE WHEN fmt <> 'wav' THEN 64 + {_B0} % 192 END AS INT) AS width,
       CAST(CASE WHEN fmt <> 'wav' THEN 64 + {_B1} % 192 END AS INT) AS height,
       CAST(CASE WHEN fmt = 'wav' THEN 1000 + ({_B2} + 256 * {_B3}) END AS BIGINT) AS duration_ms
FROM m""",
)
def mm_header_decode(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.multimodal import (
        extract_media_features,
        synth_media_from_docs,
    )

    fmt = F.element_at(
        F.array(*[F.lit(x) for x in _FMTS]),
        (F.col("media_id") % 5 + 1).cast("int"),
    )
    docs = table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), "text"
    )
    media = synth_media_from_docs(
        docs.withColumn("fmt", fmt), fmt_col="fmt"
    )
    return extract_media_features(media).select(
        "media_id",
        fmt.alias("fmt"),
        "width",
        "height",
        "duration_ms",
    )
