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


# ---------------------------------------------------------------------------
# mm_pixel_stats (r9) — certifies the tier-2 PAYLOAD decoders the same
# way mm_header_decode certifies the header parsers: every document
# becomes a real uncompressed payload (even doc_id → tiny 24bpp BMP
# pixel array, odd → 8-bit PCM WAV samples; one base value + one spike
# at an md5-derived position), the query decodes the bytes
# (media_headers.bmp_pixel_stats / wav_pcm_stats — stride padding and
# RIFF chunk walk included), and the oracle predicts the per-channel
# (sum, min, max) from the md5 construction arithmetic alone. The
# stats are integers, so the match is exact; a decoder that misread
# the stride, the pixel offset, or the data chunk would diverge on
# the first doc.


def _byte(k: int) -> str:
    """md5-hex byte k (0-based) as an integer SQL expression."""
    return f"({_hexval(2 * k + 1)} * 16 + {_hexval(2 * k + 2)})"


_PIXEL_STATS_SQL = f"""WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         md5(text) AS h
  FROM documents),
p AS (
  SELECT media_id, kind,
         CASE WHEN kind = 'image'
              THEN (4 + {_byte(0)} % 13) * (4 + {_byte(1)} % 13)
              ELSE 64 + ({_byte(0)} + 256 * {_byte(1)}) % 960 END AS n,
         {_byte(2)} AS v2, {_byte(3)} AS v3, {_byte(4)} AS v4,
         {_byte(5)} AS v5, {_byte(6)} AS v6, {_byte(7)} AS v7
  FROM m)
SELECT media_id, kind, CAST(n AS BIGINT) AS n_units,
       CAST(CASE WHEN kind = 'image' THEN v2 * (n - 1) + v5
                 ELSE v2 * (n - 1) + v3 END AS BIGINT) AS c0_sum,
       CAST(CASE WHEN kind = 'image' THEN least(v2, v5)
                 ELSE least(v2, v3) END AS BIGINT) AS c0_min,
       CAST(CASE WHEN kind = 'image' THEN greatest(v2, v5)
                 ELSE greatest(v2, v3) END AS BIGINT) AS c0_max,
       CAST(CASE WHEN kind = 'image' THEN v3 * (n - 1) + v6 END
            AS BIGINT) AS c1_sum,
       CAST(CASE WHEN kind = 'image' THEN least(v3, v6) END
            AS BIGINT) AS c1_min,
       CAST(CASE WHEN kind = 'image' THEN greatest(v3, v6) END
            AS BIGINT) AS c1_max,
       CAST(CASE WHEN kind = 'image' THEN v4 * (n - 1) + v7 END
            AS BIGINT) AS c2_sum,
       CAST(CASE WHEN kind = 'image' THEN least(v4, v7) END
            AS BIGINT) AS c2_min,
       CAST(CASE WHEN kind = 'image' THEN greatest(v4, v7) END
            AS BIGINT) AS c2_max
FROM p"""


@register("mm_pixel_stats", _PIXEL_STATS_SQL)
def mm_pixel_stats(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.multimodal import (
        extract_payload_stats,
        synth_stats_media_from_docs,
    )

    docs = table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), "text"
    )
    return extract_payload_stats(synth_stats_media_from_docs(docs))


# ---------------------------------------------------------------------------
# mm_media_quality_gate (r9) — the curation gate for media payloads,
# composing the REAL tier-2 payload decode: per media row the dynamic
# range (max channel spread), the mean level of channel 0, and the
# clipping flag (any channel pinned at 0 or 255) decide keep/drop —
# the multimodal analogue of cur_quality_gate (flat or clipped pixels/
# samples are the classic dead-image/dead-audio signals a training
# mix filters first). The oracle predicts every fact from the md5
# construction arithmetic; the Spark side must decode the bytes.
# The mean is stated with the integer-exact HALF_UP quotient.
_GATE_MIN_RANGE = 16


def _gate_sql() -> str:
    from ..functions.exactmath import halfup_mean_duck

    mean0 = halfup_mean_duck("c0_sum", "n", 9, integral_sum=True)
    return f"""WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         md5(text) AS h
  FROM documents),
p AS (
  SELECT media_id, kind,
         CASE WHEN kind = 'image'
              THEN (4 + {_byte(0)} % 13) * (4 + {_byte(1)} % 13)
              ELSE 64 + ({_byte(0)} + 256 * {_byte(1)}) % 960 END AS n,
         {_byte(2)} AS v2, {_byte(3)} AS v3, {_byte(4)} AS v4,
         {_byte(5)} AS v5, {_byte(6)} AS v6, {_byte(7)} AS v7
  FROM m),
f AS (
  SELECT media_id, kind, n,
         CASE WHEN kind = 'image' THEN v2 * (n - 1) + v5
              ELSE v2 * (n - 1) + v3 END AS c0_sum,
         CASE WHEN kind = 'image'
              THEN greatest(abs(v2 - v5), abs(v3 - v6), abs(v4 - v7))
              ELSE abs(v2 - v3) END AS dyn_range,
         CASE WHEN kind = 'image'
              THEN least(v2, v5) = 0 OR greatest(v2, v5) = 255
                OR least(v3, v6) = 0 OR greatest(v3, v6) = 255
                OR least(v4, v7) = 0 OR greatest(v4, v7) = 255
              ELSE least(v2, v3) = 0 OR greatest(v2, v3) = 255
         END AS clipped
  FROM p)
SELECT media_id, kind,
       CAST(dyn_range AS BIGINT) AS dyn_range,
       {mean0} AS c0_mean,
       clipped,
       (dyn_range >= {_GATE_MIN_RANGE} AND NOT clipped) AS keep
FROM f"""


@register("mm_media_quality_gate", _gate_sql())
def mm_media_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.exactmath import halfup_mean
    from ..sources.multimodal import (
        extract_payload_stats,
        synth_stats_media_from_docs,
    )

    docs = table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), "text"
    )
    stats = extract_payload_stats(synth_stats_media_from_docs(docs))
    rng = F.when(
        F.col("kind") == "image",
        F.greatest(
            F.col("c0_max") - F.col("c0_min"),
            F.col("c1_max") - F.col("c1_min"),
            F.col("c2_max") - F.col("c2_min"),
        ),
    ).otherwise(F.col("c0_max") - F.col("c0_min"))
    clipped = F.when(
        F.col("kind") == "image",
        (F.col("c0_min") == 0) | (F.col("c0_max") == 255)
        | (F.col("c1_min") == 0) | (F.col("c1_max") == 255)
        | (F.col("c2_min") == 0) | (F.col("c2_max") == 255),
    ).otherwise((F.col("c0_min") == 0) | (F.col("c0_max") == 255))
    return stats.select(
        "media_id",
        "kind",
        rng.cast("long").alias("dyn_range"),
        halfup_mean("c0_sum", "n_units", 9, integral_sum=True).alias(
            "c0_mean"
        ),
        clipped.alias("clipped"),
        ((rng >= _GATE_MIN_RANGE) & ~clipped).alias("keep"),
    )
