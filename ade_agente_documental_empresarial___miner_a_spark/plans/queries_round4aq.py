"""Round-4 catalog additions, forty-third batch — compressed text IO
and bit-level portability:

* gzip JSONL roundtrip (the wire format training corpora actually ship
  in — *.jsonl.gz — written and read back with explicit schema and
  codec; splittability is the scale note: gzip members are NOT
  splittable, so shard size IS the parallelism knob);
* bitwise battery (AND/OR/XOR/shifts/popcount over literal patterns —
  bitmask feature packing is how wide boolean feature sets survive at
  100 TB, and the operators must mean the same thing on every engine).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Gzip JSONL roundtrip — documents written as gzip-compressed JSON
# lines (the de-facto corpus interchange format) and read back with an
# explicit schema. The parity pin is value fidelity through the
# compress→decompress cycle; the SCALE note is the one that matters
# operationally: a .gz member decompresses on ONE task, so the writer
# controls read parallelism via shard count (here: 8 shards), not via
# maxPartitionBytes — the classic gotcha of gzip lakes.
def _gz_dir(sf: str) -> str:
    import tempfile

    from .queries_round4 import _source_tag

    return os.path.join(
        tempfile.gettempdir(),
        f"ade_jsonl_gz_{_source_tag(sf, 'documents')}",
    )


@register(
    "s20_jsonl_gzip_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def s20_jsonl_gzip_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    out = _gz_dir(sf)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            table(spark, sf, "documents")
            .repartition(8)  # shard count IS the future read parallelism
            .write.mode("overwrite")
            .option("compression", "gzip")
            .json(out)
        )
    return spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(out)


# ---------------------------------------------------------------------------
# Bitwise battery — the packing/unpacking operator set over literal
# 64-bit patterns: AND, OR, XOR, left/right shift, popcount. Bitmask
# columns carry hundreds of boolean features in one BIGINT (8 bytes vs
# hundreds), and set-membership tests compile to one AND — but only if
# every engine agrees on the semantics, including sign-preserving
# right shift on negative values (both engines shift arithmetic on
# signed BIGINT). Left-shifting a NEGATIVE value is NOT portable —
# DuckDB raises where Spark wraps — so the battery nulls that cell via
# an explicit guard on both engines: the portable rule is "only shift
# non-negative values left".
_BIT_ROWS = [
    (1, 0b1010_1100, 0b0110_0110),
    (2, 255, 15),
    (3, -8, 3),          # negative left operand: arithmetic shifts
    (4, 0, 0),
    (5, 2**40 + 7, 2**20 + 1),
]


def _bit_values_sql() -> str:
    rows = ", ".join(
        f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
        for i, a, b in _BIT_ROWS
    )
    return f"(VALUES {rows}) t(row_id, a, b)"


@register(
    "func_bitwise_battery",
    f"""SELECT row_id,
       a & b AS bit_and,
       a | b AS bit_or,
       xor(a, b) AS bit_xor,
       CASE WHEN a >= 0 THEN a << 3 END AS shl3,
       a >> 2 AS shr2,
       CAST(bit_count(a) AS INT) AS popcount_a
FROM {_bit_values_sql()}""",
)
def func_bitwise_battery(spark: SparkSession, sf: str) -> DataFrame:
    df = spark.createDataFrame(
        _BIT_ROWS, "row_id int, a long, b long"
    )
    return df.select(
        "row_id",
        (F.col("a").bitwiseAND(F.col("b"))).alias("bit_and"),
        (F.col("a").bitwiseOR(F.col("b"))).alias("bit_or"),
        (F.col("a").bitwiseXOR(F.col("b"))).alias("bit_xor"),
        F.when(F.col("a") >= 0, F.shiftleft(F.col("a"), 3)).alias("shl3"),
        F.shiftright(F.col("a"), 2).alias("shr2"),
        F.bit_count("a").cast("int").alias("popcount_a"),
    )
