"""Round-4 catalog additions, eighth batch — the raw-Arrow lanes:
``mapInArrow`` (zero-copy batch map, no pandas materialization) and
``groupBy().applyInArrow`` (grouped Arrow tables). These sit BELOW the
pandas UDF lane: no Series conversion, no index bookkeeping — the right
tier when the per-batch work is itself vectorized columnar compute
(pyarrow.compute kernels run C++ on the Arrow buffers Spark already
shipped). The engine's sanctioned Python boundaries stay the three
Arrow-batched pandas ones (extract/chunker/embedder); these entries pin
the raw-Arrow tier's contract for when pandas overhead matters.

Both ops are deterministic columnar transforms, so they are exactly
oracle-able: utf8 char count vs byte count (the multilingual-corpus
size accounting where chars ≠ bytes) per document and rolled up per
language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register, table


# ---------------------------------------------------------------------------
# mapInArrow — per-document byte accounting. The batch iterator yields
# RecordBatches straight from the scan's Arrow buffers; utf8_length and
# binary_length are pyarrow.compute kernels (C++, SIMD) — no pandas
# Series is ever built. Map-only: no shuffle, parallel per input
# partition, exactly the shape of a 100 TB corpus size audit.
def _bytestats_batches(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        text = b.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                b.column("doc_id"),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(
                    pc.binary_length(pc.cast(text, pa.binary())),
                    pa.int64(),
                ),
            ],
            names=["doc_id", "n_chars", "n_bytes"],
        )


@register(
    "text_arrow_bytestats",
    """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(strlen(text) AS BIGINT) AS n_bytes
FROM documents""",
)
def text_arrow_bytestats(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _bytestats_batches, "doc_id long, n_chars long, n_bytes long"
    )


# ---------------------------------------------------------------------------
# applyInArrow — per-language corpus rollup as a grouped Arrow table
# function: each language's documents arrive as ONE pyarrow.Table and
# reduce to a single stats row with pyarrow.compute aggregates (exact
# int64 sums — no float fold anywhere). The groupBy shuffles on lang
# (low cardinality — at real scale pre-aggregate per partition first;
# here the grouped-Arrow API contract is the point).
def _lang_rollup(table_):
    import pyarrow as pa
    import pyarrow.compute as pc

    text = table_.column("text")
    chars = pc.cast(pc.utf8_length(text), pa.int64())
    bytes_ = pc.cast(
        pc.binary_length(pc.cast(text, pa.binary())), pa.int64()
    )
    return pa.table(
        {
            "lang": [table_.column("lang")[0].as_py()],
            "n_docs": [table_.num_rows],
            "total_chars": [pc.sum(chars).as_py()],
            "total_bytes": [pc.sum(bytes_).as_py()],
        },
        schema=pa.schema(
            [
                ("lang", pa.string()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
                ("total_bytes", pa.int64()),
            ]
        ),
    )


@register(
    "text_arrow_lang_rollup",
    """SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
FROM documents
GROUP BY lang""",
)
def text_arrow_lang_rollup(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("lang", "text")
    return docs.groupBy("lang").applyInArrow(
        _lang_rollup,
        "lang string, n_docs long, total_chars long, total_bytes long",
    )
