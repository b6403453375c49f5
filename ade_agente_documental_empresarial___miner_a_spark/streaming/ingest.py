"""Incremental index build — SURVEY §2.9 row 4.

The reference rebuilds its whole Chroma index on every upload/rerun
(``micro-infobot/app.py:286-287``). The Spark-native replacement is a
streaming ingest: new document files arrive → E1 (section → chunk →
embed) runs on the micro-batch only → results append to the Parquet
chunks index. ``foreachBatch`` is used because the E1 pipeline contains
a window (section forward-fill), which is per-document and therefore
safe per-micro-batch (a document never spans files).

Sinks are IDEMPOTENT PER BATCH (ADVICE r9): ``foreachBatch`` is
at-least-once — a micro-batch retried after a failure between the
write and the checkpoint commit re-runs the function — so each batch
writes to its own ``batch_id=N`` partition directory with overwrite
semantics. A retry replaces its own output instead of appending a
duplicate, and readers of the root path see ``batch_id`` as an extra
partition column (drop it when comparing against a one-shot batch
plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.pipeline import build_chunks

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def stream_documents(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def incremental_index(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    dim: int = 64,
):
    """Start the incremental E1 pipeline: each micro-batch of new
    documents is sectioned/chunked/embedded and appended to the index.
    Returns the StreamingQuery (caller stops it)."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        chunks = build_chunks(batch_df, dim=dim)
        chunks.write.mode("overwrite").parquet(
            os.path.join(index_path, f"batch_id={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_media_stats(
    docs_stream: DataFrame,
    stats_path: str,
    checkpoint_path: str,
):
    """Start the incremental MEDIA pipeline (r9): each micro-batch of
    new documents becomes real uncompressed payloads
    (``synth_stats_media_from_docs``) whose pixel/sample bytes are
    decoded Arrow-batched (``extract_payload_stats``) and written to
    the stats table's ``batch_id=N`` partition (idempotent on retry —
    ADVICE r9). Decode is map-only, so streaming it costs exactly
    the batch plan per micro-batch — the stream ≡ batch equality is
    pinned by tests/test_streaming.py. Returns the StreamingQuery."""
    from ..sources.multimodal import (
        extract_payload_stats,
        synth_stats_media_from_docs,
    )

    def decode(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.select(
            F.col("doc_id").alias("media_id"), "text"
        )
        stats = extract_payload_stats(synth_stats_media_from_docs(docs))
        stats.write.mode("overwrite").parquet(
            os.path.join(stats_path, f"batch_id={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(decode)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
