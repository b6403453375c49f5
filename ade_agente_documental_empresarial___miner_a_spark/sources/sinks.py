"""Chat-history sink — SURVEY §2.1 S6/S7.

Reference: per-turn ``insert_one`` of ``{user, message, response,
timestamp}`` into MongoDB (``micro-infobot/app.py:50-71``), connection URI
from env (S7).

Engine-native sink: append-mode Parquet table with the D4 schema
(SURVEY §1.1) — usage counters included, since cost analytics (A5) read
them. The Mongo connector path is config-gated (``spark.ade.mongo.uri``):
with the mongo-spark connector on the classpath the same DataFrame writes
via ``format("mongodb")``; without it we stay Parquet-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHAT_SCHEMA = (
    "user string, message string, response string, ts timestamp, "
    "prompt_tokens long, completion_tokens long"
)


def append_chat_history(
    spark: SparkSession,
    rows: list[tuple],
    path: str,
) -> None:
    """Append chat turns (S6). ``rows`` are (user, message, response,
    ts, prompt_tokens, completion_tokens) tuples; ts=None → now()."""
    df = spark.createDataFrame(rows, CHAT_SCHEMA).withColumn(
        "ts", F.coalesce(F.col("ts"), F.current_timestamp())
    )
    mongo_uri = spark.conf.get("spark.ade.mongo.uri", None)
    if mongo_uri:
        (
            df.write.format("mongodb")
            .mode("append")
            .option("connection.uri", mongo_uri)
            .option("database", "db-historial-chats")
            .option("collection", "coleccion-histochats")
            .save()
        )
        return
    df.write.mode("append").parquet(path)


def read_chat_history(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CHAT_SCHEMA).parquet(path)


def session_transcripts(chat: DataFrame) -> DataFrame:
    """Reconstruct per-user conversation state (the reference's
    ConversationBufferMemory, app.py:43-44) as ordered message structs."""
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "message", "response"))
    )
    return chat.groupBy("user").agg(
        F.flatten(
            F.transform(
                ordered,
                lambda x: F.array(
                    F.struct(
                        F.lit("user").alias("role"),
                        x["message"].alias("content"),
                    ),
                    F.struct(
                        F.lit("assistant").alias("role"),
                        x["response"].alias("content"),
                    ),
                ),
            )
        ).alias("messages"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("prompt_tokens").alias("prompt_tokens"),
        F.sum("completion_tokens").alias("completion_tokens"),
        (
            F.sum("prompt_tokens") * F.lit(0.00001)
            + F.sum("completion_tokens") * F.lit(0.00003)
        ).alias("cost_usd"),
    )
