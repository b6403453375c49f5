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

_CHAT_ROW_SCHEMA = (
    "user string, message string, response string, ts timestamp, "
    "prompt_tokens long, completion_tokens long"
)
# turn_id: monotonically increasing per append batch — the deterministic
# tiebreaker for same-timestamp turns (timestamps have finite resolution;
# two turns in the same microsecond would otherwise make `ORDER BY ts
# LIMIT n` nondeterministic across runs).
CHAT_SCHEMA = _CHAT_ROW_SCHEMA + ", turn_id long"


def chat_store_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe for the chat store. Probing by catching
    the reader's AnalysisException works, but Spark 4's analyzer logs the
    full stack at ERROR before the Python side can swallow it — every
    first turn of a fresh conversation would splash a stack trace into
    the driver log. An fs.exists() call is silent and works for any
    Hadoop-compatible store path (local, HDFS, object store)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _next_turn_id(spark: SparkSession, path: str) -> int:
    # ONLY the missing-history case may restart numbering at 0. A
    # transient read failure must propagate — swallowing it would
    # assign duplicate turn_ids and corrupt the same-timestamp
    # tiebreaker chat.py's bounded replay depends on. With the explicit
    # existence probe there is no except-clause left to mis-swallow it.
    if not chat_store_exists(spark, path):
        return 0
    prev = spark.read.schema(CHAT_SCHEMA).parquet(path)
    row = prev.agg(F.max("turn_id").alias("m")).collect()[0]
    return (row.m if row.m is not None else -1) + 1


def append_chat_history(
    spark: SparkSession,
    rows: list[tuple],
    path: str,
    base_turn_id: int | None = None,
) -> None:
    """Append chat turns (S6). ``rows`` are (user, message, response,
    ts, prompt_tokens, completion_tokens) tuples; ts=None → now().
    Each row gets a persisted ``turn_id`` continuing from the stored
    history (single-writer append, as in the reference's chat loop).
    ``base_turn_id`` lets a caller that already knows the counter (a
    live ChatSession holding it in RAM) skip the read-before-write;
    when omitted the stored max is re-derived."""
    base = _next_turn_id(spark, path) if base_turn_id is None else base_turn_id
    # single-slice parallelize: a chat append is a handful of rows, and
    # the default list→DataFrame path splits even 1 row across
    # defaultParallelism partitions — 32 scheduled tasks (31 empty) and
    # 32 committer file slots per turn. One slice → one task, one file
    # per append batch, which is also the single-writer shape the
    # turn_id contract above assumes. Measured ~1.5× faster per turn.
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [r + (base + i,) for i, r in enumerate(rows)], 1
        ),
        CHAT_SCHEMA,
    ).withColumn("ts", F.coalesce(F.col("ts"), F.current_timestamp()))
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
