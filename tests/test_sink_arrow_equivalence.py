"""The chat sink's driver-side Arrow append must be indistinguishable,
through Spark readers, from the Spark-write path it replaced — same
schema, same values, same timestamp semantics (naive input = UTC, None
= batch now). Reference shape: per-turn client-side insert_one,
micro-infobot/app.py:50-71."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
    CHAT_SCHEMA,
    append_chat_history,
    read_chat_history,
)

ROWS = [
    ("ana", "hola", "hello", datetime(2024, 3, 1, 12, 0, 0, 123456), 11, 3),
    ("ana", "¿qué tal?", "fine", datetime(2024, 3, 1, 12, 0, 1), 7, 2),
    ("luis", "adiós", "bye", datetime(2024, 3, 2, 9, 30, 0), 5, 1),
]


def _spark_write(spark, rows, path, base=0):
    """The pre-round-6 Spark write path, verbatim, as the equivalence
    reference."""
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [r + (base + i,) for i, r in enumerate(rows)], 1
        ),
        CHAT_SCHEMA,
    ).withColumn("ts", F.coalesce(F.col("ts"), F.current_timestamp()))
    df.write.mode("append").parquet(path)


def test_arrow_append_reads_back_identical_to_spark_write(spark, tmp_path):
    a, b = str(tmp_path / "spark_w"), str(tmp_path / "arrow_w")
    _spark_write(spark, ROWS, a)
    append_chat_history(spark, ROWS, b)

    da, db = read_chat_history(spark, a), read_chat_history(spark, b)
    assert da.schema == db.schema
    ra = sorted(map(tuple, da.collect()))
    rb = sorted(map(tuple, db.collect()))
    assert ra == rb


def test_none_ts_fills_one_batch_timestamp(spark, tmp_path):
    path = str(tmp_path / "c")
    append_chat_history(
        spark,
        [("u", "q1", "a1", None, 1, 1), ("u", "q2", "a2", None, 1, 1)],
        path,
    )
    got = read_chat_history(spark, path).collect()
    assert all(r.ts is not None for r in got)
    # one shared now() per batch, matching current_timestamp() semantics
    assert len({r.ts for r in got}) == 1


def test_turn_ids_continue_across_mixed_writers(spark, tmp_path):
    """A store started by the old Spark writer keeps its turn_id
    sequence when the Arrow path appends to it."""
    path = str(tmp_path / "mixed")
    _spark_write(spark, ROWS[:2], path, base=0)
    append_chat_history(spark, ROWS[2:], path)  # re-derives base = 2
    got = sorted(r.turn_id for r in read_chat_history(spark, path).collect())
    assert got == [0, 1, 2]


def test_naive_ts_follows_session_timezone_like_spark_write(spark, tmp_path):
    """Naive timestamps must mean the same instant through every store
    type: the Arrow path interprets them in spark.sql.session.timeZone,
    exactly as createDataFrame does on the Spark branches — under a
    non-UTC session the two writers must still agree."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        a, b = str(tmp_path / "sw"), str(tmp_path / "aw")
        _spark_write(spark, ROWS[:1], a)
        append_chat_history(spark, ROWS[:1], b)
        ra = read_chat_history(spark, a).collect()[0]
        rb = read_chat_history(spark, b).collect()[0]
        assert ra.ts == rb.ts
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_uri_scheme_paths_use_the_spark_writer(spark, tmp_path):
    """A store addressed by URI (file:, hdfs:, s3a:, ...) must route
    through the Spark writer — the driver-side file write handles only
    bare local paths (a file: URI would otherwise become a literal
    'file:' directory via os.makedirs)."""
    target = tmp_path / "uri_store"
    append_chat_history(spark, ROWS[:1], f"file:{target}")
    # written through Spark: readable, and no literal 'file:' dir appears
    got = read_chat_history(spark, str(target)).collect()
    assert len(got) == 1 and got[0].user == "ana"
    assert not (tmp_path / "file:").exists()


def test_readers_ignore_dangling_tmp_files(spark, tmp_path):
    """A crash mid-write leaves only a dot-prefixed temp file, which
    Spark readers skip — the visible store stays consistent."""
    path = str(tmp_path / "c")
    append_chat_history(spark, ROWS[:1], path)
    (tmp_path / "c" / ".part-deadbeef.parquet.tmp").write_bytes(
        b"partial garbage"
    )
    got = read_chat_history(spark, path).collect()
    assert len(got) == 1 and got[0].user == "ana"
