"""The chat sink's driver-side Arrow append must be indistinguishable,
through Spark readers, from the Spark-write path it replaced — same
schema, same values, same timestamp semantics (naive input = session
timeZone, None = batch now). Reference shape: per-turn client-side
insert_one, micro-infobot/app.py:50-71.

Timestamp-instant assertions go through ``unix_micros`` (epoch micros),
never collected ``datetime`` equality: PySpark's collect renders
timestamps in the driver's OS zone, so epoch comparison is the only
form that holds under any host TZ (the battery is exercised under
TZ=Asia/Tokyo in CI-equivalent runs, not just UTC).
"""

from __future__ import annotations

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.sources.sinks import (
    CHAT_SCHEMA,
    append_chat_history,
    read_chat_history,
)

# Aware inputs with DISTINCT zones: equivalence below compares the two
# writer paths in isolation (aware datetimes are unambiguous instants
# on both), independent of either path's naive-interpretation rule.
ROWS = [
    (
        "ana",
        "hola",
        "hello",
        datetime(2024, 3, 1, 12, 0, 0, 123456, tzinfo=timezone.utc),
        11,
        3,
    ),
    (
        "ana",
        "¿qué tal?",
        "fine",
        datetime(2024, 3, 1, 12, 0, 1, tzinfo=ZoneInfo("Asia/Tokyo")),
        7,
        2,
    ),
    (
        "luis",
        "adiós",
        "bye",
        datetime(2024, 3, 2, 9, 30, 0, tzinfo=ZoneInfo("America/New_York")),
        5,
        1,
    ),
]


def _epoch_micros(aware: datetime) -> int:
    u = aware.astimezone(timezone.utc)
    return (
        int(u.replace(microsecond=0, tzinfo=timezone.utc).timestamp())
        * 1_000_000
        + u.microsecond
    )


def _read_micros(spark, path):
    return sorted(
        r.m
        for r in read_chat_history(spark, path)
        .select(F.unix_micros("ts").alias("m"))
        .collect()
    )


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
    # and both persisted the TRUE instants (offset applied, not dropped)
    expected = sorted(_epoch_micros(r[3]) for r in ROWS)
    assert _read_micros(spark, a) == expected
    assert _read_micros(spark, b) == expected


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


def test_naive_ts_means_session_timezone_instant(spark, tmp_path):
    """The sink's naive-timestamp contract, pinned on its OWN terms
    against an explicit expected instant: naive = wall clock in
    spark.sql.session.timeZone, whatever the driver host's OS zone.
    (The pre-round-6 Spark writer used the OS zone via time.mktime —
    comparing against it would only hold on UTC hosts, so that
    comparison is deliberately NOT the contract here.) Naive 12:00 on
    2024-03-01 in America/New_York (EST, UTC-5) is 17:00:00Z."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        path = str(tmp_path / "aw")
        naive = datetime(2024, 3, 1, 12, 0, 0, 123456)
        append_chat_history(spark, [("u", "q", "a", naive, 1, 1)], path)
        expected = _epoch_micros(
            naive.replace(tzinfo=ZoneInfo("America/New_York"))
        )
        assert _read_micros(spark, path) == [expected]
        assert (
            expected
            == _epoch_micros(
                datetime(2024, 3, 1, 17, 0, 0, 123456, tzinfo=timezone.utc)
            )
        )
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
