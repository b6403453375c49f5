"""Round-3 operator tests: batch sessionization, paragraph dedup,
quality gate, audio chunk plan, and the live streaming-dedup path."""

import datetime as dt
import json
import time

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.dedup import (
    paragraph_dedup,
)
from ade_agente_documental_empresarial___miner_a_spark.operators.curation import (
    quality_gate,
)
from ade_agente_documental_empresarial___miner_a_spark.operators.sessions import (
    sessionize,
)


def test_sessionize_gap_boundaries(spark):
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid)

    df = spark.createDataFrame(
        [
            ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 29),   # session 1 (gaps < 30)
            ev(4, 1, 65),                               # gap 36 min -> session 2
            ev(5, 2, 0),                                # user 2, own session
        ],
        "event_id long, ts timestamp, user_id long",
    )
    out = {
        (r.user_id, r.session_id): (r.n_events, r.duration_s)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out[(1, 1)] == (3, 29 * 60.0)
    assert out[(1, 2)] == (1, 0.0)
    assert out[(2, 1)] == (1, 0.0)


def test_sessionize_same_ts_tiebreak(spark):
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [(i, t0, 1) for i in range(5)],
        "event_id long, ts timestamp, user_id long",
    )
    rows = sessionize(df, gap_minutes=30).collect()
    assert len(rows) == 1 and rows[0].n_events == 5


def test_paragraph_dedup_counts(spark):
    # doc 1: two identical 10-word passages; doc 2 repeats doc 1's passage
    p = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, p + " " + p), (2, p + " k l m n o p q r s t")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_paragraphs, r.n_kept, r.n_removed)
           for r in paragraph_dedup(docs).collect()}
    assert out[1] == (2, 1, 1)     # second copy within doc 1 removed
    assert out[2] == (2, 1, 1)     # doc 2's copy of p removed, own passage kept


def test_quality_gate_flags(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far " * 10
    docs = spark.createDataFrame(
        [(1, good.strip()), (2, "x y"), (3, "zz " * 6)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in quality_gate(docs).collect()}
    assert out[1].passes and out[1].pred_lang == "en"
    assert not out[2].pass_len          # 2 tokens < 5
    assert not out[3].pass_lang         # no stopword markers -> unk
    for r in out.values():
        assert r.passes == (r.pass_lang and r.pass_quality and r.pass_len)


def test_audio_chunk_plan_segments(spark):
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        audio_chunk_plan,
        extract_media_features,
    )

    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"payload-one")), (2, "image", bytearray(b"x"))],
        "media_id long, kind string, content binary",
    )
    dur = {
        r.media_id: r.duration_ms
        for r in extract_media_features(media).collect()
        if r.duration_ms is not None
    }
    segs = audio_chunk_plan(media, chunk_ms=5000).collect()
    assert {r.media_id for r in segs} == {1}  # image rows excluded
    by_idx = sorted((r.seg_idx, r.start_ms, r.end_ms) for r in segs)
    assert by_idx[0][1] == 0
    assert by_idx[-1][2] == dur[1]            # final segment ends at duration
    for i, (idx, start, end) in enumerate(by_idx):
        assert idx == i and start == i * 5000 and end <= start + 5000


def test_stream_dedup_drops_within_watermark(spark, tmp_path):
    from ade_agente_documental_empresarial___miner_a_spark.streaming.chat_stream import (
        dedup_events_stream,
        stream_events,
    )

    src = tmp_path / "events_in"
    src.mkdir(parents=True, exist_ok=True)
    events = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1,
         "event_type": "click", "value": "1", "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T10:05:00.000Z", "user_id": 1,
         "event_type": "click", "value": "2", "props": "{}"},  # dup key
        {"event_id": 3, "ts": "2024-01-01T10:10:00.000Z", "user_id": 2,
         "event_type": "view", "value": "3", "props": "{}"},
    ]
    with open(src / f"b{time.time_ns()}.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    stream = stream_events(spark, str(src))
    deduped = dedup_events_stream(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "select user_id, event_type, count(*) n from dedup_out group by 1, 2"
    ).collect()
    got = {(r.user_id, r.event_type): r.n for r in rows}
    assert got == {(1, "click"): 1, (2, "view"): 1}
