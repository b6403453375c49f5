"""Event-time BOUNDARY pins for the live streaming paths (SURVEY §2.9).

test_streaming.py covers the machinery (sources, checkpoints, state);
these tests pin the exact EDGE rules a 100 TB event pipeline silently
depends on, each verified live through a real streaming query:

- tumbling windows: start-inclusive / end-exclusive — a row whose ts is
  exactly a boundary belongs to the window STARTING there;
- the watermark drops a straggler iff its ts is STRICTLY older — a row
  exactly AT the persisted watermark is kept;
- session windows merge when they touch: an event exactly at
  last_ts + gap CONTINUES the session (Spark coalesces
  touching-or-overlapping [ts, ts+gap) intervals), one microsecond
  later starts a new one;
- microsecond-tied events all count (no dedup-by-timestamp anywhere).

Determined empirically on this engine build, then pinned — a Spark
upgrade that flips any of these rules breaks real pipelines and should
fail loudly here first.
"""

import json
import os
import time
from datetime import timezone

from ade_agente_documental_empresarial___miner_a_spark.streaming.chat_stream import (
    session_metrics,
    stream_events,
    tumbling_metrics,
)


def ts_str(dt) -> str:
    """UTC rendering of a collected timestamp (host-TZ-independent)."""
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")


_last_write_ns = 0


def write_events(dirpath, events):
    """Mtime-ordered micro-batch file (same discipline as
    test_streaming.write_events: the file source orders by ms-truncated
    mtime, so consecutive writes are forced >= 2 ms apart)."""
    global _last_write_ns
    dirpath.mkdir(parents=True, exist_ok=True)
    ns = max(time.time_ns(), _last_write_ns + 2_000_000)
    _last_write_ns = ns
    p = dirpath / f"batch_{ns}.json"
    with open(p, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.utime(p, ns=(ns, ns))


def ev(i, ts, user=1, etype="click"):
    return {"event_id": i, "ts": ts, "user_id": user,
            "event_type": etype, "value": "1", "props": "{}"}


def _run_memory(spark, agg, name):
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}").collect()


def test_tumbling_boundary_start_inclusive_end_exclusive(spark, tmp_path):
    src = tmp_path / "bnd_tumbling"
    write_events(src, [
        ev(1, "2024-01-01T10:00:00.000Z"),          # exactly window start
        ev(2, "2024-01-01T10:59:59.999Z"),          # last µs-ish of window
        ev(3, "2024-01-01T11:00:00.000Z"),          # exactly next start
    ])
    agg = tumbling_metrics(
        stream_events(spark, str(src)), window="1 hour", watermark="2 hours"
    )
    rows = {
        ts_str(r.window_start): r.n_events
        for r in _run_memory(spark, agg, "bnd_tumbling_out")
    }
    # start inclusive (events 1+2 in 10h), end exclusive (event 3 in 11h)
    assert rows == {
        "2024-01-01 10:00:00.000000": 2,
        "2024-01-01 11:00:00.000000": 1,
    }


def test_straggler_exactly_at_watermark_is_kept(spark, tmp_path):
    """Spark's late-row rule is STRICT inequality: dropped iff
    ts < watermark. Run 1 persists watermark = max(ts) − 2 h = 10:00;
    run 2 delivers one row exactly AT 10:00 (kept, counted in the 10 h
    window) and one at 09:59:59.999 (dropped — its 09:00 window never
    finalizes with a row); run 3 advances the watermark past every
    window end so append mode finalizes them."""
    src = tmp_path / "bnd_wm"
    out = str(tmp_path / "bnd_wm_out")
    ckpt = str(tmp_path / "bnd_wm_ckpt")

    def run_once():
        agg = tumbling_metrics(
            stream_events(spark, str(src)), window="1 hour",
            watermark="2 hours",
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
                if not df.isEmpty()
                else None
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_events(src, [ev(1, "2024-01-01T12:00:00.000Z")])  # wm → 10:00
    run_once()
    write_events(src, [
        ev(2, "2024-01-01T10:00:00.000Z"),      # ts == watermark: kept
        ev(3, "2024-01-01T09:59:59.999Z"),      # ts < watermark: dropped
    ])
    run_once()
    write_events(src, [ev(4, "2024-01-01T15:00:00.000Z")])  # wm → 13:00
    run_once()

    finalized = {
        ts_str(r.window_start): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert finalized.get("2024-01-01 10:00:00.000000") == 1   # the == row
    assert "2024-01-01 09:00:00.000000" not in finalized      # the < row
    assert finalized.get("2024-01-01 12:00:00.000000") == 1


def test_session_gap_boundary_touching_merges(spark, tmp_path):
    """Session windows coalesce touching-or-overlapping [ts, ts+gap)
    intervals: an event exactly at last_ts + gap CONTINUES the session;
    one microsecond past the gap starts a new one."""
    src = tmp_path / "bnd_sess"
    write_events(src, [
        # user 1: 10:00 then exactly +gap → ONE session of 2
        ev(1, "2024-01-01T10:00:00.000Z", user=1),
        ev(2, "2024-01-01T11:00:00.000Z", user=1),
        # user 2: 10:00 then gap + 1 ms → TWO sessions
        ev(3, "2024-01-01T10:00:00.000Z", user=2),
        ev(4, "2024-01-01T11:00:00.001Z", user=2),
    ])
    agg = session_metrics(
        stream_events(spark, str(src)), gap="1 hour", watermark="1 day"
    )
    rows = {
        (r.user_id, ts_str(r.session_start)): r.n_events
        for r in _run_memory(spark, agg, "bnd_sess_out")
    }
    assert rows[(1, "2024-01-01 10:00:00.000000")] == 2
    assert rows[(2, "2024-01-01 10:00:00.000000")] == 1
    assert rows[(2, "2024-01-01 11:00:00.001000")] == 1


def test_tied_microsecond_events_all_count(spark, tmp_path):
    """Identical event-time timestamps are ordinary rows everywhere —
    n tied events count n in their window AND inside one session."""
    src = tmp_path / "bnd_ties"
    tied = "2024-01-01T10:30:00.000Z"
    write_events(src, [
        ev(1, tied, user=1), ev(2, tied, user=1),
        ev(3, tied, user=1), ev(4, tied, user=2),
    ])
    tumb = tumbling_metrics(
        stream_events(spark, str(src)), window="1 hour", watermark="2 hours"
    )
    trows = {
        ts_str(r.window_start): r.n_events
        for r in _run_memory(spark, tumb, "bnd_ties_tumb")
    }
    assert trows == {"2024-01-01 10:00:00.000000": 4}

    sess = session_metrics(
        stream_events(spark, str(src)), gap="1 hour", watermark="1 day"
    )
    srows = {
        (r.user_id, ts_str(r.session_start)): r.n_events
        for r in _run_memory(spark, sess, "bnd_ties_sess")
    }
    assert srows == {
        (1, "2024-01-01 10:30:00.000000"): 3,
        (2, "2024-01-01 10:30:00.000000"): 1,
    }
