"""Streaming throughput decade (VERDICT r9 task 6, docs/SCALING.md).

Batch decades exist (500k dedup, 1M IVF, 10M pagerank, 100k media);
this records the STREAMING side: sustained rows/sec through the
stateful paths at 10k -> 100k -> 1M input events, each fed as many
JSON arrival files so the run spans real micro-batches, plus a
checkpoint kill/restart mid-stream proving exactly-once resume.

Paths measured (all availableNow, local[8]):
- session_state : applyInPandasWithState keyed by user_id (the
  ConversationBufferMemory analogue) -> memory sink
- stream_dedup  : withWatermark + dropDuplicatesWithinWatermark
  (bounded state) -> noop-equivalent count via memory sink
- media_decode  : foreachBatch synth -> real BMP/WAV payload decode ->
  idempotent batch_id=N parquet (streaming/ingest.py)
- recovery      : session_state run killed after ~half the arrival
  files, restarted from the same checkpoint; final per-user totals
  must equal a single uninterrupted pass (exactly-once state).

transformWithStateInPandas is measured in the correctness suite only:
its Python worker needs google.protobuf, absent in this container
(documented env gate, tests/test_streaming.py).

Usage: python tools/scale_streaming.py [--sizes 10000,100000,1000000]
Prints one JSON line per (path, size) with rows/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


N_USERS = 2000
N_FILES = 16


def gen_arrivals(workdir: str, n_rows: int, n_files: int = N_FILES) -> str:
    """n_rows events as n_files JSON-lines files (Zipf-ish hot user)."""
    src = os.path.join(workdir, f"arrivals_{n_rows}")
    os.makedirs(src, exist_ok=True)
    per = n_rows // n_files
    etypes = ["click", "view", "purchase", "error"]
    row_id = 0
    for b in range(n_files):
        with open(os.path.join(src, f"b{b:03d}.json"), "w") as fh:
            for i in range(per):
                uid = 3 if (row_id * 2654435761) % 100 < 60 else (
                    (row_id * 40503) % N_USERS
                )
                ts = f"2024-01-01T{(row_id // 3600) % 24:02d}:" \
                     f"{(row_id // 60) % 60:02d}:{row_id % 60:02d}.000Z"
                fh.write(json.dumps({
                    "event_id": row_id,
                    "ts": ts,
                    "user_id": uid,
                    "event_type": etypes[row_id % 4],
                    "value": str(row_id % 97),
                    "props": "{}",
                }) + "\n")
                row_id += 1
    return src


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName("scale-streaming")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_session_state(spark, src: str, ckpt: str, name: str) -> int:
    from ade_agente_documental_empresarial___miner_a_spark.streaming.chat_stream import (
        stateful_session_state,
        stream_events,
    )

    out = stateful_session_state(
        stream_events(spark, src, max_files_per_trigger=4)
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT count(DISTINCT user_id) AS n FROM {name}"
    ).collect()[0].n


def run_dedup(spark, src: str, ckpt: str, name: str) -> int:
    from ade_agente_documental_empresarial___miner_a_spark.streaming.chat_stream import (
        dedup_events_stream,
        stream_events,
    )

    out = dedup_events_stream(
        stream_events(spark, src, max_files_per_trigger=4)
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n


def run_media(spark, workdir: str, n_docs: int) -> int:
    from ade_agente_documental_empresarial___miner_a_spark.streaming.ingest import (
        incremental_media_stats,
        stream_documents,
    )

    src = os.path.join(workdir, f"docs_{n_docs}")
    os.makedirs(src, exist_ok=True)
    per = n_docs // 8
    did = 0
    for b in range(8):
        with open(os.path.join(src, f"d{b}.json"), "w") as fh:
            for _ in range(per):
                fh.write(json.dumps({
                    "doc_id": did,
                    "text": f"doc {did} payload text body {did % 31}",
                    "lang": "en", "source": "s",
                }) + "\n")
                did += 1
    stats = os.path.join(workdir, f"stats_{n_docs}")
    q = incremental_media_stats(
        stream_documents(spark, src, max_files_per_trigger=2),
        stats,
        os.path.join(workdir, f"media_ckpt_{n_docs}"),
    )
    q.awaitTermination()
    return spark.read.parquet(stats).count()


def run_recovery(spark, src: str, workdir: str) -> dict:
    """Kill session_state after ~half the files, restart from the same
    checkpoint, compare final totals against one uninterrupted pass."""
    from ade_agente_documental_empresarial___miner_a_spark.streaming.chat_stream import (
        stateful_session_state,
        stream_events,
    )

    ckpt = os.path.join(workdir, "rec_ckpt")
    sink = os.path.join(workdir, "rec_sink")

    # memory sinks cannot resume from a checkpoint, so the recovery leg
    # uses the engine's idempotent foreachBatch layout (batch_id=N
    # overwrite — streaming/ingest.py discipline): a replayed batch
    # after the kill REPLACES its own directory
    def upsert(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink, f"batch_id={batch_id}")
        )

    def start(trigger_kwargs):
        return (
            stateful_session_state(
                stream_events(spark, src, max_files_per_trigger=1)
            )
            .writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q = start({"processingTime": "0 seconds"})
    deadline = time.time() + 120
    while time.time() < deadline:
        if len(q.recentProgress) >= N_FILES // 2:
            break
        time.sleep(0.2)
    q.stop()  # crash point: state checkpointed for some prefix of files
    n_before = len(q.recentProgress)

    q2 = start({"availableNow": True})
    q2.awaitTermination()
    # latest update per user across all written batches = final state
    rows = spark.read.parquet(sink)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_turns").desc())
    final = (
        rows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    )
    got = {r.user_id: (r.n_turns, r.total_value) for r in final}

    # ground truth: one batch pass over the same files
    ev = spark.read.json(src)
    truth = {
        r.user_id: (r.n, r.v)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("long")).alias("v"),
        )
        .collect()
    }
    n_bad = sum(1 for u, t in truth.items() if got.get(u) != t)
    return {
        "batches_before_kill": n_before,
        "users": len(truth),
        "mismatched_users": n_bad,
        "exact": n_bad == 0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="scale_streaming_")
    results = []
    try:
        for n in sizes:
            src = gen_arrivals(workdir, n)
            for path, fn in [
                ("session_state", run_session_state),
                ("stream_dedup", run_dedup),
            ]:
                ckpt = os.path.join(workdir, f"{path}_{n}_ckpt")
                name = f"{path}_{n}"
                t0 = time.time()
                out_n = fn(spark, src, ckpt, name)
                dt = time.time() - t0
                rec = {"path": path, "rows": n, "sec": round(dt, 2),
                       "rows_per_sec": int(n / dt), "out_rows": out_n}
                print(json.dumps(rec))
                results.append(rec)
            # media decodes documents, scale by /10 (payloads are ~KB)
            n_docs = max(80, n // 10)
            t0 = time.time()
            out_n = run_media(spark, workdir, n_docs)
            dt = time.time() - t0
            rec = {"path": "media_decode", "rows": n_docs,
                   "sec": round(dt, 2), "rows_per_sec": int(n_docs / dt),
                   "out_rows": out_n}
            print(json.dumps(rec))
            results.append(rec)
        # recovery on the middle size
        src = gen_arrivals(workdir, sizes[min(1, len(sizes) - 1)])
        rec = run_recovery(spark, src, workdir)
        rec["path"] = "recovery"
        print(json.dumps(rec))
        results.append(rec)
        return 0 if rec.get("exact") else 1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
