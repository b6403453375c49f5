"""CDC-style streaming upsert sink — latest-per-key state maintained by
``foreachBatch`` merge over snapshot commits.

The batch mirror is the catalog's ``stream_cdc_latest`` (same keys, same
last-write-wins order, same ``n_versions`` changelog depth); this module
is the live path: each micro-batch merges into a NEW parquet snapshot
and an atomically-renamed ``_LATEST`` manifest flips readers to it —
the poor-man's commit log every lakehouse table format (Delta/Iceberg)
formalizes. Reading the previous snapshot while writing a new directory
avoids the read-overwrite-same-path hazard entirely; failed batches
leave the manifest pointing at the last good snapshot (foreachBatch
retries re-merge idempotently because the merge is deterministic in
(ts, event_id)).

Scale: the merge shuffles on the upsert key — the same partitioning the
state store would use; snapshot size is bounded by live key cardinality,
not stream length. Old snapshots are pruned after the manifest flip.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

UPSERT_KEYS = ("user_id", "event_type")


def _merge_latest(pseudo: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """(key..., value, ts, event_id, weight) → latest row per key with
    summed changelog depth. Last write wins by (ts, event_id) — the same
    total order the batch mirror ranks on."""
    w = Window.partitionBy(*keys).orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy(*keys)
    return (
        pseudo.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.sum("weight").over(wc).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            *keys,
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            "n_versions",
        )
    )


def cdc_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current upsert state, or None before the first commit."""
    manifest = os.path.join(state_dir, "_LATEST")
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        snap = f.read().strip()
    return spark.read.parquet(os.path.join(state_dir, snap))


def _commit(merged: DataFrame, state_dir: str, batch_id: int) -> None:
    snap = f"snap_{batch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, snap))
    tmp = os.path.join(state_dir, "_LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(snap)
    os.replace(tmp, os.path.join(state_dir, "_LATEST"))
    for d in os.listdir(state_dir):
        if d.startswith("snap_") and d != snap:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)


def cdc_upsert_query(
    stream: DataFrame,
    state_dir: str,
    keys: tuple[str, ...] = UPSERT_KEYS,
):
    """writeStream builder whose foreachBatch merges each micro-batch
    into the snapshot state. Caller adds trigger/checkpoint and starts."""

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        incoming = batch.select(
            *keys, "value", "ts", "event_id", F.lit(1).alias("weight")
        )
        cur = cdc_state(spark, state_dir)
        if cur is not None:
            prev = cur.select(
                *keys,
                F.col("last_value").alias("value"),
                F.col("last_ts").alias("ts"),
                F.col("last_event_id").alias("event_id"),
                F.col("n_versions").alias("weight"),
            )
            incoming = prev.unionByName(incoming)
        _commit(_merge_latest(incoming, keys), state_dir, batch_id)

    return stream.writeStream.foreachBatch(merge)
