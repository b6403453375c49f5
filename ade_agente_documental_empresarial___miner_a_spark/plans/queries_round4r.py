"""Round-4 catalog additions, eighteenth batch — maintenance jobs a
100 TB deployment actually schedules:

* incremental materialized-view maintenance (merge yesterday's MV state
  with today's delta instead of recomputing the history — legal exactly
  because the agg state is mergeable: counts and DECIMAL sums);
* corrupt-record ingestion (PERMISSIVE JSON with _corrupt_record
  capture: count, quarantine, and keep going — a 100 TB feed always
  contains garbage lines and a full-stop parser is an outage);
* GDPR deletion (the "right to be forgotten" rewrite: anti-join the
  forget-set, dynamically overwrite ONLY the partitions that contained
  it — sibling partitions survive byte-for-byte).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import halfup_mean, halfup_mean_duck
from .catalog import DUCK_EVENTS, events_table, register, table

_MV_SPLIT = "2024-01-20"


# ---------------------------------------------------------------------------
# Incremental MV maintenance — the nightly pattern: the MV over history
# (ts < split) is already materialized; today's delta (ts >= split)
# aggregates alone, and the new MV is a per-key MERGE of the two states
# (full outer join, coalesce-sum). This is only correct because the
# state is mergeable — count and DECIMAL sum are; avg/median are not
# (they must be derived from mergeable parts, as here: the final avg
# divides the merged sum once). The oracle recomputes from scratch, so
# parity IS the merge-equals-recompute theorem instance. At 100 TB the
# delta is 3 orders of magnitude smaller than the history — this is the
# difference between a 5-minute and a 10-hour nightly job.
@register(
    "rel_incremental_mv",
    f"""WITH {DUCK_EVENTS}
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       {halfup_mean_duck("sum(CAST(value AS DECIMAL(18,6)))",
                         "count(*)", 9)} AS avg_value
FROM ev GROUP BY event_type""",
)
def rel_incremental_mv(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select(
        "event_type",
        "ts",
        F.col("value").cast("decimal(18,6)").alias("vd"),
    )
    split = F.lit(_MV_SPLIT).cast("timestamp")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vd").alias("s"),
        )

    base = state(ev.where(F.col("ts") < split))
    delta = state(ev.where(F.col("ts") >= split))
    merged = (
        base.alias("b")
        .join(
            delta.alias("d"),
            F.col("b.event_type") == F.col("d.event_type"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("b.event_type"), F.col("d.event_type")).alias(
                "event_type"
            ),
            (
                F.coalesce(F.col("b.n"), F.lit(0))
                + F.coalesce(F.col("d.n"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(18,6)"))
            ).alias("s"),
        )
    )
    # avg_value is a round(sum/count) mean over an exact-decimal fold —
    # integer-exact HALF_UP (ROUND8 §12 class; r9 audit catch)
    return merged.select(
        "event_type",
        "n_events",
        F.col("s").cast("double").alias("total_value"),
        halfup_mean("s", "n_events", 9).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Corrupt-record ingestion — PERMISSIVE mode with _corrupt_record: good
# lines parse, bad lines land whole in the corrupt column, the job
# keeps going and REPORTS. The fixture file is deterministic (built
# from constants, not fixtures), so the oracle states the expected
# outcome as literals — the entry certifies Spark's permissive-parse
# behavior against an independently computed ground truth. Note the
# documented Spark restriction: a query may not reference ONLY the
# corrupt column; the entry aggregates data+corrupt together from a
# cached parse, which is also the practical shape (quarantine writer +
# metrics in one pass).
_GOOD_ROWS = [(i, i * 10) for i in range(40)]
_BAD_LINES = [
    '{"id": 777, "v": }',          # syntax error
    "not json at all",             # not an object
    '{"id": "x9", "v": "NaNish"}',  # type mismatch on both fields
]


def _corrupt_file(sf: str) -> str:
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"ade_corrupt_{os.path.basename(os.path.normpath(sf))}",
    )
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, "feed.jsonl")
    if not os.path.exists(path):
        lines = [
            f'{{"id": {i}, "v": {v}}}' for i, v in _GOOD_ROWS
        ]
        # interleave deterministically: one bad line after every 13 good
        out = []
        bi = 0
        for n, line in enumerate(lines):
            out.append(line)
            if (n + 1) % 13 == 0 and bi < len(_BAD_LINES):
                out.append(_BAD_LINES[bi])
                bi += 1
        out.extend(_BAD_LINES[bi:])
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
    return path


@register(
    "s17_corrupt_records",
    f"""SELECT CAST({len(_GOOD_ROWS)} AS BIGINT) AS n_good,
       CAST({len(_BAD_LINES)} AS BIGINT) AS n_corrupt,
       CAST({sum(v for _, v in _GOOD_ROWS)} AS BIGINT) AS good_value_sum""",
)
def s17_corrupt_records(spark: SparkSession, sf: str) -> DataFrame:
    path = _corrupt_file(sf)
    parsed = (
        spark.read.schema("id long, v long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    # '{"id": "x9", ...}' type-mismatches: id stays null AND the raw
    # line is captured — it counts as corrupt, like the syntax errors.
    return parsed.agg(
        F.count(F.col("id")).alias("n_good"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum("v").alias("good_value_sum"),
    )


# ---------------------------------------------------------------------------
# GDPR deletion — the "right to be forgotten" against an immutable
# lake: you cannot update parquet in place, so deletion = anti-join the
# forget-set and DYNAMICALLY overwrite only the partitions that held
# its rows; every other partition survives byte-for-byte (file-listing
# test-pinned). At 100 TB this is why lakes partition/cluster on the
# deletion subject where feasible: the rewrite cost is proportional to
# the touched partitions, not the table. The entry runs the full
# delete → read-back pipeline; the oracle states the survivor set
# directly, so a row deleted too many/few times breaks parity.
_FORGET_MOD, _FORGET_REM = 97, 13


def _gdpr_dirs(sf: str) -> str:
    import tempfile

    from .queries_round4 import _source_tag

    # keyed on the fixture's identity: a regenerated testdata file must
    # rebuild the lake rather than serve a stale deleted copy
    return os.path.join(
        tempfile.gettempdir(),
        f"ade_gdpr_{_source_tag(sf, 'documents')}",
    )


def gdpr_delete(
    spark: SparkSession, lake: str, forget, partition_col: str
) -> None:
    """Delete ``forget`` rows from the hive-partitioned parquet lake at
    ``lake``, rewriting ONLY the partitions that contain them (dynamic
    partition overwrite); untouched sibling partitions keep their files
    byte-for-byte."""
    from .queries_round4m import _dynamic_overwrite

    current = spark.read.parquet(lake)
    touched = current.where(forget).select(partition_col).distinct()
    survivors = current.join(
        F.broadcast(touched), partition_col, "left_semi"
    ).where(~forget)
    with _dynamic_overwrite(spark):
        (
            survivors.repartition(partition_col)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(lake)
        )


@register(
    "cur_gdpr_delete",
    f"""SELECT source, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM documents
WHERE NOT (doc_id % {_FORGET_MOD} = {_FORGET_REM})
GROUP BY source""",
)
def cur_gdpr_delete(spark: SparkSession, sf: str) -> DataFrame:
    lake = _gdpr_dirs(sf)
    docs = table(spark, sf, "documents")
    if not os.path.exists(os.path.join(lake, "_SUCCESS")):
        (
            docs.repartition("source")
            .write.mode("overwrite")
            .partitionBy("source")
            .parquet(lake)
        )
    forget = F.col("doc_id") % _FORGET_MOD == _FORGET_REM
    gdpr_delete(spark, lake, forget, partition_col="source")
    after = spark.read.parquet(lake)
    return after.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum("n_chars").cast("long").alias("chars_sum"),
    )
