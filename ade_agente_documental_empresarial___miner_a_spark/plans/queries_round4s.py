"""Round-4 catalog additions, nineteenth batch — temporal-dimension
correctness and training-mix mechanics:

* SCD2 point-in-time join (the warehouse fact→dimension temporal join:
  each fact row sees the dimension version valid AT ITS EVENT TIME,
  never today's — joining on the raw key silently time-travels
  attributes);
* deterministic epoch shuffle (reproducible global training order
  without RNG: hash(doc, epoch) IS the permutation, shard assignment is
  map-only — re-running epoch 3 anywhere yields byte-identical shards);
* mixture sampling weights (data-mixing: per-language sampling rates
  that hit a uniform token target without upsampling, the single-step
  DoReMi-style reweighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table

_DUCK_EV = (
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value FROM events)"
)


# ---------------------------------------------------------------------------
# SCD2 point-in-time join — compose the rel_scd2_history construction
# (click events as attribute versions with [valid_from, valid_to)
# intervals) with the purchase fact stream: each purchase joins the
# version valid at ITS timestamp. The interval set partitions time per
# user, so at most one version matches — the join is 1:≤1 by
# construction, and purchases before any version null-extend. At 100 TB
# this runs as the as-of family (sort-merge within user partitions,
# rel_asof_join / rel_asof_cogrouped); the range-predicate join here is
# the oracle-exact statement of the same semantics.
@register(
    "rel_scd2_pit_join",
    f"""WITH {_DUCK_EV},
dim AS (
  SELECT user_id, value AS attr_value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT)
           AS version
  FROM ev WHERE event_type = 'click'),
facts AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM ev WHERE event_type = 'purchase')
SELECT f.purchase_id, f.user_id,
       d.version AS attr_version,
       round(CAST(d.attr_value AS DOUBLE) * 1e9) / 1e9 AS attr_value
FROM facts f LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.p_ts
 AND (d.valid_to IS NULL OR f.p_ts < d.valid_to)""",
)
def rel_scd2_pit_join(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from .catalog import events_table

    ev = events_table(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", "value", "ts", "event_id")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("value").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
        )
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("p_ts"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to")))
    )
    return facts.join(dim, cond, "left").select(
        "purchase_id",
        "user_id",
        F.col("version").alias("attr_version"),
        dblround(F.col("attr_value").cast("double"), 9).alias(
            "attr_value"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle — a training run needs a DIFFERENT global
# order each epoch that is nonetheless REPRODUCIBLE on any cluster:
# md5(doc_id:epoch) is the permutation key (no RNG state anywhere), the
# shard is a map-only hash bucket (no global sort, no rank — the rank
# form would serialize 100 TB through one window), and the within-shard
# order is the key itself, consumed by the data loader as written.
# Changing _EPOCH re-deals every shard deterministically. min_by breaks
# no ties (md5 keys are unique on unique doc_ids).
_EPOCH = 3
_N_SHARDS = 8


@register(
    "cur_epoch_shuffle",
    f"""WITH keyed AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':' || '{_EPOCH}') AS k
  FROM documents)
SELECT CAST(CAST(('0x' || substr(k, 1, 6)) AS INTEGER)
            % {_N_SHARDS} AS INT) AS shard,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       arg_min(doc_id, k) AS lead_doc
FROM keyed GROUP BY shard""",
)
def cur_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(_EPOCH))
        ).alias("k"),
    )
    shard = (
        F.conv(F.substring("k", 1, 6), 16, 10).cast("int") % _N_SHARDS
    ).cast("int")
    return keyed.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.min_by("doc_id", "k").alias("lead_doc"),
    )


# ---------------------------------------------------------------------------
# Mixture sampling weights — the data-mixing step: given available
# tokens per language and a UNIFORM target mix, the sampling rate is
# min(1, target/available) — languages above their share downsample,
# languages below keep everything (single-step: no redistribution of
# the shortfall, which keeps the arithmetic one deterministic double op
# per group; iterative water-filling is the documented extension).
# Token counts are exact integers; only the final rate/expectation are
# doubles, computed in one identical expression on both engines.
@register(
    "cur_mixture_weights",
    f"""WITH avail AS (
  SELECT lang,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS n_langs,
         CAST(sum(n_tokens) AS BIGINT) AS ti,
         CAST(count(*) AS BIGINT) AS li
  FROM avail)
SELECT lang, n_tokens,
       least(1.0, {halfup_ratio_duck("ti", "li * n_tokens", 9)})
         AS sampling_rate,
       CAST(floor(n_tokens * least(1.0, (total / n_langs) / n_tokens))
            AS BIGINT) AS expected_tokens
FROM avail CROSS JOIN tot""",
)
def cur_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " ", -1)))
        .cast("long")
        .alias("n_tokens")
    )
    tot = avail.agg(
        F.sum("n_tokens").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_langs"),
        F.sum("n_tokens").alias("ti"),
        F.count(F.lit(1)).alias("li"),
    )
    rate = F.least(
        F.lit(1.0), (F.col("total") / F.col("n_langs")) / F.col("n_tokens")
    )
    return avail.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        # integer-exact HALF_UP rate (ROUND8 §12 class; r9 audit)
        F.least(
            F.lit(1.0), halfup_ratio("ti", "li * n_tokens", 9)
        ).alias("sampling_rate"),
        F.floor(F.col("n_tokens") * rate).cast("long").alias(
            "expected_tokens"
        ),
    )
