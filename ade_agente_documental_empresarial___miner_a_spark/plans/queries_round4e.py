"""Round-4 catalog additions, fifth batch — distributed linear algebra
(top principal component via matrix-free power iteration), pointwise
mutual information over the corpus co-occurrence graph, and z-score
anomaly detection over hourly event counts.

Parity discipline: every fold-order-sensitive float sum is quantized
round(·,12) then summed as DECIMAL (the PageRank recipe — proven to keep
an ITERATIVE recurrence bit-identical across engines); ln() results are
round(·,9); variance/mean expressions are written with one fixed
operation order on both engines over exact integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table

_DIM = 64
_PCA_ITERS = 2


# ---------------------------------------------------------------------------
# Top principal component, matrix-free power iteration: v <- X'(Xv),
# normalized — never materializes the 64x64 covariance (at 100 TB the
# Gram matrix accumulation would be one giant shuffle of d² cells; the
# matrix-free form is two co-partitioned joins per iteration, each
# O(N·d) map work, with the d-vector riding a broadcast). Start vector
# is the exact double 1/8 per position (uniform unit vector — 1/sqrt(64)
# is exactly representable, so iteration 0 is bit-clean on both
# engines). Two unrolled iterations; each dot/sum uses the quantize-
# then-decimal-fold recipe, so the whole recurrence is engine-exact.
# NOTE: mean-centering is deliberately omitted (the hashing embedder
# output is near-centered); this is the dominant-direction extractor,
# the building block under PCA/pq codebook drift monitoring.
def _pca_sql() -> str:
    parts = [
        f"""e AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) - 1 AS j,
         CAST(unnest(embedding) AS DOUBLE) AS xij
  FROM embeddings),
v0 AS (SELECT unnest(generate_series(0, {_DIM - 1})) AS j,
              CAST(0.125 AS DOUBLE) AS vj)"""
    ]
    for i in range(1, _PCA_ITERS + 1):
        parts.append(
            f"""s{i} AS (
  SELECT vec_id,
         CAST(sum(CAST(round(xij * vj * 1e12) / 1e12
                       AS DECIMAL(26,12))) AS DOUBLE)
           AS s
  FROM e JOIN v{i - 1} USING (j) GROUP BY vec_id),
w{i} AS (
  SELECT j,
         CAST(sum(CAST(round(xij * s * 1e12) / 1e12
                       AS DECIMAL(26,12))) AS DOUBLE)
           AS w
  FROM e JOIN s{i} USING (vec_id) GROUP BY j),
n{i} AS (
  SELECT sqrt(CAST(sum(CAST(round(w * w * 1e12) / 1e12
                        AS DECIMAL(30,12)))
              AS DOUBLE)) AS nrm
  FROM w{i}),
v{i} AS (SELECT j, round((w / nrm) * 1e12) / 1e12 AS vj
         FROM w{i} CROSS JOIN n{i})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(j AS BIGINT) AS pos, vj AS loading FROM v{_PCA_ITERS}"""
    )


@register("emb_pca_power", _pca_sql())
def emb_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    e = emb.select("vec_id", F.posexplode("x").alias("j", "xij"))
    v = spark.range(_DIM).select(
        F.col("id").alias("j"), F.lit(0.125).alias("vj")
    )
    for _ in range(_PCA_ITERS):
        s = (
            e.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(
                F.sum(
                    dblround(F.col("xij") * F.col("vj"), 12).cast(
                        "decimal(26,12)"
                    )
                )
                .cast("double")
                .alias("s")
            )
        )
        w = (
            e.join(s, "vec_id")
            .groupBy("j")
            .agg(
                F.sum(
                    dblround(F.col("xij") * F.col("s"), 12).cast(
                        "decimal(26,12)"
                    )
                )
                .cast("double")
                .alias("w")
            )
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(
                    dblround(F.col("w") * F.col("w"), 12).cast(
                        "decimal(30,12)"
                    )
                ).cast("double")
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm)).select(
            "j", dblround(F.col("w") / F.col("nrm"), 12).alias("vj")
        )
    return v.select(
        F.col("j").cast("long").alias("pos"), F.col("vj").alias("loading")
    )


# ---------------------------------------------------------------------------
# PMI co-occurrence — the corpus association measure under word
# embeddings and collocation mining: for word pairs sharing a document,
# pmi = ln(df_xy · N / (df_x · df_y)) over PRESENCE counts. The pair
# join is per-document (distinct words self-joined within doc_id) —
# bounded by per-doc vocabulary, never the global vocab square; df
# floors (pair df >= 5) keep noise pairs out. All ln() arguments are
# exact small-integer ratios; the surfaced pmi is round(·,9).
@register(
    "text_pmi_pairs",
    """WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
df AS (SELECT w, count(*) AS dfw FROM tok GROUP BY w),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS df_xy
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= 5)
SELECT w1, w2, CAST(df_xy AS BIGINT) AS df_xy,
       round(ln(df_xy * n_docs / (d1.dfw * d2.dfw)) * 1e9) / 1e9 AS pmi
FROM pairs
JOIN df d1 ON pairs.w1 = d1.w
JOIN df d2 ON pairs.w2 = d2.w
CROSS JOIN n""",
)
def text_pmi_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).distinct()
    n = docs.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("dfw"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("df_xy"))
        .where(F.col("df_xy") >= 5)
    )
    d1 = df.select(F.col("w").alias("w1"), F.col("dfw").alias("df1"))
    d2 = df.select(F.col("w").alias("w2"), F.col("dfw").alias("df2"))
    return (
        pairs.join(d1, "w1")
        .join(d2, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("df_xy").cast("long").alias("df_xy"),
            dblround(
                F.log(
                    F.col("df_xy")
                    * F.col("n_docs")
                    / (F.col("df1") * F.col("df2"))
                ),
                9,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Hourly anomaly z-scores — the monitoring query over the event stream's
# materialized hourly counts: hours whose count deviates >= 2 sigma from
# that event type's mean. Mean/variance come from EXACT integer sums
# (count, sum, sum-of-squares are all BIGINT), so the only float work is
# the final fixed-order expression — identical text on both engines —
# and the z-score is round(·,9). At scale this runs over the streaming
# aggregate's sink (750 rows per month per type), not the raw events.
@register(
    "stream_anomaly_hours",
    f"""WITH {DUCK_EVENTS},
c AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS cnt
  FROM ev GROUP BY event_type, hr),
st AS (
  SELECT event_type,
         count(*) AS n_hours,
         sum(cnt) AS s1,
         sum(cnt * cnt) AS s2
  FROM c GROUP BY event_type)
SELECT c.event_type, c.hr, CAST(c.cnt AS BIGINT) AS cnt,
       round(((c.cnt - CAST(s1 AS DOUBLE) / n_hours)
             / sqrt(CAST(s2 AS DOUBLE) / n_hours
                    - (CAST(s1 AS DOUBLE) / n_hours)
                      * (CAST(s1 AS DOUBLE) / n_hours))) * 1e9) / 1e9
         AS zscore
FROM c JOIN st ON c.event_type = st.event_type
WHERE s2 * n_hours > s1 * s1
  AND abs((c.cnt - CAST(s1 AS DOUBLE) / n_hours)
          / sqrt(CAST(s2 AS DOUBLE) / n_hours
                 - (CAST(s1 AS DOUBLE) / n_hours)
                   * (CAST(s1 AS DOUBLE) / n_hours))) >= 2.0""",
)
def stream_anomaly_hours(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    st = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = F.col("s2").cast("double") / F.col("n_hours") - mean * mean
    z = (F.col("cnt") - mean) / F.sqrt(var)
    return (
        c.join(st, "event_type")
        .where(
            (F.col("s2") * F.col("n_hours") > F.col("s1") * F.col("s1"))
            & (F.abs(z) >= 2.0)
        )
        .select(
            "event_type",
            "hr",
            F.col("cnt").cast("long").alias("cnt"),
            dblround(z, 9).alias("zscore"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram — the two-pass binning pattern: pass 1 reduces to
# a 1-row (min, max) frame (broadcast, never collected to the driver);
# pass 2 assigns bins map-side and aggregates 20 keys. The bin
# expression is written once, identically, for both engines: floor on a
# deterministic double ratio, clamped so value == max lands in the top
# bin. Value mass per bin rides DECIMAL(18,2).
@register(
    "rel_value_histogram",
    """WITH st AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
SELECT CAST(least(floor(coalesce((value - vmin)
                                 / nullif((vmax - vmin) / 20.0, 0.0),
                                 0.0)), 19.0)
            AS BIGINT) AS bin,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_mass
FROM events CROSS JOIN st
GROUP BY bin""",
)
def rel_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select("value")
    st = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    # nullif+coalesce: a ZERO-RANGE column (vmax == vmin — e.g. one
    # constant measure) has bin width 0; the unguarded ratio is 0/0 —
    # ANSI aborts the job, DuckDB NULLs (parity_fuzz const profile).
    # Pinning the ratio to 0 puts all mass in bin 0 on BOTH engines and
    # is value-neutral whenever the range is nonzero.
    binned = ev.crossJoin(F.broadcast(st)).select(
        F.least(
            F.floor(
                F.coalesce(
                    (F.col("value") - F.col("vmin"))
                    / F.nullif(
                        (F.col("vmax") - F.col("vmin")) / 20.0,
                        F.lit(0.0),
                    ),
                    F.lit(0.0),
                )
            ),
            F.lit(19.0),
        )
        .cast("long")
        .alias("bin"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_mass"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill — the hypertable staple (TimescaleDB
# time_bucket_gapfill / locf): materialize the COMPLETE hourly grid per
# event type from a 1-row bounds frame, left-join the observed hourly
# aggregate, and forward-fill value mass with the last observation
# (hours before a type's first observation stay NULL — no fabricated
# data). Grid generation is a broadcast explode (bounded by the time
# span, independent of event volume); the fill is one per-type ordered
# window — the same partitioning the hourly aggregate already has.
@register(
    "rel_gap_fill",
    f"""WITH {DUCK_EVENTS},
c AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,2))) AS vm
  FROM ev GROUP BY event_type, hr),
b AS (SELECT min(hr) AS hmin, max(hr) AS hmax FROM c),
grid AS (
  SELECT t.event_type,
         unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT DISTINCT event_type FROM c) t CROSS JOIN b),
j AS (
  SELECT g.event_type, g.hr, c.n, c.vm
  FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr)
SELECT event_type, hr,
       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       CAST(last_value(vm IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS value_mass_ff,
       (n IS NULL) AS filled
FROM j""",
)
def rel_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = events_table(spark, sf)
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("vm"),
    )
    b = c.agg(F.min("hr").alias("hmin"), F.max("hr").alias("hmax"))
    grid = (
        c.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("hmin"), F.col("hmax"), F.expr("interval 1 hour")
                )
            ).alias("hr"),
        )
    )
    j = grid.join(c, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "hr",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("vm", ignorenulls=True).over(w).cast("double").alias(
            "value_mass_ff"
        ),
        F.col("n").isNull().alias("filled"),
    )


# ---------------------------------------------------------------------------
# EWMA over the gap-filled hourly series — the truncated exponentially
# weighted moving average (24-hour lookback, alpha = 0.3) on top of the
# same complete grid rel_gap_fill materializes (gaps count as 0 events,
# so lag offsets are true hours). Parity design: the weights
# alpha·(1-alpha)^j are computed ONCE in Python and embedded as
# identical literals in both plans — pow() never runs in either engine;
# each term is round(·,9)-quantized and the 24 terms add as exact
# decimals in a fixed chain. Rows with fewer than 24 hours of history
# are excluded (no partial-window renormalization). One window
# partition per event type carries all 24 lags — a single shuffle.
# Precision budget: terms are DECIMAL(14,9) because a chained 24-term
# decimal addition grows precision by +1 per add on BOTH engines —
# 14+23 = 37 stays under the 38 cap, so the scale is never truncated
# (DECIMAL(20,9) terms overflowed the cap and Spark silently reduced
# the result scale to 6, shearing the last three digits).
_EWMA_LAGS = 24
_EWMA_ALPHA = 0.3
_EWMA_WEIGHTS = [
    repr(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j) for j in range(_EWMA_LAGS)
]


def _ewma_sql() -> str:
    terms = " + ".join(
        f"CAST(round(CAST({w} AS DOUBLE) * lag(x, {j}) OVER w * 1e9)"
        f" / 1e9 AS DECIMAL(14,9))"
        for j, w in enumerate(_EWMA_WEIGHTS)
    )
    return f"""WITH {DUCK_EVENTS},
c AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(count(*) AS DOUBLE) AS n
  FROM ev GROUP BY event_type, hr),
b AS (SELECT min(hr) AS hmin, max(hr) AS hmax FROM c),
grid AS (
  SELECT t.event_type,
         unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT DISTINCT event_type FROM c) t CROSS JOIN b),
x AS (
  SELECT g.event_type, g.hr, coalesce(c.n, CAST(0 AS DOUBLE)) AS x
  FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr),
e AS (
  SELECT event_type, hr, x,
         CAST(({terms}) AS DOUBLE) AS ewma,
         lag(x, {_EWMA_LAGS - 1}) OVER w AS oldest
  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY hr))
SELECT event_type, hr, CAST(x AS BIGINT) AS n_events, ewma
FROM e WHERE oldest IS NOT NULL"""


@register("rel_ewma_hourly", _ewma_sql())
def rel_ewma_hourly(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = events_table(spark, sf)
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    b = c.agg(F.min("hr").alias("hmin"), F.max("hr").alias("hmax"))
    grid = (
        c.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("hmin"), F.col("hmax"), F.expr("interval 1 hour")
                )
            ).alias("hr"),
        )
    )
    x = grid.join(c, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce(F.col("n"), F.lit(0.0)).alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    terms = None
    for j, wt in enumerate(_EWMA_WEIGHTS):
        t = (
            dblround(F.lit(float(wt)) * F.lag("x", j).over(w), 9)
            .cast("decimal(14,9)")
        )
        terms = t if terms is None else terms + t
    e = x.select(
        "event_type",
        "hr",
        "x",
        terms.cast("double").alias("ewma"),
        F.lag("x", _EWMA_LAGS - 1).over(w).alias("oldest"),
    )
    return e.where(F.col("oldest").isNotNull()).select(
        "event_type",
        "hr",
        F.col("x").cast("long").alias("n_events"),
        "ewma",
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation — the eval harness every ANN deployment runs
# before turning down nprobe: recall@5 of the IVF path against exact
# brute-force, over a deterministic probe set (vec_id % 64 == 3). Both
# legs rank by the same bit-identical cosine with the same tie-break,
# so the overlap count — and therefore the recall — is engine-exact.
# Scale shape: the IVF leg touches only the probed cells per query; the
# exact leg (the expensive one) is precisely the cost the IVF path
# avoids — which is why evals run on a sampled probe set, as here.
_EVAL_K = 5
_EVAL_NPROBE = 4


def _ivf_recall_sql() -> str:
    from .queries_ext import _DUCK_IVF_CODEBOOK
    from ..functions.vector import duck_cosine

    return f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
queries AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id % 64 = 3),
qc AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("c.cvec", "q.qvec")} DESC,
                                       c.cid DESC) AS rn
    FROM cent c CROSS JOIN queries q)
  WHERE rn <= {_EVAL_NPROBE}),
ivf5 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, ce.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("ce.embedding", "q.qvec")} DESC,
                                       ce.vec_id) AS rn
    FROM cells ce JOIN qc ON ce.cell = qc.cid
    JOIN queries q ON q.qid = qc.qid)
  WHERE rn <= {_EVAL_K}),
exact5 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("e.embedding", "q.qvec")} DESC,
                                       e.vec_id) AS rn
    FROM embeddings e CROSS JOIN queries q)
  WHERE rn <= {_EVAL_K})
SELECT exact5.qid,
       CAST(count(ivf5.vec_id) AS BIGINT) AS n_overlap,
       round((count(ivf5.vec_id) / {_EVAL_K}) * 1e9) / 1e9 AS recall
FROM exact5 LEFT JOIN ivf5
  ON exact5.qid = ivf5.qid AND exact5.vec_id = ivf5.vec_id
GROUP BY exact5.qid"""


@register("sim_ivf_recall", _ivf_recall_sql())
def sim_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.vector import cosine_staged, l2_norm
    from ..operators.ann import (
        _cell_scores,
        ivf_assign_arrow,
        lloyd_refine_codebook,
    )

    emb = table(spark, sf, "embeddings")
    cents = lloyd_refine_codebook(emb, 16, iters=1)
    assigned = ivf_assign_arrow(emb, 16, cents=cents)
    probed = F.slice(
        F.sort_array(_cell_scores(F.col("qvec"), cents), asc=False),
        1,
        _EVAL_NPROBE,
    )
    queries = (
        emb.where(F.col("vec_id") % 64 == 3)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            # norms staged once per side below the joins (bit-exact
            # re-grouping — functions/vector.cosine_staged)
            l2_norm(F.col("embedding")).alias("_qn"),
        )
        .withColumn(
            "_cells", F.transform(probed, lambda s: s["cid"].cast("long"))
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")
    ivf5 = (
        assigned.withColumn("_vn", l2_norm(F.col("embedding")))
        .join(
            F.broadcast(queries),
            F.array_contains(F.col("_cells"), F.col("cell")),
        )
        .select(
            "qid",
            "vec_id",
            cosine_staged(
                F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
            ).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _EVAL_K)
        .select("qid", "vec_id")
    )
    exact5 = (
        emb.withColumn("_vn", l2_norm(F.col("embedding")))
        .crossJoin(F.broadcast(queries.select("qid", "qvec", "_qn")))
        .select(
            "qid",
            "vec_id",
            cosine_staged(
                F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
            ).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _EVAL_K)
        .select("qid", "vec_id")
    )
    j = exact5.join(
        ivf5.withColumnRenamed("vec_id", "ivf_vec"),
        (exact5["qid"] == ivf5["qid"])
        & (exact5["vec_id"] == F.col("ivf_vec")),
        "left",
    )
    return j.groupBy(exact5["qid"].alias("qid")).agg(
        F.count("ivf_vec").alias("n_overlap"),
        dblround(F.count("ivf_vec") / _EVAL_K, 9).alias("recall"),
    )
