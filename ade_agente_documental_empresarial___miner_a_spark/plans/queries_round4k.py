"""Round-4 catalog additions, eleventh batch — engine-surface corners
that remained unexercised as first-class oracle-paired entries:

* the higher-order-function battery (transform/filter/exists/forall/
  aggregate/zip_with as a single audit over the embeddings table);
* the calendar-function battery (date_trunc/last_day/quarter/ISO week/
  day names/add_months over order dates);
* deterministic mode + exact median per group (argmax-over-counts with
  a total tiebreak — the portable form of the tie-nondeterministic
  builtin ``mode()``);
* chi-squared independence cells for lang × source (the corpus-drift
  audit: observed vs expected counts and per-cell contributions);
* near-dup cluster representatives (keep-best-quality doc per verified
  LSH cluster — the canonical-document selection step of a dedup
  pipeline, composing dedup_clusters with the quality score);
* tokenizer vocabulary coverage (smallest prefix of the frequency-
  ranked vocab covering 50% of token mass — the vocab-size selection
  primitive);
* the Python DataSource WRITER protocol (task-staged files + driver
  commit manifest, the connector-authoring sink surface — the engine
  generalization of the reference's Mongo insert sink,
  ``micro-infobot/app.py:60-71``).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.textstats import STOPWORDS
from .catalog import register, table


# ---------------------------------------------------------------------------
# §2.8 higher-order functions — every array lambda primitive in one
# audited projection. All folds are left-to-right in array order and all
# FLOAT elements are cast to DOUBLE before arithmetic (exact), so every
# output is bit-reproducible across engines. Map-only: no shuffle, no
# Python boundary; at 100 TB this is a pure scan+project stage.
@register(
    "func_hof_battery",
    """SELECT vec_id,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0))
            AS BIGINT) AS n_pos,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.5)) > 0
         AS any_gt_half,
       len(list_filter(embedding, x -> CAST(x AS DOUBLE) <= 0.0)) = 0
         AS all_pos,
       list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS sum_sq,
       list_aggregate(list_transform(embedding,
           x -> abs(CAST(x AS DOUBLE))), 'sum') AS l1,
       list_aggregate(list_transform(
           list_zip(embedding, list_reverse(embedding)),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
         AS rev_dot
FROM embeddings""",
)
def func_hof_battery(spark: SparkSession, sf: str) -> DataFrame:
    e = F.col("embedding")
    as_d = lambda x: x.cast("double")  # noqa: E731
    return table(spark, sf, "embeddings").select(
        "vec_id",
        F.size(F.filter(e, lambda x: as_d(x) > 0.0))
        .cast("long")
        .alias("n_pos"),
        F.exists(e, lambda x: as_d(x) > 0.5).alias("any_gt_half"),
        F.forall(e, lambda x: as_d(x) > 0.0).alias("all_pos"),
        F.aggregate(
            F.transform(e, lambda x: as_d(x) * as_d(x)),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("sum_sq"),
        F.aggregate(
            F.transform(e, lambda x: F.abs(as_d(x))),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("l1"),
        F.aggregate(
            F.zip_with(e, F.reverse(e), lambda x, y: as_d(x) * as_d(y)),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("rev_dot"),
    )


# ---------------------------------------------------------------------------
# §2.8 calendar functions — the date-dimension battery the scalar-fn
# entry (s28) left out: month bucketing, month-end, ISO weeks, day
# names, clamped month arithmetic (Jan 31 + 3 months = Apr 30 on both
# engines). Row-level projection keyed by o_orderkey; map-only.
@register(
    "rel_calendar_fns",
    """SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
         AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS week_iso,
       dayname(o_orderdate) AS day_name,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
         AS plus_quarter,
       CAST(last_day(CAST(o_orderdate AS DATE))
            - CAST(o_orderdate AS DATE) AS BIGINT) AS days_to_month_end
FROM orders""",
)
def rel_calendar_fns(spark: SparkSession, sf: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return table(spark, sf, "orders").select(
        "o_orderkey",
        d.alias("d"),
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("week_iso"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.add_months(d, 3).alias("plus_quarter"),
        F.datediff(F.last_day(d), d).cast("long").alias(
            "days_to_month_end"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic mode + exact median per group. The builtin ``mode()``
# is tie-nondeterministic on BOTH engines, so the portable form is the
# argmax-over-counts window with a total order tiebreak (count DESC,
# value ASC) — one extra shuffle on the group key, still
# partial-aggregatable. Median over doubles interpolates the two middle
# values identically on both engines (quantile_cont 0.5).
@register(
    "rel_mode_median",
    """WITH j AS (
  SELECT c_mktsegment AS segment, o_orderpriority AS pri, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
counts AS (
  SELECT segment, pri, count(*) AS n FROM j GROUP BY segment, pri),
mode_pick AS (
  SELECT segment, pri AS mode_priority, n AS mode_n,
         row_number() OVER (PARTITION BY segment
                            ORDER BY n DESC, pri ASC) AS rn
  FROM counts),
med AS (
  SELECT segment, quantile_cont(o_totalprice, 0.5) AS median_price
  FROM j GROUP BY segment)
SELECT m.segment, mode_priority, mode_n, median_price
FROM mode_pick m JOIN med ON med.segment = m.segment
WHERE rn = 1""",
)
def rel_mode_median(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    customer = table(spark, sf, "customer")
    j = orders.join(
        F.broadcast(customer),
        orders.o_custkey == customer.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("pri"),
        "o_totalprice",
    )
    counts = j.groupBy("segment", "pri").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("segment").orderBy(
        F.desc("n"), F.asc("pri")
    )
    mode_pick = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "segment",
            F.col("pri").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )
    med = j.groupBy("segment").agg(
        F.median("o_totalprice").alias("median_price")
    )
    return mode_pick.join(med, "segment")


# ---------------------------------------------------------------------------
# Chi-squared independence cells for lang × source over documents — the
# corpus-drift audit ("is language mix independent of source?"). Output
# is PER CELL (observed, expected, contribution), not the global
# statistic: every value is computed from integer window sums by the
# same two IEEE ops on both engines, so rows hash bit-identically,
# whereas a global Σ over cells would be partial-agg merge-order
# dependent. Consumers sum `contrib` (25-ish cells) themselves. Window
# sums over BIGINT counts are exact; two shuffles total (cell groupBy +
# one window repartition), both over tiny aggregated data.
@register(
    "rel_chi2_cells",
    """WITH cells AS (
  SELECT lang, source, count(*) AS obs
  FROM documents GROUP BY lang, source),
ext AS (
  SELECT lang, source, obs,
         sum(obs) OVER (PARTITION BY lang) AS row_tot,
         sum(obs) OVER (PARTITION BY source) AS col_tot,
         sum(obs) OVER () AS n
  FROM cells)
SELECT lang, source, CAST(obs AS BIGINT) AS obs,
       CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
       (CAST(obs AS DOUBLE)
        - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
       * (CAST(obs AS DOUBLE)
          - CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE))
         AS contrib
FROM ext""",
)
def rel_chi2_cells(spark: SparkSession, sf: str) -> DataFrame:
    cells = (
        table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    # grand total via broadcast scalar (BIGINT sum — exact regardless of
    # partial-agg order), not an empty window that would coalesce the
    # frame to one partition
    grand = cells.agg(F.sum("obs").alias("n"))
    ext = cells.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).alias("col_tot"),
    ).crossJoin(F.broadcast(grand))
    expected = (F.col("row_tot") * F.col("col_tot")).cast(
        "double"
    ) / F.col("n").cast("double")
    diff = F.col("obs").cast("double") - expected
    return ext.select(
        "lang",
        "source",
        F.col("obs").cast("long").alias("obs"),
        expected.alias("expected"),
        (diff * diff / expected).alias("contrib"),
    )


# ---------------------------------------------------------------------------
# Near-dup cluster representatives — the canonical-document selection
# step that FOLLOWS clustering in a real dedup pipeline: within each
# verified LSH cluster keep the highest-quality member (tiebreak min
# doc_id), discarding the rest. Composes dedup_clusters (LSH candidates
# → exact Jaccard verify → min-label components) with the text quality
# score; the representative pick is one row_number window over the
# cluster key — clusters are clique-ish and tiny, so the window state
# per key is bounded and the whole step scales as the clustering does.
def _quality_cte() -> str:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""q AS (
  SELECT doc_id,
         0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
         + least(0.3, 0.3 * (CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN ({in_list}))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 3.0)
         + 0.3 * greatest(0.0, 1.0 - least(1.0,
             abs((CAST(length(text) AS DOUBLE)
                  - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) - 5.0) / 5.0))
           AS quality
  FROM documents)"""


def _representatives_oracle() -> str:
    from .queries_ext import _BAND_SELECTS, _SIG_COLS, _duck_shingles

    return f"""WITH RECURSIVE {_duck_shingles(2)},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.lbl FROM reach r JOIN edges e ON e.b = r.node),
clusters AS (
  SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
{_quality_cte()},
ranked AS (
  SELECT cluster_id, c.doc_id, quality,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM clusters c JOIN q ON q.doc_id = c.doc_id)
SELECT cluster_id, doc_id AS rep_doc_id,
       CAST(n_members AS BIGINT) AS n_members, quality AS rep_quality
FROM ranked WHERE rn = 1"""


@register("dedup_representatives", _representatives_oracle())
def dedup_representatives(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import connected_components, lsh_verified_pairs
    from ..operators.textstats import quality_scores

    docs = table(spark, sf, "documents")
    pairs = lsh_verified_pairs(docs, threshold=0.3)
    clusters = connected_components(pairs)
    q = quality_scores(docs).select("doc_id", "quality")
    m = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("quality").alias("rep_quality"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage — the vocab-size selection primitive:
# rank the corpus vocabulary by frequency (tiebreak token ASC — a total
# order, so the running sum is deterministic) and keep the smallest
# prefix whose cumulative token-mass share reaches 50%. The running sum
# evaluates left-to-right over the same total order on both engines, so
# cum_share is bit-identical. The global-order window is a single
# partition over the VOCAB (≤ millions of rows after aggregation, not
# corpus-sized); at larger vocabs the same result comes from a
# two-phase rank (bucket by count range, running-sum bucket totals) —
# documented rather than needed at fixture scale.
@register(
    "cur_vocab_coverage",
    """WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (
  SELECT token, count(*) AS cnt FROM words
  WHERE token <> '' GROUP BY token),
tot AS (SELECT sum(cnt) AS total FROM freq),
ranked AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         sum(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
           OVER (ORDER BY cnt DESC, token ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_share
  FROM freq, tot)
SELECT CAST(rank AS BIGINT) AS rank, token, CAST(cnt AS BIGINT) AS cnt,
       cum_share
FROM ranked
WHERE cum_share - CAST(cnt AS DOUBLE) / (SELECT total FROM tot) < 0.5""",
)
def cur_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    freq = words.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    f = freq.crossJoin(F.broadcast(total))
    share = F.col("cnt").cast("double") / F.col("total").cast("double")
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = f.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        F.col("cnt").cast("long").alias("cnt"),
        share.alias("share"),
        F.sum(share)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_share"),
    )
    return ranked.where(
        F.col("cum_share") - F.col("share") < 0.5
    ).select("rank", "token", "cnt", "cum_share")


# ---------------------------------------------------------------------------
# S14 — Python DataSource WRITER: the connector-authoring sink surface
# (``pyspark.sql.datasource.DataSourceWriter``), two-phase commit done
# the way a real sink connector does it: each task stages a uniquely
# named file and returns a WriterCommitMessage; the driver's commit()
# renames staged files and writes a _MANIFEST.json; abort() removes
# staging so failures leave nothing visible. The entry pushes the
# documents projection through the writer once per fixture dir, reads
# the committed JSONL back, and aggregates — so the oracle (a direct
# aggregate over the fixture) certifies the full write→commit→read
# round trip, and the manifest row-count is cross-checked in the unit
# test. Engine-native generalization of S6's Mongo insert sink
# (``micro-infobot/app.py:60-71``).
def _writer_dir(spark: SparkSession, sf: str) -> str:
    from ..sources.pydatasource import JsonlCommitDataSource

    spark.dataSource.register(JsonlCommitDataSource)
    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"ade_dsw_{tag}")
    manifest = os.path.join(out, "_MANIFEST.json")
    if not os.path.exists(manifest):
        (
            table(spark, sf, "documents")
            .select("doc_id", "lang", "n_chars")
            .repartition(4)
            .write.format("jsonl_commit")
            .mode("append")
            .option("path", out)
            .save()
        )
    return out


@register(
    "s14_python_ds_writer",
    # CAST the sum: DuckDB sum(BIGINT) is HUGEINT, which .df()/pandas
    # renders as float64 while Spark's sum(long) stays int64 — values
    # equal, but the driver's hash canonicalization sees different cell
    # representations (the gate_mimic 'dtype:int64|float64' hazard, the
    # same family as the r04 rel_grouping_sets red).
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM documents GROUP BY lang""",
)
def s14_python_ds_writer(spark: SparkSession, sf: str) -> DataFrame:
    out = _writer_dir(spark, sf)
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    back = spark.read.schema(
        "doc_id long, lang string, n_chars long"
    ).json(os.path.join(out, "part-*.jsonl"))
    # trust only committed files: the manifest IS the source of truth
    assert manifest["total_rows"] >= 0
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("doc_id").alias("max_doc_id"),
    )
