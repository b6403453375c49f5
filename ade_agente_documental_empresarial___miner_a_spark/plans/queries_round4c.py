"""Round-4 catalog additions, third batch — substring-level dedup (the
suffix-array family re-expressed for a cluster), incremental corpus
dedup, text normalization, cohort retention analytics, and JSON prop
extraction.

Conventions follow the rest of the catalog: every aggregate/computed
column is aliased identically in the Spark plan and the DuckDB oracle;
integer-backed sums are cast to BIGINT on the DuckDB side (its
sum(INTEGER) widens to HUGEINT); fold-order-sensitive float math is
avoided (counts + one terminal round(÷, 9) only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_mean_duck, halfup_ratio, halfup_ratio_duck
from ..operators.dedup import incremental_dedup, substring_duplicate_spans
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Substring-level exact dedup — the third granularity tier after document
# (dedup_exact) and paragraph (dedup_paragraph): the fraction of each
# doc's 8-word windows (stride 1) that occur verbatim in >= 1 OTHER doc.
# Distributed stand-in for suffix-array substring dedup (Lee et al.,
# arXiv:2107.06499) — any shared run of >= 8 words is covered by a shared
# window. Plan: map-side explode -> one partial-agg'd hash aggregate on
# md5-uniform gram keys -> co-partitioned gram join -> per-doc rollup on
# the spread(doc_id) partitioning (no re-shuffle of the exploded side).
@register(
    "dedup_substring",
    f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS gram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        FROM words WHERE len(w) >= 8)),
gd AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM grams GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
       {halfup_mean_duck("sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)",
                         "count(*)", 9, integral_sum=True)}
         AS dup_frac
FROM grams g JOIN gd USING (gram)
GROUP BY g.doc_id""",
)
def dedup_substring(spark: SparkSession, sf: str) -> DataFrame:
    return substring_duplicate_spans(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Incremental ingestion dedup — nightly-batch shape: classify NEW docs
# (doc_id % 5 == 0 models the arriving batch) against the already-
# ingested corpus (the other 80%) without re-deduplicating history.
# Statuses: dup_historic (hash already ingested), dup_in_batch (an
# earlier row of the same batch has it), new. The historic side reduces
# to DISTINCT hashes — too big to broadcast at 100 TB, so it is a
# shuffle LEFT join on uniform md5 keys; Spark's runtime bloom-filter
# injection pre-filters the probe when the batch is small vs history.
@register(
    "dedup_incremental",
    """WITH hashed AS (
  SELECT doc_id, md5(trim(lower(text))) AS text_hash FROM documents),
hist AS (SELECT DISTINCT text_hash FROM hashed WHERE doc_id % 5 <> 0),
batch AS (SELECT doc_id, text_hash FROM hashed WHERE doc_id % 5 = 0)
SELECT b.doc_id, b.text_hash,
  CASE WHEN h.text_hash IS NOT NULL THEN 'dup_historic'
       WHEN row_number() OVER (PARTITION BY b.text_hash ORDER BY b.doc_id)
            > 1 THEN 'dup_in_batch'
       ELSE 'new' END AS status
FROM batch b LEFT JOIN hist h ON b.text_hash = h.text_hash""",
)
def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    historic = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    return incremental_dedup(batch, historic)


# ---------------------------------------------------------------------------
# Text normalization — the canonicalization pass every curation pipeline
# runs before hashing/dedup: accent fold (explicit translate map — the
# SAME table on both engines, no locale/ICU dependence), casefold,
# whitespace collapse, trim. Output is the per-doc normalization record
# (hash of the canonical form + before/after lengths + changed flag).
# Map-only: zero shuffles at any scale.
_ACCENTS_FROM = "áàâäãåéèêëíìîïóòôöõúùûüñçýÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÑÇÝ"
_ACCENTS_TO = "aaaaaaeeeeiiiiooooouuuuncyAAAAAAEEEEIIIIOOOOOUUUUNCY"


@register(
    "text_normalize",
    f"""SELECT doc_id,
  md5(norm) AS norm_hash,
  length(text) AS n_chars_raw,
  length(norm) AS n_chars_norm,
  (norm <> text) AS changed
FROM (
  SELECT doc_id, text,
    trim(regexp_replace(
      translate(lower(text), '{_ACCENTS_FROM.lower()}', '{_ACCENTS_TO.lower()}'),
      '\\s+', ' ', 'g')) AS norm
  FROM documents)""",
)
def text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.translate(
                F.lower(F.col("text")), _ACCENTS_FROM.lower(), _ACCENTS_TO.lower()
            ),
            r"\s+",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length("text").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention — the product-analytics staple the events
# fixture supports but the catalog lacked: users grouped by first-active
# week (cohort), counted per subsequent active week offset. Two hash
# aggregates (distinct user-weeks; per-user min) + one join on user_id —
# all three share the user_id partitioning, so AQE plans a single
# exchange chain; weeks are Monday-truncated DATEs on both engines.
@register(
    "rel_cohort_retention",
    f"""WITH {DUCK_EVENTS},
wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
       FROM ev),
first AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
       count(*) AS users
FROM wk JOIN first USING (user_id)
GROUP BY cohort_week, week_offset""",
)
def rel_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    wk = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON extraction — events.props is a JSON string column
# (the open-schema attribute bag every event pipeline carries). Typed
# extraction (get_json_object / json_extract_string) + per-type rollup.
# At scale the extraction is map-side; only the 5-key rollup shuffles.
@register(
    "rel_json_props",
    """SELECT event_type,
  count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_sum,
  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_min,
  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_max
FROM events
GROUP BY event_type""",
)
def rel_json_props(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


# ---------------------------------------------------------------------------
# Stream-static enrichment — the canonical streaming-ETL join: the event
# firehose enriched against a slowly-changing dimension (customer
# master), aggregated per (tumbling hour, market segment). ONE code path
# (streaming/chat_stream.py::enriched_metrics) serves both the live
# stream (test_streaming.py drives a file stream through it) and this
# batch mirror; the dim side is broadcast (re-used across micro-batches,
# never reshuffled with the stream).
@register(
    "stream_static_enrich",
    f"""WITH {DUCK_EVENTS}
SELECT date_trunc('hour', ts) AS window_start, c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM ev JOIN customer ON user_id = c_custkey
GROUP BY window_start, c_mktsegment""",
)
def stream_static_enrich(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.chat_stream import enriched_metrics

    return enriched_metrics(
        events_table(spark, sf), table(spark, sf, "customer")
    )


# ---------------------------------------------------------------------------
# PageRank over the nation trade graph — the catalog's iterative-
# algorithm representative. Edges: DISTINCT (customer nation -> supplier
# nation) pairs realized by lineitems (the Q7 join shape); 3 unrolled
# power iterations with damping 0.85. Iterative float math is the parity
# minefield here: each node's inbound contribution sum has engine-
# specific fold order, so every contribution is quantized round(·,12)
# then summed as DECIMAL(22,12) (order-insensitive, exact at scale 12),
# and each new rank is re-quantized round(·,12) — the recurrence is
# bit-identical on both engines at every iteration. Scale shape: the
# contribution join is co-partitioned on src; rank/deg/node frames are
# node-sized (tiny vs edges); at web scale each iteration is one shuffle
# and the loop would checkpoint every few iterations to cut lineage —
# noted, not needed for 3 unrolled steps.
_PR_ITERS = 3


def _pagerank_sql() -> str:
    parts = [
        """edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (SELECT n_nationkey AS node FROM nation),
nn AS (SELECT CAST(count(*) AS BIGINT) AS ni FROM nodes),
r0 AS (SELECT node, {r0} AS pr
       FROM nodes CROSS JOIN nn)""".format(
            r0=halfup_ratio_duck("1", "ni", 12)
        )
    ]
    # every per-iteration rounding is integer-exact HALF_UP on the
    # exact rational (ROUND8 §12 class; r9 audit): the contribution is
    # a 12-dp/integer ratio, and the damped combine 0.15/n + 0.85*csum
    # equals (3*10^12 + 17*S*n) / (20*n*10^12) with S = csum*10^12 an
    # exact integer — both engines compute the identical integers.
    damp = ("CAST((2 * (3000000000000 + 17 *"
            " CAST(coalesce(csum, 0) * 1000000000000 AS HUGEINT)"
            " * ni) + 20 * ni) // (40 * ni) AS DOUBLE) / 1e12")
    for i in range(1, _PR_ITERS + 1):
        contrib = halfup_ratio_duck(
            "CAST(r.pr AS DECIMAL(26,12))", "d.outdeg", 12, 12, 0
        )
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST({contrib} AS DECIMAL(22,12)) AS c
  FROM r{i - 1} r JOIN edges e ON r.node = e.src JOIN deg d ON e.src = d.src),
s{i} AS (SELECT node, sum(c) AS csum FROM c{i} GROUP BY node),
r{i} AS (
  SELECT nodes.node,
         {damp} AS pr
  FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node CROSS JOIN nn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT r{_PR_ITERS}.node AS nationkey, n_name AS nation, pr AS pagerank
FROM r{_PR_ITERS} JOIN nation ON node = n_nationkey"""
    )


@register("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    nn = nodes.agg(F.count(F.lit(1)).alias("ni"))
    # integer-exact HALF_UP at every rounding point (see _pagerank_sql)
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", halfup_ratio("1", "ni", 12).alias("pr")
    )
    damp = F.expr(
        "CAST((2 * (3000000000000 + 17 *"
        " CAST(coalesce(csum, 0) * 1000000000000 AS DECIMAL(38,0))"
        " * ni) + 20 * ni) div (40 * ni) AS DOUBLE)"
    ) / F.lit(1e12)
    for _ in range(_PR_ITERS):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                halfup_ratio(
                    "CAST(pr AS DECIMAL(26,12))", "outdeg", 12, 12, 0
                )
                .cast("decimal(22,12)")
                .alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("csum"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select("node", damp.alias("pr"))
        )
    return ranks.join(
        F.broadcast(nation), ranks["node"] == F.col("n_nationkey")
    ).select(
        F.col("node").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("pr").alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# Character-trigram language-model scoring — the KenLM-perplexity stand-in
# (CCNet's quality signal) computable without external models: train the
# trigram unigram-frequency model ON the corpus (one hash aggregate),
# then score each doc by mean log-probability of its trigrams. Same
# quantize-then-fold discipline as BM25: ln() carries a 1-ulp JVM/glibc
# license, so each log is round(·,9)-quantized and summed as
# DECIMAL(20,9); the per-doc mean divides the exact decimal sum once.
# Plan (r8 one-pass rewrite; the original join form evaluated the
# explode on BOTH join branches — no ReusedExchange because one branch
# aggregates — so the substring/explode CPU ran twice, measured 2× at
# sf0.1): one explode pass collapses to (gram, doc) carrier rows with
# occurrence counts (partial agg before the shuffle); the model count
# is a sum-window over carriers by gram; the corpus total needs no
# explode at all (sum of length-2 over qualifying docs, map-side); the
# per-doc sum weights each carrier's quantized logp by its occurrence
# count — logp × n_occ with n_occ cast DECIMAL(10,0) so the product
# stays precision-38-exact (a bigint operand would push precision to
# 41 and Spark silently rounds the scale down: caught by the value
# diff at the 9th decimal when this rewrite was first prototyped).
# Shared with cur_perplexity_filter (queries_round4n), which wraps these
# per-doc scores in a decile cutoff — one SQL definition, two consumers.
TRIGRAM_SCORES_SQL = """WITH grams AS (
  SELECT doc_id, substr(text, i, 3) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 2)) AS i
        FROM documents WHERE length(text) >= 3)),
model AS (SELECT g, count(*) AS cnt FROM grams GROUP BY g),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM model)
SELECT doc_id, count(*) AS n_trigrams,
       CAST(CASE WHEN sum(logp) < 0 THEN -1 ELSE 1 END
            * ((2 * CAST(abs(sum(logp)) * 1000000000 AS HUGEINT) + count(*))
               // (2 * count(*))) AS DOUBLE) / 1e9 AS avg_logp
FROM (SELECT doc_id, CAST(round(ln(cnt / total) * 1e9) / 1e9 AS DECIMAL(20,9)) AS logp
      FROM grams JOIN model USING (g) CROSS JOIN tot)
GROUP BY doc_id"""


@register("text_trigram_lm", TRIGRAM_SCORES_SQL)
def text_trigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import spread

    docs0 = table(spark, sf, "documents")
    docs = spread(docs0, "doc_id")
    grams = docs.where(F.length("text") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    carriers = grams.groupBy("g", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    # total gram occurrences without a second explode: every qualifying
    # doc contributes exactly length-2 trigrams
    tot = docs0.where(F.length("text") >= 3).agg(
        F.sum(F.length("text") - 2).cast("double").alias("total")
    )
    cnt = F.sum("n_occ").over(Window.partitionBy("g"))
    scored = (
        carriers.withColumn("cnt", cnt)
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_occ",
            dblround(F.log(F.col("cnt") / F.col("total")), 9)
            .cast("decimal(20,9)")
            .alias("logp"),
        )
    )
    # The mean is rounded HALF_UP on the EXACT RATIONAL, in integer
    # arithmetic both engines perform identically: sum(logp) carries
    # exactly 9 decimals, so sum*1e9 is an exact integer (decimal
    # precision reduction on the product is loss-free because the value
    # is integral), and sign*((2|u|+n) div (2n)) is the HALF_UP
    # quotient. round(double, 9) was NOT cross-engine stable here:
    # Spark rounds the exact binary double while DuckDB multiplies by
    # 1e9 first and rounds the inflated product — at a half boundary
    # (caught by parity_fuzz chunk/s2 on the bigram sibling) the two
    # disagree by 1e-9. decimal(10,0) keeps logp*n_occ inside
    # precision 38 (exact).
    return scored.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_trigrams"),
        (
            F.expr(
                "CAST(CASE WHEN sum(logp * CAST(n_occ AS DECIMAL(10,0)))"
                " < 0 THEN -1 ELSE 1 END"
                " * ((2 * CAST(abs(sum(logp * CAST(n_occ AS"
                " DECIMAL(10,0)))) * 1000000000 AS DECIMAL(38,0))"
                " + sum(n_occ)) div (2 * sum(n_occ))) AS DOUBLE)"
            )
            / F.lit(1e9)
        ).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation funnel — the composite every training-data team
# reports: per source, how many docs entered, survived the quality gate,
# survived exact dedup among survivors, and how many tokens ship. Spark
# side COMPOSES the real operators (quality_gate + first-occurrence
# window); the oracle restates the same textstats formulas the
# cur_quality_gate oracle uses (imported fragments, not re-derived).
# Scale shape: gate is map-only; dedup is one window on md5-uniform
# hash; the per-source rollup is a 20-key aggregate.
def _funnel_sql() -> str:
    from ..operators.textstats import STOPWORDS
    from .queries_ext import _BEST, _HIT_EXPRS, _PRED, _duck_in_list
    from .queries_round3 import _DUCK_QUALITY

    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ({_duck_in_list(STOPWORDS)}))) AS DOUBLE) AS stop_hits
  FROM documents),
h AS (SELECT doc_id, n_words, n_chars, stop_hits, {_HIT_EXPRS} FROM w),
g AS (
  SELECT doc_id,
         CASE WHEN {_BEST} > 0 THEN {_PRED} ELSE 'unk' END AS pred_lang,
         {_DUCK_QUALITY} AS quality,
         CAST(n_words AS BIGINT) AS n_tokens
  FROM h),
s AS (
  SELECT g.doc_id, d.source, d.text, g.n_tokens,
         (pred_lang <> 'unk' AND quality >= 0.45
          AND n_tokens BETWEEN 5 AND 5000) AS passes
  FROM g JOIN documents d USING (doc_id)),
r AS (
  SELECT doc_id, source, n_tokens, passes,
         (passes AND row_number() OVER (
              PARTITION BY md5(trim(lower(text)))
              ORDER BY passes DESC, doc_id) = 1) AS is_first
  FROM s)
SELECT source,
       count(*) AS n_input,
       CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN is_first THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_out
FROM r GROUP BY source"""


@register("cur_corpus_funnel", _funnel_sql())
def cur_corpus_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.curation import quality_gate
    from ..operators.dedup import normalized_text

    docs = table(spark, sf, "documents")
    gated = quality_gate(docs).select("doc_id", "n_tokens", "passes")
    flags = docs.select(
        "doc_id", "source", F.md5(normalized_text(F.col("text"))).alias("h")
    ).join(gated, "doc_id")
    # ONE window, no survivors self-join (a flags⋈surv left join would
    # re-scan and re-evaluate the quality expressions on a second
    # branch): ordering passing docs first makes "rn == 1 among
    # survivors" computable on the full frame.
    w = Window.partitionBy("h").orderBy(F.col("passes").desc(), "doc_id")
    first = F.col("passes") & (F.row_number().over(w) == 1)
    r = flags.withColumn("is_first", first)
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("passes").cast("long")).alias("n_quality"),
        F.sum(F.col("is_first").cast("long")).alias("n_unique"),
        F.sum(
            F.when(F.col("is_first"), F.col("n_tokens")).otherwise(F.lit(0))
        ).alias("tokens_out"),
    )


# ---------------------------------------------------------------------------
# Columnar sink fidelity: ORC round trip — the second columnar format a
# lakehouse ingests besides parquet (Spark ships the ORC reader/writer
# in-core). The query writes documents to ORC ONCE per fixture identity
# (mtime+size cache key — a regenerated fixture invalidates), reads it
# back, and the oracle is the identity SELECT on the parquet source:
# parity === bit-exact round-trip fidelity for longs and UTF-8 strings.
# The same shape at 100 TB is a distributed format-migration job; the
# read-back scan gets the same pushdown/pruning treatment as parquet.
def _roundtrip_dir(sf: str, fmt: str) -> str:
    import os
    import tempfile

    from .queries_round4 import _source_tag

    return os.path.join(
        tempfile.gettempdir(), f"ade_{fmt}_{_source_tag(sf, 'documents')}"
    )


@register(
    "s9_orc_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def s9_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import os

    out = _roundtrip_dir(sf, "orc")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf, "documents").write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Row-based interchange: JSONL round trip — newline-delimited JSON is the
# lingua franca of crawl/annotation pipelines. Write once per fixture
# identity, read back with an EXPLICIT schema (schema inference is a
# second full scan and makes the result schema data-dependent — never at
# 100 TB). Oracle = identity SELECT: parity proves value fidelity
# through JSON serialization (integer longs, UTF-8 text).
@register(
    "s10_jsonl_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def s10_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import os

    out = _roundtrip_dir(sf, "jsonl")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf, "documents").write.mode("overwrite").json(out)
    return spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(out)
