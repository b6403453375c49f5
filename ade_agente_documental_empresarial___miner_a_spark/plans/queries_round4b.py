"""Round-4 catalog additions, second batch — relational API surface the
catalog did not yet cover (PIVOT, UNPIVOT/melt, GROUPING SETS), product
quantization ANN, hybrid rank fusion, CDC-style latest-per-key and
windowed trending for the stream mirrors, and training-data curation
(mixing weights, TF-IDF keywords).

Conventions follow the rest of the catalog: every aggregate/computed
column is aliased identically in the Spark plan and the DuckDB oracle;
money/value sums go through DECIMAL casts (order-insensitive, bit-exact
across engines); float reductions that are fold-order-sensitive use the
deterministic sorted-fold recipe (F.aggregate over a sorted collect ≡
DuckDB list_aggregate(list(... ORDER BY ...), 'sum')); ln()/pow() results
are quantized with round(, 9) on both sides (JVM Math.log/pow carry a
1-ulp license vs glibc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# PIVOT — long→wide reshape (df.groupBy().pivot() with an EXPLICIT value
# list; an implicit list would add a distinct-scan job and make the
# output schema data-dependent, which breaks at scale and in streaming).
# The reference's tab-2 analytics renders per-type counts side by side
# (micro-infobot/app.py:270-283's dataframe view, generalized). Pivoted
# sums ride DECIMAL(18,6) so each cell is order-insensitive; absent
# (date, type) cells stay NULL on both engines (SUM over empty = NULL).
# Scale: one shuffle on event_date (uniform daily keys); the pivot adds
# zero extra exchanges — it is the same hash aggregate with 5 projected
# sum slots.
_PIVOT_CELLS = ",\n ".join(
    f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,6)) END) "
    f"AS DOUBLE) AS {t}"
    for t in _EVENT_TYPES
)


@register(
    "rel_pivot_events",
    f"""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
 {_PIVOT_CELLS}
FROM events GROUP BY 1""",
)
def rel_pivot_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).withColumn("event_date", F.to_date("ts"))
    return (
        ev.groupBy("event_date")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        )
    )


# ---------------------------------------------------------------------------
# UNPIVOT (melt) — wide→long, the inverse reshape (DataFrame.unpivot /
# SQL UNPIVOT). Runs on the pivoted frame above so the pair documents a
# lossless round trip: pivot → unpivot → the original long-form
# aggregate. Spark's unpivot keeps NULL cells (it is melt, not SQL
# UNPIVOT); the explicit IS NOT NULL filter pins the SQL-UNPIVOT
# semantics the oracle's UNION ALL expresses. Scale: unpivot is a
# map-only projection (5 struct rows per input row) — no shuffle.
@register(
    "rel_unpivot_events",
    f"""WITH wide AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
 {_PIVOT_CELLS}
  FROM events GROUP BY 1)
SELECT event_date, event_type, total_value FROM (
  {" UNION ALL ".join(
      f"SELECT event_date, '{t}' AS event_type, {t} AS total_value FROM wide"
      for t in _EVENT_TYPES
  )})
WHERE total_value IS NOT NULL""",
)
def rel_unpivot_events(spark: SparkSession, sf: str) -> DataFrame:
    wide = rel_pivot_events(spark, sf)
    return wide.unpivot(
        ["event_date"], _EVENT_TYPES, "event_type", "total_value"
    ).where(F.col("total_value").isNotNull())


# ---------------------------------------------------------------------------
# GROUPING SETS — multi-granularity aggregation in ONE pass (region×nation
# detail + region subtotals + grand total). rollup/cube are already
# covered (rel_rollup_orders, rel_cube_events); GROUPING SETS is the
# general form and the only one of the three with an explicit set list,
# plus the GROUPING() marker that disambiguates "NULL because aggregated
# away" from data NULLs. Expressed through spark.sql over a temp view —
# the DataFrame API has no grouping-sets verb; Catalyst expands it to a
# single Expand + one hash aggregate (NOT one scan per set — that is the
# whole point at 100 TB; the Expand triples rows map-side, the shuffle
# stays one). The revenue stays DECIMAL(38,8) through the aggregate: the
# grand-total row carries 18 significant digits, past double precision,
# and the two engines' decimal→double conversions disagree by 1 ulp there
# (verified at sf0.01) — which is exactly where the driver's hash
# canonicalization diverged in r04 (hash_match false on a cell-exact
# result). The SURFACED value is therefore the exact decimal rendered as
# a STRING: both engines print DECIMAL(38,8) identically (full scale-8
# digits, '-' sign, no exponent — verified cell-by-cell), so the driver
# hashes a byte-identical representation with zero precision loss.
@register(
    "rel_grouping_sets",
    """SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(24,8)))
            AS DECIMAL(38,8)) AS VARCHAR) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""",
)
def rel_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    reg = table(spark, sf, "region").select("r_regionkey", "r_name")
    src = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            "n_name",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(24,8)")
            .alias("rev"),
        )
    )
    src.createOrReplaceTempView("gs_rev_src")
    return spark.sql(
        """SELECT r_name, n_name,
       CAST(grouping(r_name) AS BIGINT) AS g_region,
       CAST(grouping(n_name) AS BIGINT) AS g_nation,
       CAST(CAST(sum(rev) AS DECIMAL(38,8)) AS STRING) AS revenue
FROM gs_rev_src
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())"""
    )


# ---------------------------------------------------------------------------
# Product quantization ADC — the compression step beyond sim_quantized_
# topk's int8 (4×): M=8 subspace codes of ksub=16 make a 64-dim float32
# vector 8 bytes at rest (32×), the storage layout of billion-vector
# IVF-PQ serving (Jégou et al., TPAMI'11). Training (sub-slices of the
# 16 smallest-id seeds), encoding (min-L2² code per subspace, map-only
# literal projection), and ADC scoring (query keeps floats, candidates
# are approximated by their centroids; per-subspace terms summed in
# subspace order) all replay in the oracle from the same parquet. See
# operators/ann.py:pq_* for the 100 TB shape discussion.
def _register_sim_pq():
    from ..functions.vector import duck_l2_sq
    from ..operators.ann import PQ_KSUB, PQ_M, PQ_SUBDIM

    oracle = f"""WITH subs AS (
  SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub),
seeds AS (SELECT vec_id AS cid, embedding FROM embeddings
          WHERE vec_id < {PQ_KSUB}),
cent1 AS (
  SELECT s.sub, cid,
         list_slice(embedding, s.sub*{PQ_SUBDIM}+1, s.sub*{PQ_SUBDIM}+{PQ_SUBDIM}) AS cvec
  FROM seeds, subs s),
subv AS (
  SELECT vec_id, s.sub,
         list_slice(embedding, s.sub*{PQ_SUBDIM}+1, s.sub*{PQ_SUBDIM}+{PQ_SUBDIM}) AS sv
  FROM embeddings, subs s),
codes1 AS (
  SELECT vec_id, sub, cid FROM (
    SELECT v.vec_id, v.sub, c.cid,
           row_number() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {duck_l2_sq('v.sv', 'c.cvec')}, c.cid) AS rn
    FROM subv v JOIN cent1 c ON v.sub = c.sub)
  WHERE rn = 1),
-- one Lloyd pass: per (sub, cid, pos) exact sorted-fold mean of the
-- assigned subvectors (mirrors pq_refine_codebooks bit-for-bit)
exs AS (
  SELECT vec_id,
         (unnest(generate_series(1, len(embedding))) - 1) // {PQ_SUBDIM} AS sub,
         (unnest(generate_series(1, len(embedding))) - 1) % {PQ_SUBDIM} AS spos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
cent2p AS (
  SELECT a.sub, a.cid, e.spos,
         list_aggregate(list(e.v ORDER BY e.vec_id), 'sum') / count(*) AS c
  FROM codes1 a JOIN exs e ON a.vec_id = e.vec_id AND a.sub = e.sub
  GROUP BY a.sub, a.cid, e.spos),
cent AS (
  SELECT sub, cid, list(c ORDER BY spos) AS cvec
  FROM cent2p GROUP BY sub, cid),
codes AS (
  SELECT vec_id, sub, cid FROM (
    SELECT v.vec_id, v.sub, c.cid,
           row_number() OVER (PARTITION BY v.vec_id, v.sub
                              ORDER BY {duck_l2_sq('v.sv', 'c.cvec')}, c.cid) AS rn
    FROM subv v JOIN cent c ON v.sub = c.sub)
  WHERE rn = 1),
qsub AS (
  SELECT vec_id AS query_id, sub, sv AS qv FROM subv WHERE vec_id < 10),
terms AS (
  SELECT q.query_id, e.vec_id, e.sub, {duck_l2_sq('q.qv', 'c.cvec')} AS t
  FROM codes e
  JOIN cent c ON e.sub = c.sub AND e.cid = c.cid
  JOIN qsub q ON q.sub = e.sub
  WHERE e.vec_id <> q.query_id),
adist AS (
  SELECT query_id, vec_id,
         list_aggregate(list(t ORDER BY sub), 'sum') AS approx_l2
  FROM terms GROUP BY query_id, vec_id),
ranked AS (
  SELECT query_id, vec_id, approx_l2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_l2, vec_id) AS rnk
  FROM adist)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk, approx_l2
FROM ranked WHERE rnk <= 5"""

    @register("sim_pq_adc_topk", oracle)
    def sim_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
        from ..operators import ann

        return ann.pq_adc_topk(
            table(spark, sf, "embeddings"), query_max_id=10, k=5
        )


_register_sim_pq()


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# dense (embedding cosine) rankings for the SAME query text — the
# standard combiner every hybrid search stack runs (RRF, Cormack et al.
# SIGIR'09: score(d) = Σ_legs 1/(60 + rank_leg(d)); rank-space fusion
# needs no score normalization between legs, which is why it won). The
# dense query vector is the engine's own T5 hashing embedder applied to
# the query string at plan-build time (operators/embedding.embed_one —
# pure Python, deterministic), so both legs genuinely share one query
# and the oracle inlines the same 64 literal floats. Each leg reduces
# with TakeOrderedAndProject before the bounded-10-row rank window; the
# fusion join is 10×10. Float parity: 1/(60+rank) is one correctly-
# rounded division, the fusion sum is one addition with fixed operand
# order (lex + dense) — no fold, no quantization needed.
def _register_rrf():
    from ..functions.vector import cosine_similarity, duck_cosine
    from ..operators.embedding import embed_one
    from .catalog import _ORACLES
    from .queries_round4 import _BM25_TERMS, text_bm25_topk

    qtext = " ".join(_BM25_TERMS)
    qvec = embed_one(qtext)
    qlit_sql = "[" + ", ".join(repr(float(x)) for x in qvec) + "]"

    oracle = f"""WITH lex0 AS ({_ORACLES["text_bm25_topk"]}),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rnk
  FROM lex0),
dense0 AS (
  SELECT vec_id AS doc_id,
         {duck_cosine("embedding", qlit_sql)} AS dscore
  FROM embeddings
  ORDER BY dscore DESC, doc_id LIMIT 10),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY dscore DESC, doc_id) AS vec_rnk
  FROM dense0)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rnk, d.vec_rnk,
       COALESCE(1.0 / (60 + l.lex_rnk), 0.0)
       + COALESCE(1.0 / (60 + d.vec_rnk), 0.0) AS rrf_score
FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id"""

    @register("sim_rrf_fusion", oracle)
    def sim_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
        lex0 = text_bm25_topk(spark, sf)  # already TakeOrdered k=10
        wl = Window.orderBy(F.desc("score"), "doc_id")
        lex = lex0.withColumn(
            "lex_rnk", F.row_number().over(wl).cast("long")
        ).select("doc_id", "lex_rnk")

        from ..functions.vector import cosine_to_literal

        emb = table(spark, sf, "embeddings")
        dense0 = (
            emb.select(
                F.col("vec_id").alias("doc_id"),
                # literal query: |q| folds to a driver constant
                # (bit-exact re-grouping — cosine_to_literal)
                cosine_to_literal(F.col("embedding"), qvec).alias("dscore"),
            )
            .orderBy(F.desc("dscore"), "doc_id")
            .limit(10)
        )
        wd = Window.orderBy(F.desc("dscore"), "doc_id")
        dense = dense0.withColumn(
            "vec_rnk", F.row_number().over(wd).cast("long")
        ).select("doc_id", "vec_rnk")

        fused = lex.join(dense, ["doc_id"], "full_outer")
        rrf = F.coalesce(
            F.lit(1.0) / (F.lit(60) + F.col("lex_rnk")), F.lit(0.0)
        ) + F.coalesce(
            F.lit(1.0) / (F.lit(60) + F.col("vec_rnk")), F.lit(0.0)
        )
        return fused.select(
            "doc_id", "lex_rnk", "vec_rnk", rrf.alias("rrf_score")
        )


_register_rrf()


# ---------------------------------------------------------------------------
# CDC latest-per-key — the batch mirror of a streaming upsert
# materialized view (the engine's foreachBatch merge in
# streaming/cdc.py: events are a changelog keyed by (user_id,
# event_type); last write wins by (ts, event_id)). n_versions counts the
# changelog depth per key — the compaction-debt metric an upsert sink
# tracks. One window over the key partition serves both the rank and the
# count (single shuffle); at scale this is the standard
# "latest-snapshot-from-log" query and the shuffle key is the upsert
# key, i.e. exactly how the state store would partition.
@register(
    "stream_cdc_latest",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                          event_type, value FROM events),
r AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM ev)
SELECT user_id, event_type, value AS last_value, ts AS last_ts,
       CAST(n_versions AS BIGINT) AS n_versions
FROM r WHERE rn = 1""",
)
def stream_cdc_latest(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            "n_versions",
        )
    )


# ---------------------------------------------------------------------------
# Windowed trending top-k — per tumbling hour, the top-3 event types by
# count. The windowed counts are the streaming aggregation
# (tumbling_metrics in streaming/chat_stream.py runs the same groupBy on
# a stream); the top-k rank runs over the materialized sink — rank over
# an open streaming aggregate isn't expressible without complete-mode
# re-emission, so the split IS the production shape (aggregate in the
# stream, rank in the serving view). WindowGroupLimit prunes the rank.
@register(
    "stream_topk_trending",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
c AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events
  FROM ev GROUP BY 1, 2)
SELECT window_start, event_type, n_events, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS rnk
  FROM c)
WHERE rnk <= 3""",
)
def stream_topk_trending(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Training-mixture weights — temperature-scaled source sampling (the
# multilingual-pretraining recipe, e.g. XLM-R's p^α re-weighting): from
# per-source token mass, compute the raw share p, the α=0.3-tempered
# share q ∝ p^α, and the sampling boost q/p that a weighted reservoir
# or per-source rate limiter would apply. All corpus scalars ride a
# 1-row broadcast; per-source work is one groupBy on a low-cardinality
# key. Float parity: pow() carries a 1-ulp license, so p^α is quantized
# to 9 decimals BEFORE the normalizing sum (a sorted fold over the ~20
# sources), making every downstream division engine-exact.
@register(
    "cur_domain_mix",
    """WITH tok AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens FROM tok),
p AS (
  SELECT source, n_docs, n_tokens,
         round(pow(n_tokens / total_tokens, 0.3) * 1e9) / 1e9 AS pa,
         n_tokens / total_tokens AS praw
  FROM tok CROSS JOIN tot),
z AS (SELECT list_aggregate(list(pa ORDER BY source), 'sum') AS zsum FROM p)
SELECT source, n_docs, n_tokens,
       round(praw * 1e9) / 1e9 AS p_share,
       round((pa / zsum) * 1e9) / 1e9 AS q_share,
       round(((pa / zsum) / praw) * 1e9) / 1e9 AS boost
FROM p CROSS JOIN z""",
)
def cur_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    tok = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    )
    tot = tok.agg(F.sum("n_tokens").cast("double").alias("total_tokens"))
    p = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        dblround(
            F.pow(F.col("n_tokens") / F.col("total_tokens"), 0.3), 9
        ).alias("pa"),
        (F.col("n_tokens") / F.col("total_tokens")).alias("praw"),
    )
    z = p.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "pa"))),
                lambda s: s["pa"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("zsum")
    )
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        dblround(F.col("praw"), 9).alias("p_share"),
        dblround(F.col("pa") / F.col("zsum"), 9).alias("q_share"),
        dblround((F.col("pa") / F.col("zsum")) / F.col("praw"), 9).alias(
            "boost"
        ),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction — top-3 characteristic terms per document
# (the classic doc-summarization / topic-tagging primitive; complements
# text_bm25_topk, which ranks docs for a query — this ranks terms for a
# doc). Same tokenizer contract as BM25 (whitespace split, len > 3).
# idf = ln(N/df) quantized to 9 decimals (the catalog's ln() rule);
# tf·idf multiplies an exact integer by the quantized idf — one
# correctly-rounded multiply, engine-exact — then is re-quantized for
# the surfaced score. df/tf are map-side-combinable groupBys; the rank
# is WindowGroupLimit per doc. Scoped to doc_id < 50 to keep the
# catalog entry output bounded (the operator itself is corpus-wide).
@register(
    "text_tfidf_terms",
    """WITH tokens AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents)
  WHERE length(term) > 3),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tokens),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens
       WHERE doc_id < 50 GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id, tf.term,
         round((tf * (round(ln(n_docs / df) * 1e9) / 1e9)) * 1e9) / 1e9 AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rnk
  FROM scored)
WHERE rnk <= 3""",
)
def text_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    tokens = (
        table(spark, sf, "documents")
        .select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .filter(F.length("term") > 3)
    )
    n = tokens.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = (
        tokens.where(F.col("doc_id") < 50)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            dblround(
                F.col("tf")
                * dblround(F.log(F.col("n_docs") / F.col("df")), 9),
                9,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Salted-join equivalence — the catalog entry that pins
# operators/skew.salted_join's row-level semantics against the PLAIN
# join the oracle runs: revenue per supplier through a lineitem ⋈
# supplier join executed with 8-way big-side salting (the rewrite for
# hot keys AQE can't split — the salt spreads each supplier key over 8
# reducers; the small side is replicated 8×, broadcast-size here).
# DECIMAL sums make the aggregate order-insensitive, so the salted
# shuffle's arbitrary arrival order cannot show through.
@register(
    "skew_salted_join_rev",
    """SELECT s_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8)))
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name""",
)
def skew_salted_join_rev(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = table(spark, sf, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(24,8)")
        .alias("rev"),
    )
    supp = table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(li, supp, on="suppkey", salt_buckets=8)
    return joined.groupBy("s_name").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash banding over binary payloads — the near-duplicate
# candidate generator for image/media dedup: hash the binary content,
# split the hash into bands, and bucket-join docs sharing any band
# (exactly the LSH banding shape dedup_minhash_lsh uses for text). A
# real perceptual hash (pHash/aHash over decoded pixels) is env-gated
# like every decode in sources/multimodal.py; the deterministic stand-in
# is md5 over the payload bytes, which exercises the identical banding /
# bucket-join / pair-dedup plumbing with an exact SQL mirror. 8-bit
# bands (4 per doc) keep bucket fan-out bounded: expected pair count is
# Σ_buckets C(n_b, 2) with n_b ≈ N/256 — linear in N for uniform
# hashes, never all-pairs.
@register(
    "mm_phash_band_pairs",
    """WITH h AS (
  SELECT doc_id, md5(text) AS ph FROM documents),
bands AS (
  SELECT doc_id, b.band_idx,
         substring(ph, b.band_idx * 2 + 1, 2) AS band_val
  FROM h, (SELECT unnest(generate_series(0, 3)) AS band_idx) b),
pairs AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         count(*) AS n_shared_bands
  FROM bands a JOIN bands c
    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
   AND a.doc_id < c.doc_id
  GROUP BY a.doc_id, c.doc_id)
SELECT doc_a, doc_b, CAST(n_shared_bands AS BIGINT) AS n_shared_bands
FROM pairs""",
)
def mm_phash_band_pairs(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    h = docs.select(
        "doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("ph")
    )
    bands = h.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_idx"),
        "ph",
    ).select(
        "doc_id",
        "band_idx",
        F.expr("substring(ph, band_idx * 2 + 1, 2)").alias("band_val"),
    )
    a = bands.alias("a")
    c = bands.alias("c")
    return (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# SCD type-2 history — the other half of the CDC pair: stream_cdc_latest
# materializes the SNAPSHOT; this builds the full slowly-changing-
# dimension history (validity intervals per key version) from the same
# changelog, the standard warehouse dimension-table shape. One lead()
# window per key in (ts, event_id) order — same single shuffle as the
# snapshot query; is_current marks the open interval. At scale the
# history table is append-mostly and partitions by valid_from date.
@register(
    "rel_scd2_history",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                          event_type, value FROM events)
SELECT user_id, event_type, value AS attr_value,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS BIGINT) AS version,
       lead(ts) OVER (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) IS NULL AS is_current
FROM ev""",
)
def rel_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Embedding outlier detection — per label, the 3 members farthest (by
# cosine distance) from their label centroid: the curation screen that
# catches mislabeled/garbage vectors before training (the embedding-
# space sibling of cur_quality_gate). Composes the emb_label_centroids
# training step (sorted-fold exact means) with a broadcast scoring join
# — labels×dim centroids are kilobytes at any corpus size — and a
# per-label WindowGroupLimit. Every reduction is a pos/vec_id-ordered
# deterministic fold; sqrt is correctly-rounded IEEE; argsort ties break
# on vec_id. At 100 TB: fold centroids into a literal matrix and score
# with zip_with per row (pure map) — the exploded-join here is the
# oracle-exact shape.
@register(
    "emb_outlier_scores",
    """WITH ex AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
cent AS (
  SELECT label, pos,
         list_aggregate(list(v ORDER BY vec_id), 'sum') / count(*) AS c
  FROM ex GROUP BY label, pos),
cnorm AS (
  SELECT label, sqrt(list_aggregate(list(c * c ORDER BY pos), 'sum')) AS nc
  FROM cent GROUP BY label),
vnorm AS (
  SELECT vec_id, sqrt(list_aggregate(list(v * v ORDER BY pos), 'sum')) AS nv
  FROM ex GROUP BY vec_id),
dots AS (
  SELECT e.vec_id, e.label,
         list_aggregate(list(e.v * c.c ORDER BY e.pos), 'sum') AS dot
  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
  GROUP BY e.vec_id, e.label),
scored AS (
  SELECT d.vec_id, d.label,
         1.0 - d.dot / (vnorm.nv * cnorm.nc) AS centroid_dist
  FROM dots d
  JOIN vnorm ON d.vec_id = vnorm.vec_id
  JOIN cnorm ON d.label = cnorm.label)
SELECT label, vec_id, centroid_dist, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY label
                               ORDER BY centroid_dist DESC, vec_id) AS rnk
  FROM scored)
WHERE rnk <= 3""",
)
def emb_outlier_scores(spark: SparkSession, sf: str) -> DataFrame:
    ex = (
        table(spark, sf, "embeddings")
        .select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
        .withColumn("v", F.col("v").cast("double"))
    )

    def _fold(col):
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    def _sorted_fold(key, val):
        return _fold(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(key.alias("k"), val.alias("x")))
                ),
                lambda s: s["x"],
            )
        )

    cent = ex.groupBy("label", "pos").agg(
        (_sorted_fold(F.col("vec_id"), F.col("v")) / F.count(F.lit(1))).alias("c")
    )
    cnorm = cent.groupBy("label").agg(
        F.sqrt(
            _sorted_fold(F.col("pos"), F.col("c") * F.col("c"))
        ).alias("nc")
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sqrt(
            _sorted_fold(F.col("pos"), F.col("v") * F.col("v"))
        ).alias("nv")
    )
    dots = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            _sorted_fold(F.col("pos"), F.col("v") * F.col("c")).alias("dot")
        )
    )
    scored = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "label")
        .select(
            "label",
            "vec_id",
            # try_divide: zero-norm vectors get NULL distance (ranked
            # last under DESC), matching the oracle's x/0 → NULL
            (
                F.lit(1.0)
                - F.try_divide(F.col("dot"), F.col("nv") * F.col("nc"))
            ).alias("centroid_dist"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("centroid_dist"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )
