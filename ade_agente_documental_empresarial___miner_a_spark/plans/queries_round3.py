"""Round-3 catalog additions — deeper relational shapes (TPC-H Q4/Q12/
Q18/Q19/Q22 adaptations over the fixture star schema), batch
sessionization, approximate-distinct contract, paragraph-level dedup,
corpus term statistics, the curation quality gate, audio chunk planning,
and the batch mirror of streaming dedup.

Every entry is oracle-paired; money aggregates go through DECIMAL casts
(order-insensitive, bit-exact across engines) and all computed integers
are cast to BIGINT on both sides (see docs/ROUND3.md + memory notes).
The fixture lineitem lacks commit/receipt dates and shipmode, so Q4/Q12
keep the reference query's *shape* (EXISTS semi-join; two-level CASE
aggregation) over the columns that exist — each docstring states the
adaptation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.curation import quality_gate
from ..operators.dedup import paragraph_dedup
from ..operators.sessions import sessionize
from .catalog import DUCK_EVENTS, events_table, register, table
from .queries_ext import _B2, _B3

# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order-priority counts for orders with at least one
# LATE lineitem (EXISTS → left-semi join). Fixture adaptation: "late" =
# shipped more than 30 days after the order date (no commit/receipt
# dates in the fixture). The semi-join mixes an equi key with a range
# predicate — Spark executes it as a broadcast/sort-merge semi join with
# the range as a join residual, never materializing the EXISTS subquery.
@register(
    "rel_q4_priority",
    """SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority""",
)
def rel_q4_priority(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — two-level CASE aggregation: per returnflag, how many
# shipped items belong to high- vs low-priority orders (fixture has no
# l_shipmode; returnflag carries the grouping role).
@register(
    "rel_q12_priority_class",
    """SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_returnflag""",
)
def rel_q12_priority_class(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders: group-by-HAVING subquery join
# (quantity sums decimal-exact). The HAVING side is computed once and
# joined back; at scale it is the smaller side and broadcasts.
@register(
    "rel_q18_large_orders",
    """WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
SELECT c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def rel_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive (OR-of-ANDs) predicate over a part join.
# The point of this shape: Catalyst pushes the common l_quantity bounds
# and the p_brand IN-list into the scans while keeping the residual OR
# as a join filter — check docs/PLANS.md for the pushed-filter audit.
@register(
    "rel_q19_disjunctive",
    """SELECT
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE)
    AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
       AND l_quantity BETWEEN 20 AND 30)""",
)
def rel_q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 50) & q.between(20, 30))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(pred)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape — anti-join + scalar aggregate subquery: customers with
# above-average balance and NO orders since the cutoff ("wealthy but
# inactive"). Fixture adaptation: every customer has historical orders,
# so the anti-join is against RECENT orders only. The average goes
# through a decimal sum (order-insensitive) and the anti-join is a
# broadcast of the grouped recent-customer keys at fixture scale.
@register(
    "rel_q22_inactive",
    """WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0),
recent AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '2001-01-01')
SELECT c_nationkey,
       count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
GROUP BY c_nationkey""",
)
def rel_q22_inactive(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    # scalar subquery as a broadcast 1-row cross join — stays lazy and
    # fully planned (no driver-side collect of the average)
    avg_df = cust.where(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_bal")
    )
    recent = (
        table(spark, sf, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_df))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# Batch sessionization — gaps-and-islands over the event log (the batch
# mirror of streaming session windows; operators/sessions.py). 12-hour
# gap matches the fixture cadence (median inter-event gap ≈ 7.3 h).
@register(
    "rel_sessionize",
    f"""WITH {DUCK_EVENTS},
o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
              THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM o)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000.0
         AS duration_s
FROM s GROUP BY user_id, session_id""",
)
def rel_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    return sessionize(ev, gap_minutes=720)


# ---------------------------------------------------------------------------
# Approximate distinct — the HLL contract: the engine's
# approx_count_distinct must land within 15% of the exact count. Sketches
# differ by engine, so the oracle pins (exact count, tolerance verdict),
# not the sketch value: both engines agree on the exact side and the
# boolean. At 100 TB the approx path is the one you run (no
# count-distinct shuffle of the full key set); the exact column here is
# the per-SF audit.
@register(
    "rel_approx_distinct",
    f"""WITH {DUCK_EVENTS}
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       true AS approx_ok
FROM ev GROUP BY event_type""",
)
def rel_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.15 * F.col("exact_users")
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Paragraph-level dedup (CCNet-style, operators/dedup.py::paragraph_dedup):
# drop repeated passages corpus-wide, keep first occurrences, report
# per-doc survival counts.
@register(
    "dedup_paragraph",
    """WITH wsrc AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pp AS (
  SELECT doc_id, ws,
         unnest(generate_series(0, CAST(ceil(len(ws) / 10.0) AS INT) - 1)) AS para_pos
  FROM wsrc),
paras AS (
  SELECT doc_id, para_pos,
         md5(array_to_string(list_slice(ws, para_pos * 10 + 1, para_pos * 10 + 10), ' ')) AS h
  FROM pp),
k AS (
  SELECT doc_id, para_pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, para_pos) AS rn
  FROM paras)
SELECT doc_id, count(*) AS n_paragraphs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM k GROUP BY doc_id""",
)
def dedup_paragraph(spark: SparkSession, sf: str) -> DataFrame:
    return paragraph_dedup(table(spark, sf, "documents"), words_per_para=10)


# ---------------------------------------------------------------------------
# Corpus term statistics — global top-20 terms (len > 3) with
# deterministic tie-break. The explode→groupBy is the standard map-side-
# combinable shape; top-20 via TakeOrderedAndProject, no global sort.
@register(
    "text_term_stats",
    """WITH terms AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
counted AS (
  SELECT term, count(*) AS n FROM terms WHERE length(term) > 3 GROUP BY term),
ranked AS (
  SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rnk
  FROM counted)
SELECT term, n, CAST(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= 20""",
)
def text_term_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    counted = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
        )
        .where(F.length("term") > 3)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counted.orderBy(F.desc("n"), "term").limit(20)
    # unpartitioned window is safe: runs on the 20 rows post-limit
    w = Window.orderBy(F.desc("n"), "term")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Curation quality gate — the admission filter (language + quality +
# token bounds) as one map-only scan (operators/curation.py::quality_gate).
# The oracle restates the textstats formulas (same expressions as
# text_quality_score / text_lang_id oracles).
from .queries_ext import _BEST, _HIT_EXPRS, _PRED, _duck_in_list  # noqa: E402
from ..operators.textstats import STOPWORDS  # noqa: E402

_DUCK_QUALITY = (
    "0.4 * least(1.0, n_words / 100.0)"
    " + least(0.3, 0.3 * (stop_hits / n_words) * 3.0)"
    " + 0.3 * greatest(0.0, 1.0 - least(1.0,"
    " abs((n_chars - (n_words - 1)) / n_words - 5.0) / 5.0))"
)


@register(
    "cur_quality_gate",
    f"""WITH w AS (
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
  FROM h)
SELECT doc_id, pred_lang, quality, n_tokens,
       pred_lang <> 'unk' AS pass_lang,
       quality >= 0.45 AS pass_quality,
       n_tokens BETWEEN 5 AND 5000 AS pass_len,
       (pred_lang <> 'unk' AND quality >= 0.45
        AND n_tokens BETWEEN 5 AND 5000) AS passes
FROM g""",
)
def cur_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    return quality_gate(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Audio chunk plan — multimodal EXT: fixed 5 s segments (final partial)
# per audio/video row, duration from the stub metadata (md5 bytes 2-3,
# little-endian — same arithmetic as mm_frame_plan).
@register(
    "mm_audio_chunks",
    f"""WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'audio' END AS kind,
         md5(text) AS h
  FROM documents WHERE doc_id % 3 <> 2),
d AS (SELECT media_id, 1000 + ({_B2} + 256 * {_B3}) AS duration_ms FROM m),
seg AS (
  SELECT media_id, duration_ms,
         unnest(generate_series(0, CAST(ceil(duration_ms / 5000.0) AS INT) - 1)) AS seg_idx
  FROM d)
SELECT media_id, CAST(seg_idx AS BIGINT) AS seg_idx,
       CAST(seg_idx * 5000 AS BIGINT) AS start_ms,
       CAST(least((seg_idx + 1) * 5000, duration_ms) AS BIGINT) AS end_ms
FROM seg""",
)
def mm_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.multimodal import audio_chunk_plan, synth_media_from_docs

    docs = table(spark, sf, "documents").where(F.col("doc_id") % 3 != 2)
    # valid WAV (audio) / AVI (video) payloads; segment bounds consume
    # the tier-2 header-parsed duration, oracle-certified by the md5
    # arithmetic the construction reuses
    media = synth_media_from_docs(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.when(F.col("doc_id") % 3 == 0, "video")
            .otherwise("audio")
            .alias("kind"),
            "text",
        )
    )
    return audio_chunk_plan(media, chunk_ms=5000)


# ---------------------------------------------------------------------------
# Batch mirror of streaming dedup (streaming/chat_stream.py::
# dedup_events_stream): first event per (user_id, event_type), duplicate
# count per key. The live path is exercised in tests/test_streaming.py.
@register(
    "stream_dedup",
    f"""WITH {DUCK_EVENTS},
r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_total
  FROM ev)
SELECT user_id, event_type, ts AS first_ts,
       event_id AS first_event_id,
       CAST(n_total - 1 AS BIGINT) AS n_dropped
FROM r WHERE rn = 1""",
)
def stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
            (F.col("n_total") - 1).cast("long").alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — the forecasting-revenue filter-aggregate: no join at
# all, the whole query is scan-side predicate pushdown + one partial-
# final agg. The PLANS.md entry shows every predicate reaching the
# parquet scan.
@register(
    "rel_q6_revenue_delta",
    """SELECT
  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,8))) AS DOUBLE)
    AS revenue_delta,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0""",
)
def rel_q6_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(24,8)"
                )
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Sliding windows — §2.9 breadth next to tumbling: 2-hour windows sliding
# by 1 hour, so every event lands in exactly two windows. Spark's
# window() enumerates the covering windows per row (epoch-aligned);
# the oracle replays that as an explicit 2-element window-start union.
@register(
    "stream_sliding_2h1h",
    f"""WITH {DUCK_EVENTS},
w AS (
  SELECT date_trunc('hour', ts) AS h, event_type, value FROM ev),
slid AS (
  SELECT h AS win_start, event_type, value FROM w
  UNION ALL
  SELECT h - INTERVAL 1 HOUR, event_type, value FROM w)
SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM slid GROUP BY win_start, event_type""",
)
def stream_sliding_2h1h(spark: SparkSession, sf: str) -> DataFrame:
    # SAME code path as the live stream (test_streaming drives
    # sliding_metrics over readStream; this batch run is what the oracle
    # checks)
    from ..streaming.chat_stream import sliding_metrics

    return sliding_metrics(events_table(spark, sf))
