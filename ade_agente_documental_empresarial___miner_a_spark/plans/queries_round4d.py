"""Round-4 catalog additions, fourth batch — weighted median, z-order
layout keys, curriculum phases, a deterministic count-min sketch,
cogrouped-Pandas as-of join (the one Arrow API the engine had not yet
exercised), and asymmetric containment dedup.

Same parity discipline as the rest of the catalog: integer/decimal math
wherever possible; fold-order-sensitive float sums quantized round(·,9)
then summed as DECIMAL; identical literal expressions generated for both
engines from one Python loop where the formula is mechanical (bit
interleaving, sketch rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exactmath import (
    dblround,
    halfup_mean,
    halfup_mean_duck,
    halfup_ratio,
    halfup_ratio_duck,
)
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Weighted median — revenue-weighted median order quantity per return
# flag: the smallest quantity whose cumulative revenue weight reaches
# half the group total. Pure decimal/integer math (weights DECIMAL(18,2))
# so the cumulative comparison is exact on both engines. Scale shape:
# one (flag, qty) pre-aggregate collapses the fact table map-side; the
# windows then run over ~50 rows per flag — the heavy data never meets
# a window.
@register(
    "rel_weighted_median",
    """WITH wq AS (
  SELECT l_returnflag, l_quantity,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY l_returnflag, l_quantity),
c AS (
  SELECT l_returnflag, l_quantity, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM wq)
SELECT l_returnflag,
       min(CASE WHEN cum * 2 >= tot THEN l_quantity END)
         AS weighted_median_qty,
       CAST(max(tot) AS DOUBLE) AS total_weight
FROM c GROUP BY l_returnflag""",
)
def rel_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_returnflag",
        "l_quantity",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("ep"),
    )
    wq = li.groupBy("l_returnflag", "l_quantity").agg(F.sum("ep").alias("w"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    c = wq.select(
        "l_returnflag",
        "l_quantity",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wtot).alias("tot"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("tot"), F.col("l_quantity"))
        ).alias("weighted_median_qty"),
        F.max("tot").cast("double").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Z-order layout keys — the multi-dimensional clustering math behind
# Delta/Iceberg OPTIMIZE ZORDER, surfaced as a query: interleave the low
# 16 bits of (user_id, epoch-day) into a 32-bit z-value, bucket by the
# high bits, and report each bucket's (user, day) bounding box. The
# point of the output: every z-bucket spans a NARROW range of BOTH
# dimensions — that is what makes min/max footer stats skippable for
# either predicate. The interleave expression is generated once and
# rendered for each engine's operator syntax (same arithmetic).
_ZBITS = 16


def _z_expr(spark_side: bool) -> str:
    terms = []
    for i in range(_ZBITS):
        if spark_side:
            terms.append(f"shiftleft(shiftright(ux, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright(dy, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"(((ux >> {i}) & 1) << {2 * i})")
            terms.append(f"(((dy >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "rel_zorder_keys",
    f"""WITH {DUCK_EVENTS},
k AS (
  SELECT user_id & 65535 AS ux,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) & 65535 AS dy
  FROM ev),
z AS (SELECT ux, dy, {_z_expr(False)} AS zval FROM k)
SELECT zval >> 6 AS zbucket,
       count(*) AS n,
       CAST(min(ux) AS BIGINT) AS ux_min, CAST(max(ux) AS BIGINT) AS ux_max,
       CAST(min(dy) AS BIGINT) AS dy_min, CAST(max(dy) AS BIGINT) AS dy_max
FROM z GROUP BY zbucket""",
)
def rel_zorder_keys(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    k = ev.select(
        (F.col("user_id").bitwiseAND(65535)).alias("ux"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("long")
        .bitwiseAND(65535)
        .alias("dy"),
    )
    z = k.select("ux", "dy", F.expr(_z_expr(True)).alias("zval"))
    return z.groupBy(
        F.shiftright("zval", 6).cast("long").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ux").cast("long").alias("ux_min"),
        F.max("ux").cast("long").alias("ux_max"),
        F.min("dy").cast("long").alias("dy_min"),
        F.max("dy").cast("long").alias("dy_max"),
    )


# ---------------------------------------------------------------------------
# Curriculum phases — curriculum-learning bucketing: docs ranked by the
# heuristic quality score and cut into 4 ntile phases (train easy→hard),
# reporting each phase's doc count, token budget, and mean quality.
# ntile over a global order is a single-partition sort — fine for the
# per-corpus report; at 100 TB you compute approximate quantile CUTOFFS
# first (one pass) and assign phases map-side instead (noted, the ntile
# IS the spec). Mean quality uses the quantize-then-decimal-sum fold.
def _curriculum_sql() -> str:
    from ..operators.textstats import STOPWORDS
    from .queries_ext import _HIT_EXPRS, _duck_in_list  # noqa: F401
    from .queries_round3 import _DUCK_QUALITY

    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ({_duck_in_list(STOPWORDS)}))) AS DOUBLE) AS stop_hits
  FROM documents),
q AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
         {_DUCK_QUALITY} AS quality
  FROM w),
p AS (
  SELECT doc_id, n_tokens,
         CAST(round(quality * 1e9) / 1e9 AS DECIMAL(20,9)) AS quality_q,
         ntile(4) OVER (ORDER BY quality, doc_id) AS phase
  FROM q)
SELECT CAST(phase AS BIGINT) AS phase,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       {halfup_mean_duck("sum(quality_q)", "count(*)", 9)} AS avg_quality
FROM p GROUP BY phase"""


@register("cur_curriculum_phases", _curriculum_sql())
def cur_curriculum_phases(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.textstats import quality_expr

    docs = table(spark, sf, "documents")
    t = F.col("text")
    q = docs.select(
        "doc_id",
        F.size(F.split(t, " ")).cast("long").alias("n_tokens"),
        quality_expr(t).alias("quality"),
    )
    from ..operators.ranking import global_ntile

    # curriculum quartiles over EVERY document — unbounded global rank,
    # so the distributed exact ntile rather than a partition-less window
    p = global_ntile(q, 4, ["quality", "doc_id"], bucket_col="phase").select(
        "doc_id",
        "n_tokens",
        dblround(F.col("quality"), 9).cast("decimal(20,9)").alias("quality_q"),
        "phase",
    )
    # quality_q carries exactly 9 decimals, so the phase mean is stated
    # as the integer-exact HALF_UP quotient (ROUND8 §12 — round(double,9)
    # is not cross-engine stable at half boundaries)
    return p.groupBy(F.col("phase").cast("long").alias("phase")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        halfup_mean("sum(quality_q)", "count(1)", 9).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — the streaming-sketch representative
# with an EXACT oracle: the sketch is deterministic (4 rows × 256
# buckets, bucket = first md5 byte of a salted key), so both engines
# build bit-identical sketches and the CMS estimate (min over rows) is
# engine-exact. Output: the true top-10 users with exact count and CMS
# estimate — estimate >= exact always (one-sided error), equality when
# no collision. At scale: the sketch is 1024 cells regardless of
# cardinality (broadcastable state, mergeable across partitions/windows)
# — that is the whole point vs the exact groupBy it is compared to.
_CMS_D = 4


def _cms_bucket_duck(d: int) -> str:
    h = f"md5('cms{d}:' || CAST(user_id AS VARCHAR))"
    return (
        f"(strpos('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


def _cms_sql() -> str:
    sketches = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {_cms_bucket_duck(d)} AS bucket, count(*) AS n_b"
        f" FROM ev GROUP BY bucket"
        for d in range(_CMS_D)
    )
    probes = "\nUNION ALL\n".join(
        f"SELECT user_id, n_exact, {d} AS d, {_cms_bucket_duck(d)} AS bucket"
        f" FROM top"
        for d in range(_CMS_D)
    )
    return f"""WITH {DUCK_EVENTS},
sk AS ({sketches}),
exact AS (SELECT user_id, count(*) AS n_exact FROM ev GROUP BY user_id),
top AS (SELECT user_id, n_exact FROM exact
        ORDER BY n_exact DESC, user_id LIMIT 10),
pr AS ({probes})
SELECT pr.user_id, CAST(pr.n_exact AS BIGINT) AS n_exact,
       CAST(min(sk.n_b) AS BIGINT) AS n_cms
FROM pr JOIN sk ON pr.d = sk.d AND pr.bucket = sk.bucket
GROUP BY pr.user_id, pr.n_exact"""


def _cms_bucket_spark(d: int):
    from ..operators.curation import _hexval

    h = F.md5(
        F.concat(F.lit(f"cms{d}:"), F.col("user_id").cast("string"))
    )
    return (_hexval(h, 1) * 16 + _hexval(h, 2)).cast("long")


@register("rel_heavy_hitters_cms", _cms_sql())
def rel_heavy_hitters_cms(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select("user_id")
    d_col = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d")
    keyed = ev.select("user_id", d_col)
    # per-row bucket: dispatch on d via chained whens (d is tiny)
    bucket = _cms_bucket_spark(0)
    for d in range(1, _CMS_D):
        bucket = F.when(F.col("d") == d, _cms_bucket_spark(d)).otherwise(
            bucket
        )
    sk = keyed.withColumn("bucket", bucket).groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), "user_id").limit(10)
    probes = top.select(
        "user_id", "n_exact", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d")
    )
    pbucket = _cms_bucket_spark(0)
    for d in range(1, _CMS_D):
        pbucket = F.when(F.col("d") == d, _cms_bucket_spark(d)).otherwise(
            pbucket
        )
    probes = probes.withColumn("bucket", pbucket)
    return (
        probes.join(F.broadcast(sk), ["d", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("n_b").alias("n_cms"))
    )


# ---------------------------------------------------------------------------
# Cogrouped-Pandas as-of join — the as-of semantics of rel_asof_join
# executed through groupBy().cogroup().applyInPandas(pd.merge_asof):
# the one Arrow-batched API surface (cogrouped map) the engine had not
# yet exercised. Use case at scale: per-key logic too gnarly for SQL
# (custom matching, model scoring against a per-key reference frame) —
# both sides shuffle ONCE on the key, then each key's pair of frames
# meets in a single Python worker, Arrow both ways. The oracle is the
# same ASOF LEFT JOIN contract as rel_asof_join.
@register(
    "rel_asof_cogrouped",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                          event_type FROM events),
l AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
r0 AS (SELECT user_id, ts, max(event_id) AS r_event_id
       FROM ev WHERE event_type <> 'purchase' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id,
       r0.r_event_id AS matched_event_id,
       CAST(epoch_us(l.ts - r0.ts) AS BIGINT) AS lag_us
FROM l ASOF LEFT JOIN r0 ON l.user_id = r0.user_id AND l.ts >= r0.ts""",
)
def rel_asof_cogrouped(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    ev = events_table(spark, sf)
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    right = (
        ev.where(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"))
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        l = l.sort_values("ts", kind="mergesort")
        if len(r) == 0:
            out = l[["event_id", "user_id"]].copy()
            out["matched_event_id"] = pd.array([None] * len(l), dtype="Int64")
            out["lag_us"] = pd.array([None] * len(l), dtype="Int64")
            return out
        r = r.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "r_ts", "user_id": "r_user_id"}
        )
        m = pd.merge_asof(
            l, r, left_on="ts", right_on="r_ts", direction="backward"
        )
        lag = (m["ts"] - m["r_ts"]) / pd.Timedelta(microseconds=1)
        return pd.DataFrame(
            {
                "event_id": m["event_id"],
                "user_id": m["user_id"],
                "matched_event_id": m["r_event_id"].astype("Int64"),
                "lag_us": lag.astype("Int64"),
            }
        )

    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, matched_event_id long, lag_us long",
        )
    )


# ---------------------------------------------------------------------------
# Asymmetric containment — quote/subset detection, the directional
# complement of Jaccard (Broder's containment c(A,B) = |S_A ∩ S_B| /
# |S_A|): a short doc quoted inside a long one scores ~1.0 one way and
# low the other, which symmetric Jaccard misses. Shingle space is capped
# at document frequency <= 50 (boilerplate/stop-shingles would otherwise
# create O(N²) hot buckets — the standard stop-shingle guard; both
# numerator AND denominator use the capped space, so the score is
# self-consistent). Scale shape: df cap bounds every bucket, so the
# self-join is Σ min(df,50)² — linear-ish in N, never all-pairs.
@register(
    "dedup_containment",
    f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+2], ' ')) AS s
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM words WHERE len(w) >= 3)),
df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
rare AS (SELECT doc_id, sh.s FROM sh JOIN df USING (s) WHERE df <= 50),
n AS (SELECT doc_id, count(*) AS n_sh FROM rare GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY doc_a, doc_b)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       {halfup_ratio_duck("n_shared", "n_sh", 9)} AS containment
FROM p JOIN n ON p.doc_a = n.doc_id
WHERE n_shared / n_sh >= 0.05""",
)
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import spread

    docs = spread(table(spark, sf, "documents"), "doc_id")
    words = F.split(F.col("text"), " ")
    sh = (
        docs.select(F.col("doc_id"), words.alias("w"))
        .where(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - 2),
                        lambda i: F.md5(
                            F.array_join(F.slice(F.col("w"), i, 3), " ")
                        ),
                    )
                )
            ).alias("s"),
        )
    )
    df_caps = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(df_caps.where(F.col("df") <= 50), "s").select("doc_id", "s")
    n = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = rare.alias("a")
    b = rare.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    cont = F.col("n_shared") / F.col("n_sh")
    return (
        p.join(n, p["doc_a"] == n["doc_id"])
        .where(cont >= 0.05)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            halfup_ratio("n_shared", "n_sh", 9).alias("containment"),
        )
    )
