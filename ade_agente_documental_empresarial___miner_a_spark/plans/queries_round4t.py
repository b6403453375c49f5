"""Round-4 catalog additions, twentieth batch — sequence analytics and
co-occurrence mining:

* longest activity streak (DATE-level gaps-and-islands: consecutive
  active days per user — the third islands variant next to
  inactivity-gap sessionize and overlap-merge intervals);
* market-basket pair counts (co-occurrence/support mining: parts bought
  together in one order — the frequent-itemset primitive, pair
  generation bounded per basket, never a corpus self-join);
* equi-depth histogram (ntile deciles with per-bucket bounds — the
  complement of rel_value_histogram's equi-WIDTH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Longest consecutive-day streak — islands where the key is DATE
# ADJACENCY: within a user, consecutive distinct active days with no
# calendar gap form a streak; report each user's longest. The classic
# identity: date - (dense day index) is constant within a streak — one
# distinct, one user-partitioned window, one aggregate; no self-join.
# date arithmetic is exact on both engines (no timezone: dates derive
# from the UTC-pinned timestamps).
@register(
    "rel_longest_streak",
    f"""WITH {DUCK_EVENTS},
days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM ev),
marked AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS grp
  FROM days),
streaks AS (
  SELECT user_id, grp, count(*) AS len_days, min(d) AS streak_start
  FROM marked GROUP BY user_id, grp),
ranked AS (
  SELECT user_id, len_days, streak_start,
         max(len_days) OVER (PARTITION BY user_id) AS best
  FROM streaks)
SELECT user_id,
       CAST(max(len_days) AS BIGINT) AS longest_streak,
       min(CASE WHEN len_days = best THEN streak_start END)
         AS first_best_start
FROM ranked GROUP BY user_id""",
)
def rel_longest_streak(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("d")
    )
    marked = days.withColumn("grp", F.date_sub(F.col("d"), rn))
    streaks = marked.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len_days"),
        F.min("d").alias("streak_start"),
    )
    best = Window.partitionBy("user_id")
    return (
        streaks.withColumn("best", F.max("len_days").over(best))
        .groupBy("user_id")
        .agg(
            F.max("len_days").cast("long").alias("longest_streak"),
            F.min(
                F.when(
                    F.col("len_days") == F.col("best"),
                    F.col("streak_start"),
                )
            ).alias("first_best_start"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket pair counts — the support-counting primitive of
# frequent-itemset mining: for every order, each unordered pair of
# DISTINCT part brands bought together counts once; report the top-15
# pairs by support. Pair generation is a within-order self-join on the
# deduplicated basket (a < b cuts mirror pairs), so work is
# Σ basket_size² per ORDER — bounded by the basket, never a corpus-wide
# self-join; the final top-15 is TakeOrderedAndProject with a (pair)
# total-order tiebreak so both engines cut the same tail.
@register(
    "rel_basket_pairs",
    """WITH basket AS (
  SELECT DISTINCT l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand)
SELECT brand_a, brand_b, count(*) AS support
FROM pairs GROUP BY brand_a, brand_b
ORDER BY support DESC, brand_a, brand_b LIMIT 15""",
)
def rel_basket_pairs(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.p_brand") < F.col("b.p_brand")),
    ).select(
        F.col("a.p_brand").alias("brand_a"),
        F.col("b.p_brand").alias("brand_b"),
    )
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(
            F.col("support").desc(), "brand_a", "brand_b"
        )
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram — deciles by ntile over a TOTAL order
# (o_totalprice, o_orderkey): each bucket holds ⌈n/10⌉±1 rows and the
# bucket BOUNDS are the data summary (the complement of
# rel_value_histogram's fixed-width buckets, and what an optimizer's
# histogram statistics actually store). The total order makes ntile
# deterministic across engines; the global window is the fixture-scale
# form — at 100 TB the same summary comes from approx_percentile
# boundaries (contract-checked by rel_approx_percentile_contract).
@register(
    "rel_equidepth_hist",
    """WITH t AS (
  SELECT o_totalprice, o_orderkey,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
SELECT CAST(decile AS INT) AS decile, count(*) AS n_orders,
       CAST(min(o_totalprice) AS DOUBLE) AS lo,
       CAST(max(o_totalprice) AS DOUBLE) AS hi
FROM t GROUP BY decile""",
)
def rel_equidepth_hist(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranking import global_ntile

    orders = table(spark, sf, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    # deciles over EVERY order row — unbounded global rank, so the
    # distributed exact ntile rather than a partition-less window
    t = global_ntile(
        orders, 10, ["o_totalprice", "o_orderkey"], bucket_col="decile"
    )
    return t.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
