"""Round-4 catalog additions — the remaining TPC-H join shapes the
fixture schema supports (Q13 left-outer-count distribution, Q21
double-correlated EXISTS/NOT EXISTS, Q2 correlated-min, Q7 two-nation
volume, Q8 market share, Q9 product profit), the sessionized chat-cost
composite, and the persisted IVF+int8 index read path.

Fixture adaptations (the fixture has no partsupp, l_commitdate /
l_receiptdate, l_shipmode, or comment columns — each docstring states
the substitution; the JOIN SHAPE is the point of parity):
- "late" lineitem = shipped more than N days after o_orderdate.
- Q2's correlated min runs over part.p_retailprice per p_size (no
  partsupp supplycost).
- Q9's supply cost proxy = p_retailprice * l_quantity * 0.1.

Money aggregates go through DECIMAL(24,8) per-row casts (order-
insensitive sums, bit-exact across engines); computed integers are cast
to BIGINT on both sides; year extraction is EXTRACT/F.year cast BIGINT.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann
from ..functions.exactmath import dblround
from .catalog import _ORACLES, register, table
from .queries_ext import _IVF_N, _IVF_NPROBE

_REV_DECIMAL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))"


def _source_tag(sf: str, name: str) -> str:
    """Cache key for a derived-artifact directory: sf dir name + the
    source parquet's (mtime, size), so a regenerated fixture invalidates
    the cache instead of silently serving data derived from the old
    file (the driver regenerated testdata between rounds 3 and 4)."""
    st = os.stat(os.path.join(sf, f"{name}.parquet"))
    return (
        f"{os.path.basename(sf.rstrip('/'))}"
        f"_{int(st.st_mtime)}_{st.st_size}"
    )


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution via LEFT OUTER
# JOIN with an ON-clause filter (customers with zero qualifying orders
# must appear with c_count = 0; a WHERE filter would drop them, which is
# exactly the subtlety Q13 tests). Fixture adaptation: the reference
# filters o_comment NOT LIKE '%special%requests%'; the fixture has no
# comment column, so the ON-filter role is played by excluding URGENT
# orders. Scale: the outer join shuffles on custkey (uniform), the
# second aggregation is tiny (distinct order counts).
@register(
    "rel_q13_custdist",
    """SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count""",
)
def rel_q13_custdist(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer").select("c_custkey")
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — "suppliers who kept orders waiting": for finished
# orders, the supplier whose line shipped late, where at least one OTHER
# supplier contributed a line to the same order (EXISTS → left-semi) and
# NO other supplier was also late (NOT EXISTS → left-anti). Fixture
# adaptation: "late" = l_shipdate > o_orderdate + 60 days (no
# commit/receipt dates). Both the semi and the anti join carry a
# non-equi residual (suppkey inequality; the anti also the lateness
# range) on top of the l_orderkey equi key — the two join shapes nothing
# else in the catalog covers. Scale: all three lineitem legs shuffle on
# l_orderkey (uniform); supplier/nation are broadcast-size.
@register(
    "rel_q21_waiting",
    """SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND n_nationkey = s_nationkey
  AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name""",
)
def rel_q21_waiting(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    # EXISTS: some other supplier on the same order
    l1 = l1.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: no other supplier was ALSO late on that order
    l1 = l1.join(
        l2,
        (F.col("x_orderkey") == F.col("l_orderkey"))
        & (F.col("x_suppkey") != F.col("l_suppkey"))
        & (F.col("x_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = table(spark, sf, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    return (
        l1.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — correlated scalar-min subquery: parts priced at the
# minimum retail price of their size class. Fixture adaptation: no
# partsupp, so the correlation runs over part itself (p_size plays the
# region role, p_retailprice the supplycost role). Spark realizes the
# correlated min as a tiny groupBy (≤50 size classes) broadcast-joined
# back — the decorrelation Catalyst would pick for the SQL form.
@register(
    "rel_q2_min_price",
    """SELECT p_partkey, p_name, p_brand,
       CAST(p_size AS BIGINT) AS p_size,
       CAST(p_retailprice AS DOUBLE) AS p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_size = p.p_size)""",
)
def rel_q2_min_price(spark: SparkSession, sf: str) -> DataFrame:
    part = table(spark, sf, "part")
    mins = part.groupBy(F.col("p_size").alias("m_size")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (F.col("p_size") == F.col("m_size"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nation pairs: the nation
# table joins TWICE under different roles (supplier nation / customer
# nation) with a symmetric pair predicate, grouped by both nations and
# ship year. Scale: both nation legs broadcast; the big three-way
# lineitem⋈orders⋈customer shuffles on its equi keys.
@register(
    "rel_q7_volume",
    f"""SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         {_REV_DECIMAL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_9')
      OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_2'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01') shipping
GROUP BY supp_nation, cust_nation, l_year""",
)
def rel_q7_volume(spark: SparkSession, sf: str) -> DataFrame:
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_9")
    ) | (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_2")
    )
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: the fraction of regional
# revenue supplied by one nation, per order year. Two nation roles
# (customer region membership / supplier nationality) + a conditional
# share ratio. DECIMAL sums keep both engines exact; the final division
# is double-over-double of identical values, so bit-stable.
@register(
    "rel_q8_market_share",
    f"""SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV_DECIMAL} AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY') all_nations
GROUP BY o_year""",
)
def rel_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = table(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = table(spark, sf, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    vol = _rev()
    national = F.when(
        F.col("supp_nation") == "NATION_3", vol
    ).otherwise(F.lit(0).cast("decimal(24,8)"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(national).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit by supplier nation and year, with
# a substring part filter. Fixture adaptation: profit = revenue minus a
# retail-price cost proxy (p_retailprice * l_quantity * 0.1 — no
# partsupp supplycost); p_name LIKE '%red%' mirrors the reference's
# color filter. The per-row profit expression is evaluated in DOUBLE
# with identical association on both engines, then DECIMAL-cast so the
# sum is order-free.
@register(
    "rel_q9_profit",
    """SELECT n_name AS nation, o_year,
       CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
              - p_retailprice * l_quantity * 0.1 AS DECIMAL(24,8)) AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%red%') profit
GROUP BY n_name, o_year""",
)
def rel_q9_profit(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(24,8)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# sim_ivf_persisted — S8 at serving scale: the IVF/int8 index is BUILT
# ONCE (codebook + cell-partitioned int8 codes on disk,
# operators/ann.save_ivf_i8_index) and the query only READS it — no
# codebook refinement, assignment, or quantization job at query time
# (test_index_ann pins that by making the build entry points raise).
# The oracle is sim_ivf_quantized's full replay SQL: the persisted path
# must be bit-identical to recomputing the index from scratch, which is
# exactly the invariant a saved index has to honor.
def _register_sim_ivf_persisted():
    @register("sim_ivf_persisted", _ORACLES["sim_ivf_quantized"])
    def sim_ivf_persisted(spark: SparkSession, sf: str) -> DataFrame:
        emb = table(spark, sf, "embeddings")
        path = f"/tmp/ade_ivf_i8_{_source_tag(sf, 'embeddings')}"
        if not os.path.exists(os.path.join(path, "codes", "_SUCCESS")):
            ann.save_ivf_i8_index(
                emb, path, n_centroids=_IVF_N, refine_iters=1
            )
        codes, cents = ann.load_ivf_i8_index(spark, path)
        queries = emb.where(F.col("vec_id") < 10)
        return ann.ivf_i8_search(
            codes, cents, queries, k=5, nprobe=_IVF_NPROBE
        )


_register_sim_ivf_persisted()


# ---------------------------------------------------------------------------
# chat_session_costs — the reference's tab-2 analytics generalized
# (micro-infobot/app.py:270-283 shows per-conversation token cost): the
# A5 token/cost model rolled up per SESSION instead of per user, by
# composing the sessionization window with the cost projections at the
# EVENT level — one user-partitioned window + one groupBy, no
# session⋈event range join. DECIMAL cost sums stay order-insensitive.
def _register_chat_session_costs():
    from .catalog import DUCK_EVENTS, events_table

    @register(
        "chat_session_costs",
        f"""WITH {DUCK_EVENTS},
t AS (
  SELECT user_id, event_id, ts,
         CAST(value AS DECIMAL(18,2)) AS ptok,
         CAST(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)
              AS DECIMAL(18,2)) AS ctok
  FROM ev),
o AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 43200000000
                 THEN 1 ELSE 0 END AS new_s
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS session_id
  FROM o)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_turns,
       CAST(sum(ptok) AS DOUBLE) AS prompt_tokens,
       CAST(sum(ctok) AS DOUBLE) AS completion_tokens,
       CAST(sum(ptok * 0.00001 + ctok * 0.00003) AS DOUBLE) AS cost_usd,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000.0
         AS duration_s
FROM s GROUP BY user_id, session_id""",
    )
    def chat_session_costs(spark: SparkSession, sf: str) -> DataFrame:
        from decimal import Decimal

        from ..operators.sessions import with_session_ids

        ev = events_table(spark, sf).select(
            "user_id",
            "event_id",
            "ts",
            F.col("value").cast("decimal(18,2)").alias("ptok"),
            F.regexp_extract("props", r"([0-9]+)", 1)
            .cast("bigint")
            .cast("decimal(18,2)")
            .alias("ctok"),
        )
        s = with_session_ids(ev, gap_minutes=720)
        return s.groupBy("user_id", "session_id").agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("ptok").cast("double").alias("prompt_tokens"),
            F.sum("ctok").cast("double").alias("completion_tokens"),
            F.sum(
                F.col("ptok") * F.lit(Decimal("0.00001"))
                + F.col("ctok") * F.lit(Decimal("0.00003"))
            )
            .cast("double")
            .alias("cost_usd"),
            (
                (
                    F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
                ).cast("double")
                / 1_000_000.0
            ).alias("duration_s"),
        )


_register_chat_session_costs()


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier(s) by quarterly revenue: an aggregated
# CTE consumed twice, once as the join input and once reduced to a
# scalar max the selection compares against. The Spark side mirrors
# Catalyst's decorrelation: the 1-row max broadcasts as a lazy cross
# join (the rel_q22 pattern — no driver-side collect), and the equality
# compares DECIMALs, so ties are exact on both engines.
@register(
    "rel_q15_top_supplier",
    f"""WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({_REV_DECIMAL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
)
def rel_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))  # 1-row broadcast cross join
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape — small-quantity-order revenue: a correlated AVG
# threshold per part (l_quantity < 0.2 * avg(l_quantity) over the same
# part). Float division is not cross-engine-stable, so the predicate is
# rewritten exactly: qty < sum/(5*cnt)  ⇔  qty·5·cnt < sum, all in
# DECIMAL (quantities are exact in (18,2)) — bit-identical booleans on
# both engines. The per-part agg is the small side and broadcasts.
@register(
    "rel_q17_small_qty",
    """WITH agg AS (
  SELECT l_partkey AS a_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(24,8))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN agg ON a_partkey = l_partkey
WHERE p_brand = 'Brand#17'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty""",
)
def rel_q17_small_qty(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    part = table(spark, sf, "part").where(
        F.col("p_brand") == "Brand#17"
    ).select("p_partkey")
    small = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(agg), F.col("a_partkey") == F.col("l_partkey"))
        .where(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(24,8)")).cast("double")
            / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — nested IN with a grouped-HAVING inner query:
# nation-filtered suppliers who shipped more than a quantity threshold
# of color-named parts. Both INs become left-semi joins; the inner
# GROUP BY ... HAVING reduces lineitem⋈part before the semi, so the
# outer supplier scan never joins raw lineitem. (The reference's
# partsupp availqty correlation has no fixture analogue; the shipped-
# quantity threshold keeps the nested-semi + agg-threshold shape.)
@register(
    "rel_q20_excess_shippers",
    """SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY l_suppkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 500)
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation
    WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9', 'NATION_13'))""",
)
def rel_q20_excess_shippers(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    shippers = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
        .where(F.col("sq") > 500)
    )
    nations = table(spark, sf, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9", "NATION_13")
    )
    supp = table(spark, sf, "supplier")
    return (
        supp.join(
            F.broadcast(shippers),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — "important stock": per-key value HAVING a threshold
# that is a FRACTION OF A GLOBAL AGGREGATE over the same filtered set
# (the one TPC-H shape where the scalar subquery scans the query's own
# CTE, not a different table). Fixture adaptation: no partsupp, so
# value(part) = lineitem revenue restricted to suppliers of two nations
# (Q11's GERMANY filter). The fractional threshold is rewritten
# multiplication-only — value * 1000 > total ⇔ value > 0.001 * total —
# so the comparison stays in DECIMAL and is bit-identical across
# engines (no float division). Scale: the per-part agg shuffles on
# l_partkey (uniform); the global total is a 1-row broadcast cross
# join, never a driver collect.
@register(
    "rel_q11_important_parts",
    f"""WITH pv AS (
  SELECT l_partkey, sum({_REV_DECIMAL}) AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_7', 'NATION_19')
  GROUP BY l_partkey)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM pv
WHERE part_value * 1000 > (SELECT sum(part_value) FROM pv)""",
)
def rel_q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    nations = table(spark, sf, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_19")
    )
    supp = (
        table(spark, sf, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    pv = (
        table(spark, sf, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("part_value"))
    )
    total = pv.agg(F.sum("part_value").alias("_total"))
    return (
        pv.join(F.broadcast(total))  # 1-row broadcast cross join
        .where(F.col("part_value") * 1000 > F.col("_total"))
        .select(
            "l_partkey", F.col("part_value").cast("double").alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — supplier-count distribution: COUNT(DISTINCT) under a
# multi-column GROUP BY, with a NOT IN subquery (→ anti join; the
# "complaint suppliers" of the reference become negative-balance
# suppliers, the fixture's only supplier-quality signal) and a
# negated LIKE + IN-list part filter. The distinct-agg + anti-join
# combination is the one Q-shape the sweep still lacked. Scale: the
# anti join's right side is supplier (broadcast-size); the distinct
# agg shuffles on (p_brand, p_type, p_size, l_suppkey) — Spark plans
# it as a two-phase partial-distinct expand, map-side combinable.
@register(
    "rel_q16_supplier_cnt",
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)
def rel_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    part = table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    complaints = (
        table(spark, sf, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        table(spark, sf, "lineitem")
        .join(
            F.broadcast(complaints),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Curation additions — the three sampling/batching steps between quality
# gating and tokenization in a pretraining-data pipeline: per-domain
# quota caps, stratified language rebalancing, and length-bucketed batch
# assignment. All deterministic (salted-md5 order/buckets — reproducible
# across engines and retries, no RNG), all expressible as one window or
# a map-only projection.

_DUCK_HEX = "(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"


def _duck_salt_bucket(salt: str) -> str:
    h = f"md5('{salt}' || CAST(doc_id AS VARCHAR))"
    hv = [_DUCK_HEX.format(h=h, p=p) for p in (1, 2, 3, 4)]
    return (
        f"((({hv[0]} * 16 + {hv[1]}) * 256 + ({hv[2]} * 16 + {hv[3]})) % 100)"
    )


@register(
    "cur_source_quota",
    """WITH r AS (
  SELECT source,
         row_number() OVER (PARTITION BY source
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r GROUP BY source""",
)
def cur_source_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain quota cap (operators/curation.py:source_quota) summarized
    as kept-vs-total per source."""
    from ..operators.curation import source_quota

    q = source_quota(table(spark, sf, "documents"), quota=15)
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
    )


@register(
    "cur_stratified_sample",
    f"""WITH b AS (
  SELECT lang, {_duck_salt_bucket('sample:')} AS bucket FROM documents),
s AS (
  SELECT lang,
         CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 40 ELSE 80 END)
              THEN 1 ELSE 0 END AS sampled
  FROM b)
SELECT lang, CAST(count(*) AS BIGINT) AS n_in,
       CAST(sum(sampled) AS BIGINT) AS n_sampled,
       CAST(sum(sampled) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac
FROM s GROUP BY lang""",
)
def cur_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified rebalancing: keep 40% of the
    over-represented 'en' stratum, 80% of every other language
    (operators/curation.py:stratified_sample). Map-only."""
    from ..operators.curation import stratified_sample

    s = stratified_sample(
        table(spark, sf, "documents"), {"en": 40}, default_pct=80
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_in"),
        F.sum(F.col("sampled").cast("long")).cast("long").alias("n_sampled"),
        (
            F.sum(F.col("sampled").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("frac"),
    )


@register(
    "cur_length_batches",
    """WITH b AS (
  SELECT doc_id, n_chars,
         CAST(floor(n_chars / 128.0) AS BIGINT) AS len_bucket
  FROM documents),
r AS (
  SELECT len_bucket, n_chars,
         row_number() OVER (PARTITION BY len_bucket
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM b),
a AS (SELECT len_bucket, n_chars,
             CAST(floor((rn - 1) / 8.0) AS BIGINT) AS batch_id FROM r)
SELECT len_bucket, batch_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(count(*) * max(n_chars) AS BIGINT) AS padded_cost,
       CAST(sum(n_chars) AS BIGINT) AS actual_chars
FROM a GROUP BY len_bucket, batch_id""",
)
def cur_length_batches(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bucketed batch assignment + the padding economics per batch
    (operators/curation.py:length_bucket_batches): padded_cost is what a
    fixed-shape batch pays, actual_chars what the tokens need."""
    from ..operators.curation import length_bucket_batches

    b = length_bucket_batches(
        table(spark, sf, "documents"), bucket_chars=128, batch_size=8
    )
    return b.groupBy("len_bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_chars").cast("long").alias("max_chars"),
        (F.count(F.lit(1)) * F.max("n_chars")).cast("long").alias("padded_cost"),
        F.sum("n_chars").cast("long").alias("actual_chars"),
    )


# ---------------------------------------------------------------------------
# Partition-pruned scan over a hive-partitioned events lake — the
# time-predicate access path a 100 TB deployment lives on. The fixture
# events table is written once (per sf) as a date-partitioned layout
# via sources/layout.py::write_partitioned (repartition-by-key first,
# so each day lands in ONE file, not one per writer task), then the
# query's date range prunes whole directories before any I/O: the scan
# node carries PartitionFilters on event_date and reads 3 of ~30
# day-directories (pinned by test via inputFiles()). The oracle runs
# the same predicate over the raw events parquet — pruning must be a
# pure access-path optimization with zero semantic effect.


def _ensure_partitioned_events(spark: SparkSession, sf: str) -> str:
    import tempfile

    from ..sources.layout import write_partitioned
    from .catalog import events_table

    out = os.path.join(
        tempfile.gettempdir(),
        f"ade_part_events_{_source_tag(sf, 'events')}",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = events_table(spark, sf).withColumn(
            "event_date", F.to_date("ts")
        )
        write_partitioned(ev, out, ["event_date"])
    return out


@register(
    "rel_partition_pruned_scan",
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '2024-01-10'
  AND CAST(CAST(ts AS TIMESTAMP) AS DATE) <= DATE '2024-01-12'
GROUP BY 1, 2""",
)
def rel_partition_pruned_scan(spark: SparkSession, sf: str) -> DataFrame:
    path = _ensure_partitioned_events(spark, sf)
    ev = spark.read.parquet(path)
    return (
        ev.where(
            (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
            & (F.col("event_date") <= F.lit("2024-01-12").cast("date"))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Element-wise embedding mean-pooling — the aggregation that turns chunk
# or member vectors into a document/class-level vector (centroids for
# classification, doc vectors from chunk vectors, cluster summaries).
# Exactness: float sums are fold-order-dependent, and DECIMAL quantization
# of raw doubles is engine-divergent at the last digit (Spark casts via the
# double's shortest string repr, DuckDB via the exact binary value — a
# 1e-10 disagreement per element surfaced at sf0.01). The bit-exact recipe
# is the one round 1 verified for cosine/histogram parity: a DETERMINISTIC
# left fold — collect per-(label,pos) values sorted by vec_id and sum with
# F.aggregate, which DuckDB mirrors exactly with
# list_aggregate(list(v ORDER BY vec_id), 'sum'). Scale: posexplode is
# map-only (dim×N rows); groupBy(label,pos) shuffles once; the per-group
# list is N/n_labels values — fine for centroid counts in the thousands.
# For billion-vector corpora drop the determinism requirement and use
# plain F.avg (map-side combinable, no lists); the fold here is the
# oracle-exact shape, per-position means are identical up to float
# addition order.
# Output shape: exploded (label, pos, mean_v, n_vecs) rows rather than a
# label→ARRAY<DOUBLE> centroid column — the driver's canonicalizer sorts
# result columns via pandas and cannot hash list cells (r04 RED,
# CORRECTNESS_r04 `TypeError: unhashable type: 'list'`); every other
# catalog entry already flattens arrays (array_join / explode), and the
# long form is also what the downstream broadcast-scoring join
# (emb_centroid_classify) consumes.
@register(
    "emb_label_centroids",
    """WITH ex AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(embedding) AS v
  FROM embeddings)
SELECT label, CAST(pos AS BIGINT) AS pos,
       list_aggregate(list(CAST(v AS DOUBLE) ORDER BY vec_id), 'sum')
         / count(*) AS mean_v,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM ex GROUP BY label, pos""",
)
def emb_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    ex = table(spark, sf, "embeddings").select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    )
    return ex.groupBy("label", "pos").agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    lambda s: s["v"].cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("mean_v"),
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
    ).select("label", F.col("pos").cast("long").alias("pos"), "mean_v", "n_vecs")


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Okapi, k1=1.2 b=0.75) — the classic lexical
# scorer the reference's vector search replaced (micro-infobot/app.py:130
# uses Chroma similarity; BM25 is the corpus-statistics baseline every
# retrieval stack keeps for hybrid search). Pure Catalyst: tokenize →
# per-(doc,term) tf, per-doc length, per-term df — all map-side-combinable
# groupBys on uniform keys; corpus scalars (N, avgdl) are a 1-row
# broadcast cross-join, per-term df a broadcast (|query| rows). Top-10 is
# TakeOrderedAndProject (no global sort). Float parity: idf/tf products
# are per-term doubles from exact integer inputs; the only order-sensitive
# reduction is the per-doc sum over matched query terms, done as a
# term-sorted deterministic fold (F.aggregate ≡ list_aggregate 'sum').
# ln() is the one non-exact primitive: JVM Math.log is allowed 1 ulp of
# error and measurably differs from glibc's ln on some inputs (verified:
# ln(1.2699619771863118) differs in the last bit), so the surfaced score
# is quantized to 9 decimals on both engines and the top-10 ORDER BY
# runs on the quantized value with doc_id tiebreak — the cross-engine
# contract is exact while the 1e-16 libm drift stays far below the
# quantum. Verified at sf0.001/0.01/0.1 by tools/parity.
# At 100 TB: same plan — token explode is map-only, df/tf groupBys are
# partial-agg'd, scalars broadcast; no all-pairs anywhere.
_BM25_TERMS = ["hash", "spark", "vector"]
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_bm25_topk",
    f"""WITH tokens AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents)
  WHERE length(term) > 3),
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
corpus AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl),
q(term) AS (VALUES ('hash'), ('spark'), ('vector')),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY term),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tokens
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         * (CAST(tf AS DOUBLE) * ({_BM25_K1} + 1))
         / (CAST(tf AS DOUBLE) + {_BM25_K1}
            * (1 - {_BM25_B} + {_BM25_B} * CAST(dl.dl AS DOUBLE) / avgdl))
           AS term_score
  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
          JOIN df ON tf.term = df.term
          CROSS JOIN corpus),
docs AS (
  SELECT doc_id,
         round(list_aggregate(list(term_score ORDER BY term), 'sum') * 1e9) / 1e9
           AS score,
         CAST(count(*) AS BIGINT) AS n_matched
  FROM scored GROUP BY doc_id)
SELECT doc_id, score, n_matched FROM docs
ORDER BY score DESC, doc_id LIMIT 10""",
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    tokens = (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
        .filter(F.length("term") > 3)
    )
    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtok = tokens.filter(F.col("term").isin(_BM25_TERMS))
    df = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (
                F.log(
                    1
                    + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * (F.col("tf").cast("double") * (_BM25_K1 + 1))
                / (
                    F.col("tf").cast("double")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B * F.col("dl").cast("double") / F.col("avgdl")
                    )
                )
            ).alias("term_score"),
        )
    )
    docs = scored.groupBy("doc_id").agg(
        dblround(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("term", "term_score"))),
                    lambda s: s["term_score"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_matched"),
    )
    return docs.orderBy(F.desc("score"), "doc_id").limit(10)


# ---------------------------------------------------------------------------
# Nearest-centroid classification — assign every vector to its closest
# label centroid (cosine) and report the confusion matrix. Composes
# emb_label_centroids (the training step) with a broadcast scoring join:
# centroids are labels×dim (10×64 here — kilobytes at any corpus size),
# so scoring is a BROADCAST join on pos + one groupBy(vec_id, clabel);
# nothing shuffles on the big side beyond the per-vector reduction. At
# 100 TB you would fold the centroid matrix into a literal array and
# zip_with it per-row (pure map); the exploded-join here is the
# oracle-exact shape. Float parity: every reduction (dot, both norms,
# centroid means) is a pos/vec_id-sorted deterministic fold; sqrt is
# IEEE-correctly-rounded on both engines; argmax tie-breaks on clabel.
@register(
    "emb_centroid_classify",
    """WITH ex AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
cent AS (
  SELECT label AS clabel, pos,
         list_aggregate(list(v ORDER BY vec_id), 'sum') / count(*) AS c
  FROM ex GROUP BY label, pos),
cnorm AS (
  SELECT clabel,
         sqrt(list_aggregate(list(c * c ORDER BY pos), 'sum')) AS nc
  FROM cent GROUP BY clabel),
vnorm AS (
  SELECT vec_id,
         sqrt(list_aggregate(list(v * v ORDER BY pos), 'sum')) AS nv
  FROM ex GROUP BY vec_id),
dots AS (
  SELECT ex.vec_id, cent.clabel,
         list_aggregate(list(ex.v * cent.c ORDER BY ex.pos), 'sum') AS dot
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY ex.vec_id, cent.clabel),
ranked AS (
  SELECT d.vec_id, d.clabel,
         row_number() OVER (
           PARTITION BY d.vec_id
           ORDER BY d.dot / (vnorm.nv * cnorm.nc) DESC, d.clabel) AS rnk
  FROM dots d
  JOIN vnorm ON d.vec_id = vnorm.vec_id
  JOIN cnorm ON d.clabel = cnorm.clabel),
pred AS (
  SELECT e.vec_id, e.label AS true_label, r.clabel AS pred_label
  FROM (SELECT DISTINCT vec_id, label FROM ex) e
  JOIN ranked r ON e.vec_id = r.vec_id AND r.rnk = 1)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
FROM pred GROUP BY true_label, pred_label""",
)
def emb_centroid_classify(spark: SparkSession, sf: str) -> DataFrame:
    ex = table(spark, sf, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).withColumn("v", F.col("v").cast("double"))

    def _fold(col):
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    cent = ex.groupBy(F.col("label").alias("clabel"), "pos").agg(
        (
            _fold(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "v"))),
                    lambda s: s["v"],
                )
            )
            / F.count(F.lit(1))
        ).alias("c")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sqrt(
            _fold(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", (F.col("c") * F.col("c")).alias("cc")))
                    ),
                    lambda s: s["cc"],
                )
            )
        ).alias("nc")
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sqrt(
            _fold(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", (F.col("v") * F.col("v")).alias("vv")))
                    ),
                    lambda s: s["vv"],
                )
            )
        ).alias("nv")
    )
    dots = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "clabel")
        .agg(
            _fold(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", (F.col("v") * F.col("c")).alias("vc")))
                    ),
                    lambda s: s["vc"],
                )
            ).alias("dot")
        )
    )
    from pyspark.sql.window import Window

    ranked = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "clabel")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    # try_divide: zero-norm vectors rank all centroids
                    # NULL (DESC NULLS LAST → tie on clabel), matching
                    # the oracle instead of aborting the job
                    F.desc(
                        F.try_divide(
                            F.col("dot"), F.col("nv") * F.col("nc")
                        )
                    ),
                    "clabel",
                )
            ),
        )
        .filter(F.col("rnk") == 1)
        .select("vec_id", F.col("clabel").alias("pred_label"))
    )
    truth = ex.select("vec_id", F.col("label").alias("true_label")).distinct()
    return (
        truth.join(ranked, "vec_id")
        .groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
