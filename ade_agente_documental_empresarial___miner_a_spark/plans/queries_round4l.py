"""Round-4 catalog additions, twelfth batch — graph/temporal/lakehouse
shapes that round out the analytics surface:

* triangle counting on the nation trade graph (the second classic
  distributed graph kernel next to PageRank — the clustering-coefficient
  numerator);
* overlapping-interval merge (the OTHER gaps-and-islands: islands by
  interval OVERLAP via a running-max frontier, where ``rel_sessionize``
  islands by inactivity gap);
* MERGE INTO classification (engine-native upsert semantics without a
  table format: per-key insert/update/unchanged actions from one FULL
  OUTER pass — the batch core of what Delta/Iceberg MERGE executes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import DUCK_EVENTS, events_table, register, table

# MATERIALIZED: consumers reference `edges` several times (wedge
# closure, reciprocity's dir x dir self-join, per-iteration BFS
# relaxations) and DuckDB otherwise re-inlines the DISTINCT over the
# 4-table join per reference — at sf0.1 the reciprocity shape spilled
# tmp to disk-full before the r10 hint (same class as the SSSP fix)
_EDGES_SQL = """edges AS MATERIALIZED (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey)"""


# ---------------------------------------------------------------------------
# Triangle counting — each triangle enumerated exactly once through the
# canonical ordering a < b < c (undirected-ify, dedupe, then the
# two-hop join closed by the third edge). Per-node participation counts
# come from exploding each triangle's three corners. The fixture graph
# is nation-sized, but the SHAPE is the scale story: the join is driven
# by the ordered edge list, so each wedge (a<b, b<c) is generated once
# and closed by one hash-join probe — at web scale the standard
# refinement orders nodes by DEGREE instead of id so high-degree hubs
# never anchor wedge generation (noted; id-order suffices here).
@register(
    "graph_triangles",
    f"""WITH {_EDGES_SQL},
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
  GROUP BY least(src, dst), greatest(src, dst)),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri)
SELECT n_nationkey AS nationkey, n_name AS nation,
       count(corners.node) AS n_triangles
FROM nation LEFT JOIN corners ON corners.node = n_nationkey
GROUP BY n_nationkey, n_name""",
)
def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
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
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .distinct()
    )
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    e3 = und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return (
        nation.join(
            corners, corners["node"] == nation["n_nationkey"], "left"
        )
        .groupBy(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.count("node").alias("n_triangles"))
    )


# ---------------------------------------------------------------------------
# Overlapping-interval merge — islands by interval OVERLAP: each event
# opens a 10-minute interval [ts, ts+10m); consecutive intervals that
# overlap the running frontier (max end seen so far) merge into one
# island. The frontier is a running MAX over a ROWS frame ordered by the
# TOTAL order (ts, event_id) — max is order-insensitive within the
# frame, the total order makes the frame itself deterministic, so both
# engines mark identical island starts. One shuffle on user_id; state
# per user is one row — the same scaling as sessionization.
@register(
    "rel_merge_intervals",
    f"""WITH {DUCK_EVENTS},
iv AS (
  SELECT user_id, event_id, ts,
         ts + INTERVAL 10 MINUTE AS iv_end
  FROM ev),
flagged AS (
  SELECT user_id, event_id, ts, iv_end,
         CASE WHEN max(iv_end) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              >= ts
              THEN 0 ELSE 1 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id, ts, iv_end,
         sum(new_island) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM flagged)
SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
       min(ts) AS island_start, max(iv_end) AS island_end,
       count(*) AS n_events
FROM islands GROUP BY user_id, island_id""",
)
def rel_merge_intervals(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    iv = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("iv_end"),
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frontier = F.max("iv_end").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(frontier >= F.col("ts"), F.lit(0)).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("ts").alias("island_start"),
        F.max("iv_end").alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# MERGE INTO classification — upsert semantics without a table format.
# A deterministic source batch (every 10th order re-priced +5%, every
# order ≡5 mod 10 resent unchanged, every order ≡7 mod 100 re-keyed
# into a disjoint id space as a pure insert) merged into the target
# (orders): one FULL OUTER pass classifies insert (source-only) /
# update (both, value changed) / unchanged (both, value equal) / noop
# (target-only, untouched). This is exactly the row-matching core that
# Delta/Iceberg MERGE runs before writing; at 100 TB the join
# co-partitions on the merge key and the touched-file set is what the
# formats prune — the DataFrame computes the same action column.
# Parity note: the +5% re-price stays in EXACT decimal (scale-4
# product, never rounded) — a round(x, 2) here would diverge on
# half-cent ties (Spark HALF_UP vs DuckDB's banker-ish decimal round).
_INSERT_SHIFT = 10_000_000


@register(
    "rel_upsert_merge",
    f"""WITH src AS (
  SELECT o_orderkey AS k,
         CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2))
           AS new_price
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(21,4))
           AS new_price
  FROM orders WHERE o_orderkey % 10 = 5
  UNION ALL
  SELECT o_orderkey + {_INSERT_SHIFT} AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(21,4))
           AS new_price
  FROM orders WHERE o_orderkey % 100 = 7),
tgt AS (
  SELECT o_orderkey AS k,
         CAST(o_totalprice AS DECIMAL(18,2)) AS old_price
  FROM orders),
m AS (
  SELECT coalesce(src.k, tgt.k) AS k, new_price, old_price,
         CASE WHEN tgt.k IS NULL THEN 'insert'
              WHEN src.k IS NULL THEN 'noop'
              WHEN new_price <> old_price THEN 'update'
              ELSE 'unchanged' END AS action
  FROM src FULL OUTER JOIN tgt ON src.k = tgt.k)
SELECT action, count(*) AS n_rows,
       CAST(sum(CAST(coalesce(new_price, old_price) AS DECIMAL(24,4))
                ) AS DOUBLE) AS merged_value
FROM m GROUP BY action""",
)
def rel_upsert_merge(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        (price_dec * F.lit("1.05").cast("decimal(3,2)")).alias(
            "new_price"
        ),
    )
    resend = orders.where(F.col("o_orderkey") % 10 == 5).select(
        F.col("o_orderkey").alias("k"),
        price_dec.cast("decimal(21,4)").alias("new_price"),
    )
    inserts = orders.where(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + _INSERT_SHIFT).alias("k"),
        price_dec.cast("decimal(21,4)").alias("new_price"),
    )
    src = updates.unionByName(resend).unionByName(inserts)
    tgt = orders.select(
        F.col("o_orderkey").alias("k"),
        price_dec.alias("old_price"),
    )
    m = src.join(tgt, "k", "full_outer").select(
        "k",
        "new_price",
        "old_price",
        F.when(F.col("old_price").isNull(), "insert")
        .when(F.col("new_price").isNull(), "noop")
        .when(F.col("new_price") != F.col("old_price"), "update")
        .otherwise("unchanged")
        .alias("action"),
    )
    return m.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.coalesce("new_price", "old_price").cast("decimal(24,4)")
        )
        .cast("double")
        .alias("merged_value"),
    )
