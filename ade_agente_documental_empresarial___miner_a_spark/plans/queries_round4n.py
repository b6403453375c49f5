"""Round-4 catalog additions, fourteenth batch — the remaining classic
distributed kernels and runtime-filter machinery:

* single-source BFS levels over the nation trade graph (iterative
  frontier expansion — the traversal kernel next to PageRank and
  triangle counting; oracle is a cycle-safe recursive CTE);
* 2-D skyline / Pareto frontier (the classic OLAP preference operator,
  computed as a LINEAR price-level sweep, not the quadratic dominance
  self-join the oracle states);
* mergeable HLL sketches (DataSketches ``hll_sketch_agg`` /
  ``hll_union_agg`` — the 100 TB distinct-counting shape: per-shard
  sketches merged associatively, estimate within a pinned tolerance);
* corpus perplexity filtering (CCNet-style: worst-decile cut on the
  trigram-LM score from ``text_trigram_lm``);
* runtime bloom-filter join (Catalyst's InjectRuntimeFilter: the
  selective dim side builds a bloom filter that pre-filters the fact
  scan BEFORE the shuffle — the row-level sibling of dynamic partition
  pruning, pinned via ``might_contain`` in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table
from .queries_round4c import TRIGRAM_SCORES_SQL
from .queries_round4l import _EDGES_SQL


# ---------------------------------------------------------------------------
# Single-source BFS levels — hop distance from nation 0 over the
# undirected trade graph. Spark side is the standard iterative frontier
# expansion: each round joins the current frontier against the symmetric
# edge list, anti-joins out already-visited nodes, and localCheckpoints
# the (small) visited set so the lineage stays flat — the same
# per-round discipline as dedup_clusters' label propagation. The number
# of rounds is the graph diameter, and every round is one co-partitioned
# join on the node key; at web scale the frontier/visited sets live
# partitioned on node id and never collect. The oracle is a recursive
# CTE made cycle-safe by UNION (dedup on (node, lvl)) plus a depth guard,
# reduced to min(lvl) per node.
@register(
    "graph_bfs_levels",
    f"""WITH RECURSIVE {_EDGES_SQL},
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
  GROUP BY least(src, dst), greatest(src, dst)),
sym AS (
  SELECT a AS src, b AS dst FROM und
  UNION ALL SELECT b AS src, a AS dst FROM und),
bfs AS (
  SELECT CAST(0 AS INTEGER) AS node, 0 AS lvl
  UNION
  SELECT sym.dst AS node, bfs.lvl + 1 AS lvl
  FROM bfs JOIN sym ON sym.src = bfs.node
  WHERE bfs.lvl < 24)
SELECT n_nationkey AS nationkey, n_name AS nation,
       CAST(min(lvl) AS BIGINT) AS level
FROM bfs JOIN nation ON n_nationkey = bfs.node
GROUP BY n_nationkey, n_name""",
)
def graph_bfs_levels(spark: SparkSession, sf: str) -> DataFrame:
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
    sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    source = nation.where(F.col("n_nationkey") == 0).select(
        F.col("n_nationkey").alias("node"), F.lit(0).alias("level")
    )
    visited = bfs_levels(sym, source, max_iter=24)
    return visited.join(
        F.broadcast(nation), visited["node"] == F.col("n_nationkey")
    ).select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("level").cast("long").alias("level"),
    )


def bfs_levels(
    sym_edges: DataFrame, source: DataFrame, max_iter: int = 24
) -> DataFrame:
    """Iterative BFS: ``sym_edges`` is the SYMMETRIC (src, dst) edge
    list, ``source`` the seed frontier with schema (node, level). The
    per-round ``count()`` is the termination probe — it materializes the
    (frontier-sized, not graph-sized) new-nodes set, exactly the bounded
    driver knowledge an iterative graph job needs."""
    visited = source.localCheckpoint(eager=True)
    frontier = visited
    for lvl in range(1, max_iter + 1):
        nbrs = (
            frontier.join(
                sym_edges, frontier["node"] == sym_edges["src"]
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            nbrs.join(visited, "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True)
        )
        if new.count() == 0:
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return visited


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier): parts no other part dominates, where q
# dominates p iff q is no pricier AND no smaller, strictly better in at
# least one. The ORACLE states the quadratic NOT EXISTS definition; the
# Spark side computes the same set LINEARLY — group to price levels
# (partial-agg max size per price), one running-max window over the
# (small) level table ordered by price, then a broadcast join back:
# p survives iff no strictly-cheaper level reaches its size and its own
# level's max doesn't strictly beat it. At 100 TB the level table after
# the partial agg is |distinct prices| — if that is still huge, the
# sweep range-partitions by price and propagates per-partition prefix
# maxima (the running-total pattern); the fixture's level table fits one
# window.
@register(
    "rel_skyline",
    """SELECT p_partkey, p_retailprice AS price, p_size AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""",
)
def rel_skyline(spark: SparkSession, sf: str) -> DataFrame:
    part = table(spark, sf, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    levels = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("lvl_max")
    )
    prev = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = levels.withColumn("prev_max", F.max("lvl_max").over(prev))
    joined = part.join(F.broadcast(levels), "p_retailprice")
    dominated = (
        F.coalesce(F.col("prev_max"), F.lit(-1)) >= F.col("p_size")
    ) | (F.col("lvl_max") > F.col("p_size"))
    return joined.where(~dominated).select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketches — the sketch lifecycle that actually runs at
# 100 TB: each shard (nation here) builds its own DataSketches HLL
# sketch (`hll_sketch_agg`), the sketches union associatively
# (`hll_union_agg`) WITHOUT re-reading the data, and the merged estimate
# answers the global distinct-count question. The contract pins BOTH the
# merged-estimate and the single-pass global-estimate to ±5% of the
# exact count (default lgConfigK=12 ⇒ ~1.6% standard error; the two
# estimates may differ from each other — sparse-mode promotion during
# union is representation-dependent — so each is pinned to the exact
# count, not to the other). The oracle computes the exact count and
# pins the booleans.
@register(
    "rel_hll_sketch_merge",
    """SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_shards,
       count(DISTINCT c_custkey) AS exact_users,
       true AS merged_ok, true AS global_ok
FROM customer""",
)
def rel_hll_sketch_merge(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_nationkey", "c_custkey")
    shards = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    merged = shards.agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    glob = c.agg(
        F.count_distinct("c_custkey").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias(
            "global_est"
        ),
    )
    tol = 0.05
    return merged.crossJoin(F.broadcast(glob)).select(
        "n_shards",
        "exact_users",
        (
            F.abs(F.col("merged_est") - F.col("exact_users"))
            <= tol * F.col("exact_users")
        ).alias("merged_ok"),
        (
            F.abs(F.col("global_est") - F.col("exact_users"))
            <= tol * F.col("exact_users")
        ).alias("global_ok"),
    )


# ---------------------------------------------------------------------------
# Perplexity filtering (CCNet's actual use of the LM score): drop the
# worst decile of documents by corpus-trigram-LM mean log-probability.
# Builds on text_trigram_lm's per-doc scores (same module constant backs
# both oracles); the cutoff is rank-based with a (avg_logp, doc_id)
# total order so the kept set is deterministic on both engines. This is
# the repo's canonical UNBOUNDED global rank (one row per document), so
# it uses operators/ranking.py::global_row_number — exact distributed
# rank via range partitioning + per-partition row_number + broadcast
# offsets, no single-partition window stage at any SF.
@register(
    "cur_perplexity_filter",
    f"""WITH scored AS ({TRIGRAM_SCORES_SQL}),
r AS (
  SELECT doc_id, avg_logp,
         row_number() OVER (ORDER BY avg_logp, doc_id) AS rn,
         count(*) OVER () AS n
  FROM scored)
SELECT doc_id, avg_logp,
       rn > CAST(ceil(0.1 * n) AS BIGINT) AS keep
FROM r""",
)
def cur_perplexity_filter(spark: SparkSession, sf: str) -> DataFrame:
    from .queries_round4c import text_trigram_lm

    from ..operators.ranking import global_row_number

    scored = text_trigram_lm(spark, sf).select("doc_id", "avg_logp")
    # global doc count as a broadcast scalar (exact BIGINT), not an
    # empty-partition count window
    n_tot = scored.agg(F.count(F.lit(1)).alias("n"))
    ranked = global_row_number(scored, ["avg_logp", "doc_id"]).crossJoin(
        F.broadcast(n_tot)
    )
    return ranked.select(
        "doc_id",
        "avg_logp",
        (F.col("rn") > F.ceil(0.1 * F.col("n")).cast("long")).alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join — Catalyst's InjectRuntimeFilter: the
# selective orders dim builds a bloom filter over o_orderkey
# (bloom_filter_agg subquery), and the lineitem scan applies
# might_contain(l_orderkey) BEFORE its shuffle, so non-qualifying fact
# rows never cross the wire — the row-level sibling of DPP
# (rel_dpp_join). The rule only fires for probably-shuffle joins, so
# the entry opens a conf window (auto-broadcast off, application-side
# scan threshold 0 — at 100 TB the 10 GiB default passes on its own and
# the join shuffles naturally; the window only recreates those
# conditions at fixture scale), materializes via eager localCheckpoint
# INSIDE the window, and restores every conf — later catalog entries
# plan under default settings. The unit test pins ``might_contain`` in
# the optimized plan; parity pins the result against the plain join.
_BLOOM_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter"
    ".applicationSideScanSizeThreshold": "0",
}


def _bloom_plan(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dim = o.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 200000)
    ).select("o_orderkey")
    joined = li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "rel_bloom_runtime_filter",
    """SELECT l_returnflag, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
GROUP BY l_returnflag""",
)
def rel_bloom_runtime_filter(spark: SparkSession, sf: str) -> DataFrame:
    prev = {
        k: (spark.conf.get(k) if spark.conf.isModifiable(k) else None)
        for k in _BLOOM_CONFS
    }
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        # Eager: the plan must be compiled AND executed inside the conf
        # window for the runtime filter to be injected.
        return _bloom_plan(spark, sf).localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
