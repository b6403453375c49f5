"""Round-4 catalog additions, seventeenth batch — portable regex, ordered
string aggregation, exact higher moments, and weighted shortest paths:

* regexp battery (the engine-portable regex subset: Java regex on
  Spark vs RE2 on DuckDB agree on ASCII classes, bounded quantifiers,
  word boundaries — and disagree on lookarounds/backrefs, which are
  excluded by construction);
* listagg / string_agg WITHIN GROUP (ordered string concatenation —
  deterministic only with an explicit total order, stated identically
  on both engines);
* exact skewness/kurtosis (power sums in DECIMAL, one double formula at
  the end — the merge-order-proof form of the builtin Welford moments,
  same discipline as rel_regression_moments);
* Bellman-Ford shortest paths (4 relaxation rounds over the weighted
  trade graph — the weighted sibling of graph_bfs_levels; the oracle
  unrolls the same 4 rounds as chained CTEs, min-plus in exact decimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Regex battery — the subset Java regex (Spark executors) and RE2
# (DuckDB, Go/Rust engines) evaluate identically: ASCII character
# classes, alternation, bounded quantifiers, word boundaries, global
# replace. Lookahead/lookbehind and backreferences are deliberately
# absent (RE2 rejects them); anything an engine-portable pipeline ships
# should stay inside this subset, and this entry is the executable
# statement of it. Map-only, whole-stage codegen, no shuffle.
@register(
    "func_regexp_battery",
    r"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT)
         AS n_lower_runs,
       CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]*'))
            AS INT) AS n_cap_words,
       regexp_extract(text, '[a-zA-Z]{8,}') AS first_long_word,
       substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 24)
         AS devoweled_prefix
FROM documents""",
)
def func_regexp_battery(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+"), 0)).alias(
            "n_lower_runs"
        ),
        F.size(
            F.regexp_extract_all("text", F.lit(r"\b[A-Z][a-z]*"), 0)
        ).alias("n_cap_words"),
        F.regexp_extract("text", r"[a-zA-Z]{8,}", 0).alias(
            "first_long_word"
        ),
        F.regexp_replace("text", r"[aeiou]", "")
        .substr(1, 24)
        .alias("devoweled_prefix"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation — listagg WITHIN GROUP (Spark 4) ≡
# string_agg(... ORDER BY) (DuckDB/Postgres). The WITHIN GROUP order is
# the whole point: without it both engines produce partition-order
# concatenations that differ run to run. s_name is unique per nation so
# the (s_name) order is total. One hash aggregate; the sort is per-group
# over grouped rows, not a global sort.
@register(
    "rel_string_agg",
    """SELECT s_nationkey AS nationkey,
       count(*) AS n_suppliers,
       string_agg(s_name, ',' ORDER BY s_name) AS supplier_list
FROM supplier GROUP BY s_nationkey""",
)
def rel_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    sup = table(spark, sf, "supplier").select("s_nationkey", "s_name")
    return sup.groupBy(
        F.col("s_nationkey").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.expr(
            "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)"
        ).alias("supplier_list"),
    )


# ---------------------------------------------------------------------------
# Exact skewness / kurtosis — the builtins stream Welford-style central
# moments whose double accumulation is merge-order-dependent; the
# engine-exact form aggregates raw power sums Σx..Σx⁴ in DECIMAL
# (order-insensitive, l_quantity ≤ 50 so x⁴ ≤ 6.25e6 — no overflow at
# any SF in DECIMAL(38,8)), then evaluates ONE double formula per group
# in an identical operation order on both engines. Same discipline as
# rel_regression_moments, extended to the 3rd/4th moments.
# Shared verbatim by the Spark selectExpr AND the DuckDB oracle, so the
# degenerate-group guards are portable SQL, not engine builtins:
# greatest(var, 0) clamps the tiny-negative variance FP cancellation can
# produce (pow(neg, 1.5) errors on DuckDB, NaNs on Spark), and
# nullif(denom, 0) turns a zero-variance group (e.g. a single row) into
# NULL moments on BOTH engines instead of aborting Spark's ANSI divide.
# Values are unchanged wherever the variance is strictly positive.
_MOMENT_FORMULAS = """
  CAST(n AS BIGINT) AS n_items,
  round((s1d / n) * 1e9) / 1e9 AS mean_qty,
  round(((s3d/n - 3*(s1d/n)*(s2d/n) + 2*(s1d/n)*(s1d/n)*(s1d/n))
        / nullif(pow(greatest(s2d/n - (s1d/n)*(s1d/n), 0.0), 1.5), 0.0))
        * 1e9) / 1e9 AS skewness_qty,
  round(((s4d/n - 4*(s1d/n)*(s3d/n) + 6*(s1d/n)*(s1d/n)*(s2d/n)
         - 3*(s1d/n)*(s1d/n)*(s1d/n)*(s1d/n))
        / nullif(pow(greatest(s2d/n - (s1d/n)*(s1d/n), 0.0), 2.0), 0.0)
        - 3.0) * 1e9) / 1e9 AS kurtosis_qty
"""


@register(
    "rel_higher_moments",
    f"""WITH sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS s1d,
         CAST(sum(CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS s2d,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2)) AS DECIMAL(38,6)))
              AS DOUBLE) AS s3d,
         CAST(sum(CAST(CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2))
                  * CAST(l_quantity AS DECIMAL(10,2)) AS DECIMAL(38,8)))
              AS DOUBLE) AS s4d
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, {_MOMENT_FORMULAS}
FROM sums""",
)
def rel_higher_moments(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    qd = F.col("l_quantity").cast("decimal(10,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(qd).cast("double").alias("s1d"),
        F.sum(qd * qd).cast("double").alias("s2d"),
        F.sum((qd * qd * qd).cast("decimal(38,6)"))
        .cast("double")
        .alias("s3d"),
        F.sum((qd * qd * qd * qd).cast("decimal(38,8)"))
        .cast("double")
        .alias("s4d"),
    )
    return sums.selectExpr("l_returnflag", *_MOMENT_FORMULAS.split(",\n"))


# ---------------------------------------------------------------------------
# Bellman-Ford shortest paths — the WEIGHTED sibling of
# graph_bfs_levels: edge weight = cheapest line item ever shipped
# between the two nations (exact DECIMAL), distance = min-plus over ≤4
# relaxation rounds from nation 0. Each round is one join + one
# min-aggregate on the node key (the co-partitioned Pregel step); decimal
# min/+ are exact so no fold-order concerns anywhere. The oracle unrolls
# the SAME four rounds as chained CTEs — both engines run Bellman-Ford,
# one iteratively, one textually.
_SSSP_ROUNDS = 4

_SSSP_EDGES_SQL = """pairs AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey),
e AS MATERIALIZED (
  SELECT src, dst, min(w) AS w FROM (
    SELECT src, dst, w FROM pairs
    UNION ALL SELECT dst AS src, src AS dst, w FROM pairs)
  GROUP BY src, dst)"""


def _sssp_oracle() -> str:
    steps = ["d0 AS (SELECT CAST(0 AS INTEGER) AS node, CAST(0 AS DECIMAL(20,2)) AS dist)"]
    for k in range(1, _SSSP_ROUNDS + 1):
        steps.append(
            f"""d{k} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, CAST(d{k - 1}.dist + e.w AS DECIMAL(20,2)) AS dist
    FROM d{k - 1} JOIN e ON e.src = d{k - 1}.node)
  GROUP BY node)"""
        )
    return (
        f"WITH {_SSSP_EDGES_SQL},\n"
        + ",\n".join(steps)
        + f"""
SELECT n_nationkey AS nationkey, n_name AS nation,
       CAST(dist AS DOUBLE) AS dist
FROM d{_SSSP_ROUNDS} JOIN nation ON n_nationkey = node"""
    )


def bellman_ford(
    edges: DataFrame, dist0: DataFrame, rounds: int
) -> DataFrame:
    """``rounds`` min-plus relaxations of ``dist0`` (node, dist) over
    ``edges`` (src, dst, w). Each round: one node-keyed join + one
    min-aggregate, lineage cut per round."""
    dist = dist0
    for _ in range(rounds):
        relaxed = dist.join(
            edges, dist["node"] == edges["src"]
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w"))
            .cast("decimal(20,2)")
            .alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


@register("graph_sssp_bellman", _sssp_oracle())
def graph_sssp_bellman(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf, "nation").select("n_nationkey", "n_name")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("w"),
        )
    )
    edges = (
        pairs.unionAll(
            pairs.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "w",
            )
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)  # reused every round: cut the 4-join lineage
    )
    dist0 = spark.createDataFrame([(0,)], "node int").select(
        "node", F.lit("0").cast("decimal(20,2)").alias("dist")
    )
    dist = bellman_ford(edges, dist0, _SSSP_ROUNDS)
    return dist.join(
        F.broadcast(nation), dist["node"] == F.col("n_nationkey")
    ).select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("dist").cast("double").alias("dist"),
    )
