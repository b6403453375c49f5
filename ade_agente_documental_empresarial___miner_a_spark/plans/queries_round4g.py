"""Round-4 catalog additions, seventh batch — remaining relational
semantics: value-based RANGE window frames (the time-decay window shape
ROWS frames can't express), ANALYZE-style column statistics (the input
to any cost-based decision the engine makes), and the NULL-semantics
battery (null-safe equality, explicit null ordering, count(*) vs
count(col) vs count(DISTINCT col)).

Parity discipline per the established recipes: order-sensitive float
sums ride DECIMAL, integer stats stay exact, and ordering contracts are
written explicitly on both engines (Spark defaults NULLS FIRST for ASC,
DuckDB defaults NULLS LAST — the battery pins the explicit form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Value-based RANGE frame — trailing 1-hour per-user activity window:
# for every event, how many events (and how much value mass) the same
# user produced in [ts - 59m59s, ts]. A ROWS frame cannot express this
# (row counts ≠ time spans); the RANGE frame is the native shape for
# time-decay features, rate limiting, and rolling exposure. Frames are
# peer-inclusive, so the result is independent of intra-second row
# order — a determinism property ROWS frames lack. One shuffle: the
# same user_id partitioning every per-user feature shares. At 100 TB
# the frame state per partition is bounded by the time horizon, not
# the stream (Spark evaluates RANGE frames with a sliding two-pointer
# over the sorted partition).
@register(
    "rel_range_frame",
    f"""WITH {DUCK_EVENTS},
x AS (
  SELECT event_id, user_id,
         -- floor, not CAST: Spark's unix_timestamp truncates sub-second
         -- micros while a DuckDB BIGINT cast would round them
         CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         CAST(value AS DECIMAL(18,2)) AS vd
  FROM ev)
SELECT event_id, user_id, ep,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(vd) OVER w AS DOUBLE) AS val_1h
FROM x
WINDOW w AS (PARTITION BY user_id ORDER BY ep
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""",
)
def rel_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    x = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ep"),
        F.col("value").cast("decimal(18,2)").alias("vd"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-3599, Window.currentRow)
    )
    return x.select(
        "event_id",
        "user_id",
        "ep",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum("vd").over(w).cast("double").alias("val_1h"),
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics — the engine-completeness staple:
# per-column row count, exact NDV, min/max, and DECIMAL-exact value
# sum for the lineitem measures. ONE scan computes all columns' stats
# (wide aggregate), then an unpivot (stack) reshapes to the catalog's
# long form — at 100 TB this is the difference between one pass and
# one pass per column. count(DISTINCT a), count(DISTINCT b), ... in a
# single aggregate compiles to one Expand (3× rows pre-aggregated
# map-side), still cheaper than 3 scans of a wide fact table.
_STAT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _colstats_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name,
       count(*) AS n,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS vmin,
       CAST(max({c}) AS DOUBLE) AS vmax,
       CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS vsum
FROM lineitem"""
        for c in _STAT_COLS
    ]
    return "\nUNION ALL\n".join(parts)


@register("rel_column_stats", _colstats_sql())
def rel_column_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    aggs = []
    for c in _STAT_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.sum(F.col(c).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"{c}__sum"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nd`, `{c}__min`, `{c}__max`, `{c}__sum`"
        for c in _STAT_COLS
    )
    return wide.selectExpr(
        f"stack({len(_STAT_COLS)}, {stack_args}) AS "
        "(col_name, n, n_distinct, vmin, vmax, vsum)"
    )


# ---------------------------------------------------------------------------
# NULL-semantics battery — the correctness corners every engine must
# agree on: a derived nullable key (majority flag 'N' → NULL), a
# dimension probe containing NULL joined with NULL-SAFE equality
# (<=> / IS NOT DISTINCT FROM: NULL matches NULL — a plain = join
# would drop that row), count(*) vs count(col) vs count(DISTINCT col)
# over the nullable key, and an explicit NULLS FIRST ordinal (Spark
# defaults ASC NULLS FIRST, DuckDB defaults NULLS LAST — the contract
# is pinned by writing it out).
@register(
    "rel_null_semantics",
    """WITH g AS (
  SELECT nullif(l_returnflag, 'N') AS nf, count(*) AS n_group
  FROM lineitem GROUP BY nf),
s AS (
  SELECT count(*) AS n_rows, count(nf) AS n_nonnull,
         count(DISTINCT nf) AS n_distinct
  FROM (SELECT nullif(l_returnflag, 'N') AS nf FROM lineitem)),
d AS (SELECT * FROM (VALUES ('A'), ('R'), (NULL), ('X')) AS t(dim_flag))
SELECT d.dim_flag,
       CAST(coalesce(g.n_group, 0) AS BIGINT) AS n_group,
       CAST(row_number() OVER (ORDER BY d.dim_flag ASC NULLS FIRST)
            AS BIGINT) AS ord_nulls_first,
       s.n_rows, CAST(s.n_nonnull AS BIGINT) AS n_nonnull,
       CAST(s.n_distinct AS BIGINT) AS n_distinct
FROM d
LEFT JOIN g ON d.dim_flag IS NOT DISTINCT FROM g.nf
CROSS JOIN s""",
)
def rel_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("nf")
    )
    g = li.groupBy("nf").agg(F.count(F.lit(1)).alias("n_group"))
    s = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("nf").alias("n_nonnull"),
        F.count_distinct("nf").cast("long").alias("n_distinct"),
    )
    d = spark.createDataFrame(
        [("A",), ("R",), (None,), ("X",)], "dim_flag string"
    )
    out = (
        d.join(g, d["dim_flag"].eqNullSafe(g["nf"]), "left")
        .select(
            "dim_flag",
            F.coalesce(F.col("n_group"), F.lit(0))
            .cast("long")
            .alias("n_group"),
        )
        .withColumn(
            "ord_nulls_first",
            F.row_number()
            .over(Window.orderBy(F.asc_nulls_first("dim_flag")))
            .cast("long"),
        )
        .crossJoin(F.broadcast(s))
    )
    return out.select(
        "dim_flag",
        "n_group",
        "ord_nulls_first",
        "n_rows",
        F.col("n_nonnull").cast("long").alias("n_nonnull"),
        "n_distinct",
    )


# ---------------------------------------------------------------------------
# Recursive CTE — transitive ancestor closure over a deterministic
# hierarchy (binary-heap parent: parent(k) = floor((k-1)/2), root 0)
# derived from nation keys. Spark 4's WITH RECURSIVE supports UNION ALL
# recursion only (no dedup fixpoint yet — probed: UNION errors with
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the hierarchy must be a
# DAG; depth over 25 nodes is <= 4, far under the engine's iteration
# cap. Each iteration is one small self-join — the same shape an
# org-chart / BOM rollup takes at scale, where the frontier (not the
# full closure) is the per-iteration working set.
_REC_SQL = """WITH RECURSIVE anc(nk, anc_nk, depth) AS (
  SELECT n_nationkey AS nk, n_nationkey AS anc_nk, 0 AS depth
  FROM nation
  UNION ALL
  SELECT r.nk, CAST(floor((r.anc_nk - 1) / 2.0) AS INTEGER) AS anc_nk,
         r.depth + 1 AS depth
  FROM anc r
  WHERE r.anc_nk > 0
)
SELECT a.nk, a.anc_nk, CAST(a.depth AS BIGINT) AS depth,
       n.n_name AS anc_name
FROM anc a JOIN nation n ON a.anc_nk = n.n_nationkey"""


@register("rel_recursive_ancestors", _REC_SQL)
def rel_recursive_ancestors(spark: SparkSession, sf: str) -> DataFrame:
    # distinct view name on the Spark side: the harness shares one
    # session across entries, so don't leave a view shadowing a table
    # name other SQL entries might register
    table(spark, sf, "nation").createOrReplaceTempView("_rec_nation")
    return spark.sql(_REC_SQL.replace(" nation", " _rec_nation"))


# ---------------------------------------------------------------------------
# Custom Python DataSource — the connector-authoring API
# (sources/pydatasource.py): a registered ``arith_grid`` format whose
# partitions() contract drives task planning exactly like a real
# connector's splits. The entry reads 10,000 generated rows across 8
# Python-worker partitions and reduces them to per-residue counts +
# exact sums; quadratic-residue structure makes the result
# non-trivial (classes have 0 or ~2x density). Oracle mirrors with
# generate_series — the source is hermetic and deterministic by
# contract, so this is a true connector round-trip check.
_GRID_ROWS = 10_000


@register(
    "s11_python_datasource",
    f"""SELECT (i * i) % {97} AS residue,
       count(*) AS n,
       CAST(sum(i) AS BIGINT) AS i_sum
FROM (SELECT unnest(generate_series(0, {_GRID_ROWS - 1})) AS i)
GROUP BY residue""",
)
def s11_python_datasource(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.pydatasource import ArithGridDataSource

    try:
        spark.dataSource.register(ArithGridDataSource)
    except Exception:
        pass  # already registered in this session
    grid = (
        spark.read.format("arith_grid")
        .option("n_rows", _GRID_ROWS)
        .option("n_parts", 8)
        .load()
    )
    return grid.groupBy("residue").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("i").cast("long").alias("i_sum"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning — the RUNTIME half of partition pruning
# (rel_partition_pruned_scan covers the static half): the fact side is
# hive-partitioned on event_date; the probe side is a dim whose
# qualifying dates are only known at run time (busiest weekday per
# user-0 cohort here: a deterministic stand-in for "dates in the
# current campaign" dims). Catalyst injects a DynamicPruningExpression
# subquery into the fact scan's PartitionFilters, so only the dim's
# partitions are read — at 100 TB this is the difference between
# scanning 3 days and scanning 3 years. The test pins the
# dynamicpruning marker in the executed plan.
@register(
    "rel_dpp_join",
    """WITH ev AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date, event_type,
         CAST(value AS DECIMAL(18,6)) AS vd
  FROM events),
dim AS (
  SELECT DISTINCT event_date FROM ev
  WHERE extract(day FROM event_date) IN (10, 11, 12))
SELECT e.event_date, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vd) AS DOUBLE) AS total_value
FROM ev e JOIN dim d ON e.event_date = d.event_date
GROUP BY e.event_date, e.event_type""",
)
def rel_dpp_join(spark: SparkSession, sf: str) -> DataFrame:
    from .queries_round4 import _ensure_partitioned_events

    path = _ensure_partitioned_events(spark, sf)
    ev = spark.read.parquet(path)
    dim = (
        ev.where(F.dayofmonth("event_date").isin(10, 11, 12))
        .select("event_date")
        .distinct()
    )
    joined = ev.join(F.broadcast(dim), "event_date")
    return joined.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
