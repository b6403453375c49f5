"""Round-4 catalog additions, ninth batch — statistical aggregates:
correlation / least-squares regression derived from exact integer
moments (the engine-exact route to corr/regr_slope/regr_r2), and the
approx-percentile accuracy contract (the sketch-vs-exact audit shape
``rel_approx_distinct`` established for HLL, applied to quantiles).

Parity note for the moments route: built-in corr()/regr_*() use
Welford-style streaming merges whose float results depend on merge
order — not reproducible across engines (or even across partitionings).
Deriving the same statistics from EXACT integer sums (Σx, Σy, Σx²,
Σy², Σxy as int64) and one fixed-order double expression makes them
bit-identical: int→double conversion rounds to nearest identically on
both engines, and every subsequent IEEE op is correctly rounded. At
100 TB move the five moments to DECIMAL(38,0) sums (int64 Σx² headroom
ends around 10^18); the shape stays one map-side-combinable aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import DUCK_EVENTS, events_table, register, table


# ---------------------------------------------------------------------------
# Pearson correlation + OLS slope/intercept/R² of (event value, props.k)
# per event type — five exact integer moments, then the textbook
# closed forms written ONCE, identically, for both engines:
#   corr  = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx²ᵗ)·sqrt(n·Σy² − Σy²ᵗ))
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ᵗ),  intercept = ȳ − slope·x̄
def _corr_exprs() -> str:
    # arithmetic text shared by the oracle; the DataFrame side mirrors
    # it expression-for-expression — all operands arrive as
    # exact-int-derived doubles, so evaluation is bit-identical
    cn = "(n * sxy - sx * sy)"
    dx = "(n * sxx - sx * sx)"
    dy = "(n * syy - sy * sy)"
    return f"""round(({cn} / (sqrt({dx}) * sqrt({dy}))) * 1e9) / 1e9 AS corr_vk,
       round(({cn} / {dx}) * 1e9) / 1e9 AS slope,
       round((sy / n - ({cn} / {dx}) * (sx / n)) * 1e9) / 1e9 AS intercept,
       round((({cn} * {cn}) / ({dx} * {dy})) * 1e9) / 1e9 AS r2"""


@register(
    "rel_regression_moments",
    f"""WITH {DUCK_EVENTS},
x AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS c,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM ev),
m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS sx,
         CAST(sum(k) AS DOUBLE) AS sy,
         CAST(sum(c * c) AS DOUBLE) AS sxx,
         CAST(sum(k * k) AS DOUBLE) AS syy,
         CAST(sum(c * k) AS DOUBLE) AS sxy
  FROM x GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
       {_corr_exprs()}
FROM m
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""",
)
def rel_regression_moments(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    x = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    m = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("sx"),
        F.sum("k").cast("double").alias("sy"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("sxx"),
        F.sum(F.col("k") * F.col("k")).cast("double").alias("syy"),
        F.sum(F.col("c") * F.col("k")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cn = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return m.where((dx > 0) & (dy > 0)).select(
        "event_type",
        n.cast("long").alias("n"),
        dblround(cn / (F.sqrt(dx) * F.sqrt(dy)), 9).alias("corr_vk"),
        dblround(cn / dx, 9).alias("slope"),
        dblround(sy / n - (cn / dx) * (sx / n), 9).alias("intercept"),
        dblround((cn * cn) / (dx * dy), 9).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Approx-percentile accuracy contract — the quantile sibling of
# rel_approx_distinct's HLL audit: approx_percentile's rank error is
# bounded by 1/accuracy, so at accuracy=1000 the returned value's true
# rank must lie within n/1000 of the target rank. Both engines agree on
# the exact side and the boolean; the sketch value itself is
# deliberately NOT surfaced (KLL/GK internals differ per engine — the
# CONTRACT is the portable thing). At 100 TB the sketch is the query
# you run (mergeable, one pass, no full sort); the exact percentile
# here is the per-SF audit.
@register(
    "rel_approx_percentile_contract",
    """SELECT l_returnflag,
       count(*) AS n,
       quantile_cont(l_extendedprice, 0.5) AS exact_p50,
       true AS approx_ok
FROM lineitem GROUP BY l_returnflag""",
)
def rel_approx_percentile_contract(
    spark: SparkSession, sf: str
) -> DataFrame:
    li = table(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(1000)
        ).alias("approx_p50"),
        F.sort_array(F.collect_list("l_extendedprice")).alias("_sorted"),
    )
    # true rank of the sketch's answer, via binary-search-free exprs:
    # rank error bound = n / accuracy (+1 slack for interpolation of
    # the exact side, which sits between two data ranks). Under TIES
    # the answer's true rank is a SPAN [count(<)+1, count(<=)] — a
    # fully-constant column makes count(<=) = n while the median rank
    # is n/2 (parity_fuzz const profile flipped the old point-rank
    # check to false) — so the contract tests whether the target rank
    # intersects the span, widened by the sketch's rank-error bound.
    below = F.size(
        F.filter(F.col("_sorted"), lambda v: v < F.col("approx_p50"))
    )
    at_or_below = F.size(
        F.filter(F.col("_sorted"), lambda v: v <= F.col("approx_p50"))
    )
    target = F.col("n") / 2
    slack = F.col("n") / 1000 + 1
    ok = (target >= below - slack) & (target <= at_or_below + slack)
    return agg.select(
        "l_returnflag",
        "n",
        "exact_p50",
        ok.alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Window-function family, part 2 — the rank-distribution trio the
# original battery (rel_window_family) leaves out: percent_rank (rank
# position scaled to [0,1]), cume_dist (inclusive CDF), nth_value
# (frame-positional pick). Distribution functions are the feature-
# engineering staple for score normalization. Exactness: both engines
# define percent_rank = (rank-1)/(n-1) and cume_dist = peers≤x / n on
# exact integers; the division is one IEEE op — bit-identical. Same
# single per-supplier window partitioning as part 1 (one shuffle).
@register(
    "rel_window_family2",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       round((percent_rank() OVER wq) * 1e9) / 1e9 AS qty_pctrank,
       round((cume_dist() OVER wq) * 1e9) / 1e9 AS qty_cumedist,
       nth_value(l_quantity, 3) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_qty
FROM lineitem
WINDOW wq AS (PARTITION BY l_suppkey
              ORDER BY l_quantity, l_orderkey, l_linenumber)""",
)
def rel_window_family2(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = table(spark, sf, "lineitem")
    wq = Window.partitionBy("l_suppkey").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    # l_quantity tiebreak on the positional window (r10 sf0.1 catch —
    # nth_value over a non-total order; wq needs none: percent_rank/
    # cume_dist are RANK-semantics, tie-safe by definition)
    wt = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        dblround(F.percent_rank().over(wq), 9).alias("qty_pctrank"),
        dblround(F.cume_dist().over(wq), 9).alias("qty_cumedist"),
        F.nth_value("l_quantity", 3).over(wt).alias("third_qty"),
    )


# ---------------------------------------------------------------------------
# Structured XML extraction (from_xml, Spark 4 native) — the reference
# ACCEPTS xml uploads (app.py:191) but only strips markup (S2); this is
# the schema-full path: typed extraction from an XML attribute bag.
# The XML is constructed deterministically from order columns, so the
# DuckDB oracle (no XML support) computes the same result from the
# source columns directly — from_xml is thereby checked against ground
# truth, not against another parser. Map-only until the 3-key rollup.
@register(
    "s12_xml_extract",
    """SELECT o_orderstatus AS status,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderkey % 10 < 3
GROUP BY o_orderstatus""",
)
def s12_xml_extract(spark: SparkSession, sf: str) -> DataFrame:
    ords = table(spark, sf, "orders").where(
        F.col("o_orderkey") % 10 < 3
    )
    xml = ords.select(
        F.concat(
            F.lit("<order status=\""),
            F.col("o_orderstatus"),
            F.lit("\"><price>"),
            F.col("o_totalprice").cast("string"),
            F.lit("</price></order>"),
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml(
            "doc", "`_status` STRING, price DOUBLE"
        ).alias("x")
    )
    return parsed.groupBy(
        F.col("x._status").alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x.price").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
