"""Regression pins for the composite-double round() boundary class
(docs/ROUND9.md §1's "irreducible remainder", killed in round 10).

``round(x, d)`` on a DOUBLE is not cross-engine-stable even when x is
bit-identical on both engines: Spark rounds the SHORTEST DECIMAL
RENDERING of x (java ``BigDecimal.valueOf``, HALF_UP) while DuckDB
rounds the exact binary product ``x * 10^d`` (``std::round``) — when x
sits within an ulp of a half at the rounding digit the engines split
by 10^-d. This is the sibling of the round(sum/count) class pinned in
test_half_boundary.py, but for composite doubles (z-scores, kappa,
variance/std, log/sqrt outputs) there is NO exact rational to restate,
so the r10 migration quantizes the SAME scaled double on both sides
instead: ``round(x * 10^d, 0) / 10^d`` (``exactmath.dblround`` /
``dblround_duck``) — at scale 0 the two rounding semantics provably
coincide for |y| < 2^51 (see the dblround docstring).

Pins below:
- literal level: six constructed doubles on which the OLD idiom
  diverges on the real engines (asserted, so a revert re-triggers
  loudly) while dblround/dblround_duck agree bit-exactly;
- entry level: a constructed events table that drives
  rel_abtest_ztest's z-score onto a digit-9 half boundary
  (z = 8.4603373905, found by a numpy sweep over the (n0,c0,n1,c1)
  lattice + real-engine confirmation), replayed through the full
  entry-vs-oracle compare;
- a randomized agreement sweep of dblround vs dblround_duck on
  boundary-adjacent doubles.
"""

from __future__ import annotations

import json
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.parity import compare, duck_conn  # noqa: E402
from tools.parity_fuzz import gen_tables, write_sf_dir  # noqa: E402

# real-engine-verified divergent doubles for the OLD idiom (r10 sweep):
# each x rounds differently under Spark round(x, 9) vs DuckDB
# round(x, 9); the new scaled statement agrees on all of them.
DIVERGENT_DOUBLES = [
    0.0653277425,
    0.2643299875,
    2.1163052655,
    2.9030307404999998,
    0.5650001434999999,
    -0.5650001434999999,
]


def _spark_round_model(x: float, d: int = 9) -> float:
    """Spark's Round-on-double semantics: HALF_UP on the shortest
    decimal rendering (java BigDecimal.valueOf)."""
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
        )
    )


def test_old_idiom_diverges_on_pinned_doubles(spark):
    """The OLD idiom round(x, 9) must still split the engines on each
    pinned double — if this stops failing-to-agree, the pin is stale
    (an engine changed its rounding) and the migration rationale needs
    re-checking."""
    from pyspark.sql import functions as F

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(v,) for v in DIVERGENT_DOUBLES], "x double"
    )
    spark_old = [
        r.v for r in df.select(F.round("x", 9).alias("v")).collect()
    ]
    duck_old = [
        con.execute("SELECT round(?::DOUBLE, 9)", [v]).fetchone()[0]
        for v in DIVERGENT_DOUBLES
    ]
    n_diverge = sum(1 for a, b in zip(spark_old, duck_old) if a != b)
    assert n_diverge == len(DIVERGENT_DOUBLES), (
        spark_old,
        duck_old,
    )
    # and the Spark side matches the shortest-repr model exactly
    assert spark_old == [
        _spark_round_model(v) for v in DIVERGENT_DOUBLES
    ]


def test_dblround_agrees_on_pinned_doubles(spark):
    from pyspark.sql import functions as F

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (
        dblround,
        dblround_duck,
    )

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(v,) for v in DIVERGENT_DOUBLES], "x double"
    )
    spark_new = [
        r.v for r in df.select(dblround(F.col("x"), 9).alias("v")).collect()
    ]
    duck_new = [
        con.execute(
            f"SELECT {dblround_duck('?::DOUBLE', 9)}", [v]
        ).fetchone()[0]
        for v in DIVERGENT_DOUBLES
    ]
    assert spark_new == duck_new


def test_dblround_randomized_boundary_sweep(spark):
    """5000 doubles planted within a few ulp of digit-9 halves (the
    adversarial band): dblround and dblround_duck must agree bit-
    exactly on every one, including negatives, NaN and +/-Inf."""
    from pyspark.sql import functions as F

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (
        dblround,
        dblround_duck,
    )

    rng = np.random.default_rng(42)
    ks = rng.integers(1, 4 * 10**9, 5000)
    offs = rng.integers(-3, 4, 5000)
    signs = rng.choice([-1.0, 1.0], 5000)
    xs = [
        float(s * ((k + 0.5) / 1e9 + o * 2.2e-16 * max(1.0, k / 1e9)))
        for k, o, s in zip(ks, offs, signs)
    ] + [float("nan"), float("inf"), float("-inf"), 0.0, -0.0]
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    spark_new = [
        r.v for r in df.select(dblround(F.col("x"), 9).alias("v")).collect()
    ]
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame({"x": xs})  # noqa: F841 — registered by name
    duck_new = con.execute(
        f"SELECT {dblround_duck('x', 9)} AS v FROM pdf"
    ).df()["v"].tolist()
    n_bad = 0
    for a, b in zip(spark_new, duck_new):
        same = (a == b) or (
            a is not None
            and b is not None
            and np.isnan(a)
            and np.isnan(b)
        )
        if not same:
            n_bad += 1
    assert n_bad == 0


def test_abtest_ztest_boundary(spark, tmp_path):
    """Constructed cohort counts (n0=204, c0=6, n1=211, c1=76) put the
    pooled two-proportion z at 8.4603373905 — within an ulp of a
    digit-9 half, where the old idiom demonstrably split the engines
    (Spark 8.460337391 vs DuckDB 8.46033739). The migrated entry must
    pass the full entry-vs-oracle compare on this data."""
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    n0, c0, n1, c1 = 204, 6, 211, 76
    rows = []
    eid = 0
    for i in range(n0):  # even user_ids -> cohort 0
        rows.append((eid, 2 * i, "purchase" if i < c0 else "view"))
        eid += 1
    for i in range(n1):  # odd user_ids -> cohort 1
        rows.append((eid, 2 * i + 1, "purchase" if i < c1 else "view"))
        eid += 1
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * len(rows),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([json.dumps({"k": 1})] * len(rows)),
        }
    )
    tables = gen_tables("tiny", 0)
    tables["events"] = events
    sf = str(tmp_path / "sfzpin")
    write_sf_dir(tables, sf)

    con = duck_conn(sf)
    try:
        df = catalog.queries()["rel_abtest_ztest"](spark, sf)
        ok, n_rows, _, _ = compare(
            "rel_abtest_ztest[boundary]",
            df,
            con,
            catalog.oracle_sql()["rel_abtest_ztest"],
        )
        (row,) = df.collect()
    finally:
        con.close()
    assert ok and n_rows == 1
    # the z really is the boundary value the sweep found
    assert abs(row.z_score - 8.4603373905) < 2e-9
    # and the OLD idiom still diverges on exactly this z (revert guard)
    z = row.z_score
    duck_old = duckdb.connect().execute(
        "SELECT round(?::DOUBLE, 9)", [8.4603373905]
    ).fetchone()[0]
    assert _spark_round_model(8.4603373905) != duck_old


def test_duck_decimal_to_double_cast_is_the_varchar_path():
    """The r10 sf0.1 catch (rel_q1_pricing): DuckDB's native
    DECIMAL->DOUBLE cast is not correctly rounded once the scaled
    integer exceeds 2^53 (hugeint->double then *10^-scale — two
    roundings), while Spark's BigDecimal.doubleValue is. The pinned
    sum 2828375807.43413200 must expose the native-path error AND the
    VARCHAR route must equal the correctly-rounded value on a
    randomized sweep, so catalog._stable_double_casts stays justified."""
    from decimal import Decimal

    import numpy as np

    con = duckdb.connect()
    v = "2828375807.43413200"
    native = con.execute(
        f"SELECT CAST(CAST('{v}' AS DECIMAL(34,8)) AS DOUBLE)"
    ).fetchone()[0]
    routed = con.execute(
        f"SELECT CAST(CAST(CAST('{v}' AS DECIMAL(34,8)) AS VARCHAR)"
        " AS DOUBLE)"
    ).fetchone()[0]
    correct = float(Decimal(v))
    assert native != correct  # the engine bug this guards against
    assert routed == correct
    # randomized: varchar path == correctly rounded, always
    rng = np.random.default_rng(7)
    vals = [
        f"{int(rng.integers(0, 10**12))}.{int(rng.integers(0, 10**8)):08d}"
        for _ in range(2000)
    ]
    import pandas as pd

    pdf = pd.DataFrame({"s": vals})  # noqa: F841
    routed_all = con.execute(
        "SELECT CAST(CAST(CAST(s AS DECIMAL(34,8)) AS VARCHAR) AS DOUBLE)"
        " AS v FROM pdf"
    ).df()["v"]
    assert all(
        float(Decimal(s)) == d for s, d in zip(vals, routed_all)
    )
    # the FLOAT caveat the type dispatch exists for: VARCHAR-routing a
    # FLOAT re-parses its short rendering to a DIFFERENT double than
    # exact widening
    w_bad, w_good = con.execute(
        "SELECT CAST(CAST(CAST(0.1 AS FLOAT) AS VARCHAR) AS DOUBLE),"
        " CAST(CAST(0.1 AS FLOAT) AS DOUBLE)"
    ).fetchone()
    assert w_bad != w_good


def test_stable_double_casts_transformer():
    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        _stable_double_casts as T,
    )

    assert T("CAST(x AS DOUBLE)") == (
        "CAST(CASE WHEN typeof(x) IN ('FLOAT', 'BOOLEAN')"
        " THEN CAST(CAST(x AS DOUBLE) AS VARCHAR)"
        " ELSE CAST(x AS VARCHAR) END AS DOUBLE)"
    )
    # quoted parens don't unbalance the scanner
    r = T("CAST(len(regexp_extract_all(t, '([ab])')) AS DOUBLE)")
    assert "typeof(len(regexp_extract_all(t, '([ab])'))" in r
    assert T("CAST(x AS DECIMAL(20,9))") == "CAST(x AS DECIMAL(20,9))"
    # an already-routed cast is recognized and not re-wrapped at the
    # top level (oracle_sql() only ever transforms the RAW strings, so
    # strict idempotence is not required — the FLOAT branch contains a
    # CAST(... AS DOUBLE) artifact that a second pass would re-route,
    # which stays value-equivalent)
    once = T("CAST(sum(CAST(a AS DECIMAL(24,8))) AS DOUBLE)")
    assert once.count("CASE WHEN typeof(sum(CAST(a AS DECIMAL(24,8))))") == 1
    # inner AS DOUBLE inside an outer one both get the route (the
    # outer operand replicates the routed inner 3x across the CASE)
    r = T("CAST(CAST(x AS DOUBLE) / n AS DOUBLE)")
    assert "typeof(x)" in r and r.startswith("CAST(CASE WHEN typeof(")


def test_q1_pricing_sf01_value_parity(spark):
    """The original failing case end-to-end at sf0.1: rel_q1_pricing
    must value-match its (transformed) oracle on the bench corpus."""
    import os

    sf = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf, "lineitem.parquet")):
        pytest.skip("sf0.1 fixtures not present")
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    con = duck_conn(sf)
    try:
        ok, n_rows, _, _ = compare(
            "rel_q1_pricing[sf0.1]",
            catalog.queries()["rel_q1_pricing"](spark, sf),
            con,
            catalog.oracle_sql()["rel_q1_pricing"],
        )
    finally:
        con.close()
    assert ok and n_rows == 6


def test_raw_double_to_decimal_cast_class_audit(spark):
    """The cast sibling of the round() class (r10 audit): CAST(x AS
    DECIMAL(p,s)) on a raw double also splits the engines near a
    scale-s half (Spark HALF_UP-rounds the shortest rendering, DuckDB
    rounds the binary value) — pinned here on constructed doubles,
    with dblround-before-cast as the stable statement. The catalog
    audit found ZERO live sites: every composite-double -> decimal
    quantization goes through dblround first (the r10 migration), and
    the remaining raw casts quantize fixed-decimal DATA (2dp money,
    2dp values) at an equal-or-finer scale, where the exact rational
    sits on a coarser lattice and the double's error (~1e-3 scaled
    units at TPC-H magnitudes) cannot reach the 0.5-unit half."""
    from pyspark.sql import functions as F

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (
        dblround,
    )

    vals = [29971.189053745, 31024.187555905, 32186.939107605]
    con = duckdb.connect()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    old_s = [
        str(r.v)
        for r in df.select(
            F.col("x").cast("decimal(24,8)").alias("v")
        ).collect()
    ]
    old_d = [
        con.execute(
            "SELECT CAST(CAST(?::DOUBLE AS DECIMAL(24,8)) AS VARCHAR)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert all(a != b for a, b in zip(old_s, old_d))  # the class is real
    new_s = [
        str(r.v)
        for r in df.select(
            dblround(F.col("x"), 8).cast("decimal(24,8)").alias("v")
        ).collect()
    ]
    new_d = [
        con.execute(
            "SELECT CAST(CAST(round(?::DOUBLE * 1e8) / 1e8"
            " AS DECIMAL(24,8)) AS VARCHAR)",
            [v],
        ).fetchone()[0]
        for v in vals
    ]
    assert new_s == new_d  # dblround-before-cast is the stable form
