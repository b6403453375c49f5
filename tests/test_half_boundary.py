"""Regression pins for the round(sum/count) half-boundary bug class
(docs/ROUND8.md §12, migrated catalog-wide in round 9 — the four named
sites below get constructed-boundary entry pins; the fifteen
ratio-shaped siblings found by the r9 audit share the same
halfup_mean/halfup_ratio helpers, which the literal cases here and
test_halfup_ratio_matches_ground_truth pin against exact-rational
ground truth).

``round(CAST(sum AS DOUBLE)/count, d)`` splits between Spark and DuckDB
whenever the exact rational mean sits on (or within an ulp of) a half at
the rounding digit: Spark rounds the decimal rendering of the quotient
double, DuckDB rounds the 10^d-inflated product double. Each migrated
entry gets a CONSTRUCTED adversarial dataset that drives its mean onto a
boundary the old idiom demonstrably mis-rounds cross-engine (asserted at
literal level below, so a regression re-triggers loudly), and the full
entry-vs-oracle compare is replayed on it.

Boundary constructions (found by real-engine sweeps, /tmp notebooks r9):
- integer sums at d=9 need v2(count) >= 10 with a factor 5 —
  count = 5120 and an odd sum puts the exact mean ON a half;
  (10241, 5120) and (41, 5120) are real-engine-divergent under the old
  idiom.
- DECIMAL(20,9) sums at d=9: ANY odd u = sum*1e9 over a 2-row group is
  an exact half; every odd-sum pair tested diverged under the old idiom.
- cur_winsorize (DECIMAL(18,6), d=6) is special: an exhaustive sweep of
  its reachable value lattice (clip fractions are multiples of the
  percentile-interpolation granularity) found NO real-engine-divergent
  boundary in realistic ranges — the entry could not have been exposed.
  Its pin locks an exact-half input (HALF_UP on both engines) and the
  d=6 divergence is asserted at literal level instead.
"""

from __future__ import annotations

import os
import sys
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import pyarrow as pa
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.parity import compare, duck_conn  # noqa: E402
from tools.parity_fuzz import gen_tables, write_sf_dir  # noqa: E402


def _docs_table(rows: list[tuple[int, str, str]]) -> pa.Table:
    """documents at the fixture Arrow schema from (doc_id, text, lang)."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["pin"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def _sf_dir_with_docs(tmp_path, docs: pa.Table, n_chars=None) -> str:
    tables = gen_tables("tiny", 0)
    if n_chars is not None:
        idx = docs.schema.get_field_index("n_chars")
        docs = docs.set_column(
            idx, pa.field("n_chars", pa.int64()), pa.array(n_chars, pa.int64())
        )
    tables["documents"] = docs
    d = str(tmp_path / "sfpin")
    write_sf_dir(tables, d)
    return d


def _run_entry(spark, sf_dir: str, name: str):
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    con = duck_conn(sf_dir)
    try:
        df = catalog.queries()[name](spark, sf_dir)
        ok, n_rows, _, _ = compare(
            name, df, con, catalog.oracle_sql()[name]
        )
        rows = {tuple(r) for r in df.collect()}
    finally:
        con.close()
    return ok, rows


def _halfup(num: int, den: int, digits: int) -> float:
    """Ground-truth HALF_UP of the exact rational num/den at digits."""
    p = 10**digits
    u = Fraction(num * p, den)
    sign = -1 if u < 0 else 1
    au = abs(u)
    k = (2 * au.numerator + au.denominator) // (2 * au.denominator)
    return float(sign * k) / p


def test_sentence_stats_half_boundary(spark, tmp_path):
    # 5120 sentences, 10241 words: first sentence "x" (1 word), 5118
    # injected sentences "Table x" (2 words), one "Table x y y" (4).
    text = "x" + " table x" * 5118 + " table x y y"
    sf = _sf_dir_with_docs(tmp_path, _docs_table([(1, text, "en")]))
    ok, rows = _run_entry(spark, sf, "text_sentence_stats")
    assert ok
    row = next(iter(rows))
    got = dict(zip(("doc_id", "n_sentences", "avg", "longest"), row))
    # shape: the crafted counts actually landed on the boundary pair
    assert got["n_sentences"] == 5120 and got["longest"] == 4
    # 10241/5120 = 2.00019531|25 — exact half at digit 9, HALF_UP up
    assert got["avg"] == _halfup(10241, 5120, 9) == 2.000195313


def test_dedup_substring_half_boundary(spark, tmp_path):
    # doc A: 5127 unique words -> 5120 rolling 8-word windows; doc B
    # copies a 48-word contiguous run -> exactly 41 of A's windows are
    # duplicated. 41/5120 = 0.00800781|25 — exact half at digit 9.
    a_words = [f"w{i:04d}" for i in range(5127)]
    b_words = a_words[1000:1048]
    sf = _sf_dir_with_docs(
        tmp_path,
        _docs_table(
            [(1, " ".join(a_words), "en"), (2, " ".join(b_words), "en")]
        ),
    )
    ok, rows = _run_entry(spark, sf, "dedup_substring")
    assert ok
    by_id = {r[0]: r for r in rows}
    assert by_id[1][1] == 5120 and by_id[1][2] == 41  # shape
    assert by_id[1][3] == _halfup(41, 5120, 9) == 0.008007813
    assert by_id[2][3] == 1.0


def test_curriculum_half_boundary(spark, tmp_path):
    # 40 docs -> four 10-doc ntile phases. The ten lowest-quality docs
    # (7 words, zero stopwords, char counts tuned) have quality_q
    # summing to u = 1694285715 — 2u ≡ n (mod 2n), so the phase mean
    # 0.1694285715 is an exact half at digit 9, and this u is
    # real-engine-divergent under the old idiom (the literal case
    # below asserts that). Found by sweeping boundary combos of the
    # stable (w=7, c) quality lattice against both engines.
    low_cs = (13, 14, 15, 16, 17, 18, 27, 34, 35, 36)
    low = [
        (i + 1, "b" * (c - 12) + " c d e f g h", "en")
        for i, c in enumerate(low_cs)
    ]
    # 30 identical stopword-rich docs (quality 0.473714286, far above
    # the low ten; ties broken by doc_id, phase means exact)
    high = [
        (i + 11, "the of to the of to the", "en") for i in range(30)
    ]
    sf = _sf_dir_with_docs(tmp_path, _docs_table(low + high))
    ok, rows = _run_entry(spark, sf, "cur_curriculum_phases")
    assert ok
    by_phase = {r[0]: r for r in rows}
    assert by_phase[1][1] == 10  # n_docs: the crafted 10-doc phase
    assert (
        by_phase[1][3]
        == _halfup(1694285715, 10 * 10**9, 9)
        == 0.169428572
    )
    assert by_phase[4][3] == 0.473714286


def test_winsorize_exact_half(spark, tmp_path):
    # 96 docs one lang; n_chars multiset drives lo = 40 (tie at the p05
    # rank) and hi = 51.25 (gap 1 at the p95 rank): clipped sum
    # 4802.25 over 96 -> mean 50.023437|5, exact half at digit 6.
    # (The reachable winsorize lattice has NO real-engine-divergent
    # boundary — this pin locks HALF_UP agreement on the exact half;
    # the d=6 divergence class is pinned at literal level below.)
    n_chars = (
        [39] * 4 + [40] * 2 + [50] * 29 + [51] * 55 + [51] + [52] * 5
    )
    rows = [(i + 1, "w x y z", "xx") for i in range(96)]
    sf = _sf_dir_with_docs(
        tmp_path, _docs_table(rows), n_chars=n_chars
    )
    ok, out = _run_entry(spark, sf, "cur_winsorize")
    assert ok
    row = next(iter(out))
    assert row[1] == 96
    assert row[2] == _halfup(4802250000, 96 * 10**6, 6) == 50.023438


# --- literal-level: the OLD idiom demonstrably diverges on the pinned
# boundary rationals (so a revert re-triggers), the NEW one agrees and
# matches the exact-rational ground truth on both engines.
_CASES = [
    # (u = sum*10^d, count, d) — u integral; entry provenance in name
    pytest.param(10241 * 10**9, 5120, 9, id="sentence-stats-10241/5120"),
    pytest.param(41 * 10**9, 5120, 9, id="dup-frac-41/5120"),
    pytest.param(1694285715, 10, 9, id="curriculum-10docs"),
    pytest.param(8000650000, 160, 6, id="winsorize-d6-unreachable-frac"),
]


@pytest.mark.parametrize("u,n,d", _CASES)
def test_old_idiom_diverges_new_agrees(spark, u, n, d):
    import duckdb

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (  # noqa: E501
        halfup_mean,
        halfup_mean_duck,
    )

    con = duckdb.connect()
    # the literal "sum" with exactly d decimals, as both engines see it
    lit = str(Decimal(u).scaleb(-d))
    s_sql = f"CAST('{lit}' AS DECIMAL(38,{d}))"
    old_s = spark.sql(
        f"SELECT round(CAST({s_sql} AS DOUBLE) / {n}, {d})"
    ).collect()[0][0]
    old_d = con.execute(
        f"SELECT round(CAST({s_sql} AS DOUBLE) / {n}, {d})"
    ).fetchone()[0]
    assert old_s != old_d, "old idiom no longer diverges — engine drift?"

    truth = _halfup(u, n * 10**d, d)
    new_s = (
        spark.range(1)
        .select(halfup_mean(s_sql, str(n), d).alias("m"))
        .collect()[0][0]
    )
    new_d = con.execute(
        "SELECT " + halfup_mean_duck(s_sql, str(n), d)
    ).fetchone()[0]
    con.close()
    assert new_s == new_d == truth


def test_halfup_ratio_matches_ground_truth(spark):
    """The generalized decimal/decimal ratio (cur_mix_entropy's
    entropy_normalized shape): exact HALF_UP on both engines, NULL on a
    zero denominator (the try_divide contract)."""
    import duckdb

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (  # noqa: E501
        halfup_ratio,
        halfup_ratio_duck,
    )

    con = duckdb.connect()
    cases = [
        ("1.000000003", "2.000000000", _halfup(1000000003, 2000000000, 9)),
        # exact half at digit 9: 3/2e9 scaled -> .5 -> HALF_UP up
        ("0.000000003", "2.000000000", 2e-09),
        ("-0.000000003", "2.000000000", -2e-09),
        ("1.5", "0", None),
    ]
    for num, den, want in cases:
        n_sql = f"CAST('{num}' AS DECIMAL(20,9))"
        d_sql = f"CAST('{den}' AS DECIMAL(20,9))"
        got_s = (
            spark.range(1)
            .select(halfup_ratio(n_sql, d_sql, 9, 9, 9).alias("r"))
            .collect()[0][0]
        )
        got_d = con.execute(
            "SELECT " + halfup_ratio_duck(n_sql, d_sql, 9, 9, 9)
        ).fetchone()[0]
        assert got_s == got_d == want, (num, den, got_s, got_d, want)
    con.close()


def test_halfup_randomized_sweep_vs_fraction(spark):
    """200 seeded random (u, n, d) cases per helper shape — including
    forced exact halves — batched as ONE query per engine and compared
    to Fraction ground truth. Catches any drift in the div/HUGEINT
    arithmetic across the precision range the catalog uses."""
    import random

    import duckdb

    from ade_agente_documental_empresarial___miner_a_spark.functions.exactmath import (  # noqa: E501
        halfup_mean,
        halfup_mean_duck,
    )

    rng = random.Random(9)
    cases = []
    for i in range(200):
        d = rng.choice([6, 9, 12])
        n = rng.randint(1, 10**6)
        if i % 3 == 0:
            # force an exact half: u ≡ n/2 (mod n), n even
            n += n % 2
            u = rng.randrange(0, 10 ** (d + 3)) * n + n // 2
        else:
            u = rng.randrange(-(10 ** (d + 4)), 10 ** (d + 4))
        cases.append((u, n, d))

    sels_s, sels_d, truths = [], [], []
    for j, (u, n, d) in enumerate(cases):
        lit = str(Decimal(u).scaleb(-d))
        s_sql = f"CAST('{lit}' AS DECIMAL(38,{d}))"
        sels_s.append(halfup_mean(s_sql, str(n), d).alias(f"r{j}"))
        sels_d.append(
            halfup_mean_duck(s_sql, str(n), d) + f" AS r{j}"
        )
        truths.append(_halfup(u, n * 10**d, d))

    got_s = spark.range(1).select(*sels_s).collect()[0]
    con = duckdb.connect()
    got_d = con.execute("SELECT " + ", ".join(sels_d)).fetchone()
    con.close()
    for j, want in enumerate(truths):
        assert got_s[f"r{j}"] == got_d[j] == want, (cases[j], want)


def test_duck_wide_decimal_scale_strip_stays_exact():
    """ADVICE r9 #1 audit (r10): the duck-side non-integral halfup path
    multiplies a DECIMAL(38,9) sum by 10^9. The concern was a silent
    DOUBLE fallback past 2^53; in DuckDB 1.0.0 the product stays
    DECIMAL(38,9) (hugeint-backed) and true overflow is LOUD. Pin both
    facts so an engine upgrade that changes either re-triggers."""
    import random

    import duckdb

    con = duckdb.connect()
    t = con.execute(
        "SELECT typeof(abs(CAST('1.000000001' AS DECIMAL(38,9)))"
        " * 1000000000)"
    ).fetchone()[0]
    assert t.startswith("DECIMAL"), t  # not DOUBLE
    random.seed(0)
    for _ in range(500):
        u = random.randrange(2**53, 2**60) | 1  # past double-exact range
        s = str(u)
        v = s[:-9] + "." + s[-9:]
        n = random.randrange(3, 99, 2)
        got = con.execute(
            f"SELECT (2 * CAST(abs(CAST('{v}' AS DECIMAL(38,9)))"
            f" * 1000000000 AS HUGEINT) + {n}) // (2 * {n})"
        ).fetchone()[0]
        assert int(got) == (2 * u + n) // (2 * n), (v, n)
    # and the failure mode past 38 digits is loud, not a silent split
    import pytest as _pytest

    with _pytest.raises(Exception, match="Overflow|Out of Range"):
        con.execute(
            "SELECT abs(CAST('1234567890123456789012345.123456789'"
            " AS DECIMAL(38,9))) * 1000000000"
        ).fetchone()
