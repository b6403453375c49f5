"""Pins for tools/parity_fuzz.py and the bug classes it caught.

The fuzzer generates the ten engine tables at the exact fixture Arrow
schemas under adversarial profiles and replays the driver's
Spark-vs-DuckDB value compare on them. These tests pin (a) the
generator's determinism + schema fidelity (no Spark needed) and (b) one
representative entry per ROBUSTNESS BUG CLASS the first sweep found, on
the exact profile that triggered it — each was a job-aborting crash or a
cross-engine value divergence before the round-7 fixes:

- zero-norm cosine        → k1_topk_search, edge   (was DIVIDE_BY_ZERO)
- zero-denominator ratios → rel_higher_moments, tiny (single-row group)
- empty regexp char array → cur_bpe_pair_stats, edge (slice length -1)
- CSV quote/trim/newline  → s18_csv_interop, edge  (record splits, trim)
- byte- vs codepoint-Levenshtein → text_edit_distance, edge
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.parity import TABLES, compare, duck_conn  # noqa: E402
from tools.parity_fuzz import gen_tables, write_sf_dir  # noqa: E402

FIXTURE_DIR = "/root/testdata/sf0.001"


def test_generation_is_deterministic_per_seed():
    a = gen_tables("edge", 7)
    b = gen_tables("edge", 7)
    c = gen_tables("edge", 8)
    for name in TABLES:
        assert a[name].equals(b[name]), name
    assert any(not a[n].equals(c[n]) for n in TABLES)


@pytest.mark.parametrize(
    "profile", ["random", "edge", "skew", "tiny", "const", "chunk"]
)
def test_generated_schemas_match_fixtures(profile, tmp_path):
    d = str(tmp_path / profile)
    write_sf_dir(gen_tables(profile, 0), d)
    for t in TABLES:
        want = pq.read_schema(os.path.join(FIXTURE_DIR, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(d, f"{t}.parquet"))
        assert [(f.name, f.type) for f in got] == [
            (f.name, f.type) for f in want
        ], t


# (entry, profile, seed) — one per fixed bug class, chosen to
# re-trigger the original failure shape if the fix regresses.
_REGRESSION_CASES = [
    ("k1_topk_search", "edge", 0),
    ("rel_higher_moments", "tiny", 0),
    ("cur_bpe_pair_stats", "edge", 0),
    ("s18_csv_interop", "edge", 0),
    ("text_edit_distance", "edge", 0),
    # KM survival hitting exactly 0 (d == n_at_risk): ln(0) in the
    # log-sum form — needs seed 3's fully-churned tiny cohort (seeds
    # re-scanned after _rng moved to crc32 tag hashing;
    # test_pinned_seed_shapes asserts the shape still holds)
    ("rel_survival_km", "tiny", 3),
    # const profile: zero-range histogram bin width (0/0 under ANSI);
    # approx-percentile rank contract under total ties (rank is a span)
    ("rel_value_histogram", "const", 0),
    ("rel_approx_percentile_contract", "const", 0),
    # bitext ratio against an EMPTY paired doc (length 0 denominator)
    # — needs seed 2's rank alignment to pair the empty en/de docs
    ("cur_bitext_ratio_filter", "edge", 2),
    # chunk profile (r8): the chunker entries VALUE-checked inside
    # their oracle domain — crafted 120/20-boundary texts incl. the
    # 119-char-second-word piece-vs-word domain edge the first sweep
    # caught (a non-first word's piece carries its separator)
    ("t3b_chunk_long_docs", "chunk", 0),
    ("stream_incremental_index", "chunk", 0),
    # r8: a mean landing EXACTLY on a round(·,9) half boundary —
    # Spark rounds the exact binary double, DuckDB multiplies by 1e9
    # first and rounds the inflated product, and they split by 1e-9.
    # Fixed by the integer-exact HALF_UP mean in both LM entries; this
    # seed regenerates the boundary sum.
    ("text_bigram_backoff_lm", "chunk", 2),
    # r9: the boundary profile drives the four migrated
    # round(sum/count) sites onto exact halves by construction
    # (tests/test_half_boundary.py holds the divergence-verified static
    # pins; these re-run the same class through the seeded generator)
    ("text_sentence_stats", "boundary", 0),
    ("dedup_substring", "boundary", 0),
    ("cur_winsorize", "boundary", 0),
    ("cur_curriculum_phases", "boundary", 0),
    # r9: the edge profile now plants a NULL text (code-review finding)
    # — these four were REAL cross-engine divergences on it: DuckDB
    # NULLS-LAST window/ntile order vs Spark NULLS FIRST (quantile,
    # psi), DuckDB list_intersect(NULL) = 0-length vs Spark NULL
    # (similarity pairs), and engine-split NULL rule semantics in the
    # expectations gate
    ("rel_quantile_normalize", "edge", 0),
    ("cur_psi_sources", "edge", 0),
    ("text_set_similarity_battery", "edge", 0),
    ("cur_expectations", "edge", 0),
]


def test_pinned_seed_shapes(tmp_path):
    """The two seed-sensitive pins above only re-trigger their bug class
    if the generated data still exhibits the shape. Assert the shape
    DIRECTLY (via DuckDB) so a generator change that drifts the data is
    a loud failure here, not a silently-depinned regression case."""
    d = str(tmp_path / "km")
    write_sf_dir(gen_tables("tiny", 3), d)
    con = duck_conn(d)
    try:
        # fully-churned cohort: some lifetime step has d == n_at_risk,
        # so KM survival hits exactly 0 at/after it
        rows = con.execute(
            """WITH ev AS (SELECT * FROM events),
            span AS (SELECT user_id,
                            CAST(min(CAST(ts AS DATE)) AS DATE) f,
                            CAST(max(CAST(ts AS DATE)) AS DATE) l
                     FROM ev GROUP BY user_id),
            edge AS (SELECT max(l) AS e FROM span),
            life AS (SELECT CAST(l - f AS BIGINT) AS lt,
                            l > e - 3 AS cens
                     FROM span CROSS JOIN edge),
            tbl AS (SELECT lt,
                           sum(CASE WHEN NOT cens THEN 1 ELSE 0 END) d,
                           count(*) a FROM life GROUP BY lt),
            risk AS (SELECT d, sum(a) OVER (ORDER BY lt DESC) n
                     FROM tbl)
            SELECT count(*) FROM risk WHERE d >= n AND d > 0"""
        ).fetchone()
        assert rows[0] > 0, "tiny/seed 3 lost the d==n_at_risk shape"
    finally:
        con.close()

    d = str(tmp_path / "bitext")
    write_sf_dir(gen_tables("edge", 2), d)
    con = duck_conn(d)
    try:
        # rank-paired en/de docs where the de side is EMPTY (len 0)
        rows = con.execute(
            """WITH en AS (SELECT row_number() OVER (ORDER BY doc_id) r
                           FROM documents WHERE lang = 'en'),
            de AS (SELECT row_number() OVER (ORDER BY doc_id) r,
                          length(text) dl
                   FROM documents WHERE lang = 'de')
            SELECT count(*) FROM en JOIN de USING (r) WHERE dl = 0"""
        ).fetchone()
        assert rows[0] > 0, "edge/seed 2 lost the empty-de-doc pairing"
    finally:
        con.close()


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name,profile,seed", _REGRESSION_CASES)
def test_fuzz_regression_case(
    spark, entry_mod, tmp_path, name, profile, seed
):
    d = str(tmp_path / f"{profile}_{name}")
    write_sf_dir(gen_tables(profile, seed), d)
    ok, nrows, _, _ = compare(
        f"{profile}:{name}",
        entry_mod.queries()[name](spark, d),
        duck_conn(d),
        entry_mod.oracle_sql()[name],
    )
    assert ok, f"{name} diverged from the oracle on {profile} data"


def test_boundary_profile_shapes(tmp_path):
    """The boundary docs must actually sit ON rounding-digit halves —
    assert the shapes directly via DuckDB so generator drift is a loud
    failure, not a silently-depinned class (same discipline as
    test_pinned_seed_shapes)."""
    d = str(tmp_path / "boundary")
    write_sf_dir(gen_tables("boundary", 0), d)
    con = duck_conn(d)
    try:
        # xs doc: 5120 sentences, odd word total
        n_sent, n_words = con.execute(
            """WITH s AS (
              SELECT unnest(string_split_regex(
                REPLACE(REPLACE(text, ' table ', '. Table '),
                        ' spark ', '! Spark '), '[.!?] ')) AS x
              FROM documents WHERE lang = 'xs')
            SELECT count(*),
                   CAST(sum(len(string_split(x, ' '))) AS BIGINT)
            FROM s WHERE length(x) > 0"""
        ).fetchone()
        assert n_sent == 5120 and n_words % 2 == 1
        # xd pair: odd duplicated-window count over 5120 spans
        n_spans, run_words = con.execute(
            """SELECT
              (SELECT len(string_split(text, ' ')) - 7 FROM documents
               WHERE lang = 'xd' ORDER BY doc_id LIMIT 1),
              (SELECT len(string_split(text, ' ')) FROM documents
               WHERE lang = 'xd' ORDER BY doc_id DESC LIMIT 1)"""
        ).fetchone()
        assert n_spans == 5120 and (run_words - 7) % 2 == 1
        # xb block: clipped sum ends exactly on the digit-6 half
        frac = con.execute(
            """WITH b AS (
              SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.05) lo,
                     quantile_cont(CAST(n_chars AS DOUBLE), 0.95) hi
              FROM documents WHERE lang = 'xb')
            SELECT CAST(sum(least(greatest(CAST(n_chars AS DOUBLE), lo),
                                  hi)) * 1000000 AS HUGEINT)
                   % (SELECT count(*) FROM documents WHERE lang = 'xb')
            FROM documents, b WHERE lang = 'xb'"""
        ).fetchone()[0]
        assert frac == 48, "xb clipped sum left the 2u ≡ n (mod 2n) residue"
    finally:
        con.close()


def test_media_profile_runs_green(spark):
    """The media profile (truncations/garbage/NULLs/lying headers
    through the full Spark media operators) must pass for seed 0 — its
    first run caught the resize_plan int-overflow job-killer."""
    from tools.parity_fuzz import run_media_profile

    results, failures = run_media_profile(spark, 0)
    assert not failures, failures
    assert results["extract_media_features"]["status"] == "ok"
    assert results["extract_payload_stats"]["status"] == "ok"


def test_edge_profile_has_null_text(tmp_path):
    """The NULL-text pins above only re-trigger their class if edge/s0
    still plants a NULL text row — assert the shape directly."""
    d = str(tmp_path / "nulltext")
    write_sf_dir(gen_tables("edge", 0), d)
    con = duck_conn(d)
    try:
        n_null, n_null_chars = con.execute(
            "SELECT count(*) FILTER (text IS NULL),"
            " count(*) FILTER (n_chars IS NULL) FROM documents"
        ).fetchone()
    finally:
        con.close()
    assert n_null >= 1 and n_null_chars >= 1
