"""Driver-contract smoke tests: entry() + queries()/oracle_sql() wiring."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 4
    assert {"chunk_id", "doc_id", "section", "text", "score", "pct"} <= set(
        df.columns
    )


def test_every_oracle_key_has_query():
    mod = load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # substantial coverage: at least 40 oracle-paired queries
    assert len(oracles) >= 40
    assert len(qs) >= 41


def test_queries_run_at_sf0001(spark):
    """Every catalog query at least executes and has stable columns at
    the smallest SF (full value parity is tools/parity.py's job)."""
    mod = load_entry()
    sf = "/root/testdata/sf0.001"
    for name, fn in mod.queries().items():
        df = fn(spark, sf)
        assert df.columns, name
        df.limit(1).collect()
