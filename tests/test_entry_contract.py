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


def test_no_driver_hostile_output_types(spark):
    """The driver's correctness canonicalizer sorts result columns via
    pandas and hashes cell values; ARRAY/MAP/STRUCT cells crash the sort
    (r04: emb_label_centroids) and DECIMAL cells hash through a lossy
    decimal->double conversion that diverges between engines at >15
    significant digits (r04: rel_grouping_sets). Pin the invariant for
    the ENTIRE oracle-paired catalog — not just the current 50-entry
    window — so future window rotations can never resurface the hazard."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    mod = load_entry()
    oracles = set(mod.oracle_sql())
    sf = "/root/testdata/sf0.001"
    bad = []
    for name, fn in mod.queries().items():
        if name not in oracles:
            continue  # rows-only entries never reach the value hasher
        for f in fn(spark, sf).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, bad


def test_driver_window_ordering():
    """The driver certifies only the first ~50 queries() entries per
    round; pin the rotation invariants so a catalog edit cannot silently
    push unchecked work out of the window: (1) _PRIORITY names lead,
    (2) every never-driver-green name precedes every green name that is
    not in _RECHECK, (3) the order is deterministic across loads."""
    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        _DRIVER_GREEN,
        _PRIORITY,
        _RECHECK,
    )

    mod = load_entry()
    order = list(mod.queries())
    assert order[: len(_PRIORITY)] == [
        n for n in _PRIORITY if n in set(order)
    ]
    pos = {n: i for i, n in enumerate(order)}
    recheck = [
        n for n in order
        if n in _DRIVER_GREEN and n in _RECHECK and n not in _PRIORITY
    ]
    never = [
        n for n in order
        if n not in _DRIVER_GREEN and n not in _PRIORITY
    ]
    settled_green = [
        n for n in order
        if n in _DRIVER_GREEN and n not in _RECHECK and n not in _PRIORITY
    ]
    # touched-green names re-verify FIRST (a stale green claim over
    # changed code must not queue behind the never-checked backlog)
    if recheck and never:
        assert max(pos[n] for n in recheck) < min(pos[n] for n in never)
    if never and settled_green:
        assert max(pos[n] for n in never) < min(
            pos[n] for n in settled_green
        )
    # deterministic across module loads
    assert list(load_entry().queries()) == order
    # oracle_sql iterates in the same driver-facing order on shared keys
    osql_order = [n for n in mod.oracle_sql() if n in pos]
    assert osql_order == [n for n in order if n in set(osql_order)]


def test_recorded_red_names_lead_tier_two(monkeypatch):
    """A name whose LATEST driver record is red must lead tier 2 — it
    re-enters the very next window instead of waiting at its
    registration position behind the never-checked backlog (the r04
    reds needed manual _PRIORITY pins for exactly this; the ordering
    now generalizes it)."""
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    mapping = {f"q{i}": i for i in range(8)}
    # q1/q2 green, q5 RED on record, q0/q3/q4/q6/q7 never checked;
    # q5 registers LATE (position 5) yet must front tier 2
    monkeypatch.setattr(catalog, "_VERDICTS", {
        "q1": True, "q2": True, "q5": False,
    })
    monkeypatch.setattr(
        catalog, "_DRIVER_GREEN", frozenset({"q1", "q2"})
    )
    monkeypatch.setattr(catalog, "_RECHECK", frozenset({"q2"}))
    monkeypatch.setattr(catalog, "_PRIORITY", ("q7",))
    got = list(catalog.driver_ordered(mapping))
    assert got == [
        "q7",                       # priority
        "q2",                       # recheck (green + touched)
        "q5",                       # RED record — fronts tier 2
        "q0", "q3", "q4", "q6",    # never-checked, registration order
        "q1",                       # settled green last
    ]
    # values ride along untouched
    assert catalog.driver_ordered(mapping)["q5"] == 5


def test_recorded_verdicts_derivation(tmp_path):
    """The driver-green set is derived from the CORRECTNESS_r{N}.json
    files the driver writes; latest round wins so regressions re-enter
    the window automatically and re-greens settle without manual edits."""
    import json

    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        _DRIVER_GREEN,
        _STATIC_GREEN,
        _VERDICTS,
        _recorded_verdicts,
    )

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 5, "oracle_rows": 5, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "spark_rows": 5, "oracle_rows": 5, "err": None}
    crash = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": "boom"}
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 9, "oracle_rows": None,
                 "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(
        {"a": ok, "b": ok, "c": red, "d": rows_only}
    ))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(
        {"b": crash, "c": ok}
    ))
    (tmp_path / "CORRECTNESS_r06.json").write_text("not json")  # skipped
    v, rounds = _recorded_verdicts(str(tmp_path))
    assert v == {"a": True, "b": False, "c": True, "d": True}
    # rounds track the LATEST record per name (the r06 file is unparseable
    # so r05 is the newest valid record for b and c)
    assert rounds == {"a": 4, "b": 5, "c": 5, "d": 4}

    # the module-level wiring: greens union the static baseline, latest
    # reds are excluded even if an older round (or the baseline) had them
    live, _ = _recorded_verdicts()
    expect = frozenset(
        (_STATIC_GREEN | {n for n, g in live.items() if g})
        - {n for n, g in live.items() if not g}
    )
    assert _DRIVER_GREEN == expect
    assert _VERDICTS == live
    # the r04 reds must be rotation-eligible (front of the window)
    for name in ("emb_label_centroids", "rel_grouping_sets"):
        if name in live:
            assert live[name] is False or name in _DRIVER_GREEN


def test_recheck_auto_expiry():
    """A _RECHECK pin queued for round Q stays active until a GREEN
    driver record from round >= Q exists: pre-change greens (older
    rounds) don't satisfy it, later reds don't satisfy it, and a
    post-change green retires it without a manual reset."""
    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        _RECHECK,
        _RECHECK_QUEUED,
        _VERDICT_ROUNDS,
        _VERDICTS,
        _active_rechecks,
    )

    queued = {"x": 6, "y": 6, "z": 6, "w": 6}
    verdicts = {"x": True, "y": True, "z": False}
    rounds = {"x": 5, "y": 6, "z": 7}
    active = _active_rechecks(queued, verdicts, rounds)
    assert "x" in active  # green but PRE-change (r5 < queue r6)
    assert "y" not in active  # post-change green -> retired
    assert "z" in active  # post-change but red -> still owed a green
    assert "w" in active  # never recorded

    # module wiring: the live _RECHECK is exactly the derivation over
    # the live verdict/round maps
    assert _RECHECK == _active_rechecks(
        _RECHECK_QUEUED, _VERDICTS, _VERDICT_ROUNDS
    )
    # as of the r5 records currently in-repo, nothing can have a r>=6
    # green yet, so every queued name is still active; once the driver
    # writes CORRECTNESS_r06 greens, these retire with no code change
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = max(
        int(p.rsplit("_r", 1)[1].split(".")[0])
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )
    if latest < 6:
        assert _RECHECK == frozenset(_RECHECK_QUEUED)
