"""Catalog-level tests for the oracle-paired ingestion queries (S1–S4,
E1 front half) over the committed fixture tree in tests/data/ingest/."""

import os

from ade_agente_documental_empresarial___miner_a_spark.plans import catalog
from ade_agente_documental_empresarial___miner_a_spark.plans.queries_ingest import (
    FIXTURE_DIR,
)

INGEST_KEYS = [
    "s1_binary_scan_mime",
    "s2_html_extract",
    "s3_extract_degrade",
    "s4_csv_serialize",
    "s4b_csv_relational",
    "e1_ingest_chunks",
]


def test_fixture_tree_committed():
    names = sorted(os.listdir(FIXTURE_DIR))
    assert "alpha.html" in names and "golf.pdf" in names
    assert "india.xlsx" in names  # S5 degrade fixture (round 3)
    assert len(names) == 9


def test_registered_with_oracles():
    qs, oracles = catalog.queries(), catalog.oracle_sql()
    for k in INGEST_KEYS:
        assert k in qs, k
        assert k in oracles, k


def test_e1_chain_rows(spark):
    rows = catalog.queries()["e1_ingest_chunks"](spark, "unused").collect()
    # 2 txt files, 5 content paragraphs, 3 distinct sections, titles consumed
    assert len(rows) == 5
    sections = {r["section"] for r in rows}
    assert sections == {"DELTA OVERVIEW", "DELTA DETAILS", "ECHO SUMMARY"}
    assert all(r["chunk_pos"] == 0 for r in rows)
    assert all(not r["text"].startswith(("\n", " ")) for r in rows)


def test_degrade_contract(spark):
    rows = catalog.queries()["s3_extract_degrade"](spark, "unused").collect()
    by_name = {r["fname"]: r for r in rows}
    assert by_name["golf.pdf"]["error"].startswith("NotImplementedError")
    assert by_name["hotel.bin"]["error"] == "unsupported mime: application/octet-stream"
    assert all(r["text"] is None for r in rows)
