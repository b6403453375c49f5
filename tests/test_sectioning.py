"""Golden sectioning tests (SURVEY §5.2/§5.3, FIXTURES.md group B)."""

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.sectioning import (
    assign_sections,
    extract_titles,
    split_paragraphs,
)

GOLDEN = (
    "intro before any title\n\n"
    "SECTION ALPHA\n\n"
    "body of alpha. more text\n\n"
    "AB\n\n"                      # <=5 chars: NOT a title
    "SECCIÓN ACENTO\n\n"      # accented caps: NOT a title (regex [A-Z\s])
    "NEXT SECTION\n\n"
    "tail paragraph"
)


def golden_df(spark):
    return spark.createDataFrame([(1, GOLDEN)], "doc_id long, text string")


def test_extract_titles(spark):
    rows = extract_titles(golden_df(spark)).collect()
    assert [r.title for r in rows] == ["SECTION ALPHA", "NEXT SECTION"]


def test_paragraph_split_positions(spark):
    rows = split_paragraphs(golden_df(spark)).orderBy("para_pos").collect()
    assert rows[0].para_pos == 0
    assert rows[0].paragraph == "intro before any title"
    assert len(rows) == 7


def test_section_forward_fill(spark):
    rows = (
        assign_sections(golden_df(spark)).orderBy("para_pos").collect()
    )
    got = [(r.para_pos, r.section, r.paragraph) for r in rows]
    assert got == [
        (0, "General", "intro before any title"),
        (2, "SECTION ALPHA", "body of alpha. more text"),
        (3, "SECTION ALPHA", "AB"),
        (4, "SECTION ALPHA", "SECCIÓN ACENTO"),
        (6, "NEXT SECTION", "tail paragraph"),
    ]


def test_no_titles_all_general(spark):
    df = spark.createDataFrame(
        [(1, "plain paragraph\n\nanother one")], "doc_id long, text string"
    )
    rows = assign_sections(df).collect()
    assert {r.section for r in rows} == {"General"}


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    # empty text -> one empty paragraph row (matches str.split semantics);
    # null text -> no rows
    rows = assign_sections(df).collect()
    assert all(r.doc_id == 1 for r in rows)
