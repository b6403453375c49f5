"""Ingestion queries — SURVEY §2.1 S1–S4 over a committed binary fixture
tree, oracle-paired (VERDICT r1 item 1: the E1 front half previously had
zero CORRECTNESS coverage).

Reference surface (``micro-infobot/app.py:191-205``): uploader → MIME
dispatch → per-format text extraction → flat corpus. Re-expressed here as
``binaryFile`` scan (S1) → Arrow-batched ``mapInPandas`` extraction
(S2/S3) → sectioning/chunking (T1/T2/T3), each stage DuckDB-checkable:
DuckDB reads the same files via ``read_blob``/``read_text``/``read_csv``
and mirrors the exact fallback-extraction pipeline (the regex strip in
``sources/extract.py`` is written backreference-free so RE2 can run it).

The fixtures live in-repo (``tests/data/ingest/``), committed, so both
engines see identical bytes regardless of cwd or scale factor — ingestion
is SF-independent by nature (the sf tables have no binary column).

S3 (pdf) is environment-gated: PyMuPDF is absent from this container, so
the CONTRACT under test is the degrade path — error row, null text, job
survives. That contract is exactly oracle-able (deterministic error
strings), so it gets a green row too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_sections
from ..operators.sectioning import assign_sections
from ..session import CONF_DEFAULTS, config_source
from ..sources.extract import binary_scan, csv_scan, extract_text
from .catalog import register

FIXTURE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "tests", "data", "ingest")
)

_FNAME = "regexp_extract(filename, '[^/]+$')"

# extension → mime CASE mirror of sources/extract.py::_EXT_MIME
_DUCK_MIME = """CASE lower(regexp_extract(filename, '[^.]+$'))
      WHEN 'pdf' THEN 'application/pdf'
      WHEN 'csv' THEN 'text/csv'
      WHEN 'xlsx' THEN 'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
      WHEN 'html' THEN 'text/html'
      WHEN 'htm' THEN 'text/html'
      WHEN 'xml' THEN 'application/xml'
      WHEN 'txt' THEN 'text/plain'
      ELSE 'application/octet-stream' END"""


def _fname(col: str = "path"):
    return F.regexp_extract(F.col(col), r"[^/]+$", 0).alias("fname")


# ---------------------------------------------------------------------------
# S1 — parallel binary scan + MIME dispatch (app.py:191-195)
@register(
    "s1_binary_scan_mime",
    f"""SELECT {_FNAME} AS fname,
       {_DUCK_MIME} AS mime,
       CAST(size AS BIGINT) AS n_bytes
FROM read_blob('{FIXTURE_DIR}/*')""",
)
def s1_binary_scan_mime(spark: SparkSession, sf: str) -> DataFrame:
    return binary_scan(spark, FIXTURE_DIR).select(
        _fname(), "mime", F.col("length").alias("n_bytes")
    )


# ---------------------------------------------------------------------------
# S2 — html/xml visible-text extraction (app.py:197-199). The oracle runs
# the identical fallback pipeline: strip script/style bodies, strip tags,
# unescape entities in the same order, collapse whitespace, trim.
_DUCK_STRIP = """regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    content,
    '<script\\b[^>]*>.*?</script>', ' ', 'gis'),
    '<style\\b[^>]*>.*?</style>', ' ', 'gis'),
    '<[^>]+>', ' ', 'g'),
    '\\s+', ' ', 'g')"""

_DUCK_UNESC = (
    "trim(regexp_replace(replace(replace(replace(replace(replace(replace("
    + "regexp_replace(regexp_replace(regexp_replace(content, "
    + "'<script\\b[^>]*>.*?</script>', ' ', 'gis'), "
    + "'<style\\b[^>]*>.*?</style>', ' ', 'gis'), "
    + "'<[^>]+>', ' ', 'g'), "
    + "'&amp;', '&'), '&lt;', '<'), '&gt;', '>'), "
    + "'&quot;', '\"'), '&#39;', ''''), '&nbsp;', ' '), "
    + "'\\s+', ' ', 'g'))"
)


@register(
    "s2_html_extract",
    f"""SELECT {_FNAME} AS fname, {_DUCK_UNESC} AS text
FROM read_text(['{FIXTURE_DIR}/*.html', '{FIXTURE_DIR}/*.xml'])""",
)
def s2_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    scanned = binary_scan(spark, FIXTURE_DIR).where(
        F.col("mime").isin("text/html", "application/xml")
    )
    return extract_text(scanned).select(_fname(), "text")


# ---------------------------------------------------------------------------
# S3 — pdf degrade contract + unknown-mime guard (app.py:200-202). PyMuPDF
# is absent here, so extraction MUST yield an error row with null text and
# keep the job alive; same for unregistered formats. Both error strings are
# deterministic → exact oracle.
@register(
    "s3_extract_degrade",
    f"""SELECT {_FNAME} AS fname,
       CAST(NULL AS VARCHAR) AS text,
       CASE WHEN filename LIKE '%.pdf'
            THEN 'NotImplementedError: PyMuPDF (fitz) not installed'
            ELSE 'unsupported mime: application/octet-stream' END AS error
FROM read_blob('{FIXTURE_DIR}/*')
WHERE filename LIKE '%.pdf' OR filename LIKE '%.bin'""",
)
def s3_extract_degrade(spark: SparkSession, sf: str) -> DataFrame:
    scanned = binary_scan(spark, FIXTURE_DIR).where(
        F.col("mime").isin("application/pdf", "application/octet-stream")
    )
    return extract_text(scanned).select(_fname(), "text", "error")


# ---------------------------------------------------------------------------
# S5 — xlsx contract (app.py:17,191: xlsx accepted by the uploader but
# never handled; our xlsx_scan_distributed implements the declared
# branch). india.xlsx is a REAL minimal OOXML workbook (1 sheet, 3 rows,
# hand-built zip — tests/test_sources pins it). Since round 6 the
# executor branch always has a parser (openpyxl when importable, else
# the vendored stdlib reader sources/xlsx_lite.py), so the oracle is the
# parse branch unconditionally: one row per sheet row, null error. The
# degrade contract (error row, job survives) still exists for BROKEN
# workbooks and is pinned by tests/test_sources.py, just no longer the
# path a well-formed fixture takes. (The entry keeps its historical
# "degrade" name — the catalog is frozen.)
_S5_ORACLE = f"""SELECT {_FNAME} AS fname,
       CAST(v.ri AS BIGINT) AS row_idx,
       CAST(NULL AS VARCHAR) AS error
FROM read_blob('{FIXTURE_DIR}/*.xlsx'), (VALUES (0), (1), (2)) v(ri)"""


@register("s5_xlsx_degrade", _S5_ORACLE)
def s5_xlsx_degrade(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.extract import xlsx_scan_distributed

    rows = xlsx_scan_distributed(spark, FIXTURE_DIR)
    return rows.select(
        _fname(), F.col("row_idx").cast("long").alias("row_idx"), "error"
    )


# ---------------------------------------------------------------------------
# S7 — env/config source (app.py:22,54,122,249): os.getenv-with-fallback
# re-expressed as the spark.conf settings namespace. Under the driver's
# fresh session every key resolves to its documented default, so the oracle
# is the literal default table (built from CONF_DEFAULTS — one source of
# truth for both engines).
_S7_ORACLE = "SELECT * FROM (VALUES {}) AS t(key, value, is_default)".format(
    ", ".join(
        f"('{k}', '{v}', true)" for k, v in sorted(CONF_DEFAULTS.items())
    )
)


@register("s7_conf_roundtrip", _S7_ORACLE)
def s7_conf_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    return config_source(spark)


# ---------------------------------------------------------------------------
# S4 — relational CSV scan + the reference's table→text serialization
# (app.py:204-205)
@register(
    "s4_csv_serialize",
    f"""SELECT concat_ws(' ',
        coalesce(CAST(id AS VARCHAR), ''),
        coalesce(CAST(category AS VARCHAR), ''),
        coalesce(CAST(qty AS VARCHAR), ''),
        coalesce(CAST(note AS VARCHAR), '')) AS line
FROM read_csv('{FIXTURE_DIR}/foxtrot.csv', header = true)""",
)
def s4_csv_serialize(spark: SparkSession, sf: str) -> DataFrame:
    return csv_scan(spark, os.path.join(FIXTURE_DIR, "foxtrot.csv"), serialize=True)


@register(
    "s4b_csv_relational",
    f"""SELECT category, CAST(sum(qty) AS BIGINT) AS total_qty,
       count(*) AS n_rows, min(note) AS first_note
FROM read_csv('{FIXTURE_DIR}/foxtrot.csv', header = true)
GROUP BY category""",
)
def s4b_csv_relational(spark: SparkSession, sf: str) -> DataFrame:
    df = csv_scan(spark, os.path.join(FIXTURE_DIR, "foxtrot.csv"))
    return df.groupBy("category").agg(
        F.sum("qty").cast("long").alias("total_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("note").alias("first_note"),
    )


# ---------------------------------------------------------------------------
# E1 front half — the full ingestion chain the reference runs on upload
# (app.py:191-205 → 86-107 → 123-128): binary scan → text extraction →
# paragraph split → section forward-fill → chunking. Fixture paragraphs are
# all < 500 chars, so the 500/50 splitter is provably a trim() pass-through
# (same contract as t3_chunk_pipeline) and the oracle is exact end-to-end.
_DUCK_INGEST_SECTIONS = f"""raw AS (
  SELECT {_FNAME} AS doc_id, content AS text
  FROM read_text('{FIXTURE_DIR}/*.txt')),
paras AS (
  SELECT doc_id,
         unnest(generate_series(0, len(string_split(text, e'\\n\\n')) - 1)) AS para_pos,
         unnest(string_split(text, e'\\n\\n')) AS paragraph
  FROM raw),
sect AS (
  SELECT doc_id, para_pos, paragraph,
         coalesce(
           last_value(CASE WHEN regexp_full_match(trim(paragraph), '[A-Z\\s]+')
                                AND length(trim(paragraph)) > 5
                      THEN trim(paragraph) END IGNORE NULLS)
             OVER (PARTITION BY doc_id ORDER BY para_pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           'General') AS section,
         (regexp_full_match(trim(paragraph), '[A-Z\\s]+')
          AND length(trim(paragraph)) > 5) AS is_title
  FROM paras)"""


@register(
    "e1_ingest_chunks",
    f"""WITH {_DUCK_INGEST_SECTIONS}
SELECT doc_id, CAST(para_pos AS BIGINT) AS para_pos, section,
       CAST(0 AS BIGINT) AS chunk_pos,
       trim(paragraph, e' \\t\\n\\r') AS text
FROM sect WHERE NOT is_title AND trim(paragraph, e' \\t\\n\\r') <> ''""",
)
def e1_ingest_chunks(spark: SparkSession, sf: str) -> DataFrame:
    scanned = binary_scan(spark, FIXTURE_DIR, glob="*.txt")
    extracted = extract_text(scanned).select(
        F.regexp_extract("path", r"[^/]+$", 0).alias("doc_id"), "text"
    )
    content = assign_sections(extracted)
    return chunk_sections(content).select(
        "doc_id",
        F.col("para_pos").cast("long").alias("para_pos"),
        "section",
        F.col("chunk_pos").cast("long").alias("chunk_pos"),
        "text",
    )
