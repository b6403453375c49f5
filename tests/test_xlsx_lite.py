"""Unit battery for the vendored stdlib XLSX reader
(``sources/xlsx_lite.py`` — the openpyxl-absent S5 fallback). Fixtures
are hand-assembled OOXML zips exercising the supported profile: shared
strings (incl. rich-text runs), inline strings, numbers (int collapse),
booleans, formula cached values, sparse rows with column gaps,
multi-sheet workbook order — plus the refusal cases (not a zip, missing
workbook part, bad XML) that must degrade rather than emit junk."""

from __future__ import annotations

import io
import zipfile

import pytest

from ade_agente_documental_empresarial___miner_a_spark.sources.xlsx_lite import (
    XlsxUnsupportedError,
    read_workbook,
)

_MAIN = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_RNS = (
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument'
    '/2006/relationships"'
)


def build_xlsx(
    sheets: list[tuple[str, str]], shared: list[str] | None = None
) -> bytes:
    """Assemble a minimal OOXML zip: sheets = [(name, sheetData-XML)]."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        sheet_tags = "".join(
            f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {_MAIN} {_RNS}><sheets>{sheet_tags}</sheets>'
            "</workbook>",
        )
        rel_tags = "".join(
            f'<Relationship Id="rId{i + 1}" Type="t" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rel_tags}</Relationships>',
        )
        if shared is not None:
            sis = "".join(f"<si><t>{s}</t></si>" for s in shared)
            z.writestr(
                "xl/sharedStrings.xml", f"<sst {_MAIN}>{sis}</sst>"
            )
        for i, (_, body) in enumerate(sheets):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                f"<worksheet {_MAIN}><sheetData>{body}</sheetData>"
                "</worksheet>",
            )
    return buf.getvalue()


def test_cell_types_and_int_collapse():
    body = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'          # shared string
        '<c r="B1"><v>2</v></c>'                 # int-valued number
        '<c r="C1"><v>2.5</v></c>'               # float
        '<c r="D1" t="b"><v>1</v></c>'           # boolean
        '<c r="E1" t="str"><v>cached</v></c>'    # formula cached value
        '<c r="F1" t="inlineStr"><is><t>inline</t></is></c>'
        "</row>"
    )
    (name, rows), = read_workbook(build_xlsx([("S", body)], shared=["hi"]))
    assert name == "S"
    assert rows == [["hi", 2, 2.5, True, "cached", "inline"]]
    assert isinstance(rows[0][1], int) and isinstance(rows[0][2], float)


def test_sparse_row_gaps_are_none():
    body = '<row r="1"><c r="B1"><v>7</v></c><c r="D1"><v>9</v></c></row>'
    (_, rows), = read_workbook(build_xlsx([("S", body)]))
    assert rows == [[None, 7, None, 9]]


def test_multisheet_workbook_order():
    wb = build_xlsx(
        [
            ("Zeta", '<row r="1"><c r="A1"><v>1</v></c></row>'),
            ("Alpha", '<row r="1"><c r="A1"><v>2</v></c></row>'),
        ]
    )
    sheets = read_workbook(wb)
    assert [s for s, _ in sheets] == ["Zeta", "Alpha"]  # workbook order
    assert [r for _, rows in sheets for r in rows] == [[1], [2]]


def test_rich_text_shared_string_runs():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {_MAIN} {_RNS}><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f"<sst {_MAIN}><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet {_MAIN}><sheetData><row r="1">'
            '<c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>',
        )
    (_, rows), = read_workbook(buf.getvalue())
    assert rows == [["rich"]]


def test_fixture_matches_known_truth():
    data = open("tests/data/ingest/india.xlsx", "rb").read()
    (name, rows), = read_workbook(data)
    assert name == "Hoja1"
    assert rows == [["id", "name"], [1, "ana"], [2, "luis"]]


def test_refusals():
    with pytest.raises(XlsxUnsupportedError):
        read_workbook(b"PK\x03\x04 fake workbook")  # zip magic, not a zip
    with pytest.raises(XlsxUnsupportedError):
        read_workbook(b"not even zip")
    buf = io.BytesIO()  # real zip, no workbook part
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.txt", "hello")
    with pytest.raises(XlsxUnsupportedError):
        read_workbook(buf.getvalue())
