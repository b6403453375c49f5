"""Property-based round-trips for the two vendored pure-Python parsers
(``sources/pdftext.py``, ``sources/xlsx_lite.py``): generate arbitrary
content, ASSEMBLE a spec-valid file with the same fixture builders the
unit batteries use, parse it back, and require value identity. The unit
tests pin the profile edge-by-edge; these pin the interior — arbitrary
text through the escape/encode paths, arbitrary grids through the
sparse-cell/type-collapse paths — so a regression anywhere in the
decode pipeline fails on a minimized counterexample, not a user file.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from ade_agente_documental_empresarial___miner_a_spark.sources.pdftext import (
    extract_text,
)
from ade_agente_documental_empresarial___miner_a_spark.sources.xlsx_lite import (
    read_workbook,
)
from tests.test_pdftext import one_page_pdf
from tests.test_xlsx_lite import build_xlsx

# ---------------------------------------------------------------- pdftext

# printable ASCII including the chars that need literal-string escaping
# ((, ), \) and excluding control bytes the content-stream tokenizer
# treats as whitespace
_PDF_ALPHABET = st.characters(
    min_codepoint=0x20, max_codepoint=0x7E
)
_pdf_line = st.text(alphabet=_PDF_ALPHABET, min_size=1, max_size=60).filter(
    lambda s: s.strip() != ""
)


def _lit(s: str) -> bytes:
    """PDF literal-string encoding of ``s`` (escape \\, (, ))."""
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


@settings(max_examples=60, deadline=None)
@given(line=_pdf_line, flate=st.booleans())
def test_pdf_literal_string_roundtrip(line: str, flate: bool):
    content = b"BT /F1 12 Tf 72 720 Td (" + _lit(line) + b") Tj ET"
    assert extract_text(one_page_pdf(content, flate=flate)) == line + "\n"


@settings(max_examples=40, deadline=None)
@given(line=_pdf_line)
def test_pdf_hex_string_roundtrip(line: str):
    content = (
        b"BT <" + line.encode("latin-1").hex().encode() + b"> Tj ET"
    )
    assert extract_text(one_page_pdf(content)) == line + "\n"


@settings(max_examples=40, deadline=None)
@given(lines=st.lists(_pdf_line, min_size=1, max_size=6))
def test_pdf_multiline_td_roundtrip(lines: list[str]):
    # each line shown with Tj, then T* advances: one output line per input
    content = b"BT " + b" ".join(
        b"(" + _lit(ln) + b") Tj T*" for ln in lines
    ) + b" ET"
    assert extract_text(one_page_pdf(content)) == "".join(
        ln + "\n" for ln in lines
    )


# -------------------------------------------------------------- xlsx_lite

# cell strings: XML-escapable text without leading/trailing whitespace
# (bare <t> elements don't carry xml:space="preserve"; edge whitespace
# is out of the emit profile, interior spaces and &<> are in)
_xl_text = (
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=1,
        max_size=20,
    )
    .map(str.strip)
    .filter(lambda s: s != "")
)
_xl_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).filter(lambda f: f != int(f)),  # non-integral: no int-collapse dispute
    st.booleans(),
    _xl_text,
)
_xl_grid = st.lists(
    st.lists(_xl_cell, min_size=1, max_size=6).filter(
        lambda row: any(v is not None for v in row)
    ),
    min_size=1,
    max_size=8,
)


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(grid: list[list]) -> str:
    rows = []
    for r, row in enumerate(grid, start=1):
        cells = []
        for c, val in enumerate(row):
            ref = f"{_col_letter(c)}{r}"
            if val is None:
                continue
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{escape(val)}</t>'
                    "</is></c>"
                )
        rows.append(f'<row r="{r}">{"".join(cells)}</row>')
    return "".join(rows)


def _trim(row: list) -> list:
    """Expected parse of a row: padded to its LAST non-None column."""
    last = max(i for i, v in enumerate(row) if v is not None)
    return row[: last + 1]


@settings(max_examples=60, deadline=None)
@given(grid=_xl_grid)
def test_xlsx_grid_roundtrip(grid: list[list]):
    (name, rows), = read_workbook(build_xlsx([("P", _sheet_xml(grid))]))
    assert name == "P"
    expected = [_trim(row) for row in grid]
    assert len(rows) == len(expected)
    for got, want in zip(rows, expected):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if isinstance(w, float):
                assert isinstance(g, float) and abs(g - w) < 1e-9
            else:
                assert g == w and type(g) is type(w)


@settings(max_examples=30, deadline=None)
@given(
    strings=st.lists(_xl_text, min_size=1, max_size=8),
)
def test_xlsx_shared_string_table_roundtrip(strings: list[str]):
    # reference every table entry once, in order, across one row
    body = '<row r="1">' + "".join(
        f'<c r="{_col_letter(i)}1" t="s"><v>{i}</v></c>'
        for i in range(len(strings))
    ) + "</row>"
    (_, rows), = read_workbook(
        build_xlsx([("S", body)], shared=[escape(s) for s in strings])
    )
    assert rows == [strings]
