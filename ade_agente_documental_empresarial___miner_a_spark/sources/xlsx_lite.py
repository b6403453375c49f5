"""Minimal pure-Python XLSX (OOXML spreadsheet) reader — the
openpyxl-absent fallback for S5 (reference: the uploader accepts xlsx
and silently drops it, ``micro-infobot/app.py:17,191``; this repo
implements the declared branch).

Built on the public ECMA-376 / ISO 29500 SpreadsheetML format using
only stdlib ``zipfile`` + ``xml.etree``. Supported profile:

* sheets resolved in workbook order via ``xl/workbook.xml`` +
  ``xl/_rels/workbook.xml.rels``;
* shared strings (including rich-text runs, concatenated), inline
  strings, formula cached values, booleans, numbers (integral floats
  collapse to int, matching openpyxl's ``data_only=True`` cell values);
* sparse rows padded with ``None`` to each row's max column.

Known divergences from openpyxl, documented rather than hidden: date
cells surface as raw Excel serial numbers (style/numFmt resolution is
out of scope), and rows entirely absent from the XML are skipped rather
than yielded as all-``None``. Anything structurally broken raises
:class:`XlsxUnsupportedError`; callers degrade to an error row.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
import xml.etree.ElementTree as ET

_NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_NS_PKG_REL = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)


class XlsxUnsupportedError(Exception):
    """Structural failure — callers degrade on this."""


_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' → 0, 'B3' → 1, 'AA7' → 26."""
    m = _COL_RE.match(ref)
    if not m:
        raise XlsxUnsupportedError(f"bad cell ref {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _text_of(el) -> str:
    """Concatenate all <t> descendants (plain + rich-text runs)."""
    return "".join(t.text or "" for t in el.iter(f"{_NS_MAIN}t"))


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS_MAIN}is")
        return _text_of(is_el) if is_el is not None else None
    v = cell.find(f"{_NS_MAIN}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if ctype == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError) as e:
            raise XlsxUnsupportedError(f"bad shared-string ref {raw!r}") from e
    if ctype == "str" or ctype == "e":
        return raw
    if ctype == "b":
        return raw.strip() == "1"
    try:  # 'n' (default): number; integral floats collapse like openpyxl
        f = float(raw)
    except ValueError as e:
        raise XlsxUnsupportedError(f"bad numeric cell {raw!r}") from e
    return int(f) if f.is_integer() else f


def read_workbook(data: bytes) -> list[tuple[str, list[list]]]:
    """Parse workbook bytes → [(sheet_name, rows)] in workbook order;
    each row is a list of python values (None for gaps)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise XlsxUnsupportedError(f"not a zip archive: {e}") from e
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise XlsxUnsupportedError("xl/workbook.xml missing")

    def _xml(path):
        try:
            return ET.fromstring(zf.read(path))
        except (KeyError, ET.ParseError) as e:
            raise XlsxUnsupportedError(f"bad XML part {path}: {e}") from e

    # relationship id → worksheet part path
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        for rel in _xml("xl/_rels/workbook.xml.rels").iter(
            f"{_NS_PKG_REL}Relationship"
        ):
            target = rel.get("Target", "")
            rels[rel.get("Id")] = posixpath.normpath(
                posixpath.join("xl", target)
            )

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        shared = [
            _text_of(si)
            for si in _xml("xl/sharedStrings.xml").iter(f"{_NS_MAIN}si")
        ]

    out: list[tuple[str, list[list]]] = []
    sheet_no = 0
    for sheet in _xml("xl/workbook.xml").iter(f"{_NS_MAIN}sheet"):
        sheet_no += 1
        name = sheet.get("name", f"Sheet{sheet_no}")
        part = rels.get(
            sheet.get(f"{_NS_R}id"), f"xl/worksheets/sheet{sheet_no}.xml"
        )
        rows: list[list] = []
        for row in _xml(part).iter(f"{_NS_MAIN}row"):
            cells: dict[int, object] = {}
            for cell in row.iter(f"{_NS_MAIN}c"):
                ref = cell.get("r")
                col = _col_index(ref) if ref else len(cells)
                cells[col] = _cell_value(cell, shared)
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
        out.append((name, rows))
    if not out:
        raise XlsxUnsupportedError("workbook has no sheets")
    return out
