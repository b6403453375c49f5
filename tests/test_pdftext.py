"""Unit battery for the vendored pure-Python PDF extractor
(``sources/pdftext.py`` — the fitz-absent S3 fallback, app.py:200-202
semantics). Fixtures are hand-assembled spec-valid PDFs exercising the
supported profile edge by edge: Flate streams, TJ arrays with kerning,
hex strings, literal-string escapes, multi-page order, /Contents
arrays, indirect /Length — plus the refusal cases (encryption,
unsupported filters, garbage) that must degrade rather than emit junk.
"""

from __future__ import annotations

import zlib

import pytest

from ade_agente_documental_empresarial___miner_a_spark.sources.pdftext import (
    PdfUnsupportedError,
    extract_text,
)


def build_pdf(objs: list[bytes]) -> bytes:
    """Assemble numbered objects (1-based) + xref + trailer (/Root 1)."""
    header = b"%PDF-1.4\n"
    body, offsets, pos = b"", [], len(header)
    for i, o in enumerate(objs, start=1):
        obj = f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
        offsets.append(pos)
        body += obj
        pos += len(obj)
    xref = (
        f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
        + b"".join(f"{off:010d} 00000 n \n".encode() for off in offsets)
    )
    trailer = (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{pos}\n%%EOF\n"
    ).encode()
    return header + body + xref + trailer


def stream_obj(payload: bytes, extra: bytes = b"") -> bytes:
    return (
        b"<< /Length " + str(len(payload)).encode() + b" " + extra
        + b" >>\nstream\n" + payload + b"\nendstream"
    )


def one_page_pdf(content: bytes, flate: bool = False) -> bytes:
    payload = zlib.compress(content) if flate else content
    extra = b"/Filter /FlateDecode" if flate else b""
    return build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            stream_obj(payload, extra),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
    )


def test_plain_tj():
    pdf = one_page_pdf(b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET")
    assert "Hello World" in extract_text(pdf)


def test_flate_stream():
    pdf = one_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Compressed text run) Tj ET", flate=True
    )
    assert "Compressed text run" in extract_text(pdf)


def test_tj_array_kerning_becomes_space():
    # large negative adjustment = inter-word gap; small one = kerning
    pdf = one_page_pdf(b"BT [ (Hel) -20 (lo) -250 (World) ] TJ ET")
    txt = extract_text(pdf)
    assert "Hello World" in txt


def test_hex_strings_and_escapes():
    pdf = one_page_pdf(
        b"BT <48656C6C6F> Tj (\\110ex\\tok \\(parens\\) \\\\slash) Tj ET"
    )
    txt = extract_text(pdf)
    assert "Hello" in txt           # hex string
    assert "Hex" in txt             # \110 octal = 'H'
    assert "(parens)" in txt        # escaped parens
    assert "\\slash" in txt         # escaped backslash


def test_nested_parens_and_quote_ops():
    pdf = one_page_pdf(b"BT (outer (inner) tail) Tj (next line) ' ET")
    txt = extract_text(pdf)
    assert "outer (inner) tail" in txt
    assert "next line" in txt


def test_multipage_order_and_contents_array():
    p1 = b"BT (page one) Tj ET"
    p2a, p2b = b"BT (page two A) Tj ET", b"BT (page two B) Tj ET"
    pdf = build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            stream_obj(p1),
            b"<< /Type /Page /Parent 2 0 R /Contents [6 0 R 7 0 R] >>",
            stream_obj(p2a),
            stream_obj(p2b),
        ]
    )
    txt = extract_text(pdf)
    assert txt.index("page one") < txt.index("page two A") < txt.index(
        "page two B"
    )


def test_indirect_length():
    content = b"BT (indirect length) Tj ET"
    pdf = build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream",
            str(len(content)).encode(),
        ]
    )
    assert "indirect length" in extract_text(pdf)


def test_newlines_from_td_and_tstar():
    pdf = one_page_pdf(
        b"BT (line one) Tj 0 -14 Td (line two) Tj T* (line three) Tj ET"
    )
    lines = [ln for ln in extract_text(pdf).split("\n") if ln]
    assert lines == ["line one", "line two", "line three"]


def test_garbage_raises():
    with pytest.raises(PdfUnsupportedError):
        extract_text(b"%PDF-1.4 fake fixture bytes not a real pdf\n")
    with pytest.raises(PdfUnsupportedError):
        extract_text(b"not a pdf at all")


def test_encrypted_raises():
    pdf = one_page_pdf(b"BT (secret) Tj ET")
    pdf = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(PdfUnsupportedError):
        extract_text(pdf)


def test_unsupported_filter_raises():
    payload = b"\x00\x01\x02"
    pdf = build_pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            stream_obj(payload, b"/Filter /LZWDecode"),
        ]
    )
    with pytest.raises(PdfUnsupportedError):
        extract_text(pdf)


def test_objstm_compressed_structure():
    """PDF 1.5 shape: catalog/pages/page dicts live inside a Flate
    /ObjStm (as modern xref-stream writers emit); only the content
    stream is a top-level object. The extractor must unpack the object
    stream and still walk the page tree."""
    embedded = [
        (2, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>"),
    ]
    offsets, payload = [], b""
    for num, body in embedded:
        offsets.append((num, len(payload)))
        payload += body + b" "
    header = b" ".join(f"{n} {o}".encode() for n, o in offsets) + b" "
    objstm_raw = header + payload
    objstm = zlib.compress(objstm_raw)
    content = b"BT (from an object stream) Tj ET"
    pdf = build_pdf(
        [
            b"<< /Type /ObjStm /N 3 /First " + str(len(header)).encode()
            + b" /Length " + str(len(objstm)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + objstm + b"\nendstream",
            b"null", b"null", b"null",  # placeholders; real defs in ObjStm
            stream_obj(content),
        ]
    )
    # drop the placeholder null objects so the ObjStm definitions win
    pdf = pdf.replace(b"2 0 obj\nnull\nendobj\n", b"")
    pdf = pdf.replace(b"3 0 obj\nnull\nendobj\n", b"")
    pdf = pdf.replace(b"4 0 obj\nnull\nendobj\n", b"")
    assert "from an object stream" in extract_text(pdf)


def test_pageless_fallback_document_order():
    """No catalog/trailer root: page objects are still found by scan."""
    pdf = build_pdf(
        [
            b"<< >>",  # not a catalog
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            stream_obj(b"BT (orphan page) Tj ET"),
        ]
    )
    assert "orphan page" in extract_text(pdf)
