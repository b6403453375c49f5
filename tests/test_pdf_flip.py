"""S3 extraction + degrade contract (SURVEY §2.1 S3; app.py:200-202).

Since round 6 the fitz-absent path is no longer a pure degrade: a
vendored pure-Python extractor (``sources/pdftext.py``) handles the
classic-xref / raw-or-Flate / Tj-TJ profile, so a REAL simple PDF
parses in THIS container — the "real branch" below runs un-skipped with
either engine. The degrade contract survives for files outside the
fallback's profile (or outside PDF entirely): those still produce the
exact oracle-pinned error row that ``s3_extract_degrade`` checks
(fixture golf.pdf is fake header bytes, so that entry is unchanged).
"""

import pytest

from ade_agente_documental_empresarial___miner_a_spark.sources.extract import (
    HAVE_PYMUPDF,
    extract_text,
    binary_scan,
)


def _minimal_pdf(text: str) -> bytes:
    """A spec-valid single-page PDF 1.4 with one Helvetica text run —
    assembled object-by-object with a correct xref table so a real
    parser (fitz/mupdf) accepts it without repair."""
    header = b"%PDF-1.4\n"
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        (
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/MediaBox [0 0 612 792] /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
        ),
    ]
    stream = f"BT /F1 24 Tf 72 720 Td ({text}) Tj ET".encode()
    objs.append(
        b"4 0 obj\n<< /Length "
        + str(len(stream)).encode()
        + b" >>\nstream\n"
        + stream
        + b"\nendstream\nendobj\n"
    )
    objs.append(
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 "
        b"/BaseFont /Helvetica >>\nendobj\n"
    )
    body = b""
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        body += o
        pos += len(o)
    xref_pos = pos
    xref = b"xref\n0 6\n0000000000 65535 f \n" + b"".join(
        f"{off:010d} 00000 n \n".encode() for off in offsets
    )
    trailer = (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(xref_pos).encode()
        + b"\n%%EOF\n"
    )
    return header + body + xref + trailer


@pytest.fixture
def pdf_dir(tmp_path):
    d = str(tmp_path / "docs")
    import os

    os.makedirs(d)
    with open(os.path.join(d, "real.pdf"), "wb") as fh:
        fh.write(_minimal_pdf("Hello Spark PDF"))
    return d


@pytest.mark.skipif(
    HAVE_PYMUPDF, reason="fitz present: its failure message differs"
)
def test_unparseable_pdf_degrades_exactly(spark, tmp_path):
    """A .pdf outside the fallback's profile (here: header-only fake
    bytes, same shape as the committed golf.pdf fixture) must yield the
    exact error row the s3_extract_degrade oracle pins."""
    import os

    d = str(tmp_path / "bad")
    os.makedirs(d)
    with open(os.path.join(d, "fake.pdf"), "wb") as fh:
        fh.write(b"%PDF-1.4 fake fixture bytes not a real pdf\n")
    rows = extract_text(binary_scan(spark, d, glob="*.pdf")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.text is None
    # the exact error string the degrade oracle pins (queries_ingest S3)
    assert r.error == "NotImplementedError: PyMuPDF (fitz) not installed"


def test_real_pdf_parses(spark, pdf_dir):
    """The real branch — un-skipped in this container since round 6:
    fitz if present, else the vendored pure-Python extractor."""
    rows = extract_text(binary_scan(spark, pdf_dir, glob="*.pdf")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.error is None
    assert "Hello Spark PDF" in r.text


def test_fixture_is_parseable_by_an_independent_reader(pdf_dir):
    """Guard the fixture itself: if the hand-assembled PDF were invalid,
    the flip test would pass vacuously the day fitz appears. pypdf isn't
    in this env either, so structurally validate: header, 5 numbered
    objects, xref offsets that land exactly on their 'N 0 obj' bytes,
    and a trailing %%EOF."""
    import os
    import re

    data = open(os.path.join(pdf_dir, "real.pdf"), "rb").read()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    xref = data.index(b"xref\n")
    entries = re.findall(rb"(\d{10}) 00000 n", data[xref:])
    assert len(entries) == 5
    for i, off in enumerate(int(e) for e in entries):
        assert data[off:].startswith(f"{i + 1} 0 obj".encode())
    startxref = int(
        re.search(rb"startxref\n(\d+)", data).group(1)
    )
    assert data[startxref:].startswith(b"xref")
