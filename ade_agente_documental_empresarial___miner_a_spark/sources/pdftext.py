"""Minimal pure-Python PDF text extraction — the fitz-absent fallback
for S3 (reference behavior: per-page ``get_text("text")`` concatenation,
``micro-infobot/app.py:200-202``).

Built from the public PDF 1.7 spec (ISO 32000-1) only. Scope is the
overwhelmingly common "digital-born simple text" profile:

* classic cross-reference PDFs — objects are scanned directly
  (``N G obj`` … ``endobj``), so a stale/linearized xref table doesn't
  matter — plus **object streams** (``/ObjStm``, PDF 1.5): every
  Flate-decodable ObjStm is unpacked and its embedded objects join the
  store, covering modern xref-stream writers without parsing the xref
  stream itself (offsets are never trusted anyway);
* content streams stored raw or ``/FlateDecode`` (zlib) — any other
  filter raises;
* text shown with ``Tj``, ``'``, ``"`` and ``TJ``; line breaks from
  ``T*``/``Td``/``TD``/``Tm`` and text-object boundaries — the layout
  model fitz applies in ``get_text("text")`` is approximated, not
  reproduced;
* string bytes decoded as Latin-1 (byte-preserving). Font ``/Encoding``
  differences and CID/``/ToUnicode`` CMaps are out of scope — text from
  subsetted/CID fonts may come out garbled rather than raising.

Anything outside the profile raises :class:`PdfUnsupportedError`, and
``sources/extract.py`` maps that to the oracle-pinned degrade row — the
contract is "extract confidently or degrade loudly", never silently
emit garbage from an encrypted or exotic file.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfUnsupportedError(Exception):
    """Structural or profile failure — callers degrade on this."""


# ---------------------------------------------------------------------------
# object-level parsing


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


class _Name(str):
    """A /Name (distinct from a string value)."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b"%":  # comment to EOL
            while i < n and data[i : i + 1] not in b"\r\n":
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")
_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")


def _parse_object(data: bytes, i: int):
    """Recursive-descent parse of ONE PDF object at offset i.
    Returns (value, next_offset)."""
    i = _skip_ws(data, i)
    if i >= len(data):
        raise PdfUnsupportedError("unexpected end of data")
    c = data[i : i + 1]
    if c == b"<":
        if data[i : i + 2] == b"<<":
            return _parse_dict(data, i)
        j = data.index(b">", i + 1)
        hexs = re.sub(rb"\s", b"", data[i + 1 : j])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii", "replace")), j + 1
    if c == b"(":
        return _parse_literal_string(data, i)
    if c == b"[":
        out = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 1] == b"]":
                return out, i + 1
            val, i = _parse_object(data, i)
            out.append(val)
    if c == b"/":
        m = _NAME_RE.match(data, i)
        name = m.group(1)
        # #xx hex escapes in names (spec 7.3.5)
        name = re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda mm: bytes([int(mm.group(1), 16)]),
            name,
        )
        return _Name(name.decode("latin-1")), m.end()
    m = _REF_RE.match(data, i)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(lit, i):
            return val, i + len(lit)
    raise PdfUnsupportedError(f"unparseable token at byte {i}")


def _parse_dict(data: bytes, i: int):
    assert data[i : i + 2] == b"<<"
    i += 2
    out: dict[str, object] = {}
    while True:
        i = _skip_ws(data, i)
        if data[i : i + 2] == b">>":
            return out, i + 2
        key, i = _parse_object(data, i)
        if not isinstance(key, _Name):
            raise PdfUnsupportedError("dict key is not a name")
        val, i = _parse_object(data, i)
        out[str(key)] = val


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
    b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal_string(data: bytes, i: int):
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # \ddd octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in b"\r\n":  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:  # unknown escape: drop the backslash (spec 7.3.4.2)
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out += c
            i += 1
        else:
            out += c
            i += 1
    raise PdfUnsupportedError("unterminated literal string")


# ---------------------------------------------------------------------------
# document structure

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _load_objects(data: bytes) -> dict[int, object]:
    """Scan every top-level ``N G obj`` and parse its value. Streams are
    kept as (dict, raw_bytes) tuples, decoded lazily by _stream_data."""
    objs: dict[int, object] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        try:
            val, j = _parse_object(data, m.end())
        except PdfUnsupportedError:
            continue  # tolerate junk between objects; pages may still parse
        if isinstance(val, dict):
            j2 = _skip_ws(data, j)
            if data.startswith(b"stream", j2):
                j2 += len(b"stream")
                if data[j2 : j2 + 2] == b"\r\n":
                    j2 += 2
                elif data[j2 : j2 + 1] == b"\n":
                    j2 += 1
                val = (val, j2)  # raw offset; sliced in _stream_data
        # latest definition wins (incremental updates append)
        objs[num] = val
    if not objs:
        raise PdfUnsupportedError("no PDF objects found")
    return objs


class _Doc:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.objs = _load_objects(data)
        if b"/Encrypt" in data:
            # conservative: any trailer mentioning /Encrypt degrades
            raise PdfUnsupportedError("encrypted PDF")
        self._unpack_objstms()

    def _unpack_objstms(self) -> None:
        """PDF 1.5 object streams: modern writers park the catalog/page
        dicts inside Flate-compressed /ObjStm streams. Decompress each,
        read the N (objnum, offset) header pairs, and parse the embedded
        objects into the store. Top-level definitions keep precedence
        (incremental updates are appended top-level); a broken ObjStm is
        skipped — the page tree may still resolve from elsewhere, and
        pages() raises if it doesn't."""
        for v in list(self.objs.values()):
            if not (isinstance(v, tuple) and str(v[0].get("Type")) == "ObjStm"):
                continue
            try:
                raw = self._stream_data(v)
                count = self.resolve(v[0].get("N"))
                first = self.resolve(v[0].get("First"))
                if not isinstance(count, int) or not isinstance(first, int):
                    continue
                header = raw[:first].split()
                for k in range(count):
                    objnum = int(header[2 * k])
                    off = int(header[2 * k + 1])
                    val, _ = _parse_object(raw, first + off)
                    self.objs.setdefault(objnum, val)
            except (PdfUnsupportedError, ValueError, IndexError):
                continue

    def resolve(self, val):
        seen = 0
        while isinstance(val, _Ref):
            val = self.objs.get(val.num)
            seen += 1
            if seen > 64:
                raise PdfUnsupportedError("reference cycle")
        return val

    def _stream_data(self, obj) -> bytes:
        d, start = obj
        length = self.resolve(d.get("Length"))
        if not isinstance(length, int):
            end = self.data.find(b"endstream", start)
            if end < 0:
                raise PdfUnsupportedError("unterminated stream")
            raw = self.data[start:end].rstrip(b"\r\n")
        else:
            raw = self.data[start : start + length]
        filt = self.resolve(d.get("Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = self.resolve(f)
            if str(f) == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise PdfUnsupportedError(f"bad Flate stream: {e}") from e
            else:
                raise PdfUnsupportedError(f"unsupported filter {f}")
        if self.resolve(d.get("DecodeParms")) is not None:
            raise PdfUnsupportedError("predictor DecodeParms unsupported")
        return raw

    def pages(self) -> list[dict]:
        """Page dicts in document order via the /Root → /Pages tree; if no
        catalog is findable, fall back to object-number order of /Type
        /Page objects (covers torn/linearized files)."""
        root = None
        for m in re.finditer(rb"trailer", self.data):
            try:
                d, _ = _parse_dict(self.data, _skip_ws(self.data, m.end()))
            except (PdfUnsupportedError, AssertionError, IndexError):
                continue
            if "Root" in d:
                root = self.resolve(d["Root"])
        if not (isinstance(root, dict) and "Pages" in root):
            for v in self.objs.values():
                base = v[0] if isinstance(v, tuple) else v
                if isinstance(base, dict) and str(base.get("Type")) == "Catalog":
                    root = base
                    break
        out: list[dict] = []
        if isinstance(root, dict) and "Pages" in root:
            self._walk(self.resolve(root["Pages"]), out, 0)
        if not out:  # fallback: document order of page objects
            for num in sorted(self.objs):
                v = self.objs[num]
                base = v[0] if isinstance(v, tuple) else v
                if isinstance(base, dict) and str(base.get("Type")) == "Page":
                    out.append(base)
        if not out:
            raise PdfUnsupportedError("no pages found")
        return out

    def _walk(self, node, out: list, depth: int) -> None:
        if depth > 64 or not isinstance(node, dict):
            return
        t = str(node.get("Type", ""))
        if t == "Page":
            out.append(node)
            return
        for kid in self.resolve(node.get("Kids")) or []:
            self._walk(self.resolve(kid), out, depth + 1)

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        parts = c if isinstance(c, list) else [c]
        buf = []
        for p in parts:
            p = self.resolve(p)
            if not isinstance(p, tuple):
                raise PdfUnsupportedError("page contents is not a stream")
            buf.append(self._stream_data(p))
        return b"\n".join(buf)


# ---------------------------------------------------------------------------
# content-stream text extraction

_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_text(stream: bytes) -> str:
    """Walk one content stream and collect shown text. Newlines come
    from T*/Td/TD/Tm/'/" and ET; TJ kerning more negative than -100
    (thousandths of an em) becomes a space — the standard heuristic for
    inter-word gaps encoded as adjustments."""
    out: list[str] = []
    operands: list[object] = []
    i, n = 0, len(stream)

    def shown(s) -> None:
        if isinstance(s, bytes):
            out.append(s.decode("latin-1"))

    while i < n:
        i = _skip_ws(stream, i)
        if i >= n:
            break
        c = stream[i : i + 1]
        if c == b"(":
            s, i = _parse_literal_string(stream, i)
            operands.append(s)
        elif c == b"<" and stream[i : i + 2] != b"<<":
            j = stream.index(b">", i + 1)
            hexs = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            operands.append(bytes.fromhex(hexs.decode("ascii", "replace")))
            i = j + 1
        elif c == b"<":  # << dict >> (BDC/DP property lists)
            _, i = _parse_dict(stream, i)
            operands.append(None)
        elif c == b"[":
            arr: list[object] = []
            i += 1
            while True:
                i = _skip_ws(stream, i)
                if i >= n or stream[i : i + 1] == b"]":
                    i += 1
                    break
                val, i = _parse_object(stream, i)
                arr.append(val)
            operands.append(arr)
        elif c == b"/":
            m = _NAME_RE.match(stream, i)
            operands.append(_Name(m.group(1).decode("latin-1")))
            i = m.end()
        elif _NUM_RE.match(stream, i):
            m = _NUM_RE.match(stream, i)
            tok = m.group(0)
            operands.append(float(tok) if b"." in tok else int(tok))
            i = m.end()
        else:
            m = _OP_RE.match(stream, i)
            if not m:
                i += 1  # tolerate stray delimiter bytes
                continue
            op = m.group(0)
            i = m.end()
            if op == b"Tj" and operands:
                shown(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        shown(el)
                    elif isinstance(el, (int, float)) and el < -100:
                        out.append(" ")
            elif op == b"'" and operands:
                out.append("\n")
                shown(operands[-1])
            elif op == b'"' and operands:
                out.append("\n")
                shown(operands[-1])
            elif op in (b"T*", b"Td", b"TD", b"Tm", b"ET"):
                if out and not out[-1].endswith("\n"):
                    out.append("\n")
            elif op == b"BI":  # inline image: skip to EI
                j = stream.find(b"EI", i)
                if j < 0:
                    raise PdfUnsupportedError("unterminated inline image")
                i = j + 2
            operands = []
    return "".join(out)


def extract_text(data: bytes) -> str:
    """Per-page text concatenation — the fallback mirror of the fitz loop
    in sources/extract.py::_pdf_text (app.py:200-202 semantics). Raises
    PdfUnsupportedError when the file is outside the supported profile."""
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise PdfUnsupportedError("missing %PDF header")
    doc = _Doc(data)
    pages = doc.pages()
    texts = []
    for page in pages:
        txt = _content_text(doc.page_content(page))
        if txt and not txt.endswith("\n"):
            txt += "\n"
        texts.append(txt)
    return "".join(texts)
