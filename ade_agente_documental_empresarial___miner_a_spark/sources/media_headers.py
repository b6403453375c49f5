"""Vendored stdlib media header builders + parsers — multimodal tier 2.

The container has no Pillow/librosa/av, so real pixel/sample decode is
impossible here (tier 1, ``decode_stub=False``, still raises). What a
100 TB curation pipeline needs FIRST from media, though, is header
metadata — dimensions, duration, format — and that is pure byte
arithmetic the stdlib covers. This module de-stubs that step the same
way ``pdftext.py``/``xlsx_lite.py`` de-stubbed S3/S5 in round 6
(VERDICT r7 task 3): hand-rolled parsers for the headers of six common
container formats, plus builders that CONSTRUCT minimal valid files so
the fixtures can carry genuinely parseable media.

Parsers (``sniff``): PNG (IHDR), GIF (logical screen descriptor), BMP
(BITMAPINFOHEADER), JPEG (SOF segment scan), WAV (RIFF fmt/data
chunks), AVI (RIFF avih main header). Each returns header-declared
facts only — a truncated payload parses fine, exactly like any
header-sniffing tool (file(1), exiftool). Malformed bytes return None,
never raise: the caller degrades to the md5-fake tier.

Builders: header-exact files with deterministic parameters; payload
bytes after the header are omitted (declared sizes stand in), which
keeps 60k-row fixture media at tens of bytes per row instead of the
megabytes real sample data would cost. The parse→build round trip is
pinned by property tests (tests/test_media_headers.py).
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# builders


def build_bmp(
    width: int, height: int, pixels: bytes | None = None
) -> bytes:
    """54-byte BMP (BITMAPINFOHEADER, 24bpp) header; with ``pixels``
    (flat BGR byte triples, width*height*3 bytes, storage row order) a
    REAL pixel array follows, each row padded to the spec's 4-byte
    stride — decodable by :func:`bmp_pixel_stats` without Pillow."""
    stride = (width * 3 + 3) // 4 * 4
    img_size = stride * abs(height) if pixels is not None else 0
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    if pixels is None:
        return header
    if len(pixels) != width * abs(height) * 3:
        raise ValueError(
            f"pixel payload {len(pixels)} != {width}x{abs(height)}x3"
        )
    pad = b"\x00" * (stride - width * 3)
    rows = (
        pixels[r * width * 3 : (r + 1) * width * 3] + pad
        for r in range(abs(height))
    )
    return header + b"".join(rows)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    body = ctype + payload
    return (
        struct.pack(">I", len(payload))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (spec §9.4) — shared by the filter
    (builder) and unfilter (decoder) directions."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def build_png(
    width: int, height: int, pixels: bytes | None = None
) -> bytes:
    """PNG signature + IHDR chunk (real CRC); IDAT/IEND omitted unless
    ``pixels`` is given (flat RGB byte triples, width*height*3 bytes,
    top-down row order) — then a REAL zlib-compressed IDAT follows,
    with each scanline FORWARD-FILTERED by filter type ``row % 5``
    (None/Sub/Up/Average/Paeth in turn), so a decoder that skips the
    unfilter step — or gets any of the five filters wrong — cannot
    reproduce the pixel values. Decodable by :func:`png_pixel_stats`
    with stdlib zlib only."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if pixels is None:
        return out
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel payload {len(pixels)} != {width}x{height}x3"
        )
    bpp = 3
    rowlen = width * bpp
    raw = bytearray()
    prev = bytes(rowlen)
    for r in range(height):
        row = pixels[r * rowlen : (r + 1) * rowlen]
        ftype = r % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += row
        elif ftype == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(rowlen)
            )
        elif ftype == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(rowlen))
        elif ftype == 3:  # Average
            raw += bytes(
                (row[i]
                 - ((row[i - bpp] if i >= bpp else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(rowlen)
            )
        else:  # Paeth
            raw += bytes(
                (row[i] - _paeth(
                    row[i - bpp] if i >= bpp else 0,
                    prev[i],
                    prev[i - bpp] if i >= bpp else 0,
                )) & 0xFF
                for i in range(rowlen)
            )
        prev = row
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavored LZW (spec appendix F): emits CLEAR first, builds
    the string table greedily, bumps the code width when the NEXT code
    to be assigned crosses a power of two, resets at 4095. Returns the
    packed little-endian bitstream (no sub-block framing)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh_table():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # GIF "deferred" growth: width bumps when the next code
            # WOULD not fit (decoder mirrors this exactly)
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = fresh_table()
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
        # the decoder appends one more table entry after this final
        # data code — if that lands on 2^width it reads END at the
        # bumped width, so mirror the bump here (no dict entry needed)
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def build_gif(
    width: int,
    height: int,
    indices: bytes | None = None,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """GIF89a header + logical screen descriptor; by default (header
    fixture) no image data follows. With ``indices`` (one palette index
    per pixel, row-major) and ``palette`` (2..256 RGB triples) a REAL
    image block follows — global color table, image descriptor, and an
    actual LZW-compressed pixel stream in 255-byte sub-blocks —
    decodable by :func:`gif_pixel_stats` with no codec library."""
    if indices is None:
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + bytes([0x00, 0x00, 0x00])
            + b"\x3b"
        )
    if len(indices) != width * height:
        raise ValueError(f"indices {len(indices)} != {width}x{height}")
    if not palette or len(palette) > 256:
        raise ValueError("palette must have 1..256 entries")
    # global color table size: 2^(n+1) >= len(palette), min 2
    n = 0
    while (2 << n) < len(palette):
        n += 1
    gct_entries = 2 << n
    if max(indices) >= gct_entries:
        raise ValueError("index out of palette range")
    gct = bytearray()
    for i in range(gct_entries):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    min_code_size = max(2, n + 1)
    data = _lzw_compress(indices, min_code_size)
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0x80 | n, 0x00, 0x00])  # GCT flag + size n
        + bytes(gct)
        + b"\x2c"  # image descriptor
        + struct.pack("<HHHH", 0, 0, width, height)
        + bytes([0x00])  # no local table, not interlaced
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3b"
    )


def build_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0/JFIF + SOF0 (carries the dims) + EOI; scan data omitted."""
    app0 = struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    sof0 = struct.pack(">HBHHB", 8 + 3, 8, height, width, 1) + bytes([1, 0x11, 0])
    return (
        b"\xff\xd8" + b"\xff\xe0" + app0 + b"\xff\xc0" + sof0 + b"\xff\xd9"
    )


def build_wav(duration_ms: int, samples: bytes | None = None) -> bytes:
    """44-byte WAV header, PCM 8-bit mono at 1000 Hz (byte rate 1000, so
    the declared data size in bytes IS the duration in ms); by default
    sample bytes are omitted — duration comes from the declared size, as
    any header sniffer reads it. With ``samples`` (must be exactly
    ``duration_ms`` bytes, one unsigned 8-bit sample per ms) a REAL PCM
    payload follows — decodable by :func:`wav_pcm_stats`."""
    data_size = int(duration_ms)
    if samples is not None and len(samples) != data_size:
        raise ValueError(
            f"sample payload {len(samples)} != duration {data_size}"
        )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 1000, 1, 8)
        + b"data"
        + struct.pack("<I", data_size)
        + (samples or b"")
    )


def build_avi(width: int, height: int, duration_ms: int) -> bytes:
    """RIFF AVI with the hdrl LIST's avih main header (1 ms/frame, so
    dwTotalFrames = duration in ms); movi data omitted."""
    avih = struct.pack(
        "<14I",
        1000,           # dwMicroSecPerFrame: 1 ms per frame
        0, 0, 0,
        int(duration_ms),  # dwTotalFrames
        0, 1, 0,
        int(width),     # dwWidth
        int(height),    # dwHeight
        0, 0, 0, 0,
    )
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# parsers — each returns a dict or None; none of them raises on garbage


def _parse_png(data: bytes) -> dict | None:
    if len(data) < 24 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return {"format": "png", "width": w, "height": h, "duration_ms": None}


def _parse_gif(data: bytes) -> dict | None:
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return {"format": "gif", "width": w, "height": h, "duration_ms": None}


def _parse_bmp(data: bytes) -> dict | None:
    if len(data) < 26 or data[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", data[18:26])
    return {
        "format": "bmp",
        "width": abs(w),
        "height": abs(h),  # negative height = top-down row order
        "duration_ms": None,
    }


def _parse_jpeg(data: bytes) -> dict | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    # SOF0..SOF15 carry the frame dims; C4/C8/CC are not SOFs
    sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        code = data[pos + 1]
        if code == 0xD9:  # EOI
            return None
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if code in sof:
            if pos + 9 > len(data):
                return None
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return {
                "format": "jpeg",
                "width": w,
                "height": h,
                "duration_ms": None,
            }
        pos += 2 + seg_len
    return None


def _riff_chunks(data: bytes, start: int):
    """Yield (fourcc, declared_size, payload) for RIFF sub-chunks; the
    payload may be shorter than the declared size on truncated files."""
    pos = start
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        yield cid, size, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse_wav(data: bytes) -> dict | None:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    byte_rate = None
    data_size = None
    for cid, size, payload in _riff_chunks(data, 12):
        if cid == b"fmt " and len(payload) >= 12:
            byte_rate = struct.unpack("<I", payload[8:12])[0]
        elif cid == b"data":
            # DECLARED size, not len(payload): a truncated file still
            # declares its duration in the header
            data_size = size
    if not byte_rate or data_size is None:
        return None
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "duration_ms": data_size * 1000 // byte_rate,
    }


def _parse_avi(data: bytes) -> dict | None:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    off = data.find(b"avih")
    if off < 0 or off + 8 + 40 > len(data):
        return None
    body = data[off + 8 :]
    usec_per_frame = struct.unpack("<I", body[0:4])[0]
    total_frames = struct.unpack("<I", body[16:20])[0]
    width = struct.unpack("<I", body[32:36])[0]
    height = struct.unpack("<I", body[36:40])[0]
    return {
        "format": "avi",
        "width": width,
        "height": height,
        "duration_ms": usec_per_frame * total_frames // 1000,
    }


_PARSERS = (_parse_png, _parse_gif, _parse_bmp, _parse_jpeg, _parse_wav,
            _parse_avi)


def sniff(data: bytes) -> dict | None:
    """Magic-dispatch header parse. Returns {format, width, height,
    duration_ms} (absent facts None) or None when no parser claims the
    bytes. Never raises on malformed input."""
    if not data:
        return None
    for parse in _PARSERS:
        try:
            out = parse(data)
        except Exception:  # noqa: BLE001 — garbage bytes degrade, not die
            out = None
        if out is not None:
            return out
    return None


# ---------------------------------------------------------------------------
# payload decoders — tier 2 for the UNCOMPRESSED formats (r9): a 24bpp
# BMP pixel array and 8-bit PCM WAV samples are plain byte arithmetic,
# no Pillow/librosa needed. Same degrade contract as the header
# parsers: malformed/truncated input returns None, never raises.


def bmp_pixel_stats(data: bytes) -> dict | None:
    """Decode a 24bpp uncompressed BMP's REAL pixel array: per-channel
    (sum, min, max) over every pixel, padding bytes excluded.

    Reads the pixel-array offset from the file header and honours the
    4-byte row stride and bottom-up/top-down height sign — the facts a
    naive 'slice after the header' fake would get wrong. Returns
    {n_pixels, c0/c1/c2 (BGR) sum/min/max} or None (not a BMP, not
    24bpp, compressed, or the array is truncated)."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        return None
    px_off = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    n_rows = abs(h)
    if bpp != 24 or compression != 0 or w <= 0 or n_rows == 0:
        return None
    if px_off < 54:
        # a malformed offset pointing INSIDE the 54-byte header would
        # decode header bytes as pixels — degrade instead (ADVICE r9)
        return None
    stride = (w * 3 + 3) // 4 * 4
    if px_off + stride * n_rows > len(data):
        return None  # truncated pixel array -> degrade
    arr = np.frombuffer(
        data, dtype=np.uint8, count=stride * n_rows, offset=px_off
    ).reshape(n_rows, stride)[:, : w * 3]
    px = arr.reshape(-1, 3).astype(np.int64)
    sums = px.sum(axis=0)
    mins = px.min(axis=0)
    maxs = px.max(axis=0)
    return {
        "n_units": int(w) * n_rows,
        "c0_sum": int(sums[0]), "c0_min": int(mins[0]), "c0_max": int(maxs[0]),
        "c1_sum": int(sums[1]), "c1_min": int(mins[1]), "c1_max": int(maxs[1]),
        "c2_sum": int(sums[2]), "c2_min": int(mins[2]), "c2_max": int(maxs[2]),
    }


# ---------------------------------------------------------------------------
# Baseline JPEG, DC-only profile (r10 tier-1 shrink #6). A general
# JPEG needs the full AC path (zigzag runs + 2-D IDCT with loosely
# specified rounding) — genuinely tier-1. But the ENTROPY layer is
# exact integer work: Huffman tables from DHT, byte-stuffed bit
# stream, DC category+extend decoding, per-block DC prediction,
# dequantization. For an image whose every 8x8 block is CONSTANT the
# spectrum is DC-only, and with Q[0]=8 the IDCT collapses to
# pixel = DC + 128 exactly — so a real entropy decoder's output is
# closed-form predictable. The builder writes spec-valid single-
# component baseline JPEGs with custom canonical Huffman tables; the
# decoder handles ANY table via DHT and degrades (None) the moment a
# nonzero AC coefficient appears — the documented profile edge.


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            pad = self.acc << (8 - self.n) | ((1 << (8 - self.n)) - 1)
            self.out.append(pad)
            if pad == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


# custom canonical DC table: symbols (categories) 0..11, all 4 bits —
# legal (16 slots at length 4) and trivial to reason about
_JPEG_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_SYMBOLS = list(range(12))
# custom AC table: ONE symbol, EOB (0x00), 1 bit
_JPEG_AC_COUNTS = [1] + [0] * 15
_JPEG_AC_SYMBOLS = [0x00]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def build_jpeg_dc(width: int, height: int, block_vals: list[int]) -> bytes:
    """Spec-valid single-component (grayscale) baseline JPEG whose 8x8
    blocks are each the CONSTANT gray value ``block_vals[i]`` (row-major
    blocks; width/height must be multiples of 8; values 0..255).
    Q[0] = 8, so decoded pixel == block value exactly. Entropy data is
    real Huffman (custom canonical tables, declared in DHT), with DC
    prediction and byte stuffing — decodable by :func:`jpeg_dc_stats`."""
    if width % 8 or height % 8 or width == 0 or height == 0:
        raise ValueError("dims must be nonzero multiples of 8")
    wb, hb = width // 8, height // 8
    if len(block_vals) != wb * hb:
        raise ValueError("need one value per 8x8 block")
    # DQT: table 0, 8-bit, Q[0]=8 and 16 elsewhere (AC never used)
    dqt = bytes([0x00]) + bytes([8] + [16] * 63)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes(
        [1, 1, 0x11, 0]
    )
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMBOLS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + bytes(_JPEG_AC_SYMBOLS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])

    # canonical code assignment for the DC table: 12 codes of length 4
    dc_code = {sym: (i, 4) for i, sym in enumerate(_JPEG_DC_SYMBOLS)}
    bw = _BitWriter()
    pred = 0
    for v in block_vals:
        if not 0 <= v <= 255:
            raise ValueError("block values must be 0..255")
        dc = v - 128  # level shift; Q[0]=8 makes coefficient == DC
        delta = dc - pred
        pred = dc
        cat = delta.bit_length() if delta else 0
        code, ln = dc_code[cat]
        bw.put(code, ln)
        if cat:
            bits = delta if delta > 0 else delta + (1 << cat) - 1
            bw.put(bits, cat)
        bw.put(0, 1)  # AC EOB (1-bit code 0)
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bw.flush()
        + b"\xff\xd9"
    )


def _huff_from_dht(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman decode map {(code, length): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(code, length)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte = 0
        self.bit = 0

    def take(self) -> int | None:
        while True:
            if self.byte >= len(self.data):
                return None
            b = self.data[self.byte]
            if b == 0xFF:
                nxt = (
                    self.data[self.byte + 1]
                    if self.byte + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:
                    pass  # stuffed FF: real data byte
                else:
                    return None  # a marker: end of scan
            bit = (b >> (7 - self.bit)) & 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1 + (1 if b == 0xFF else 0)  # skip stuffing
            return bit

    def read_huff(self, table: dict) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.take()
            if b is None:
                return None
            code = (code << 1) | b
            if (code, length) in table:
                return table[(code, length)]
        return None

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.take()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def jpeg_dc_stats(data: bytes) -> dict | None:
    """Decode a baseline JPEG through the REAL entropy layer (Huffman
    tables from DHT, byte-stuffed bitstream, DC category+extend with
    prediction, dequantization) for the DC-ONLY profile: single 8-bit
    grayscale component, no subsampling, every block's AC spectrum
    empty (EOB immediately after the DC coefficient), and a DQT whose
    DC step makes the constant-block IDCT exact (Q[0] divisible by 8 —
    pixel = DC*Q[0]/8 + 128). Any nonzero AC coefficient, progressive/
    multi-component frame, or corrupt stream returns None — the honest
    profile edge (general AC + IDCT is genuinely tier-1). Returns
    {n_units, c0 sum/min/max} over the gray pixel values."""
    try:
        return _jpeg_dc_stats_inner(data)
    except (IndexError, struct.error):
        return None  # truncated/corrupt structure -> degrade


def _jpeg_dc_stats_inner(data: bytes) -> dict | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    w = h = None
    scan = None
    dc_id = ac_id = qt_id = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables out of profile
                qt[tq] = list(body[bpos + 1 : bpos + 65])
                bpos += 65
        elif marker == 0xC0:
            if body[0] != 8:
                return None
            h, w = struct.unpack(">HH", body[1:5])
            if body[5] != 1 or body[7] != 0x11:
                return None  # multi-component / subsampled: tier 1
            qt_id = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xC4:
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                counts = list(body[bpos + 1 : bpos + 17])
                nsym = sum(counts)
                syms = list(body[bpos + 17 : bpos + 17 + nsym])
                tbl = _huff_from_dht(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                bpos += 17 + nsym
        elif marker == 0xDA:
            if body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan = data[pos + 2 + seg_len :]
            break
        pos += 2 + seg_len
    if (
        scan is None or w is None or not w or not h
        or w % 8 or h % 8
        or qt_id not in qt or dc_id not in huff_dc or ac_id not in huff_ac
        or qt[qt_id][0] % 8 != 0
    ):
        return None
    q0 = qt[qt_id][0]
    n_blocks = (w // 8) * (h // 8)
    br = _BitReader(scan)
    pred = 0
    total = 0
    mn = mx = None
    for _ in range(n_blocks):
        cat = br.read_huff(huff_dc[dc_id])
        if cat is None or cat > 11:
            return None
        if cat:
            bits = br.read_bits(cat)
            if bits is None:
                return None
            delta = (
                bits
                if bits >= (1 << (cat - 1))
                else bits - (1 << cat) + 1
            )
        else:
            delta = 0
        pred += delta
        # AC scan: only EOB (or 63 explicit zero runs) keeps the block
        # inside the DC-only profile
        k = 1
        while k <= 63:
            sym = br.read_huff(huff_ac[ac_id])
            if sym is None:
                return None
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size != 0:
                return None  # nonzero AC coefficient: out of profile
            if sym != 0xF0:
                return None
            k += 16  # ZRL: sixteen zeros
        val = pred * q0 // 8 + 128
        val = max(0, min(255, val))
        total += val * 64
        mn = val if mn is None or val < mn else mn
        mx = val if mx is None or val > mx else mx
    return {
        "n_units": int(w) * int(h),
        "c0_sum": total,
        "c0_min": mn,
        "c0_max": mx,
    }


# IMA ADPCM (WAV format 0x11) tables — spec: IMA Digital Audio Pack,
# as implemented by every ADPCM codec (step table of 89 quantizer
# steps, 16-entry index adjustment)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nib: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM step: (new predictor clamped to int16, new index)."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX[nib]))
    return pred, idx


def _ima_encode(samples: list[int]) -> tuple[int, bytes]:
    """Reference IMA encoder for one mono block: returns (initial
    predictor = samples[0], packed nibbles for samples[1:], low nibble
    first). Lossy by design — used by the round-trip tolerance tests;
    the fixture builder constructs nibbles directly instead."""
    pred = samples[0]
    idx = 0
    nibbles = []
    for s in samples[1:]:
        delta = s - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        step = _IMA_STEPS[idx]
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, idx = _ima_decode_nibble(nib, pred, idx)
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4)
        for i in range(0, len(nibbles), 2)
    )
    return samples[0], packed


def build_wav_ima(
    n_samples: int, predictor: int, spike_pos: int | None = None
) -> bytes:
    """Mono IMA-ADPCM WAV (format 0x11, 4-bit, one block) whose decoded
    samples have a CLOSED FORM the SQL oracles can predict:

    - block header: ``predictor`` (sample 0), step index 0;
    - all nibbles zero — at index 0 the step is 7, so a zero nibble
      adds ``7 >> 3 = 0``: the signal holds exactly at ``predictor``
      (and the index clamps at 0), with NO drift;
    - optionally ONE nibble 4 at ``spike_pos`` (1-based sample index of
      the spiked delta, must be <= n_samples - 4): delta +7 and index
      jumps to 2, after which the zero nibbles decay the index 2 -> 1
      -> 0 adding +1 (step 9 >> 3) then +1 (step 8 >> 3) then hold —
      decoded tail = P+7, P+8, P+9, P+9, ... exactly.

    ``n_samples`` must be odd (a mono block carries 1 header sample +
    2 nibbles/byte). Decodable by :func:`wav_adpcm_stats`."""
    if n_samples % 2 == 0 or n_samples < 3:
        raise ValueError("n_samples must be odd and >= 3")
    if not -32768 <= predictor <= 32767:
        raise ValueError("predictor out of int16 range")
    n_nibbles = n_samples - 1
    nibbles = [0] * n_nibbles
    if spike_pos is not None:
        if not 1 <= spike_pos <= n_samples - 4:
            raise ValueError("spike_pos must be in [1, n_samples-4]")
        nibbles[spike_pos - 1] = 4
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4)
        for i in range(0, n_nibbles, 2)
    )
    block_align = 4 + len(packed)
    block = struct.pack("<hBB", predictor, 0, 0) + packed
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, 1, 8000, 8000 * block_align // n_samples or 1,
        block_align, 4, 2, n_samples,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(block))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n_samples)
        + b"data"
        + struct.pack("<I", len(block))
        + block
    )


def wav_adpcm_stats(data: bytes) -> dict | None:
    """Decode a REAL mono IMA-ADPCM WAV (format 0x11, 4-bit) — the r10
    tier-1 shrink #5: ADPCM is pure integer arithmetic (step table +
    nibble deltas), no codec library involved. Walks the RIFF chunks,
    decodes every complete block in the data payload (header sample +
    one sample per nibble), and returns (sum, min, max) over the int16
    samples. Wrong codec/layout or corrupt structure returns None —
    the shared degrade contract. Returns {n_units, c0 sum/min/max}."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    fmt_ok = False
    block_align = None
    payload = None
    for cid, size, chunk in _riff_chunks(data, 12):
        if cid == b"fmt " and len(chunk) >= 16:
            audio_fmt, n_ch = struct.unpack("<HH", chunk[0:4])
            block_align = struct.unpack("<H", chunk[12:14])[0]
            bits = struct.unpack("<H", chunk[14:16])[0]
            fmt_ok = audio_fmt == 0x11 and n_ch == 1 and bits == 4
        elif cid == b"data":
            payload = chunk[: min(size, len(chunk))]
    if not fmt_ok or not payload or not block_align or block_align < 5:
        return None
    total = 0
    mn = None
    mx = None
    n = 0
    for off in range(0, len(payload) - block_align + 1, block_align):
        block = payload[off : off + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        idx = block[2]
        if idx > 88 or block[3] != 0:
            return None
        samples = [pred]
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, idx = _ima_decode_nibble(nib, pred, idx)
                samples.append(pred)
        for s in samples:
            total += s
            mn = s if mn is None or s < mn else mn
            mx = s if mx is None or s > mx else mx
        n += len(samples)
    if n == 0:
        return None
    return {"n_units": n, "c0_sum": total, "c0_min": mn, "c0_max": mx}


def png_pixel_stats(data: bytes) -> dict | None:
    """Decode a REAL (compressed) PNG pixel stream with stdlib zlib
    only: walk the chunk list, inflate the concatenated IDAT payloads,
    undo the per-scanline filter (all five spec filter types —
    None/Sub/Up/Average/Paeth), and return per-channel (sum, min, max)
    over every pixel. This is the r10 tier-1 shrink (VERDICT r9 task
    4): PNG's compression is zlib, which the container has, so nothing
    about the format genuinely needs Pillow at fixture scale.

    Supports the fixture construction's shape — 8-bit truecolor RGB
    (color type 2), non-interlaced. Anything else (palette, alpha,
    16-bit, interlaced, truncated or corrupt streams) returns None:
    the same degrade contract as :func:`bmp_pixel_stats`. Returns
    {n_units, c0/c1/c2 (RGB) sum/min/max} or None."""
    import numpy as np

    if len(data) < 33 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w = h = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + clen]
        if len(payload) < clen:
            return None  # truncated chunk -> degrade
        if ctype == b"IHDR":
            if clen < 13:
                return None
            w, h, depth, ctype_img, comp, filt, interlace = struct.unpack(
                ">II5B", payload[:13]
            )
            if (depth, ctype_img, comp, filt, interlace) != (8, 2, 0, 0, 0):
                return None  # only 8-bit RGB non-interlaced (tier-2 domain)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = 3
    rowlen = w * bpp
    if len(raw) != h * (1 + rowlen):
        return None
    px = np.zeros((h, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.int64)
    for r in range(h):
        off = r * (1 + rowlen)
        ftype = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=rowlen, offset=off + 1
        ).astype(np.int64)
        cur = np.empty(rowlen, dtype=np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorizable (no intra-row dependence)
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — serial in-row
            for i in range(rowlen):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                cur[i] = (line[i] + pred) & 0xFF
        else:
            return None  # invalid filter byte -> degrade
        px[r] = cur.astype(np.uint8)
        prev = cur
    flat = px.reshape(-1, 3).astype(np.int64)
    sums = flat.sum(axis=0)
    mins = flat.min(axis=0)
    maxs = flat.max(axis=0)
    return {
        "n_units": int(w) * int(h),
        "c0_sum": int(sums[0]), "c0_min": int(mins[0]), "c0_max": int(maxs[0]),
        "c1_sum": int(sums[1]), "c1_min": int(mins[1]), "c1_max": int(maxs[1]),
        "c2_sum": int(sums[2]), "c2_min": int(mins[2]), "c2_max": int(maxs[2]),
    }


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes | None:
    """Canonical GIF LZW decode (spec appendix F): little-endian
    bitstream, CLEAR/END codes, string table rebuilt on the fly, code
    width grows when the next-entry counter hits 2^width (capped at
    12), the KwKwK case handled. Returns None on a corrupt stream.
    The builder's :func:`_lzw_compress` mirrors this exactly — the
    encoder's width bump is DELAYED one entry (``next == 2^w + 1``)
    because the decoder's table runs one entry behind the encoder's;
    round-trips across every width boundary and a 4096-reset are
    pinned by tests/test_media_headers.py."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1

    pos = 0  # bit position
    nbits_total = len(data) * 8

    def read(width: int) -> int | None:
        nonlocal pos
        if pos + width > nbits_total:
            return None
        byte = pos // 8
        bit = pos % 8
        val = 0
        got = 0
        while got < width:
            val |= (data[byte] >> bit) << got
            got += 8 - bit
            bit = 0
            byte += 1
        pos += width
        return val & ((1 << width) - 1)

    out = bytearray()
    roots = [bytes([i]) for i in range(clear)]

    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None
    while True:
        code = read(width)
        if code is None:
            return None  # truncated before END
        if code == clear:
            table = roots + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if not table:
            return None  # data before the first CLEAR
        if prev is None:
            if code >= clear:
                return None  # first code must be a root
            out += table[code]
            prev = table[code]
            continue
        if code < len(table):
            entry = table[code]
            if code < clear:
                pass
            elif not entry:
                return None  # CLEAR/END slots are not emittable
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            return None
        out += entry
        table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


def gif_pixel_stats(data: bytes) -> dict | None:
    """Decode a REAL GIF image with no codec library: logical screen
    descriptor → global color table → image descriptor → LZW sub-block
    stream (:func:`_lzw_decompress`) → palette-mapped per-channel
    (sum, min, max) over every pixel. The r10 tier-1 shrink #4: GIF's
    only compression is LZW, which is ~60 lines of integer bit-twiddling.

    Supported profile: single image, global color table, no interlace,
    no local color table, no transparency handling (extensions are
    skipped structurally). Anything else — and any corrupt/truncated
    stream — returns None: the degrade contract of the other decoders.
    Returns {n_units, c0/c1/c2 (RGB) sum/min/max} or None."""
    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    palette = None
    if packed & 0x80:
        n_entries = 2 << (packed & 0x07)
        if pos + 3 * n_entries > len(data):
            return None
        palette = np.frombuffer(
            data, np.uint8, 3 * n_entries, pos
        ).reshape(n_entries, 3)
        pos += 3 * n_entries
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return None  # no image block found
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            return None
        # image descriptor
        if pos + 9 > len(data):
            return None
        ix, iy, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x80 or ipacked & 0x40:
            return None  # local color table / interlace: out of profile
        if palette is None or (ix, iy, iw, ih) != (0, 0, w, h):
            return None
        if pos >= len(data):
            return None
        mcs = data[pos]
        pos += 1
        stream = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            if pos + 1 + n > len(data):
                return None
            stream += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        indices = _lzw_decompress(bytes(stream), mcs)
        if indices is None or len(indices) != w * h:
            return None
        idx = np.frombuffer(indices, np.uint8)
        if idx.max(initial=0) >= palette.shape[0]:
            return None
        px = palette[idx].astype(np.int64)
        sums = px.sum(axis=0)
        mins = px.min(axis=0)
        maxs = px.max(axis=0)
        return {
            "n_units": int(w) * int(h),
            "c0_sum": int(sums[0]), "c0_min": int(mins[0]),
            "c0_max": int(maxs[0]),
            "c1_sum": int(sums[1]), "c1_min": int(mins[1]),
            "c1_max": int(maxs[1]),
            "c2_sum": int(sums[2]), "c2_min": int(mins[2]),
            "c2_max": int(maxs[2]),
        }
    return None


def wav_pcm_stats(data: bytes) -> dict | None:
    """Decode an 8-bit mono PCM WAV's REAL sample bytes: (sum, min,
    max) over every sample actually present. Walks the RIFF chunks to
    the data payload; requires PCM (format 1), 8 bits, mono. Returns
    {n_units, c0 sum/min/max} or None (wrong codec/layout, or the
    declared data chunk carries no bytes to decode)."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    fmt_ok = False
    samples = None
    for cid, size, payload in _riff_chunks(data, 12):
        if cid == b"fmt " and len(payload) >= 16:
            audio_fmt, n_ch = struct.unpack("<HH", payload[0:4])
            bits = struct.unpack("<H", payload[14:16])[0]
            fmt_ok = audio_fmt == 1 and n_ch == 1 and bits == 8
        elif cid == b"data":
            # PRESENT bytes (min of declared and available): stats are
            # about the samples we can actually decode
            samples = payload[: min(size, len(payload))]
    if not fmt_ok or not samples:
        return None
    arr = np.frombuffer(samples, dtype=np.uint8).astype(np.int64)
    return {
        "n_units": int(arr.shape[0]),
        "c0_sum": int(arr.sum()),
        "c0_min": int(arr.min()),
        "c0_max": int(arr.max()),
    }
