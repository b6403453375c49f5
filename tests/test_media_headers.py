"""Vendored media header builders/parsers (sources/media_headers.py) and
the tier-2 decode path they enable in extract_media_features.

The builders construct minimal VALID files; the parsers must read back
exactly the parameters built in (round trip), never raise on garbage,
and — the tier contract — take precedence over the md5 fake inside
extract_media_features while unparseable payloads still degrade to it.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
    build_avi,
    build_bmp,
    build_gif,
    build_jpeg,
    build_png,
    build_wav,
    sniff,
)

_IMG_BUILDERS = {
    "png": build_png,
    "gif": build_gif,
    "bmp": build_bmp,
    "jpeg": build_jpeg,
}


@settings(max_examples=50, deadline=None)
@given(
    fmt=st.sampled_from(sorted(_IMG_BUILDERS)),
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
)
def test_image_roundtrip(fmt, w, h):
    got = sniff(_IMG_BUILDERS[fmt](w, h))
    assert got == {
        "format": fmt, "width": w, "height": h, "duration_ms": None
    }


@settings(max_examples=50, deadline=None)
@given(dur=st.integers(min_value=0, max_value=2**31 - 1))
def test_wav_roundtrip(dur):
    got = sniff(build_wav(dur))
    assert got == {
        "format": "wav", "width": None, "height": None, "duration_ms": dur
    }


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=100_000),
    h=st.integers(min_value=1, max_value=100_000),
    dur=st.integers(min_value=0, max_value=10**8),
)
def test_avi_roundtrip(w, h, dur):
    got = sniff(build_avi(w, h, dur))
    assert got == {
        "format": "avi", "width": w, "height": h, "duration_ms": dur
    }


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_sniff_never_raises_on_garbage(data):
    out = sniff(data)
    assert out is None or isinstance(out, dict)


def test_sniff_rejects_close_calls():
    # right magic, truncated body — must degrade, not crash or misparse
    assert sniff(b"") is None
    assert sniff(b"BM") is None
    assert sniff(b"\x89PNG\r\n\x1a\n") is None
    assert sniff(b"GIF89a\x01") is None
    assert sniff(b"\xff\xd8\xff") is None
    assert sniff(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert sniff(b"RIFF\x04\x00\x00\x00AVI ") is None
    assert sniff("plain text document".encode()) is None


def test_bmp_topdown_negative_height():
    # negative biHeight = top-down DIB; dimensions are still |h|
    import struct

    data = bytearray(build_bmp(10, 20))
    data[22:26] = struct.pack("<i", -20)
    assert sniff(bytes(data)) == {
        "format": "bmp", "width": 10, "height": 20, "duration_ms": None
    }


def test_tier2_header_beats_tier3_fake(spark):
    # a valid BMP whose header dims differ from what the md5 fake would
    # invent for the same bytes: the extractor must report the header
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        extract_media_features,
    )

    payload = build_bmp(123, 45)
    h = hashlib.md5(payload).digest()
    fake_w, fake_h = 64 + h[0] % 192, 64 + h[1] % 192
    assert (fake_w, fake_h) != (123, 45)  # distinguishable by design
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, content binary",
    )
    row = extract_media_features(media).collect()[0]
    assert (row.width, row.height) == (123, 45)
    assert row.duration_ms is None
    assert row.error is None


def test_tier3_fake_still_covers_unparseable(spark):
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        extract_media_features,
    )

    payload = b"not a media file at all"
    h = hashlib.md5(payload).digest()
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload)), (2, "audio", bytearray(payload))],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert rows[1].width == 64 + h[0] % 192
    assert rows[1].height == 64 + h[1] % 192
    assert rows[1].duration_ms is None
    assert rows[2].duration_ms == 1000 + int.from_bytes(h[2:4], "little")
    assert rows[2].width is None


def test_synth_media_parses_back_to_md5_params(spark):
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        extract_media_features,
        synth_media_from_docs,
    )

    docs = spark.createDataFrame(
        [
            (1, "image", "alpha beta"),
            (2, "audio", "gamma delta"),
            (3, "video", "epsilon zeta"),
        ],
        "media_id long, kind string, text string",
    )
    feats = {
        r.media_id: r
        for r in extract_media_features(synth_media_from_docs(docs)).collect()
    }
    for mid, text in ((1, "alpha beta"), (2, "gamma delta"),
                      (3, "epsilon zeta")):
        h = hashlib.md5(text.encode()).digest()
        w, ht = 64 + h[0] % 192, 64 + h[1] % 192
        dur = 1000 + int.from_bytes(h[2:4], "little")
        r = feats[mid]
        assert r.error is None
        if r.kind in ("image", "video"):
            assert (r.width, r.height) == (w, ht)
        if r.kind in ("audio", "video"):
            assert r.duration_ms == dur
        if r.kind == "image":
            assert r.duration_ms is None
        if r.kind == "audio":
            assert r.width is None and r.height is None


def test_decode_stub_false_still_raises_into_error_rows(spark):
    # tier 1 (real decoders) remains absent in this container: the
    # error lands in the row, the job never dies
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        extract_media_features,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(build_png(8, 8)))],
        "media_id long, kind string, content binary",
    )
    row = extract_media_features(media, decode_stub=False).collect()[0]
    assert row.error is not None and "NotImplementedError" in row.error
    assert row.width is None and row.features is None


@settings(max_examples=30, deadline=None)
@given(
    fmt=st.sampled_from(sorted(_IMG_BUILDERS) + ["wav", "avi"]),
    w=st.integers(min_value=1, max_value=4096),
    h=st.integers(min_value=1, max_value=4096),
    dur=st.integers(min_value=0, max_value=10**7),
)
def test_every_truncation_prefix_degrades_not_crashes(fmt, w, h, dur):
    # a stream cut mid-header is the classic parser crash class: every
    # prefix of a valid file must sniff to None or a dict, never raise
    if fmt == "wav":
        data = build_wav(dur)
    elif fmt == "avi":
        data = build_avi(w, h, dur)
    else:
        data = _IMG_BUILDERS[fmt](w, h)
    for cut in range(len(data) + 1):
        out = sniff(data[:cut])
        assert out is None or isinstance(out, dict)


def test_null_text_propagates_null_media(spark, tmp_path):
    # code-review r8: str(None) used to build valid md5('None') media
    # while the paired oracles compute md5(NULL) = NULL — a NULL-text
    # doc must flow through the FULL entry as NULL dims on both
    # engines. Replays mm_header_decode's compare on a crafted table.
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.test_half_boundary import _docs_table, _sf_dir_with_docs
    from tools.parity import compare, duck_conn
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    docs = _docs_table(
        [(1, "alpha beta gamma", "en"), (3, "delta epsilon", "en")]
    )
    # doc 2: NULL text (pyarrow: swap the text column with a null slot)
    import pyarrow as pa

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta gamma", None, "delta eps"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["pin"] * 3),
            "n_chars": pa.array([16, 0, 9], pa.int64()),
        }
    )
    sf = _sf_dir_with_docs(tmp_path, docs)
    con = duck_conn(sf)
    try:
        df = catalog.queries()["mm_header_decode"](spark, sf)
        ok, *_ = compare(
            "mm_header_decode[null-text]",
            df,
            con,
            catalog.oracle_sql()["mm_header_decode"],
        )
        rows = {r.media_id: r for r in df.collect()}
    finally:
        con.close()
    assert ok
    assert rows[2].width is None and rows[2].duration_ms is None
    assert rows[1].width is not None  # non-null rows unaffected


def test_unknown_fmt_raises_valueerror(spark):
    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        synth_media_from_docs,
    )

    docs = spark.createDataFrame(
        [(1, "some text", "tiff")],
        "media_id long, text string, fmt string",
    )
    with pytest.raises(Exception) as ei:
        synth_media_from_docs(docs, fmt_col="fmt").collect()
    assert "unknown media format" in str(ei.value)


# --- r9: tier-2 PAYLOAD decoders (real pixel arrays / PCM samples) ---


def test_bmp_pixel_stats_roundtrip_with_stride_padding():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        bmp_pixel_stats,
        build_bmp,
    )

    # width 3 -> 9-byte rows padded to 12: a decoder that slices the
    # array naively would swallow padding zeros into the stats
    px = bytes([200] * 9 + [10, 250, 7] + [200] * 6)  # 2 rows of 3 px
    data = build_bmp(3, 2, px)
    s = bmp_pixel_stats(data)
    assert s["n_units"] == 6
    assert (s["c0_sum"], s["c0_min"], s["c0_max"]) == (
        5 * 200 + 10, 10, 200
    )
    assert (s["c1_sum"], s["c1_min"], s["c1_max"]) == (
        5 * 200 + 250, 200, 250
    )
    assert (s["c2_sum"], s["c2_min"], s["c2_max"]) == (5 * 200 + 7, 7, 200)


def test_wav_pcm_stats_roundtrip():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_wav,
        wav_pcm_stats,
    )

    s = wav_pcm_stats(build_wav(4, bytes([0, 128, 255, 1])))
    assert s == {"n_units": 4, "c0_sum": 384, "c0_min": 0, "c0_max": 255}


def test_payload_stats_degrade_paths():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        bmp_pixel_stats,
        build_bmp,
        build_png,
        build_wav,
        wav_pcm_stats,
    )

    # header-only files (no payload) and compressed formats degrade
    assert bmp_pixel_stats(build_bmp(4, 4)) is None
    assert wav_pcm_stats(build_wav(100)) is None
    assert bmp_pixel_stats(build_png(4, 4)) is None
    # truncated pixel array degrades (declared 2 rows, bytes for 1)
    full = build_bmp(4, 2, bytes(range(24)))
    assert bmp_pixel_stats(full[: 54 + 12]) is None


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=255),
)
def test_payload_decoder_prefixes_never_raise(w, h, seed):
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        bmp_pixel_stats,
        build_bmp,
        build_wav,
        wav_pcm_stats,
    )

    px = bytes((seed + i) % 256 for i in range(w * h * 3))
    data = build_bmp(w, h, px)
    for cut in range(0, len(data) + 1, max(1, len(data) // 37)):
        out = bmp_pixel_stats(data[:cut])
        assert out is None or isinstance(out, dict)
    wav = build_wav(w * h, bytes((seed + i) % 256 for i in range(w * h)))
    for cut in range(0, len(wav) + 1, max(1, len(wav) // 37)):
        out = wav_pcm_stats(wav[:cut])
        assert out is None or isinstance(out, dict)


def test_mm_pixel_stats_null_text(spark, tmp_path):
    # NULL text -> NULL stats row on BOTH engines through the full entry
    import pyarrow as pa
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.test_half_boundary import _sf_dir_with_docs
    from tools.parity import compare, duck_conn
    from ade_agente_documental_empresarial___miner_a_spark.plans import (
        catalog,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([2, 3], pa.int64()),
            "text": pa.array(["alpha beta", None]),
            "lang": pa.array(["en"] * 2),
            "source": pa.array(["pin"] * 2),
            "n_chars": pa.array([10, 0], pa.int64()),
        }
    )
    sf = _sf_dir_with_docs(tmp_path, docs)
    con = duck_conn(sf)
    try:
        df = catalog.queries()["mm_pixel_stats"](spark, sf)
        ok, *_ = compare(
            "mm_pixel_stats[null-text]",
            df,
            con,
            catalog.oracle_sql()["mm_pixel_stats"],
        )
        rows = {r.media_id: r for r in df.collect()}
    finally:
        con.close()
    assert ok
    assert rows[3].n_units is None and rows[3].c0_sum is None
    assert rows[2].n_units is not None and rows[2].c1_max is not None


def test_real_features_for_decodable_payloads(spark):
    # a decodable BMP payload yields a REAL descriptor: channel means
    # and ranges hand-computable from the pixel bytes (NOT the md5
    # fake); compressed/opaque payloads keep the fake
    import math

    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        _fake_features,
        extract_media_features,
    )
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_bmp,
        build_png,
        build_wav,
    )

    px = bytes([10, 20, 30] * 5 + [210, 220, 230])  # 3x2, one bright px
    bmp = build_bmp(3, 2, px)
    wav = build_wav(4, bytes([0, 100, 100, 200]))
    png = build_png(5, 5)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp)),
            (2, "audio", bytearray(wav)),
            (3, "image", bytearray(png)),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    f1 = rows[1].features
    # hand-computed: mean_c0 = (5*10+210)/(6*255), ranges = 200/255,
    # log term, flag 1.0 — then L2-normalized
    raw = [
        (5 * 10 + 210) / (6 * 255.0),
        (5 * 20 + 220) / (6 * 255.0),
        (5 * 30 + 230) / (6 * 255.0),
        200 / 255.0, 200 / 255.0, 200 / 255.0,
        min(1.0, math.log10(7.0) / 8.0),
        1.0,
    ]
    n = math.sqrt(sum(x * x for x in raw))
    want = [x / n for x in raw]
    assert all(abs(a - b) < 1e-6 for a, b in zip(f1, want))
    assert rows[2].features[-1] < 0  # audio flag
    assert rows[3].features == _fake_features(bytes(png))  # compressed


# ---------------------------------------------------------------------------
# r10 — real PNG payload decode (inflate + all-five-filters unfilter)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=18),
    h=st.integers(min_value=1, max_value=18),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_png_pixel_stats_roundtrip(w, h, seed):
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        png_pixel_stats,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    s = png_pixel_stats(build_png(w, h, px))
    arr = np.frombuffer(px, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
    assert s == {
        "n_units": w * h,
        "c0_sum": int(arr[:, 0].sum()),
        "c0_min": int(arr[:, 0].min()),
        "c0_max": int(arr[:, 0].max()),
        "c1_sum": int(arr[:, 1].sum()),
        "c1_min": int(arr[:, 1].min()),
        "c1_max": int(arr[:, 1].max()),
        "c2_sum": int(arr[:, 2].sum()),
        "c2_min": int(arr[:, 2].min()),
        "c2_max": int(arr[:, 2].max()),
    }


def test_png_pixel_stats_exercises_every_filter_type():
    # h=5 guarantees scanlines filtered None/Sub/Up/Average/Paeth; a
    # gradient image makes every filter's delta non-trivial, so any
    # broken unfilter branch corrupts the stats
    import zlib as _zlib

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        png_pixel_stats,
    )

    w, h = 7, 5
    px = bytes((r * 40 + c * 9 + ch * 3) % 256
               for r in range(h) for c in range(w) for ch in range(3))
    data = build_png(w, h, px)
    # the raw (pre-compression) stream really does use filters 0..4
    idat_off = data.find(b"IDAT") + 4
    (idat_len,) = __import__("struct").unpack(
        ">I", data[idat_off - 8 : idat_off - 4]
    )
    raw = _zlib.decompress(data[idat_off : idat_off + idat_len])
    assert [raw[r * (1 + w * 3)] for r in range(h)] == [0, 1, 2, 3, 4]
    s = png_pixel_stats(data)
    vals = [px[i] for i in range(0, len(px), 3)]
    assert s["n_units"] == 35
    assert s["c0_sum"] == sum(vals)
    assert s["c0_min"] == min(vals) and s["c0_max"] == max(vals)


def test_png_pixel_stats_degrade_paths():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        png_pixel_stats,
    )

    full = build_png(4, 5, bytes(range(60)))
    assert png_pixel_stats(full) is not None
    # header-only (no IDAT), truncated IDAT, garbage, non-PNG
    assert png_pixel_stats(build_png(4, 5)) is None
    assert png_pixel_stats(full[:-20]) is None
    assert png_pixel_stats(b"\x89PNG\r\n\x1a\n" + b"junk" * 10) is None
    assert png_pixel_stats(build_bmp(4, 4)) is None
    # wrong color type (IHDR says grayscale) degrades
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">II5B", 4, 4, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", len(ihdr))
        + chunk
        + _struct.pack(">I", _zlib.crc32(chunk) & 0xFFFFFFFF)
    )
    assert png_pixel_stats(gray) is None


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=255),
)
def test_png_decoder_prefixes_never_raise(w, h, seed):
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        png_pixel_stats,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
    data = build_png(w, h, px)
    for cut in range(0, len(data), max(1, len(data) // 40)):
        png_pixel_stats(data[:cut])  # must degrade (None), never raise


def test_bmp_pixel_stats_rejects_offset_inside_header():
    # ADVICE r9: a malformed px_off pointing inside the 54-byte header
    # must degrade to None, not decode header bytes as pixels
    import struct as _struct

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        bmp_pixel_stats,
    )

    data = bytearray(build_bmp(2, 2, bytes(12)))
    data[10:14] = _struct.pack("<I", 10)  # px_off -> inside header
    # pad so the truncation check can't mask the offset check
    assert bmp_pixel_stats(bytes(data) + bytes(64)) is None


def test_real_features_real_for_pixel_carrying_png(spark):
    # r10: a PNG WITH a real IDAT now yields the REAL descriptor (the
    # fake would md5-seed from the compressed bytes and differ)
    import math

    from ade_agente_documental_empresarial___miner_a_spark.sources.multimodal import (
        _fake_features,
        extract_media_features,
    )

    px = bytes([10, 20, 30] * 5 + [210, 220, 230])  # 3x2, one bright px
    png = build_png(3, 2, px)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, kind string, content binary",
    )
    (row,) = extract_media_features(media).collect()
    raw = [
        (5 * 10 + 210) / (6 * 255.0),
        (5 * 20 + 220) / (6 * 255.0),
        (5 * 30 + 230) / (6 * 255.0),
        200 / 255.0, 200 / 255.0, 200 / 255.0,
        min(1.0, math.log10(7.0) / 8.0),
        1.0,
    ]
    n = math.sqrt(sum(x * x for x in raw))
    want = [x / n for x in raw]
    assert all(abs(a - b) < 1e-6 for a, b in zip(row.features, want))
    assert row.features != _fake_features(bytes(png))


# ---------------------------------------------------------------------------
# r10 — real GIF LZW decode + IMA-ADPCM decode


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=18),
    h=st.integers(min_value=1, max_value=18),
    npal=st.integers(min_value=2, max_value=16),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_gif_pixel_stats_roundtrip(w, h, npal, seed):
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        gif_pixel_stats,
    )

    rng = np.random.default_rng(seed)
    np_pal = rng.integers(0, 256, (npal, 3))
    pal = [tuple(int(x) for x in row) for row in np_pal]
    idx = rng.integers(0, npal, w * h).astype(np.uint8).tobytes()
    s = gif_pixel_stats(build_gif(w, h, idx, pal))
    px = np_pal[np.frombuffer(idx, np.uint8)]
    assert s == {
        "n_units": w * h,
        "c0_sum": int(px[:, 0].sum()), "c0_min": int(px[:, 0].min()),
        "c0_max": int(px[:, 0].max()),
        "c1_sum": int(px[:, 1].sum()), "c1_min": int(px[:, 1].min()),
        "c1_max": int(px[:, 1].max()),
        "c2_sum": int(px[:, 2].sum()), "c2_min": int(px[:, 2].min()),
        "c2_max": int(px[:, 2].max()),
    }


def test_lzw_end_code_width_boundary_regression():
    """The r10 encoder bug: the decoder appends a table entry after the
    FINAL data code, so when that append lands exactly on 2^width the
    END code must be written at the bumped width. n=39 zeros with one
    spike at mcs=2 hits the boundary (found live: 36/500 fixture docs
    failed before the fix). Exhaustive spike positions across the
    boundary region must round-trip."""
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        _lzw_compress,
        _lzw_decompress,
    )

    for n in range(35, 45):
        for p in range(n):
            idx = bytearray(n)
            idx[p] = 1
            syms = bytes(idx)
            assert _lzw_decompress(_lzw_compress(syms, 2), 2) == syms, (
                n,
                p,
            )


def test_lzw_4096_reset_roundtrip():
    # a stream long and diverse enough to fill the 12-bit dictionary
    # and force a mid-stream CLEAR
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        _lzw_compress,
        _lzw_decompress,
    )

    rng = np.random.default_rng(3)
    syms = rng.integers(0, 256, 60_000).astype(np.uint8).tobytes()
    assert _lzw_decompress(_lzw_compress(syms, 8), 8) == syms


def test_gif_degrade_paths():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        gif_pixel_stats,
    )

    full = build_gif(6, 6, bytes(36), [(1, 2, 3), (4, 5, 6)])
    assert gif_pixel_stats(full) is not None
    assert gif_pixel_stats(build_gif(4, 4)) is None      # header-only
    assert gif_pixel_stats(full[:-8]) is None            # truncated
    assert gif_pixel_stats(b"GIF89a" + b"x" * 30) is None
    assert gif_pixel_stats(build_png(4, 4)) is None      # wrong format
    assert sniff(full)["width"] == 6                     # sniff intact


def test_wav_ima_closed_form_and_encoder_tracking():
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        _ima_decode_nibble,
        _ima_encode,
        build_wav_ima,
        wav_adpcm_stats,
    )

    # flat construction: every decoded sample == predictor exactly
    s = wav_adpcm_stats(build_wav_ima(65, 1234))
    assert s == {
        "n_units": 65, "c0_sum": 1234 * 65,
        "c0_min": 1234, "c0_max": 1234,
    }
    # spike tail P+7, P+8, P+9, P+9... at both position extremes
    P, n = -500, 65
    for p in (1, 17, n - 4):
        s = wav_adpcm_stats(build_wav_ima(n, P, spike_pos=p))
        want = P * p + (P + 7) + (P + 8) + (P + 9) * (n - p - 2)
        assert s == {
            "n_units": n, "c0_sum": want, "c0_min": P, "c0_max": P + 9,
        }, p
    # the REAL encoder tracks an arbitrary signal within codec error
    rng = np.random.default_rng(9)
    sig = (
        np.cumsum(rng.integers(-200, 201, 401))
        .clip(-30000, 30000)
        .astype(int)
        .tolist()
    )
    pred, packed = _ima_encode(sig)
    idx = 0
    out = [pred]
    for byte in packed:
        for nib in (byte & 0x0F, byte >> 4):
            pred, idx = _ima_decode_nibble(nib, pred, idx)
            out.append(pred)
    assert max(abs(a - b) for a, b in zip(sig, out)) < 1500


def test_wav_adpcm_degrade_and_codec_dispatch():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_wav_ima,
        wav_adpcm_stats,
        wav_pcm_stats,
    )

    full = build_wav_ima(65, 7, spike_pos=5)
    assert wav_adpcm_stats(b"RIFF" + b"x" * 20) is None
    # codec dispatch is strict both ways: PCM is not ADPCM and vice versa
    assert wav_adpcm_stats(build_wav(10, bytes(10))) is None
    assert wav_pcm_stats(full) is None
    # corrupt step index degrades
    broken = bytearray(full)
    off = full.find(b"data") + 8 + 2
    broken[off] = 120  # step index > 88
    assert wav_adpcm_stats(bytes(broken)) is None


# ---------------------------------------------------------------------------
# r10 — baseline-JPEG entropy decode (DC-only profile)


@settings(max_examples=40, deadline=None)
@given(
    wb=st.integers(min_value=1, max_value=5),
    hb=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_jpeg_dc_stats_roundtrip(wb, hb, seed):
    import numpy as np

    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_jpeg_dc,
        jpeg_dc_stats,
    )

    rng = np.random.default_rng(seed)
    vals = [int(v) for v in rng.integers(0, 256, wb * hb)]
    s = jpeg_dc_stats(build_jpeg_dc(wb * 8, hb * 8, vals))
    assert s == {
        "n_units": wb * hb * 64,
        "c0_sum": sum(vals) * 64,
        "c0_min": min(vals),
        "c0_max": max(vals),
    }


def test_jpeg_dc_byte_stuffing_and_prediction():
    # alternating extremes force 0xFF bytes in the scan (stuffing) and
    # maximal DC deltas (category 9 + extend bits, both signs)
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_jpeg_dc,
        jpeg_dc_stats,
    )

    vals = [255, 0] * 8
    s = jpeg_dc_stats(build_jpeg_dc(32, 32, vals))
    assert s == {
        "n_units": 1024, "c0_sum": 255 * 8 * 64, "c0_min": 0,
        "c0_max": 255,
    }


def test_jpeg_dc_degrade_paths():
    from ade_agente_documental_empresarial___miner_a_spark.sources.media_headers import (
        build_jpeg_dc,
        jpeg_dc_stats,
    )

    full = build_jpeg_dc(16, 16, [1, 2, 3, 4])
    assert jpeg_dc_stats(full) is not None
    for cut in range(0, len(full), 3):
        jpeg_dc_stats(full[:cut])  # never raises
    assert jpeg_dc_stats(full[:-10]) is None       # truncated scan
    assert jpeg_dc_stats(b"\xff\xd8junk") is None
    # the header-only S-fixture JPEG (no DHT/SOS) degrades
    assert jpeg_dc_stats(build_jpeg(8, 8)) is None
    assert sniff(full)["width"] == 16              # header sniff intact
