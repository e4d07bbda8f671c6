"""Round-8 real pixel decode: BMP/PPM/PNG -> canonical RGB with stdlib
only (operators/multimodal.py decode_pixels). The synthetic payloads are
id-parameterized (raw byte j = (id + j) % 256) so every assertion has an
arithmetic expected value; the PNG encoder rotates row filters (r % 5),
so round-tripping proves all five filter reconstructions.

Reference context: the fake-object content surface the media column
models is /root/reference/src/main.py:977-1020 (synthesize-then-deliver
payload bytes)."""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators.multimodal import (
    _bmp_encode,
    _png_chunk,
    _png_encode,
    _ppm_encode,
    _raw_fill,
    decode_pixels,
    decode_pixels_bytes,
    synthetic_pixel_media,
)
from amazon_macie_activity_generator_spark.sources.tables import load_table

# ------------------------------------------------------------ pure codec


@pytest.mark.parametrize("media_id", [0, 1, 2, 3, 4, 23, 24, 31, 255, 256, 12345])
@pytest.mark.parametrize(
    "enc,fmt", [(_bmp_encode, "bmp"), (_ppm_encode, "ppm"), (_png_encode, "png")]
)
def test_codec_round_trip(media_id, enc, fmt):
    w, h = 1 + media_id % 32, 1 + media_id % 24
    raw = _raw_fill(media_id, w, h)
    assert all(raw[j] == (media_id + j) % 256 for j in range(len(raw)))
    out = decode_pixels_bytes(enc(raw, w, h))
    assert out == (fmt, w, h, raw)


def test_png_all_filters_exercised():
    # h >= 5 so the encoder's r % 5 rotation emits every filter type;
    # a decoder with a wrong Sub/Up/Average/Paeth cannot round-trip
    raw = _raw_fill(7, 16, 9)
    payload = _png_encode(raw, 16, 9)
    # pull filter bytes back out of the IDAT stream to prove the claim
    idat_off = payload.index(b"IDAT") + 4
    idat_len = int.from_bytes(payload[idat_off - 8 : idat_off - 4], "big")
    data = zlib.decompress(payload[idat_off : idat_off + idat_len])
    filters = {data[r * (16 * 3 + 1)] for r in range(9)}
    assert filters == {0, 1, 2, 3, 4}
    assert decode_pixels_bytes(payload) == ("png", 16, 9, raw)


def test_png_grayscale_expands_to_rgb():
    w, h = 6, 7  # h >= 5: all five filters exercised at bpp=1 (the
    # encoder twin uses the SPEC's bpp-sized left neighbor, so a decoder
    # hardcoding left-offset 3 corrupts these rows)
    gray = bytes((11 * j + 5) % 256 for j in range(w * h))
    out = decode_pixels_bytes(_png_encode(gray, w, h, bpp=1, ctype=0))
    assert out is not None
    fmt, w2, h2, raw = out
    assert (fmt, w2, h2) == ("png", w, h)
    assert raw == b"".join(bytes([g, g, g]) for g in gray)


def test_png_rgba_drops_alpha():
    w, h = 5, 6  # all five filters at bpp=4 (left neighbor 4 bytes back)
    rgba = bytes((7 * j + 3) % 256 for j in range(w * h * 4))
    out = decode_pixels_bytes(_png_encode(rgba, w, h, bpp=4, ctype=6))
    assert out is not None
    fmt, w2, h2, raw = out
    assert (fmt, w2, h2) == ("png", w, h)
    want = b"".join(rgba[p * 4 : p * 4 + 3] for p in range(w * h))
    assert raw == want


def test_png_palette_without_plte_rejected():
    # palette (color type 3) with NO PLTE chunk is unrenderable per spec —
    # must quarantine, not mis-decode (ctype 3 itself is supported since r9)
    assert decode_pixels_bytes(_png_encode(bytes(12), 4, 3, bpp=1, ctype=3)) is None


def test_png_palette_round_trip():
    # round 9: 8-bit indexed PNG (ctype 3). h >= 5 exercises all five
    # filters over the 1-byte index stream; the palette lookup then maps
    # indices to RGB — both stages must be right to reproduce `want`
    for i in (0, 7, 31, 255, 300):
        w, h = 1 + i % 32, 1 + i % 24
        idx = bytes((i + p) % 256 for p in range(w * h))
        pal = bytes(
            v for k in range(256)
            for v in ((3 * k + i) % 256, (5 * k + 2 * i) % 256, (7 * k + 3 * i) % 256)
        )
        out = decode_pixels_bytes(_png_encode(idx, w, h, bpp=1, ctype=3, plte=pal))
        assert out is not None, i
        fmt, w2, h2, raw = out
        assert (fmt, w2, h2) == ("png", w, h)
        want = b"".join(pal[k * 3 : k * 3 + 3] for k in idx)
        assert raw == want


def test_png_palette_index_beyond_plte_rejected():
    # stream encodes index 200 but the palette has 10 entries: corrupt
    # per spec — the bounds guard must reject, not wrap or crash
    short_pal = bytes(range(30))  # 10 entries
    bad = _png_encode(bytes([5, 200, 1, 2]), 2, 2, bpp=1, ctype=3, plte=short_pal)
    assert decode_pixels_bytes(bad) is None
    ok = _png_encode(bytes([5, 9, 1, 2]), 2, 2, bpp=1, ctype=3, plte=short_pal)
    assert decode_pixels_bytes(ok) is not None


def test_png_palette_malformed_plte_rejected():
    idx, pal = bytes([0, 1, 1, 0]), bytes(range(6))  # 2 entries
    good = _png_encode(idx, 2, 2, bpp=1, ctype=3, plte=pal)
    # PLTE length not divisible by 3
    assert decode_pixels_bytes(good.replace(_png_chunk(b"PLTE", pal),
                                            _png_chunk(b"PLTE", pal[:5]))) is None
    # PLTE after IDAT (spec orders it before)
    no_plte = _png_encode(idx, 2, 2, bpp=1, ctype=3)
    iend_at = no_plte.index(b"IEND") - 4
    late = no_plte[:iend_at] + _png_chunk(b"PLTE", pal) + no_plte[iend_at:]
    assert decode_pixels_bytes(late) is None
    # duplicate PLTE
    plte_chunk = _png_chunk(b"PLTE", pal)
    dup = good.replace(plte_chunk, plte_chunk + plte_chunk)
    assert decode_pixels_bytes(dup) is None


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (7, 7), (8, 8), (9, 5),
                                 (32, 24), (17, 13)])
def test_png_adam7_round_trip(w, h):
    """Round 10: Adam7 interlaced RGB — seven independently filtered
    passes scattered at (x0 + i*dx, y0 + j*dy); small dims exercise the
    empty-pass rule (no bytes at all for a 0-width/height pass)."""
    raw = _raw_fill(3, w, h)
    assert decode_pixels_bytes(_png_encode(raw, w, h, interlace=1)) == \
        ("png", w, h, raw)


def test_png_16bit_high_byte_narrowing():
    """16-bit samples narrow to their HIGH byte: encode v*257 (high ==
    low == v) and also v<<8 | junk — both must decode to v, proving the
    decoder picks the high byte rather than low/average."""
    w, h = 16, 9
    raw8 = _raw_fill(7, w, h)
    exact = bytes(v for x in raw8 for v in (x, x))
    assert decode_pixels_bytes(
        _png_encode(exact, w, h, bpp=6, bitdepth=16)) == ("png", w, h, raw8)
    junklow = bytes(v for x in raw8 for v in (x, (x + 37) % 256))
    assert decode_pixels_bytes(
        _png_encode(junklow, w, h, bpp=6, bitdepth=16)) == ("png", w, h, raw8)


def test_png_16bit_interlaced_round_trip():
    raw8 = _raw_fill(9, 21, 14)
    raw16 = bytes(v for x in raw8 for v in (x, x))
    payload = _png_encode(raw16, 21, 14, bpp=6, bitdepth=16, interlace=1)
    assert decode_pixels_bytes(payload) == ("png", 21, 14, raw8)


def test_png_gray_alpha_expands_and_drops_alpha():
    """Round 10: ctype 4 (gray+alpha, bpp=2 — the left filter neighbor
    is 2 bytes back) at depths 8 and 16."""
    w, h = 6, 7
    gray = bytes((11 + 3 * k) % 256 for k in range(w * h))
    want = b"".join(bytes([g, g, g]) for g in gray)
    ga8 = bytes(v for g in gray for v in (g, 200))
    assert decode_pixels_bytes(
        _png_encode(ga8, w, h, bpp=2, ctype=4)) == ("png", w, h, want)
    ga16 = bytes(v for g in gray for v in (g, g, 0x12, 0x34))
    assert decode_pixels_bytes(
        _png_encode(ga16, w, h, bpp=4, ctype=4, bitdepth=16)) == \
        ("png", w, h, want)


def test_png_16bit_gray_and_rgba():
    w, h = 6, 5
    gray = bytes((11 + 3 * k) % 256 for k in range(w * h))
    want = b"".join(bytes([g, g, g]) for g in gray)
    g16 = bytes(v for g in gray for v in (g, (g * 7) % 256))
    assert decode_pixels_bytes(
        _png_encode(g16, w, h, bpp=2, ctype=0, bitdepth=16)) == \
        ("png", w, h, want)
    rgba16 = bytes(
        v for g in gray
        for v in (g, g, (g + 1) % 256, 0, (g + 2) % 256, 9, 255, 255)
    )
    want_rgb = bytes(v for g in gray for v in (g, (g + 1) % 256, (g + 2) % 256))
    assert decode_pixels_bytes(
        _png_encode(rgba16, w, h, bpp=8, ctype=6, bitdepth=16)) == \
        ("png", w, h, want_rgb)


def test_png_interlaced_palette_round_trip():
    idx = bytes((5 + p) % 256 for p in range(17 * 13))
    pal = bytes(v for k in range(256) for v in (k, (k * 3) % 256, (k * 5) % 256))
    payload = _png_encode(idx, 17, 13, bpp=1, ctype=3, plte=pal, interlace=1)
    want = b"".join(pal[k * 3 : k * 3 + 3] for k in idx)
    assert decode_pixels_bytes(payload) == ("png", 17, 13, want)


def test_png_unsupported_depth_interlace_variants_quarantine():
    good = _png_encode(_raw_fill(1, 4, 4), 4, 4)
    for mutate in (
        # sub-byte depths are valid ONLY for ctypes 0 and 3 (spec
        # 11.2.2) — on this RGB (ctype 2) file they must quarantine
        lambda b: b[:24] + bytes([4]) + b[25:],            # depth 4 + RGB
        lambda b: b[:24] + bytes([1]) + b[25:],            # depth 1 + RGB
        lambda b: b[:28] + bytes([2]) + b[29:],            # interlace 2
        lambda b: b[:24] + bytes([16, 3]) + b[26:],        # 16-bit palette
    ):
        assert decode_pixels_bytes(mutate(good)) is None


def test_png_subbyte_gray_round_trip():
    """Depths 1/2/4 grayscale: MSB-first unpack, row-pad trim, and the
    exact 255/(2^d - 1) sample scaling, plain and interlaced."""
    rng = np.random.RandomState(7)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for w, h in ((1, 1), (7, 3), (8, 8), (17, 13), (33, 21)):
            s = rng.randint(0, 1 << depth, size=w * h).astype(np.uint8)
            exp = np.repeat(
                (s.reshape(h, w) * scale)[..., None], 3, axis=2
            ).tobytes()
            for interlace in (0, 1):
                out = decode_pixels_bytes(_png_encode(
                    s.tobytes(), w, h, ctype=0, bitdepth=depth,
                    interlace=interlace,
                ))
                assert out == ("png", w, h, exp), (depth, w, h, interlace)


def test_png_subbyte_palette_round_trip():
    """Depths 1/2/4 palette: packed indices through the PLTE lookup —
    including a palette SHORTER than 2^depth, where only in-range
    indices may appear."""
    rng = np.random.RandomState(8)
    for depth in (1, 2, 4):
        n = 1 << depth
        pal = bytes(
            v for k in range(n)
            for v in ((3 * k + 1) % 256, (5 * k) % 256, (7 * k + 2) % 256)
        )
        pa = np.frombuffer(pal, np.uint8).reshape(-1, 3)
        for w, h in ((5, 4), (16, 9), (31, 17)):
            s = rng.randint(0, n, size=w * h).astype(np.uint8)
            exp = pa[s.reshape(h, w)].tobytes()
            for interlace in (0, 1):
                out = decode_pixels_bytes(_png_encode(
                    s.tobytes(), w, h, ctype=3, bitdepth=depth, plte=pal,
                    interlace=interlace,
                ))
                assert out == ("png", w, h, exp), (depth, w, h, interlace)


def test_gif_interlaced_round_trip():
    """Interlaced GIFs deinterlace via the spec's four-pass row scatter —
    heights below, at, and above the pass strides all land right."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _GIF_FILL_PALETTE,
        _gif_encode,
    )
    rng = np.random.RandomState(5)
    for w, h in ((3, 1), (4, 2), (5, 5), (8, 8), (7, 9), (16, 23)):
        idx = rng.randint(0, 256, size=w * h).astype(np.uint8).tobytes()
        plain = decode_pixels_bytes(
            _gif_encode(idx, _GIF_FILL_PALETTE, w, h))
        inter = decode_pixels_bytes(
            _gif_encode(idx, _GIF_FILL_PALETTE, w, h, interlace=True))
        assert plain is not None and inter == plain, (w, h)


def test_png_subbyte_palette_out_of_range_index_quarantines():
    # 2-entry palette with a depth-2 index of 3: corrupt per spec
    b = _png_encode(bytes([0, 1, 3, 2]), 2, 2, ctype=3, bitdepth=2,
                    plte=bytes(6))
    assert decode_pixels_bytes(b) is None


def test_png_subbyte_row_pad_bits_are_ignored():
    # w=3 at depth 2 leaves 2 pad bits per row; set them in the packed
    # stream directly and require identical decode (the spec says pad
    # bits carry no meaning)
    import zlib
    s = np.array([1, 2, 3, 0, 1, 2], dtype=np.uint8)
    clean = _png_encode(s.tobytes(), 3, 2, ctype=0, bitdepth=2)
    ref = decode_pixels_bytes(clean)
    # rebuild with filter 0 rows and dirty pad bits
    rows = bytearray()
    for r in range(2):
        rows.append(0)
        packed = (s[3 * r] << 6) | (s[3 * r + 1] << 4) | (s[3 * r + 2] << 2)
        rows.append(packed | 0b11)  # dirty pad
    ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [2, 0, 0, 0, 0]
    )
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _png_chunk,
    )
    dirty = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
             + _png_chunk(b"IEND", b""))
    assert decode_pixels_bytes(dirty) == ref


def test_bmp_32bpp_drops_alpha():
    w, h = 5, 4
    raw = _raw_fill(9, w, h)  # expected RGB after decode
    # hand-build a 32-bpp BI_RGB BMP: bottom-up rows of BGRA
    body = bytearray()
    for r in range(h - 1, -1, -1):
        for c in range(w):
            px = raw[(r * w + c) * 3 : (r * w + c) * 3 + 3]
            body += bytes((px[2], px[1], px[0], 0xAA))  # BGRA
    header = (
        b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
    )
    assert decode_pixels_bytes(header + bytes(body)) == ("bmp", w, h, raw)


def test_bmp_top_down_negative_height():
    # negative BITMAPINFOHEADER height = rows stored top-down: flip the
    # encoder's bottom-up body back and assert the decoder handles it
    w, h = 5, 4
    raw = _raw_fill(9, w, h)
    b = bytearray(_bmp_encode(raw, w, h))
    stride = (w * 3 + 3) // 4 * 4
    body = b[54:]
    flipped = b"".join(
        bytes(body[r * stride : (r + 1) * stride]) for r in range(h - 1, -1, -1)
    )
    b[54:] = flipped
    b[22:26] = (-h).to_bytes(4, "little", signed=True)
    assert decode_pixels_bytes(bytes(b)) == ("bmp", w, h, raw)


def test_ppm_comments_and_split_header():
    raw = _raw_fill(3, 4, 2)
    payload = b"P6\n# c1\n4 # inline\n# c2\n2\n255\n" + raw
    assert decode_pixels_bytes(payload) == ("ppm", 4, 2, raw)


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"hello world not an image",
        b"BM" + b"\x00" * 60,                       # zeroed BMP header
        b"P6\n5 5\n255\n" + b"\x00" * 10,            # truncated PPM body
        b"P6\n5 5\n65535\n" + b"\x00" * 200,         # 16-bit maxval unsupported
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 50,        # garbage chunks
    ],
)
def test_malformed_payloads_yield_none(payload):
    assert decode_pixels_bytes(payload) is None


def test_truncated_png_yields_none():
    payload = _png_encode(_raw_fill(7, 8, 8), 8, 8)
    assert decode_pixels_bytes(payload[: len(payload) // 2]) is None


def test_png_bomb_guard():
    # tiny IDAT, colossal claimed dims: must be rejected, not allocated
    ihdr = (1 << 15).to_bytes(4, "big") * 2 + bytes([8, 2, 0, 0, 0])
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_pixels_bytes(bomb) is None


def test_png_wrong_color_type_rejected():
    # gray+alpha (color type 4) is genuinely unsupported: the IHDR
    # validation itself must reject it (ctype 4 has no bpp mapping),
    # independent of any downstream stride mismatch
    raw = _raw_fill(1, 4, 4)
    payload = bytearray(_png_encode(raw, 4, 4))
    ihdr_at = payload.index(b"IHDR") + 4
    payload[ihdr_at + 9] = 4  # color type byte
    # CRC now wrong too, but IHDR validation fires first either way
    assert decode_pixels_bytes(bytes(payload)) is None


def test_png_reconstruct_wavefront_equals_naive():
    """The round-9 filter reconstruction is two-tier: runs of >= 64
    Average/Paeth rows on images >= 64 px wide go through the
    anti-diagonal wavefront (_avg_paeth_wavefront), everything else
    through the scalar lane scan. Both must agree byte-for-byte with the
    naive spec-literal loop on random images across dims, bpp, and
    filter mixes (the >= 64x64 all-Paeth/all-Average cases force the
    wavefront; rotations and small dims force the scalar path)."""
    import random

    import numpy as np

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _WAVEFRONT_MIN_ROWS,
        _WAVEFRONT_MIN_WIDTH,
        _paeth,
        _png_reconstruct,
    )

    rng = random.Random(99)
    cases = [(7, 5, 3), (33, 17, 4), (2, 9, 3), (9, 1, 1), (1, 9, 3), (2, 2, 3),
             (5, 40, 3), (40, 5, 1), (20, 30, 4),
             # at/above the wavefront trigger (k >= 64 rows, w >= 64)
             (64, 64, 3), (70, 80, 1), (65, 100, 4), (128, 64, 3)]
    assert (64, 64) >= (_WAVEFRONT_MIN_WIDTH, _WAVEFRONT_MIN_ROWS)
    for _ in range(15):
        cases.append((rng.randint(1, 50), rng.randint(1, 50), rng.choice([1, 3, 4])))
    for w, h, bpp in cases:
        stride = w * bpp
        raw = bytes(rng.randrange(256) for _ in range(h * stride))
        # big images always take a sequential-filter mode so the run is
        # maximal and the wavefront path is the one under test
        mode = (rng.choice(["allpaeth", "allavg"])
                if w >= _WAVEFRONT_MIN_WIDTH and h >= _WAVEFRONT_MIN_ROWS
                else rng.choice(["random", "allpaeth", "allavg", "rot"]))
        fts = {"allpaeth": [4] * h, "allavg": [3] * h,
               "rot": [r % 5 for r in range(h)]}.get(
            mode, [rng.randrange(5) for _ in range(h)])
        body = bytearray()
        prior = bytes(stride)
        for r in range(h):
            row = raw[r * stride : (r + 1) * stride]
            f = fts[r]
            body.append(f)
            left = lambda i: row[i - bpp] if i >= bpp else 0  # noqa: E731
            upleft = lambda i: prior[i - bpp] if i >= bpp else 0  # noqa: E731
            if f == 0:
                body += row
            elif f == 1:
                body += bytes((row[i] - left(i)) & 0xFF for i in range(stride))
            elif f == 2:
                body += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
            elif f == 3:
                body += bytes((row[i] - (left(i) + prior[i]) // 2) & 0xFF
                              for i in range(stride))
            else:
                body += bytes((row[i] - _paeth(left(i), prior[i], upleft(i))) & 0xFF
                              for i in range(stride))
            prior = row
        assert _png_reconstruct(bytes(body), w, h, bpp) == raw, (w, h, bpp, mode)
    # invalid filter byte still quarantines
    bad = bytes([7]) + bytes(12)
    assert _png_reconstruct(bad, 4, 1, 3) is None
    assert isinstance(np.add.accumulate(np.array([[250], [10]], np.uint8),
                                        axis=0, dtype=np.uint8)[1, 0], np.uint8)


def test_png_reconstruct_wavefront_blocking_agrees(monkeypatch):
    """Round 10: long wavefront runs are processed in bounded-pixel
    blocks (prior row carried between blocks) so a max-size all-Paeth
    payload can't stage an unbounded int16 working set. Force tiny
    blocks and require byte-identity with the unblocked result."""
    import random

    from amazon_macie_activity_generator_spark.operators import multimodal as mm

    rng = random.Random(4)
    w, h, bpp = 80, 300, 3
    stride = w * bpp
    raw = bytes(rng.randrange(256) for _ in range(h * stride))
    body = bytearray()
    prior = bytes(stride)
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        body.append(4)
        left = lambda i: row[i - bpp] if i >= bpp else 0  # noqa: E731
        upleft = lambda i: prior[i - bpp] if i >= bpp else 0  # noqa: E731
        body += bytes(
            (row[i] - mm._paeth(left(i), prior[i], upleft(i))) & 0xFF
            for i in range(stride)
        )
        prior = row
    unblocked = mm._png_reconstruct(bytes(body), w, h, bpp)
    assert unblocked == raw
    # ~2 blocks of 80 rows + remainder (max() floors the block at 64 rows)
    monkeypatch.setattr(mm, "_WAVEFRONT_BLOCK_PX", 80 * 80)
    assert mm._png_reconstruct(bytes(body), w, h, bpp) == raw
    # the floor case (BLOCK_PX // w < _WAVEFRONT_MIN_ROWS): the tail must
    # NOT fold into the 64-row floor block (it would breach the px
    # budget) yet still reconstruct exactly as its own block
    monkeypatch.setattr(mm, "_WAVEFRONT_BLOCK_PX", 16 * 80)
    assert mm._png_reconstruct(bytes(body), w, h, bpp) == raw


# ----------------------------------------------------------------- gif


def test_gif_lzw_round_trips():
    """From-scratch GIF LZW: random + repetitive index streams across
    palette depths, long enough to force code-width growth AND a
    dictionary-full CLEAR/restart (the 4096 cap)."""
    import random

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(7)
    for min_size in (2, 4, 8):
        maxi = (1 << min_size) - 1
        for idx in (
            bytes(rng.randint(0, maxi) for _ in range(10)),
            bytes([maxi] * 5000),                               # deep dict chains
            bytes(rng.randint(0, maxi) for _ in range(20000)),  # width growth + clear
            bytes([0]),
        ):
            enc = _gif_lzw_encode(idx, min_size)
            assert _gif_lzw_decode(enc, min_size, len(idx)) == idx


def test_gif_file_round_trip():
    import random

    from amazon_macie_activity_generator_spark.operators.multimodal import _gif_encode

    rng = random.Random(3)
    pal = bytes(range(48))  # 16 colors
    idx = bytes(rng.randint(0, 15) for _ in range(37 * 23))
    out = decode_pixels_bytes(_gif_encode(idx, pal, 37, 23))
    assert out is not None
    fmt, w, h, raw = out
    assert (fmt, w, h) == ("gif", 37, 23)
    assert raw == b"".join(pal[i * 3 : i * 3 + 3] for i in idx)


def test_gif_real_world_interop():
    """The canonical 1x1 GIF (produced by a real encoder, not our own
    twin): proves the LZW decoder reads streams we didn't write."""
    import base64

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert decode_pixels_bytes(tiny) == ("gif", 1, 1, b"\x00\x00\x00")


def test_gif_decodes_hand_authored_spec_stream():
    """A variable-width LZW stream authored BY HAND from the GIF89a spec
    (not by the encoder twin): CLEAR, a KwKwK code (code == next_code),
    dictionary growth across the 3->4 bit width boundary, END. Codes
    (4,1,6,7,2,5) at widths (3,3,3,3,4,4) decode to indices 1,1,1,1,1,1,2
    and pack LSB-first into bytes 8C 2F 05 — a decoder with the twin's
    hypothetical off-by-one in width-growth timing cannot read this."""
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    gif = (
        b"GIF89a"
        + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x81, 0, 0])          # GCT present, 4 colors
        + pal
        + b"\x2c" + bytes(4)
        + (7).to_bytes(2, "little") + (1).to_bytes(2, "little") + b"\x00"
        + bytes([2])                    # LZW min code size
        + bytes([3, 0x8C, 0x2F, 0x05])  # one 3-byte sub-block
        + b"\x00\x3b"
    )
    out = decode_pixels_bytes(gif)
    assert out is not None
    fmt, w, h, raw = out
    assert (fmt, w, h) == ("gif", 7, 1)
    assert raw == bytes([40, 50, 60]) * 6 + bytes([70, 80, 90])


def test_gif_hostile_variants_quarantine():
    import time

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode,
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    pal = bytes(range(12))  # 4 colors
    good = bytearray(_gif_encode(bytes([0, 1, 2, 3]), pal, 2, 2))
    desc = good.index(0x2C, 6)
    # interlace flag on a non-interlaced stream still DECODES (row
    # reorder only — the data is structurally valid); it must not raise
    # and must keep dims (the interlaced round-trip test pins values)
    flagged = bytearray(good)
    flagged[desc + 9] |= 0x40
    out = decode_pixels_bytes(bytes(flagged))
    assert out is not None and out[1:3] == (2, 2)
    # truncated LZW data
    assert decode_pixels_bytes(bytes(good[: len(good) // 2])) is None
    # ANIMATED: splice a second full-frame image block before the trailer —
    # multi-frame media is the video class and must quarantine, not decode
    # silently to frame 1
    img_block = bytes(good[desc:-1])  # descriptor..data terminator
    animated = bytes(good[:-1]) + img_block + b"\x3b"
    assert decode_pixels_bytes(animated) is None
    # index beyond the declared palette: stream encodes index 3 but the
    # GCT claims only 2 colors — the bounds guard must reject, not crash
    lzw = _gif_lzw_encode(bytes([3, 0, 1]), 2)
    small_pal_gif = (
        b"GIF89a" + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x80, 0, 0])  # GCT present, size field 0 -> 2 colors
        + bytes(6)
        + b"\x2c" + bytes(4)
        + (3).to_bytes(2, "little") + (1).to_bytes(2, "little") + b"\x00"
        + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00\x3b"
    )
    assert decode_pixels_bytes(small_pal_gif) is None
    # CLEAR-spam DoS: a megabyte of CLEAR codes for a 4-pixel image must
    # be rejected up front (size bound), not ground through per-code
    t0 = time.monotonic()
    assert _gif_lzw_decode(b"\x24" * 1_000_000, 2, 4) is None
    assert time.monotonic() - t0 < 0.1


# ------------------------------------------------------------ spark stage


def test_decode_pixels_stage_matches_arithmetic(spark, sf_dir):
    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 60"
    )
    rows = decode_pixels(synthetic_pixel_media(ids)).collect()
    assert len(rows) == 60
    for r in rows:
        i = r.media_id
        w, h = 1 + i % 32, 1 + i % 24
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        if i % 8 == 4:
            assert r.fmt == "tga"  # r13 sub-route of the BMP slice
        elif i % 8 == 5:
            assert r.fmt == "qoi"  # r13 sub-route of the PPM slice
        elif i % 8 == 7:
            assert r.fmt == "tiff"  # r13 sub-route of the GIF slice
        else:
            assert r.fmt == {0: "bmp", 1: "ppm", 2: "png", 3: "gif"}[i % 4]
        expected = [0, 0, 0]
        for j in range(w * h * 3):
            expected[j % 3] += (i + j) % 256
        assert (r.r_sum, r.g_sum, r.b_sum) == tuple(expected)
        assert r.pixel_sha256 == hashlib.sha256(_raw_fill(i, w, h)).hexdigest()


def test_palette_media_stage_matches_arithmetic(spark, sf_dir):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_palette_media,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id < 40"
    )
    rows = decode_pixels(synthetic_palette_media(ids)).collect()
    assert len(rows) == 40
    for r in rows:
        i = r.media_id
        w, h = 1 + i % 32, 1 + i % 24
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("png", w, h, w * h)
        expected = [0, 0, 0]
        for p in range(w * h):
            k = (i + p) % 256
            expected[0] += (3 * k + i) % 256
            expected[1] += (5 * k + 2 * i) % 256
            expected[2] += (7 * k + 3 * i) % 256
        assert (r.r_sum, r.g_sum, r.b_sum) == tuple(expected)


def test_decode_pixels_quarantines_garbage(spark):
    import pandas as pd

    pdf = pd.DataFrame({
        "media_id": pd.array([1, 2, None], dtype="Int64"),
        "kind": ["image"] * 3,
        "payload": [b"not an image at all", None, _ppm_encode(_raw_fill(0, 1, 1), 1, 1)],
        "source_uri": ["x"] * 3,
    })
    from amazon_macie_activity_generator_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = {r.media_id: r for r in decode_pixels(media).collect()}
    assert rows[1].fmt is None and rows[1].r_sum is None   # garbage -> NULL stats
    assert rows[2].fmt is None                              # NULL payload
    assert rows[None].fmt == "ppm" and rows[None].n_pixels == 1  # id survives as NULL


def test_synthetic_pixel_media_null_id(spark):
    import pandas as pd

    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": pd.array([5, None], dtype="Int64")})
    )
    rows = {r.media_id: r for r in synthetic_pixel_media(ids).collect()}
    assert set(rows) == {5, None}
    # NULL id synthesizes deterministically as id 0 but keeps media_id NULL
    assert bytes(rows[None].payload) == _bmp_encode(_raw_fill(0, 1, 1), 1, 1)


# ------------------------------------------------- animated GIF frame sampling


def _frames_fixture(n, w, h, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=w * h).astype(np.uint8).tobytes()
            for _ in range(n)]


def test_gif_animated_frames_decode_exact():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _GIF_FILL_PALETTE,
        _decode_gif_frames,
        _gif_encode_animated,
    )
    w, h = 5, 4
    idxs = _frames_fixture(3, w, h, seed=1)
    b = _gif_encode_animated(idxs, _GIF_FILL_PALETTE, w, h,
                             delays_cs=[10, 20, 30])
    out = _decode_gif_frames(b, max_frames=16)
    assert out is not None
    gw, gh, frames = out
    assert (gw, gh) == (w, h) and len(frames) == 3
    pal = np.frombuffer(_GIF_FILL_PALETTE, np.uint8).reshape(-1, 3)
    for (delay, rgb), idx, exp_delay in zip(frames, idxs, (100, 200, 300)):
        assert delay == exp_delay
        assert rgb == pal[np.frombuffer(idx, np.uint8)].tobytes()


def test_gif_animated_interlaced_frames_round_trip():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _GIF_FILL_PALETTE,
        _decode_gif_frames,
        _gif_encode_animated,
    )
    w, h = 7, 9
    idxs = _frames_fixture(2, w, h, seed=2)
    plain = _decode_gif_frames(
        _gif_encode_animated(idxs, _GIF_FILL_PALETTE, w, h), 16)
    inter = _decode_gif_frames(
        _gif_encode_animated(idxs, _GIF_FILL_PALETTE, w, h, interlace=True),
        16)
    assert plain is not None and inter is not None
    assert [rgb for _, rgb in inter[2]] == [rgb for _, rgb in plain[2]]


def _pal4():
    # 4 colors: index p -> (10p+10, 10p+10, 10p+10); bg index 0 -> 10s
    return bytes(v for p in range(4) for v in (10 * p + 10,) * 3)


def _screens(b, max_frames=None):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
    )
    out = _decode_gif_frames(b, max_frames)
    assert out is not None
    w, h, frames = out
    return [np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
            for _, rgb in frames]


def test_gif_partial_frame_composites_onto_screen():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    # frame 0: full 4x4 of index 0; frame 1: 2x2 of index 1 at (1,1)
    b = _gif_encode_animated(
        [bytes(16), bytes([1] * 4)], _pal4(), 4, 4,
        rects=[None, (1, 1, 2, 2)],
    )
    s0, s1 = _screens(b)
    assert (s0 == 10).all()
    want = np.full((4, 4, 3), 10, np.uint8)
    want[1:3, 1:3] = 20
    assert np.array_equal(s1, want)


def test_gif_first_frame_partial_shows_background_elsewhere():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    # bg index is 0 (palette -> 10s); a lone 1x1 frame of index 2 at (3,0)
    b = _gif_encode_animated([bytes([2])], _pal4(), 4, 2,
                             rects=[(3, 0, 1, 1)])
    (s0,) = _screens(b)
    want = np.full((2, 4, 3), 10, np.uint8)
    want[0, 3] = 30
    assert np.array_equal(s0, want)


def test_gif_transparency_passes_prior_screen_through():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    # frame 0: full index 1 (20s); frame 1: checkerboard of transparent
    # index 3 and opaque index 2 -> 30s where opaque, 20s show through
    checker = bytes((3 if (i + i // 4) % 2 else 2) for i in range(16))
    b = _gif_encode_animated(
        [bytes([1] * 16), checker], _pal4(), 4, 4,
        transparent=True, transparent_idx=3,
    )
    s0, s1 = _screens(b)
    assert (s0 == 20).all()
    for i in range(16):
        r, c = divmod(i, 4)
        expect = 20 if (i + r) % 2 else 30
        assert (s1[r, c] == expect).all(), (r, c)


def test_gif_transparent_index_may_exceed_palette():
    # the LZW min code size is a free byte, so a stream may carry pixel
    # values beyond the 4-entry color table (min_size 8 -> roots 0..255).
    # tidx=200 pixels are never looked up (transparent, legal); the same
    # pixels WITHOUT transparency are an out-of-table lookup: quarantine
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
        _gif_frame_block,
        _gif_screen_header,
    )
    header, _ = _gif_screen_header(_pal4(), 4, 4)
    mixed = bytes([200, 1] * 8)
    gce = lambda packed: b"\x21\xf9\x04" + bytes([packed, 0, 0, 200, 0])  # noqa: E731
    base = _gif_frame_block(bytes([1] * 16), 4, 4, 8, False)
    patch = _gif_frame_block(mixed, 4, 4, 8, False)
    transparent = header + gce(1) + base + gce(1) + patch + b"\x3b"
    s0, s1 = _screens(transparent)
    assert np.array_equal(s0, s1)  # transparent cells show frame 0
    opaque = header + gce(0) + patch + b"\x3b"
    assert _decode_gif_frames(opaque) is None


def test_gif_disposal_2_restores_background_region():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    # frame 0: full index 1, disposal 2 -> after snapshot the FULL rect
    # (here the whole screen) resets to bg (10s); frame 1: 1x1 of index
    # 3 at (0,0) -> screen shows 40 there and bg 10 elsewhere
    b = _gif_encode_animated(
        [bytes([1] * 16), bytes([3])], _pal4(), 4, 4,
        rects=[None, (0, 0, 1, 1)], disposals=[2, 0],
    )
    s0, s1 = _screens(b)
    assert (s0 == 20).all()
    want = np.full((4, 4, 3), 10, np.uint8)
    want[0, 0] = 40
    assert np.array_equal(s1, want)


def test_gif_disposal_3_restores_previous_screen():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    # frame 0: full index 1; frame 1: full index 2 with disposal 3
    # (restore previous); frame 2: 1x1 index 3 at (1,1) -> composited
    # over the RESTORED frame-0 screen, not over frame 1
    b = _gif_encode_animated(
        [bytes([1] * 16), bytes([2] * 16), bytes([3])], _pal4(), 4, 4,
        rects=[None, None, (1, 1, 1, 1)], disposals=[0, 3, 0],
    )
    s0, s1, s2 = _screens(b)
    assert (s0 == 20).all() and (s1 == 30).all()
    want = np.full((4, 4, 3), 20, np.uint8)
    want[1, 1] = 40
    assert np.array_equal(s2, want)


def test_gif_reserved_disposal_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
        _gif_encode_animated,
    )
    b = _gif_encode_animated([bytes(16)], _pal4(), 4, 4, disposals=[4])
    assert _decode_gif_frames(b) is None


def test_gif_frame_rect_outside_screen_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
        _gif_encode_animated,
    )
    b = _gif_encode_animated([bytes(4)], _pal4(), 4, 4,
                             rects=[(3, 3, 2, 2)])
    assert _decode_gif_frames(b) is None


def test_gif_interlaced_partial_frame_composites_correctly():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )
    rng = np.random.RandomState(9)
    patch = rng.randint(0, 4, size=5 * 6).astype(np.uint8).tobytes()
    plain = _gif_encode_animated(
        [bytes(8 * 9), patch], _pal4(), 8, 9, rects=[None, (2, 3, 6, 5)])
    inter = _gif_encode_animated(
        [bytes(8 * 9), patch], _pal4(), 8, 9, rects=[None, (2, 3, 6, 5)],
        interlace=True)
    # the interlace four-pass scatter runs over the FRAME's own 5 rows;
    # both encodings must composite to the same screens
    for a, b_ in zip(_screens(plain), _screens(inter)):
        assert np.array_equal(a, b_)


def test_gif_frame_decode_budget_bounds_work():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _GIF_FILL_PALETTE,
        _decode_gif_frames,
        _gif_encode_animated,
    )
    idxs = _frames_fixture(10, 4, 4, seed=4)
    out = _decode_gif_frames(
        _gif_encode_animated(idxs, _GIF_FILL_PALETTE, 4, 4), max_frames=3)
    assert out is not None and len(out[2]) == 3  # rest parsed past


def test_sample_frames_real_gif(spark):
    import pandas as pd

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _GIF_FILL_PALETTE,
        MEDIA_SCHEMA,
        _gif_encode_animated,
        sample_frames,
    )

    w, h = 4, 3
    idxs = _frames_fixture(5, w, h, seed=5)
    # delays 40cs = 400ms each: frames at 0/400/800/1200/1600ms;
    # every_ms=1000 samples frame 0 (t=0), frame 3 (t=1200 >= 1000),
    # then next boundary 2000 > 1600 -> done
    animated = _gif_encode_animated(idxs, _GIF_FILL_PALETTE, w, h,
                                    delays_cs=[40] * 5)
    pdf = pd.DataFrame({
        "media_id": pd.array([1, 2, 3], dtype="Int64"),
        "kind": "video",
        "payload": [animated, b"definitely not media", None],
        "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = sample_frames(media, every_ms=1000, max_frames=16,
                         decode_stub=False).collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert [(r["frame_idx"], r["ts_ms"]) for r in
            sorted(by_media[1], key=lambda r: r["frame_idx"])] == \
        [(0, 0), (3, 1200)]
    pal = np.frombuffer(_GIF_FILL_PALETTE, np.uint8).reshape(-1, 3)
    frame0 = sorted(by_media[1], key=lambda r: r["frame_idx"])[0]
    assert bytes(frame0["frame_payload"]) == \
        pal[np.frombuffer(idxs[0], np.uint8)].tobytes()
    # garbage and NULL payloads: one NULL-fields quarantine row each
    for mid in (2, 3):
        assert len(by_media[mid]) == 1
        assert by_media[mid][0]["frame_idx"] is None
        assert by_media[mid][0]["frame_payload"] is None


def test_sample_frames_true_video_container_stays_loud(spark):
    import pandas as pd
    import pytest as _pytest

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    mp4ish = bytes(4) + b"ftyp" + b"isom" + bytes(16)
    pdf = pd.DataFrame({
        "media_id": pd.array([1], dtype="Int64"),
        "kind": "video",
        "payload": [mp4ish],
        "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    with _pytest.raises(Exception):  # NotImplementedError crosses Py4J
        sample_frames(media, decode_stub=False).collect()


def test_sample_frames_stub_mode_unchanged(spark):
    import pandas as pd

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    pdf = pd.DataFrame({
        "media_id": pd.array([7], dtype="Int64"),
        "kind": "video",
        "payload": [b"anything"],
        "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = sample_frames(media, every_ms=1000, max_frames=8).collect()
    assert rows and all(r["media_id"] == 7 for r in rows)
    assert [r["frame_idx"] for r in rows] == list(range(len(rows)))


def test_gif_frames_total_pixel_budget_bounds_memory():
    # a 3000x3000 screen (~9M px) with 3 solid frames compresses tiny
    # but would buffer 81MB of RGB without the cumulative budget:
    # 16.7M-px cap / 9M px -> only frame 0 decodes, the rest parse past
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
        _gif_encode_animated,
    )
    w = h = 3000
    solid = bytes(w * h)  # index 0 everywhere -> tiny LZW
    pal = bytes(6)  # 2 colors
    b = _gif_encode_animated([solid] * 3, pal, w, h, delays_cs=[10] * 3)
    out = _decode_gif_frames(b, max_frames=16)
    assert out is not None
    assert len(out[2]) == 1  # budget = _MAX_PIXELS total decoded pixels


def test_sample_frames_rejects_nonpositive_knobs(spark):
    import pandas as pd
    import pytest as _pytest

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    pdf = pd.DataFrame({
        "media_id": pd.array([1], dtype="Int64"),
        "kind": "video", "payload": [b"x"], "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    with _pytest.raises(ValueError):
        sample_frames(media, every_ms=0, decode_stub=False)
    with _pytest.raises(ValueError):
        sample_frames(media, max_frames=0)


# ------------------------------------------------------ TGA + QOI (r13)


def test_tga_roundtrip_all_variants():
    """Every (RLE, origin, bpp) combination decodes back to the exact
    top-down RGB input."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tga_encode,
    )

    rng = np.random.default_rng(7)
    for rle in (False, True):
        for td in (False, True):
            for b32 in (False, True):
                w, h = 13, 9
                raw = rng.integers(0, 256, w * h * 3,
                                   dtype=np.uint8).tobytes()
                out = decode_pixels_bytes(
                    _tga_encode(raw, w, h, rle=rle, top_down=td, bpp32=b32))
                assert out == ("tga", w, h, raw), (rle, td, b32)


def test_tga_rle_run_packets_compress_and_roundtrip():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tga_encode,
    )

    rng = np.random.default_rng(8)
    raw = bytes([7, 8, 9]) * 50 + rng.integers(
        0, 256, 150, dtype=np.uint8).tobytes()
    rle = _tga_encode(raw, 10, 10, rle=True)
    flat = _tga_encode(raw, 10, 10, rle=False)
    assert len(rle) < len(flat)  # the run actually compressed
    assert decode_pixels_bytes(rle) == ("tga", 10, 10, raw)


def test_tga_requires_v2_footer_for_sniffing():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tga_pixels,
        _tga_encode,
    )

    raw = bytes((2 * j) % 256 for j in range(13 * 2 * 3))
    tga = _tga_encode(raw, 13, 2)
    assert decode_pixels_bytes(tga) is not None
    # strip the footer: no magic anywhere -> unsniffable, quarantined
    assert decode_pixels_bytes(tga[:-26]) is None
    assert _decode_tga_pixels(tga[:-26]) is None


def test_tga_hostile_variants_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tga_encode,
    )

    raw = bytes(13 * 2 * 3)
    tga = _tga_encode(raw, 13, 2)
    # color-mapped type
    assert decode_pixels_bytes(tga[:1] + b"\x01" + tga[2:]) is None
    # grayscale image type 3
    assert decode_pixels_bytes(tga[:2] + b"\x03" + tga[3:]) is None
    # 16-bpp depth
    assert decode_pixels_bytes(tga[:16] + b"\x10" + tga[17:]) is None
    # truncated pixel data (footer re-appended so sniffing still hits)
    assert decode_pixels_bytes(tga[:30] + tga[-26:]) is None
    # RLE packet overrunning the declared pixel count
    rle = bytearray(_tga_encode(raw, 13, 2, rle=True))
    rle[18] = 0x80 | 127  # first packet now claims a 128-pixel run
    assert decode_pixels_bytes(bytes(rle)) is None


def test_qoi_roundtrip_content_shapes():
    """Random, run-heavy, palette-ish, grammar-fill, and all-zero
    (first-pixel run from the initial decoder state) images all
    roundtrip exactly through the full op set."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _qoi_encode,
        _raw_fill,
    )

    rng = np.random.default_rng(9)
    for raw in [
        rng.integers(0, 256, 17 * 11 * 3, dtype=np.uint8).tobytes(),
        bytes([5, 5, 5]) * 120 + bytes([9, 1, 2]) * 67,
        bytes([(p % 4) * 60 for p in range(17 * 11 * 3)]),
        _raw_fill(37, 17, 11),
        bytes(17 * 11 * 3),
    ]:
        assert decode_pixels_bytes(
            _qoi_encode(raw, 17, 11)) == ("qoi", 17, 11, raw)


def test_qoi_rgba_channels_accepted_alpha_dropped():
    """A channels=4 header with RGBA ops decodes with the alpha byte
    dropped (the 32-bpp BMP/TGA opaque-view convention)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_qoi_pixels,
    )

    # hand-assembled 2x1 RGBA stream: RGBA(10,20,30,40), RGB(50,60,70)
    q = (b"qoif" + (2).to_bytes(4, "big") + (1).to_bytes(4, "big")
         + bytes([4, 0])
         + bytes([0xFF, 10, 20, 30, 40])
         + bytes([0xFE, 50, 60, 70])
         + b"\x00" * 7 + b"\x01")
    assert _decode_qoi_pixels(q) == (2, 1, bytes([10, 20, 30, 50, 60, 70]))


def test_qoi_hostile_variants_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _qoi_encode,
    )

    raw = bytes(range(36))
    q = _qoi_encode(raw, 4, 3)
    assert decode_pixels_bytes(q) == ("qoi", 4, 3, raw)
    # missing end marker
    assert decode_pixels_bytes(q[:-8]) is None
    # truncated op stream (end marker re-appended)
    assert decode_pixels_bytes(q[:15] + q[-8:]) is None
    # zero dims / bad channels
    assert decode_pixels_bytes(q[:4] + bytes(4) + q[8:]) is None
    assert decode_pixels_bytes(q[:12] + b"\x05" + q[13:]) is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_tga_qoi_never_raise(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _qoi_encode,
        _raw_fill,
        _tga_encode,
    )

    for payload in (
        bytearray(_tga_encode(_raw_fill(11, 9, 7), 9, 7, rle=True)),
        bytearray(_qoi_encode(_raw_fill(12, 9, 7), 9, 7)),
    ):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = decode_pixels_bytes(bytes(payload))
        assert out is None or (len(out) == 4 and
                               len(out[3]) == out[1] * out[2] * 3)


# ----------------------------------------------------------- TIFF (r13)


def test_tiff_roundtrip_all_variants():
    """Every (compression, byte order, strip layout) combination decodes
    back to the exact top-down RGB input — including single-row strips."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_encode,
    )

    rng = np.random.default_rng(11)
    for pb in (False, True):
        for be in (False, True):
            for rps in (0, 3, 1):
                w, h = 13, 9
                raw = rng.integers(0, 256, w * h * 3,
                                   dtype=np.uint8).tobytes()
                out = decode_pixels_bytes(_tiff_encode(
                    raw, w, h, packbits=pb, big_endian=be,
                    rows_per_strip=rps))
                assert out == ("tiff", w, h, raw), (pb, be, rps)


def test_tiff_packbits_compresses_and_roundtrips():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
        _tiff_encode,
    )

    rng = np.random.default_rng(12)
    runs = bytes([5]) * 180 + rng.integers(
        0, 256, 120, dtype=np.uint8).tobytes()
    pb = _tiff_encode(runs, 10, 10, packbits=True)
    assert len(pb) < len(_tiff_encode(runs, 10, 10))
    assert decode_pixels_bytes(pb) == ("tiff", 10, 10, runs)
    # PackBits edges: empty, literal/run boundaries, 128-byte caps
    for data in (b"", b"a", b"ab", b"aaa", b"a" * 200,
                 bytes(range(256)) * 2, b"ab" + b"c" * 129 + b"de"):
        enc = _packbits_encode(data)
        assert _packbits_decode(enc, 0, len(enc), len(data)) == data


def test_tiff_grayscale_expands_to_rgb():
    """photometric 1 / 1 sample-per-pixel expands g -> (g, g, g), the
    PNG grayscale convention."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _tiff_encode,
    )

    w, h = 6, 4
    gray = bytes((11 * j + 5) % 256 for j in range(w * h))
    # hand-patch an RGB twin down to gray: rewrite the IFD fields
    t = bytearray(_tiff_encode(bytes(
        v for g in gray for v in (g, g, g)), w, h))
    # easier: build gray by editing SamplesPerPixel/Photometric/BPS
    # count and replacing the strip — instead assemble directly:
    bo = "little"
    def u16(v): return v.to_bytes(2, bo)
    def u32(v): return v.to_bytes(4, bo)
    entries = [
        (256, 3, 1, u16(w) + b"\x00\x00"),
        (257, 3, 1, u16(h) + b"\x00\x00"),
        (258, 3, 1, u16(8) + b"\x00\x00"),
        (259, 3, 1, u16(1) + b"\x00\x00"),
        (262, 3, 1, u16(1) + b"\x00\x00"),
        (273, 4, 1, u32(8 + 2 + 12 * 8 + 4)),
        (277, 3, 1, u16(1) + b"\x00\x00"),
        (279, 4, 1, u32(len(gray))),
    ]
    g = bytearray(b"II\x2a\x00" + u32(8) + u16(len(entries)))
    for tag, typ, cnt, val in entries:
        g += u16(tag) + u16(typ) + u32(cnt) + val
    g += u32(0) + gray
    out = _decode_tiff_pixels(bytes(g))
    assert out == (w, h, b"".join(bytes([v, v, v]) for v in gray))


def test_tiff_hostile_variants_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_encode,
    )

    raw = bytes(13 * 2 * 3)
    t = _tiff_encode(raw, 13, 2)
    ifd = 8 + 2  # first entry
    def patch_entry_value(buf, tag, newval16):
        b2 = bytearray(buf)
        n = int.from_bytes(b2[8:10], "little")
        for k in range(n):
            e = 10 + 12 * k
            if int.from_bytes(b2[e:e+2], "little") == tag:
                b2[e + 8 : e + 10] = newval16.to_bytes(2, "little")
                return bytes(b2)
        raise AssertionError(tag)
    # declared-LZW (5) over raw strip bytes: no opening Clear -> None
    assert decode_pixels_bytes(patch_entry_value(t, 259, 5)) is None
    # compression 7 demands photometric 6 — this file declares RGB (2)
    assert decode_pixels_bytes(patch_entry_value(t, 259, 7)) is None
    # planar configuration 2
    assert decode_pixels_bytes(patch_entry_value(t, 284, 2)) is None
    # palette photometric (3)
    assert decode_pixels_bytes(patch_entry_value(t, 262, 3)) is None
    # truncated strip data
    assert decode_pixels_bytes(t[:-10]) is None
    # IFD count pointing past the buffer
    b2 = bytearray(t)
    b2[8:10] = (999).to_bytes(2, "little")
    assert decode_pixels_bytes(bytes(b2)) is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_tiff_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _raw_fill,
        _tiff_encode,
    )

    for payload in (
        bytearray(_tiff_encode(_raw_fill(15, 9, 7), 9, 7, packbits=True,
                               rows_per_strip=3)),
        bytearray(_tiff_encode(_raw_fill(23, 9, 7), 9, 7,
                               big_endian=True)),
    ):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = decode_pixels_bytes(bytes(payload))
        assert out is None or (len(out) == 4 and
                               len(out[3]) == out[1] * out[2] * 3)


# ------------------------------------------------- TIFF LZW/tiles (r13)


def test_tiff_lzw_roundtrip_all_variants():
    """LZW x predictor-2 x tiled x byte order over shapes that exercise
    exact-tile, padded-edge-tile, and sub-tile geometries."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_encode,
    )

    rng = np.random.default_rng(13)
    for w, h in ((16, 16), (20, 20), (33, 17), (3, 5)):
        raw = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        for pred in (False, True):
            for tile in (0, 16):
                for be in (False, True):
                    out = decode_pixels_bytes(_tiff_encode(
                        raw, w, h, lzw=True, predictor2=pred,
                        big_endian=be, tile=tile,
                        rows_per_strip=0 if tile else 5))
                    assert out == ("tiff", w, h, raw), (w, h, pred, tile, be)
    # predictor-2 and tiles also compose with PackBits / uncompressed
    raw = rng.integers(0, 256, 20 * 20 * 3, dtype=np.uint8).tobytes()
    for pb in (False, True):
        out = decode_pixels_bytes(_tiff_encode(
            raw, 20, 20, packbits=pb, predictor2=True, tile=16))
        assert out == ("tiff", 20, 20, raw), pb


def test_tiff_lzw_codec_golden_and_boundaries():
    """Golden pins freeze the bit-level conventions (MSB-first packing,
    opening Clear, EOI, zero-pad) AND the early-change width timing: a
    GIF-timed pair would still round-trip, so byte-identity over a
    width-crossing buffer is what actually pins the TIFF rule. The tiny
    vector is hand-checked: codes 256,7,258,258,257 at 9 bits."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    assert _tiff_lzw_encode(b"\x07" * 5) == b"\x80\x01\xe0P(\x08"
    assert _tiff_lzw_encode(b"") == b"\x80@@"
    # crosses the 9->10 early-change boundary (>253 table entries)
    buf = bytes((i * 31 + (i >> 5)) % 256 for i in range(2000))
    enc = _tiff_lzw_encode(buf)
    assert hashlib.md5(enc).hexdigest() == "be638a4d560f1c7850f552a2ad59f00f"
    assert _tiff_lzw_decode(enc, 0, len(enc), 2000) == buf
    # crosses every width boundary plus the 4094-entry Clear restart
    big = bytes((i * 131 + (i >> 3) * 17) % 256 for i in range(30000))
    enc = _tiff_lzw_encode(big)
    assert hashlib.md5(enc).hexdigest() == "9b485071ec3a141532412ee518fc3dbf"
    assert _tiff_lzw_decode(enc, 0, len(enc), 30000) == big
    # exact sizes around the first width bump round-trip too
    for n in (250, 253, 254, 255, 256, 260, 509, 520):
        data = bytes((7 * i) % 251 for i in range(n))
        e = _tiff_lzw_encode(data)
        assert _tiff_lzw_decode(e, 0, len(e), n) == data, n


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(min_size=0, max_size=4096))
def test_tiff_lzw_roundtrip_fuzz(data):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    enc = _tiff_lzw_encode(data)
    assert _tiff_lzw_decode(enc, 0, len(enc), len(data)) == data


def test_tiff_lzw_hostile_streams_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    enc = _tiff_lzw_encode(b"hello world, hello world")
    # truncation: bits run out before cap bytes decode
    assert _tiff_lzw_decode(enc, 0, len(enc) - 2, 24) is None
    # asking for more than the stream carries hits EOI -> None
    assert _tiff_lzw_decode(enc, 0, len(enc), 25) is None
    # stream that does not open with Clear (9-bit code 0 first)
    assert _tiff_lzw_decode(b"\x00" * 8, 0, 8, 4) is None
    # code beyond the dictionary right after Clear: 100000000 100000010
    bad = bytes([0b10000000, 0b01000000, 0b10000000, 0])
    assert _tiff_lzw_decode(bad, 0, len(bad), 4) is None
    # empty stream
    assert _tiff_lzw_decode(b"", 0, 0, 1) is None


def test_tiff_tiled_and_predictor_hostile_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _raw_fill,
        _tiff_encode,
    )

    raw = _raw_fill(9, 20, 20)
    t = _tiff_encode(raw, 20, 20, lzw=True, predictor2=True, tile=16)

    def patch_entry_value(buf, tag, newval16):
        b2 = bytearray(buf)
        n = int.from_bytes(b2[8:10], "little")
        for k in range(n):
            e = 10 + 12 * k
            if int.from_bytes(b2[e : e + 2], "little") == tag:
                b2[e + 8 : e + 10] = newval16.to_bytes(2, "little")
                return bytes(b2)
        raise AssertionError(tag)

    assert _decode_tiff_pixels(t) == (20, 20, raw)
    # predictor 3 (floating point) quarantines
    assert _decode_tiff_pixels(patch_entry_value(t, 317, 3)) is None
    # JPEG-in-TIFF (compression 7): native-codec territory
    assert _decode_tiff_pixels(patch_entry_value(t, 259, 7)) is None
    # tile size 0
    assert _decode_tiff_pixels(patch_entry_value(t, 322, 0)) is None
    # wrong tile grid: TileWidth 32 -> 1x2 tiles declared, 4 stored
    assert _decode_tiff_pixels(patch_entry_value(t, 322, 32)) is None
    # strip AND tile tags at once: malformed
    s = _tiff_encode(raw, 20, 20)
    b2 = bytearray(s)
    n = int.from_bytes(b2[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(b2[e : e + 2], "little") == 278:
            b2[e : e + 2] = (322).to_bytes(2, "little")  # now a tile tag
    assert _decode_tiff_pixels(bytes(b2)) is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_lzw_tiled_tiff_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _raw_fill,
        _tiff_encode,
    )

    for payload in (
        bytearray(_tiff_encode(_raw_fill(31, 20, 18), 20, 18, lzw=True,
                               predictor2=True, tile=16)),
        bytearray(_tiff_encode(_raw_fill(47, 20, 18), 20, 18, lzw=True,
                               big_endian=True, rows_per_strip=7)),
    ):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = decode_pixels_bytes(bytes(payload))
        assert out is None or (len(out) == 4 and
                               len(out[3]) == out[1] * out[2] * 3)


def test_tiff_grammar_slice_covers_new_axes(spark):
    """The id%8==7 grammar slice routes k-bits onto LZW / predictor /
    tiled variants; every such payload still decodes to the raw fill
    (lossless — the catalog oracle's sums never move)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _raw_fill,
        synthetic_pixel_media,
    )

    # k = i//8: 8 (lzw), 9 (lzw+pred), 16/17 (tiled), 24/25 (lzw+tiled),
    # 32/33 (palette / palette+packbits — in the oracle's id < 300 range)
    ids = [71, 79, 135, 143, 199, 207, 263, 271]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_pixel_media(df).collect()}
    for i in ids:
        w, h = 1 + i % 32, 1 + i % 24
        assert _decode_tiff_pixels(rows[i]) == (w, h, _raw_fill(i, w, h)), i
    # the compressed/palette routes actually set the declared tags
    def tag16(b, tag, bo):
        n = int.from_bytes(b[8:10], bo)
        for k in range(n):
            e = 10 + 12 * k
            if int.from_bytes(b[e : e + 2], bo) == tag:
                return int.from_bytes(b[e + 8 : e + 10], bo)
        return None
    assert tag16(rows[71], 259, "little") == 5    # lzw slice
    assert tag16(rows[135], 259, "little") == 1   # tiled, uncompressed
    assert tag16(rows[199], 259, "little") == 5   # lzw + tiled
    assert tag16(rows[263], 262, "little") == 3   # palette photometric
    assert tag16(rows[263], 277, "little") == 1   # 1 sample/pixel
    assert tag16(rows[271], 259, "little") == 32773  # palette+packbits


# -------------------------------------------- TIFF compression 7 (r13)


def _jpeg_slice_file(i: int):
    """Replay the synthetic_jpeg_media grammar for one id: returns the
    bare full-image JFIF stream plus the pieces (w, h, sampling, DC
    arrays, restart/progressive knobs) a TIFF wrap needs."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        jpeg_encode_dc_only,
    )

    if i % 2 == 0:
        w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
        sampling = ((1, 1), (1, 1), (1, 1))
        n_c = (w // 8) * (h // 8)
        n_y = n_c
    else:
        w, h = 16 * (1 + i % 3), 16 * (1 + i % 2)
        sampling = ((2, 2), (1, 1), (1, 1))
        n_c = (w // 16) * (h // 16)
        n_y = 4 * n_c
    dcy = [(i + 7 * b) % 64 - 32 for b in range(n_y)]
    dcb = [(2 * i + 11 * b) % 64 - 32 for b in range(n_c)]
    dcr = [(3 * i + 5 * b) % 64 - 32 for b in range(n_c)]
    full = jpeg_encode_dc_only(
        w, h, [dcy, dcb, dcr], sampling=sampling,
        restart_interval=2 if i % 3 == 1 else 0, progressive=i % 5 == 2)
    return full, w, h, sampling, (dcy, dcb, dcr)


def test_tiff_jpeg_grammar_slice_matches_bare_jfif(spark):
    """Every id%7==3 payload is a TIFF compression-7 container whose
    decode is pixel-identical to the bare-JFIF encode of the same DC
    grammar — across both byte orders and all three strip layouts
    (single full strip / JPEGTables-abbreviated per-MCU-row strips /
    self-contained per-MCU-row strips)."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_jpeg_media,
    )

    # k%3 layouts x k%2 byte orders x (restart, progressive) parities
    ids = [3, 10, 17, 24, 31, 38, 45, 52, 94, 136]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_jpeg_media(df).collect()}
    for i in ids:
        full, w, h, _, _ = _jpeg_slice_file(i)
        got = decode_pixels_bytes(rows[i])
        assert got is not None, i
        fmt, gw, gh, raw = got
        assert (fmt, gw, gh) == ("tiff", w, h), i
        assert raw == decode_jpeg_pixels(full)[2], i
    # non-slice ids keep the bare JFIF route
    df2 = spark.createDataFrame([(4,)], "doc_id long")
    b4 = bytes(synthetic_jpeg_media(df2).collect()[0].payload)
    assert decode_pixels_bytes(b4)[0] == "jpeg"


def test_tiff_jpeg_tables_are_really_abbreviated():
    """The JPEGTables variant must strip every DQT/DHT from the strip
    streams (else the tag-347 splice is untested dead weight): tag 347
    is present, strips carry no table markers, and the decode still
    round-trips through the splice."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _jpeg_abbreviate,
        _tiff_encode,
    )

    i = 10  # k=1 -> JPEGTables layout in the grammar
    full, w, h, sampling, (dcy, dcb, dcr) = _jpeg_slice_file(i)
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        jpeg_encode_dc_only,
    )

    mh = 16 if i % 2 else 8
    ypr, cpr = ((w // 8, w // 8) if i % 2 == 0
                else (4 * (w // 16), w // 16))
    segs = [jpeg_encode_dc_only(
        w, mh,
        [dcy[s * ypr:(s + 1) * ypr], dcb[s * cpr:(s + 1) * cpr],
         dcr[s * cpr:(s + 1) * cpr]],
        sampling=sampling, restart_interval=2 if i % 3 == 1 else 0,
        progressive=i % 5 == 2) for s in range(h // mh)]
    tables = _jpeg_abbreviate(segs[0])[0]
    abbrev = [_jpeg_abbreviate(s)[1] for s in segs]
    assert tables[:2] == b"\xff\xd8" and tables[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in tables and b"\xff\xc4" in tables
    for s in abbrev:
        # scan the marker section (up to first SOS) for table markers
        j = 2
        while s[j + 1] != 0xDA:
            assert s[j + 1] not in (0xDB, 0xC4), hex(s[j + 1])
            j += 2 + int.from_bytes(s[j + 2:j + 4], "big")
        assert len(s) < len(segs[0])
    t = _tiff_encode(b"", w, h, rows_per_strip=mh,
                     jpeg_segments=abbrev, jpeg_tables=tables)
    got = decode_pixels_bytes(t)
    assert got == ("tiff", w, h, decode_jpeg_pixels(full)[2])


def test_tiff_jpeg_tiled_decode():
    """Tile-organized compression 7: each tile is an independent
    16x16 JPEG; edge tiles are full-size and cropped on paste."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        decode_jpeg_pixels,
        jpeg_encode_dc_only,
    )
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _tiff_encode,
    )

    w, h, te = 24, 18, 16  # 2x2 tile grid, both edges cropped
    tiles = []
    expected = np.zeros((32, 32, 3), np.uint8)
    for t in range(4):
        dcs = [[(3 * t + 5 * b) % 64 - 32 for b in range(4)]
               for _ in range(3)]
        tb = jpeg_encode_dc_only(te, te, dcs,
                                 sampling=((1, 1), (1, 1), (1, 1)))
        tiles.append(tb)
        tw_, th_, raw = decode_jpeg_pixels(tb)
        tr, tc = divmod(t, 2)
        expected[tr * te:(tr + 1) * te, tc * te:(tc + 1) * te] = \
            np.frombuffer(raw, np.uint8).reshape(te, te, 3)
    f = _tiff_encode(b"", w, h, tile=te, jpeg_segments=tiles)
    out = _decode_tiff_pixels(f)
    assert out is not None
    assert out[:2] == (w, h)
    assert out[2] == expected[:h, :w].tobytes()


def test_tiff_jpeg_hostile_variants_quarantine():
    """Malformed compression-7 files must return None, never raise:
    bad JPEGTables framing, strips without SOI, streams whose SOF
    geometry disagrees with the strip, predictor 2, photometric 2."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _tiff_encode,
    )

    full, w, h, _, _ = _jpeg_slice_file(3)
    good = _tiff_encode(b"", w, h, rows_per_strip=h,
                        jpeg_segments=[full])
    assert _decode_tiff_pixels(good) is not None

    # JPEGTables without SOI/EOI framing
    bad_tab = _tiff_encode(b"", w, h, rows_per_strip=h,
                           jpeg_segments=[full], jpeg_tables=b"\x00" * 8)
    assert _decode_tiff_pixels(bad_tab) is None
    # segment that is not a JPEG stream
    not_jpeg = _tiff_encode(b"", w, h, rows_per_strip=h,
                            jpeg_segments=[b"\x00" * len(full)])
    assert _decode_tiff_pixels(not_jpeg) is None
    # stream geometry disagrees with the declared strip (h halved)
    wrong_geom = _tiff_encode(b"", w, h * 2, rows_per_strip=h * 2,
                              jpeg_segments=[full])
    assert _decode_tiff_pixels(wrong_geom) is None

    def patch_entry(buf, tag, newval16):
        b2 = bytearray(buf)
        n = int.from_bytes(b2[8:10], "little")
        for k in range(n):
            e = 10 + 12 * k
            if int.from_bytes(b2[e:e + 2], "little") == tag:
                b2[e + 8:e + 10] = newval16.to_bytes(2, "little")
                return bytes(b2)
        raise AssertionError(tag)

    # photometric 2 (RGB) with compression 7: quarantine
    assert _decode_tiff_pixels(patch_entry(good, 262, 2)) is None
    # predictor 2 never applies to the JPEG route
    pred = _tiff_encode(b"", w, h, rows_per_strip=h,
                        jpeg_segments=[full], predictor2=True)
    assert _decode_tiff_pixels(pred) is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_jpeg_tiff_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _jpeg_abbreviate,
        _tiff_encode,
    )

    full, w, h, _, _ = _jpeg_slice_file(17)   # MM, self-contained strips
    tab, ab = _jpeg_abbreviate(full)
    for payload in (
        bytearray(_tiff_encode(b"", w, h, rows_per_strip=h,
                               jpeg_segments=[full])),
        bytearray(_tiff_encode(b"", w, h, rows_per_strip=h,
                               jpeg_segments=[ab], jpeg_tables=tab)),
    ):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = decode_pixels_bytes(bytes(payload))
        assert out is None or (len(out) == 4 and
                               len(out[3]) == out[1] * out[2] * 3)


# ---------------------------------------------- palette TIFF (late r13)


def test_tiff_palette_roundtrip_all_variants():
    """Photometric-3 palette TIFF: the index stream + 16-bit ColorMap
    (values v*257, reds/greens/blues planes) reconstructs exact RGB
    across compression, predictor, byte-order, and tile variants."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _tiff_encode,
    )

    i = 39
    w, h = 1 + i % 32, 1 + i % 24
    idx = bytes((i + 3 * p) % 256 for p in range(w * h))
    pal = bytes(v for c in range(256)
                for v in (c, (c + 1) % 256, (c + 2) % 256))
    expect = b"".join(
        bytes(((i + 3 * p) % 256, (i + 3 * p + 1) % 256,
               (i + 3 * p + 2) % 256)) for p in range(w * h))
    for kwargs in (dict(), dict(big_endian=True),
                   dict(lzw=True, predictor2=True),
                   dict(packbits=True, rows_per_strip=2),
                   dict(tile=8), dict(tile=16, lzw=True)):
        t = _tiff_encode(idx, w, h, palette=pal, **kwargs)
        assert _decode_tiff_pixels(t) == (w, h, expect), kwargs
        assert decode_pixels_bytes(t)[0] == "tiff"


def test_tiff_palette_colormap_narrowing_and_quarantines():
    """ColorMap 16-bit values narrow by >> 8 (not /257); a missing or
    short ColorMap with photometric 3 quarantines."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _tiff_encode,
    )

    w, h = 4, 3
    idx = bytes(range(w * h))
    pal = bytes(v for c in range(256) for v in (c, 255 - c, c ^ 0x5A))
    t = _tiff_encode(idx, w, h, palette=pal)
    out = _decode_tiff_pixels(t)
    assert out is not None and out[:2] == (w, h)
    # v*257 >> 8 == v: exact round trip through the 16-bit widening
    assert out[2] == b"".join(
        bytes((k, 255 - k, k ^ 0x5A)) for k in idx)

    # photometric 3 without tag 320: quarantine
    b2 = bytearray(t)
    n = int.from_bytes(b2[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(b2[e:e + 2], "little") == 320:
            b2[e:e + 2] = (32000).to_bytes(2, "little")  # unknown tag
    assert _decode_tiff_pixels(bytes(b2)) is None
    # truncated ColorMap count
    b3 = bytearray(t)
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(b3[e:e + 2], "little") == 320:
            b3[e + 4:e + 8] = (100).to_bytes(4, "little")
    assert _decode_tiff_pixels(bytes(b3)) is None


# ------------------------------------------ palette / RLE8 BMP (late r13)


def test_bmp_palette_roundtrip_and_rle8():
    """8-bit palette BMP (BI_RGB and BI_RLE8): indices through the BGRX
    color table reconstruct exact RGB; RLE8 exercises run tokens,
    absolute mode with its word pad, EOL, and EOB."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _bmp_encode_palette,
        _decode_bmp_pixels,
    )

    for i in (0, 8, 131):
        for w, h in ((1, 1), (13, 9), (32, 24)):
            idx = bytes((i + 3 * p) % 256 for p in range(w * h))
            pal = bytes(v for c in range(256)
                        for v in (c, (c + 1) % 256, (c + 2) % 256))
            expect = b"".join(
                bytes(((i + 3 * p) % 256, (i + 3 * p + 1) % 256,
                       (i + 3 * p + 2) % 256)) for p in range(w * h))
            for rle in (False, True):
                f = _bmp_encode_palette(idx, pal, w, h, rle=rle)
                assert _decode_bmp_pixels(f) == (w, h, expect), (i, w, h, rle)
                assert decode_pixels_bytes(f)[0] == "bmp"
    # run-heavy content drives the run-token path
    runs = (b"\x05" * 37 + bytes(range(9))) * 20
    idx = runs[:23 * 17]
    pal = bytes(v for c in range(256) for v in (c, c, c))
    f = _bmp_encode_palette(idx, pal, 23, 17, rle=True)
    assert _decode_bmp_pixels(f) == (
        23, 17, b"".join(bytes((k, k, k)) for k in idx))


def test_bmp_palette_grammar_route(spark):
    """k%4==1/3 of the BMP slice emit palette BMPs (RLE8 on k%4==3)
    that still decode to the raw fill — the oracle never moves."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_bmp_pixels,
        _raw_fill,
        synthetic_pixel_media,
    )

    ids = [8, 24, 40, 56]  # k = 1, 3, 5, 7
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_pixel_media(df).collect()}
    for i in ids:
        w, h = 1 + i % 32, 1 + i % 24
        b = rows[i]
        assert int.from_bytes(b[28:30], "little") == 8, i  # 8-bit
        comp = int.from_bytes(b[30:34], "little")
        assert comp == (1 if (i // 8) % 4 == 3 else 0), i
        assert _decode_bmp_pixels(b) == (w, h, _raw_fill(i, w, h)), i


def test_bmp_rle8_escapes_and_hostiles():
    """RLE8 delta escape leaves skipped pixels at index 0; early EOB
    leaves the rest at index 0; malformed streams quarantine."""
    import numpy as np

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _bmp_encode_palette,
        _bmp_rle8_decode,
        _decode_bmp_pixels,
    )

    # hand-built stream: run, delta skip, literal, EOL, EOB on a 6x2 grid
    s = bytes((2, 9,        # two pixels of 9
               0, 2, 1, 0,  # delta: skip 1 right
               3, 7,        # three pixels of 7
               0, 0,        # EOL
               0, 3, 1, 2, 3, 0,  # absolute: 3 literals + word pad
               0, 1))       # EOB
    g = _bmp_rle8_decode(s, 0, 6, 2)
    assert g is not None
    assert g.tolist() == [[9, 9, 0, 7, 7, 7], [1, 2, 3, 0, 0, 0]]

    idx = bytes(range(16))
    pal = bytes(768)
    f = _bmp_encode_palette(idx, pal, 4, 4, rle=True)
    assert _decode_bmp_pixels(f) is not None
    # truncation (EOB cut off)
    assert _decode_bmp_pixels(f[:-3]) is None
    # run crossing the row end
    assert _bmp_rle8_decode(bytes((7, 1, 0, 1)), 0, 6, 2) is None
    # delta leaving the grid
    assert _bmp_rle8_decode(bytes((0, 2, 9, 9, 0, 1)), 0, 6, 2) is None
    # index beyond a short declared palette (biClrUsed)
    g2 = _bmp_encode_palette(bytes((5, 5, 5, 5)), pal[:15], 2, 2)
    assert _decode_bmp_pixels(g2) is None  # index 5 >= ncol 5


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_palette_bmp_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _bmp_encode_palette,
    )

    idx = bytes((11 + 3 * p) % 256 for p in range(13 * 9))
    pal = bytes(v for c in range(256)
                for v in (c, (c + 1) % 256, (c + 2) % 256))
    for payload in (
        bytearray(_bmp_encode_palette(idx, pal, 13, 9)),
        bytearray(_bmp_encode_palette(idx, pal, 13, 9, rle=True)),
    ):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = decode_pixels_bytes(bytes(payload))
        assert out is None or (len(out) == 4 and
                               len(out[3]) == out[1] * out[2] * 3)


# --------------------------------------- P5 + WhiteIsZero (late r13)


def test_pgm_p5_grayscale_decodes():
    """P5 (binary grayscale netpbm) expands g -> (g, g, g); header
    rules (comments, exact one-whitespace separator, maxval 255) match
    the P6 lane."""
    w, h = 7, 4
    gray = bytes((11 * j + 3) % 256 for j in range(w * h))
    f = b"P5\n# scan\n%d %d\n255\n" % (w, h) + gray
    out = decode_pixels_bytes(f)
    assert out == ("ppm", w, h,
                   b"".join(bytes((g, g, g)) for g in gray))
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_image_dims,
    )
    assert _parse_image_dims(f) == (w, h)
    # short data / wrong maxval quarantine
    assert decode_pixels_bytes(f[:-3]) is None
    assert decode_pixels_bytes(f.replace(b"255", b"65535", 1)) is None


def test_tiff_white_is_zero_inverts():
    """Photometric 0 (the fax/scan convention): stored 0 is white, so
    the decode inverts before the gray expansion."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
    )

    w, h = 6, 3
    gray = bytes((17 * j + 9) % 256 for j in range(w * h))

    def build(photo: int) -> bytes:
        bo = "little"
        def u16(v): return v.to_bytes(2, bo)
        def u32(v): return v.to_bytes(4, bo)
        entries = [
            (256, 3, 1, u16(w) + b"\x00\x00"),
            (257, 3, 1, u16(h) + b"\x00\x00"),
            (258, 3, 1, u16(8) + b"\x00\x00"),
            (259, 3, 1, u16(1) + b"\x00\x00"),
            (262, 3, 1, u16(photo) + b"\x00\x00"),
            (273, 4, 1, u32(8 + 2 + 12 * 8 + 4)),
            (277, 3, 1, u16(1) + b"\x00\x00"),
            (279, 4, 1, u32(len(gray))),
        ]
        g = bytearray(b"II\x2a\x00" + u32(8) + u16(len(entries)))
        for tag, typ, cnt, val in entries:
            g += u16(tag) + u16(typ) + u32(cnt) + val
        g += u32(0) + gray
        return bytes(g)

    black_is_zero = _decode_tiff_pixels(build(1))
    white_is_zero = _decode_tiff_pixels(build(0))
    assert black_is_zero == (
        w, h, b"".join(bytes((g, g, g)) for g in gray))
    assert white_is_zero == (
        w, h, b"".join(bytes((255 - g,) * 3) for g in gray))


def test_tiff_jpeg_grayscale_strips_roundtrip():
    """Grayscale JPEG-in-TIFF (photometric 1, 1-component streams —
    the scanned-document layout): single-strip and
    JPEGTables-abbreviated per-8-row strips both decode to the bare
    stream's RGB expansion; photometric 0 with compression 7
    quarantines."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        decode_jpeg_pixels,
        jpeg_encode_dc_only,
    )
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_tiff_pixels,
        _jpeg_abbreviate,
        _tiff_encode,
    )

    for i in (4, 9, 22):
        w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
        nb = (w // 8) * (h // 8)
        dcs = [[(i + 7 * b) % 64 - 32 for b in range(nb)]]
        full = jpeg_encode_dc_only(w, h, dcs)
        ref = decode_jpeg_pixels(full)[2]
        t1 = _tiff_encode(b"", w, h, rows_per_strip=h,
                          jpeg_segments=[full], jpeg_gray=True)
        assert _decode_tiff_pixels(t1) == (w, h, ref), i
        bpr = w // 8
        segs = [jpeg_encode_dc_only(w, 8, [dcs[0][s * bpr:(s + 1) * bpr]])
                for s in range(h // 8)]
        jt = _jpeg_abbreviate(segs[0])[0]
        ab = [_jpeg_abbreviate(s)[1] for s in segs]
        t2 = _tiff_encode(b"", w, h, rows_per_strip=8, jpeg_segments=ab,
                          jpeg_tables=jt, jpeg_gray=True,
                          big_endian=i % 2 == 1)
        assert _decode_tiff_pixels(t2) == (w, h, ref), i
    # photometric 0 + compression 7: not a defined combination here
    tb = bytearray(t1)
    n = int.from_bytes(tb[8:10], "little")
    for k in range(n):
        e = 10 + 12 * k
        if int.from_bytes(tb[e:e + 2], "little") == 262:
            tb[e + 8:e + 10] = (0).to_bytes(2, "little")
    assert _decode_tiff_pixels(bytes(tb)) is None
