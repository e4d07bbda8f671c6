"""Decoder robustness fuzz: the quarantine contract under hostile bytes.

``decode_pixels_bytes`` promises the mapInPandas stage can feed it ANY
payload — crawl garbage, truncations, bit-flipped real files — and get
back either None or a structurally valid (fmt, w, h, rgb) tuple, never
an exception and never unbounded work. That contract is what keeps one
bad row from killing a 100 TB decode stage, so it gets the classic
decoder treatment: random bytes, random mutations of VALID files (the
highest-yield corpus — deep parser paths only open for almost-valid
input), truncations, and magic-byte prefixes over garbage.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators.jpeg import (
    jpeg_encode_dc_only,
)
from amazon_macie_activity_generator_spark.operators.multimodal import (
    _GIF_FILL_PALETTE,
    _bmp_encode,
    _bmp_encode_palette,
    _gif_encode,
    _jpeg_abbreviate,
    _png_encode,
    _ppm_encode,
    _qoi_encode,
    _raw_fill,
    _tga_encode,
    _tiff_encode,
    decode_pixels_bytes,
)


def _valid_payloads() -> list[bytes]:
    out = []
    for i in (0, 5, 11):
        w, h = 1 + i % 32, 1 + i % 24
        raw = _raw_fill(i, w, h)
        pal = bytes(
            v for k in range(256)
            for v in ((3 * k + i) % 256, (5 * k + 2 * i) % 256, (7 * k + 3 * i) % 256)
        )
        out += [
            _bmp_encode(raw, w, h),
            _ppm_encode(raw, w, h),
            _png_encode(raw, w, h),
            # palette PNG (r9): mutations reach the PLTE walk + 1-byte
            # filter reconstruction + palette-lookup bounds check
            _png_encode(bytes((i + p) % 256 for p in range(w * h)),
                        w, h, bpp=1, ctype=3, plte=pal),
            _gif_encode(bytes((i + 3 * p) % 256 for p in range(w * h)),
                        _GIF_FILL_PALETTE, w, h),
            # r10 PNG surface: Adam7 / 16-bit / gray+alpha — mutations
            # reach the pass-geometry walk, the high-byte narrowing, and
            # the 2-channel filter reconstruction
            _png_encode(raw, w, h, interlace=1),
            _png_encode(bytes(v for x in raw for v in (x, x)),
                        w, h, bpp=6, bitdepth=16, interlace=1),
            _png_encode(bytes(v for p in range(w * h)
                              for v in ((i + p) % 256, 255)),
                        w, h, bpp=2, ctype=4),
            # sub-byte depths: mutations reach the bit unpack, row-pad
            # trim, packed-row filters, and short-palette bound checks
            _png_encode(bytes((i + p) % 2 for p in range(w * h)),
                        w, h, ctype=0, bitdepth=1, interlace=1),
            _png_encode(bytes((i + p) % 16 for p in range(w * h)),
                        w, h, ctype=3, bitdepth=4, plte=pal[:48]),
            # r13 containers: mutations reach the TGA RLE packet walk,
            # the QOI op loop + index table, the TIFF IFD/strip/tile
            # walks, TIFF-LZW early-change decode, and predictor undiff
            _tga_encode(raw, w, h, rle=True, bpp32=True, top_down=False),
            _qoi_encode(raw, w, h),
            _tiff_encode(raw, w, h, lzw=True, predictor2=True,
                         rows_per_strip=3, big_endian=True),
            _tiff_encode(raw, w, h, tile=8),
            # palette-color: mutations reach the ColorMap fetch/narrow
            _tiff_encode(bytes((i + 3 * p) % 256 for p in range(w * h)),
                         w, h, palette=pal, packbits=True),
            # palette BMP incl. RLE8: mutations reach the color-table
            # bound check and the RLE token walk/escapes
            _bmp_encode_palette(
                bytes((i + 3 * p) % 256 for p in range(w * h)),
                pal, w, h, rle=True),
        ]
    # JPEG-in-TIFF (r13): mutations reach the tag-347 splice and the
    # per-strip JPEG geometry checks
    _j = jpeg_encode_dc_only(16, 16, [[5, -10, 3, 3], [12, 0, -3, 7],
                                      [-7, 20, 1, -1]],
                             sampling=((1, 1), (1, 1), (1, 1)))
    _jt, _jab = _jpeg_abbreviate(_j)
    out += [
        _tiff_encode(b"", 16, 16, rows_per_strip=16, jpeg_segments=[_j]),
        _tiff_encode(b"", 16, 16, rows_per_strip=16, jpeg_segments=[_jab],
                     jpeg_tables=_jt),
    ]
    # JPEG (r10): mutations reach the marker walk, DHT/DQT parsers,
    # table-driven Huffman decode, restart resync, and IDCT plumbing —
    # plus the progressive multi-scan layer (DC/AC first+refine, EOB
    # runs, per-scan restart resync) via SOF2 twins of the same files
    out += [
        jpeg_encode_dc_only(
            16, 8, [[5, -10], [3, 3], [-7, 20]],
            sampling=((1, 1), (1, 1), (1, 1)),
        ),
        jpeg_encode_dc_only(
            32, 16, [list(range(-4, 4)), [10, -10], [-25, 25]],
            restart_interval=1,
        ),
        jpeg_encode_dc_only(8, 8, [[12]]),
        jpeg_encode_dc_only(
            16, 8, [[5, -10], [3, 3], [-7, 20]],
            sampling=((1, 1), (1, 1), (1, 1)), progressive=True,
        ),
        jpeg_encode_dc_only(
            32, 16, [list(range(-4, 4)), [10, -10], [-25, 25]],
            restart_interval=1, progressive=True,
        ),
        jpeg_encode_dc_only(8, 8, [[12]], progressive=True),
    ]
    return out


_VALID = _valid_payloads()


def _check(payload: bytes | None) -> None:
    out = decode_pixels_bytes(payload)  # must not raise, whatever comes in
    if out is not None:
        fmt, w, h, raw = out
        assert fmt in ("bmp", "ppm", "png", "gif", "jpeg",
                       "tga", "qoi", "tiff")
        assert w > 0 and h > 0 and len(raw) == w * h * 3


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=4096))
def test_random_bytes_never_raise(data):
    _check(data)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(0, len(_VALID) - 1),
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
             min_size=1, max_size=8),
)
def test_bitflipped_valid_files_never_raise(idx, flips):
    """Mutate real container files: almost-valid input reaches the deep
    parser paths (chunk walks, LZW tables, filter reconstruction) that
    pure random bytes never open."""
    payload = bytearray(_VALID[idx])
    for pos, val in flips:
        payload[pos % len(payload)] = val
    _check(bytes(payload))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, len(_VALID) - 1), st.integers(0, 100))
def test_truncations_never_raise(idx, pct):
    payload = _VALID[idx]
    _check(payload[: len(payload) * pct // 100])


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.sampled_from([b"BM", b"P6", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
                     b"\xff\xd8", b"II\x2a\x00", b"MM\x00\x2a", b"qoif"]),
    st.binary(max_size=512),
)
def test_magic_prefixed_garbage_never_raises(magic, junk):
    """Payloads that pass the sniff but fail the parse — the exact class
    a format-dispatching decoder mishandles first."""
    _check(magic + junk)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 90),            # w — reaches past the 64 wavefront gate
    st.integers(1, 90),            # h
    st.sampled_from([1, 3, 4]),    # bpp
    st.randoms(use_true_random=False),
)
def test_png_reconstruct_fuzz_equals_naive(w, h, bpp, rng):
    """Property fuzz of the round-9 two-tier filter reconstruction
    (vectorized Sub/Up + run-dispatched wavefront/scalar Average/Paeth)
    against the naive spec-literal loop — hypothesis-driven dims, bpp,
    and per-row filter choices (biased toward maximal Average/Paeth runs
    and dims spanning the >= 64-row/width wavefront gate so both tiers
    are exercised, not just the scalar fallback)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _paeth,
        _png_reconstruct,
    )

    stride = w * bpp
    raw = bytes(rng.randrange(256) for _ in range(h * stride))
    # 50%: all rows one sequential filter (maximal run -> wavefront when
    # the run clears the measured _WAVEFRONT_MIN_ROWS x _WAVEFRONT_MIN_WIDTH
    # gate, 64x64 — dims range to 90 so both sides are exercised); else
    # independent per-row choices (short runs -> scalar)
    if rng.random() < 0.5:
        fts = [rng.choice([3, 4])] * h
    else:
        fts = [rng.randrange(5) for _ in range(h)]
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
    assert _png_reconstruct(bytes(body), w, h, bpp) == raw


# ---------------------------------------------------------------------------
# animated-GIF compositing decoder (round 11): the same hostile-bytes
# contract over the multi-frame path — partial rects, disposals 0-3,
# transparency, local tables — must never raise and never emit a
# structurally invalid frame list
# ---------------------------------------------------------------------------


def _valid_animated() -> list[bytes]:
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )

    pal = bytes(v for p in range(8) for v in ((p * 31) % 256,
                                              (p * 57) % 256,
                                              (p * 11) % 256))
    full = [bytes((k + j) % 8 for j in range(6 * 5)) for k in range(3)]
    return [
        _gif_encode_animated(full, pal, 6, 5, delays_cs=[5, 10, 15]),
        _gif_encode_animated(
            [full[0], bytes((j % 8 for j in range(12))), full[2]],
            pal, 6, 5, rects=[None, (2, 1, 4, 3), None],
            disposals=[0, 2, 3], delays_cs=[5, 5, 5],
        ),
        _gif_encode_animated(
            full[:2], pal, 6, 5, transparent=True, transparent_idx=3,
            interlace=True,
        ),
    ]


_ANIMATED = _valid_animated()


def _check_frames(payload: bytes) -> None:
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
    )

    out = _decode_gif_frames(payload)
    if out is not None:
        w, h, frames = out
        assert w > 0 and h > 0 and frames
        for delay, rgb in frames:
            assert delay >= 0 and len(rgb) == w * h * 3


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(0, len(_ANIMATED) - 1),
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
             min_size=1, max_size=8),
)
def test_bitflipped_animated_gifs_never_raise(idx, flips):
    payload = bytearray(_ANIMATED[idx])
    for pos, val in flips:
        payload[pos % len(payload)] = val
    _check_frames(bytes(payload))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, len(_ANIMATED) - 1), st.integers(0, 100))
def test_truncated_animated_gifs_never_raise(idx, pct):
    payload = _ANIMATED[idx]
    _check_frames(payload[: len(payload) * pct // 100])


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=2048))
def test_gif_magic_garbage_never_raises_frames(junk):
    _check_frames(b"GIF89a" + junk)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 2000),          # npix spans the _LZW_TWO_PHASE_MIN_PIX gate
    st.sampled_from([4, 16, 256]),  # palette sizes -> min code widths
    st.booleans(),                  # runs vs noise content
    st.randoms(use_true_random=False),
)
def test_lzw_two_phase_equals_scalar(npix, ncol, runs, rng):
    """The r11 two-phase LZW and the scalar small-input lane must agree
    on every well-formed stream (round trip) AND on mutated streams
    (both None, or byte-identical output) — the dispatch gate must be
    purely a performance choice, never a semantics one."""
    import numpy as np

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_lzw_decode_small,
        _gif_lzw_encode,
    )
    from amazon_macie_activity_generator_spark.operators import multimodal as mm

    msz = max(2, (ncol - 1).bit_length())
    if runs:
        idx = bytes(np.repeat(
            [rng.randrange(ncol) for _ in range(max(1, npix // 8))], 8
        )[:npix].astype(np.uint8))
    else:
        idx = bytes(rng.randrange(ncol) for _ in range(npix))
    npix = len(idx)
    enc = bytes(_gif_lzw_encode(idx, msz))
    # well-formed: the public fn (whichever lane the gate picks) and the
    # scalar lane both decode exactly
    assert mm._gif_lzw_decode(enc, msz, npix) == idx
    assert _gif_lzw_decode_small(enc, msz, npix) == idx
    # mutated: the public fn and the scalar lane must still agree (both
    # None or byte-identical) — for npix >= the gate this pits the
    # two-phase body against the scalar reference on corrupt streams
    for _ in range(3):
        m = bytearray(enc)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
        assert (mm._gif_lzw_decode(bytes(m), msz, npix)
                == _gif_lzw_decode_small(bytes(m), msz, npix))


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(1, 2000),   # cap spans the _LZW_TWO_PHASE_MIN_PIX gate
    st.booleans(),          # runs vs noise content
    st.randoms(use_true_random=False),
)
def test_tiff_lzw_two_phase_equals_scalar(cap, runs, rng):
    """The late-r13 two-phase TIFF LZW and its scalar lane must agree
    on every well-formed stream (round trip) AND on mutated streams
    (both None, or byte-identical output) — the dispatch gate must be
    purely a performance choice, never a semantics one. The TIFF
    variant's early-change width rule makes the two-phase batch
    prediction off-by-one-sensitive, which is exactly what this pins."""
    import numpy as np

    from amazon_macie_activity_generator_spark.operators import multimodal as mm

    if runs:
        data = bytes(np.repeat(
            [rng.randrange(256) for _ in range(max(1, cap // 8))], 8
        )[:cap].astype(np.uint8))
    else:
        data = bytes(rng.randrange(256) for _ in range(cap))
    cap = len(data)
    enc = mm._tiff_lzw_encode(data)
    assert mm._tiff_lzw_decode(enc, 0, len(enc), cap) == data
    assert mm._tiff_lzw_decode_small(enc, 0, len(enc), cap) == data
    for _ in range(3):
        m = bytearray(enc)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
        assert (mm._tiff_lzw_decode(bytes(m), 0, len(m), cap)
                == mm._tiff_lzw_decode_small(bytes(m), 0, len(m), cap))


# --------------------------------------------------------------- AVI (r12)

def _valid_avis() -> list[bytes]:
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _avi_encode_dib,
        _avi_encode_mjpeg,
    )

    out = []
    for i in (7, 23, 47):
        nb = 1 + i % 3
        w, h = 8 * nb, 8
        frames = [
            jpeg_encode_dc_only(
                w, h,
                [[(i + 3 * f + 7 * b) % 64 - 32 for b in range(nb)],
                 [(2 * i + 5 * f + 11 * b) % 64 - 32 for b in range(nb)],
                 [(3 * i + 7 * f + 13 * b) % 64 - 32 for b in range(nb)]],
                sampling=((1, 1), (1, 1), (1, 1)),
            )
            for f in range(1 + i % 6)
        ]
        out.append(_avi_encode_mjpeg(frames, w, h))
        # DIB route (late r13): mutations reach the strf-geometry gate
        # and the row-unpad/flip path
        out.append(_avi_encode_dib(
            [bytes((i + 3 * f + j) % 256 for j in range(w * h * 3))
             for f in range(1 + i % 6)], w, h))
    return out


_AVIS = _valid_avis()


def _check_avi(payload: bytes) -> None:
    """The AVI contract: None, a valid (w, h, frames) tuple, or the
    DOCUMENTED NotImplementedError (a mutation can rewrite fccHandler
    into a non-MJPEG codec — that raise is the honest seam, and the
    sample_frames caller propagates it on purpose)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_avi_mjpeg_frames,
    )

    try:
        out = _decode_avi_mjpeg_frames(payload)
    except NotImplementedError:
        return
    if out is not None:
        w, h, frames = out
        assert w > 0 and h > 0 and frames
        for delay, rgb in frames:
            assert delay >= 0 and len(rgb) == w * h * 3


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(0, len(_AVIS) - 1),
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
             min_size=1, max_size=8),
)
def test_bitflipped_avis_never_raise(idx, flips):
    payload = bytearray(_AVIS[idx])
    for pos, val in flips:
        payload[pos % len(payload)] = val
    _check_avi(bytes(payload))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, len(_AVIS) - 1), st.integers(0, 100))
def test_truncated_avis_never_raise(idx, pct):
    payload = _AVIS[idx]
    _check_avi(payload[: len(payload) * pct // 100])


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=2048))
def test_avi_magic_garbage_never_raises(junk):
    _check_avi(b"RIFF" + len(junk).to_bytes(4, "little") + b"AVI " + junk)
