"""Baseline JPEG codec tests (round 10): exact DC-only pixel math, exact
Huffman/zigzag/RLE/restart round-trips through the coefficient layer, an
independent direct-cosine IDCT cross-check, and the hostile-variant
quarantine contract (progressive/12-bit/truncated/oversubscribed inputs
return None, never raise).
"""

from __future__ import annotations

import numpy as np
import pytest

from amazon_macie_activity_generator_spark.operators.jpeg import (
    STD_AC_LUMA,
    STD_DC_LUMA,
    ZIGZAG,
    _decode_frame,
    decode_jpeg_pixels,
    jpeg_encode_baseline,
    jpeg_encode_dc_only,
)
from amazon_macie_activity_generator_spark.operators.multimodal import (
    decode_pixels_bytes,
)


def _rgb(y: int, cb: int, cr: int) -> list[int]:
    """The module's documented fixed-point YCbCr->RGB, reimplemented
    independently (python ints, explicit floor division)."""
    cb1, cr1 = cb - 128, cr - 128
    r = y + (91881 * cr1 + 32768) // 65536
    g = y - (22554 * cb1 + 46802 * cr1 + 32768) // 65536
    b = y + (116130 * cb1 + 32768) // 65536
    return [max(0, min(255, v)) for v in (r, g, b)]


def test_dc_only_444_exact_pixels():
    dcy, dcb, dcr = [5, -10], [3, 3], [-7, 20]
    payload = jpeg_encode_dc_only(
        16, 8, [dcy, dcb, dcr], sampling=((1, 1), (1, 1), (1, 1))
    )
    w, h, raw = decode_jpeg_pixels(payload)
    assert (w, h) == (16, 8)
    px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    for blk in range(2):
        exp = _rgb(128 + dcy[blk], 128 + dcb[blk], 128 + dcr[blk])
        assert (px[:, blk * 8 : (blk + 1) * 8] == np.array(exp)).all()


def test_dc_only_420_with_restarts_exact_pixels():
    """4:2:0 sampling + a 1-MCU restart interval: proves RSTn resync and
    the per-restart DC predictor reset (a decoder that carries predictors
    across restarts decodes wrong values from MCU 1 on)."""
    dcy = list(range(-4, 4))
    dcb, dcr = [10, -10], [-25, 25]
    payload = jpeg_encode_dc_only(32, 16, [dcy, dcb, dcr], restart_interval=1)
    assert b"\xff\xd0" in payload  # an actual RST0 marker is present
    w, h, raw = decode_jpeg_pixels(payload)
    assert (w, h) == (32, 16)
    px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    for m in range(2):  # MCU columns
        for s in range(4):  # 2x2 luma sub-blocks, raster order
            exp = _rgb(128 + dcy[4 * m + s], 128 + dcb[m], 128 + dcr[m])
            r0, c0 = (s // 2) * 8, m * 16 + (s % 2) * 8
            assert (px[r0 : r0 + 8, c0 : c0 + 8] == np.array(exp)).all(), (m, s)


def test_grayscale_expands_to_rgb():
    w, h, raw = decode_jpeg_pixels(jpeg_encode_dc_only(8, 8, [[12]]))
    px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    assert (px == 140).all()  # 128 + 12 on all three channels


def test_non_mcu_multiple_dims_cropped():
    """20x10 at 4:2:0 pads to a 2x1 grid of 16x16 MCUs; the decoder must
    decode the full MCUs and crop, not reject or mis-size."""
    payload = jpeg_encode_dc_only(20, 10, [[1] * 8, [2] * 2, [3] * 2])
    w, h, raw = decode_jpeg_pixels(payload)
    assert (w, h) == (20, 10) and len(raw) == 20 * 10 * 3


def test_coefficient_round_trip_with_ac():
    """Arbitrary quantized coefficients (dense AC) survive the encoder ->
    entropy decoder exactly: proves Huffman tables, zigzag, RLE
    categories, byte stuffing, and the EXTEND sign rule bit-for-bit,
    independent of the IDCT."""
    rng = np.random.default_rng(0)
    coefs = [
        rng.integers(-100, 100, size=(4, 64)).astype(np.int32),
        rng.integers(-30, 30, size=(1, 64)).astype(np.int32),
        rng.integers(-30, 30, size=(1, 64)).astype(np.int32),
    ]
    payload = jpeg_encode_baseline(
        coefs, 16, 16, sampling=((2, 2), (1, 1), (1, 1)), qy=1, qc=1
    )
    w, h, comps = _decode_frame(payload)
    assert (w, h) == (16, 16)
    for ci, c in enumerate(comps):
        nat = c["coeffs"].reshape(-1, 64)
        assert (nat[:, list(ZIGZAG)] == coefs[ci]).all(), ci


def test_coefficient_round_trip_sparse_zrl():
    """Sparse blocks with >16-zero gaps force ZRL (0xF0) emission and
    decode; a trailing nonzero at k=63 avoids the EOB path entirely."""
    blk = np.zeros((1, 64), dtype=np.int32)
    blk[0, 0] = 7
    blk[0, 40] = -3   # 39 leading AC zeros -> two ZRLs + run 7
    blk[0, 63] = 1    # last coefficient: no EOB emitted
    payload = jpeg_encode_baseline([blk], 8, 8, qy=1)
    _, _, comps = _decode_frame(payload)
    nat = comps[0]["coeffs"].reshape(-1, 64)
    assert (nat[:, list(ZIGZAG)] == blk).all()


def test_byte_stuffing_round_trip():
    """Drive entropy bytes through 0xFF territory: all-max-category DCs
    produce long 1-runs, which is how stuffed 0xFF bytes appear."""
    dcy = [1023, -1024, 1023, -1024]
    payload = jpeg_encode_dc_only(
        32, 8, [dcy, [0] * 4, [0] * 4], sampling=((1, 1), (1, 1), (1, 1))
    )
    assert b"\xff\x00" in payload  # stuffing actually happened
    w, h, raw = decode_jpeg_pixels(payload)
    px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    # dc 1023 -> sample clamps to 255; -1024 -> 0
    assert (px[:, 0:8] == np.array(_rgb(255, 128, 128))).all()
    assert (px[:, 8:16] == np.array(_rgb(0, 128, 128))).all()


def test_dc_only_422_exact_pixels():
    """4:2:2 (2x1 luma sampling) falls out of the generic integer-ratio
    upsampler: chroma is constant over 16x8 boxes, luma over 8x8."""
    dcy = [3, -9, 14, 27]  # 2 MCUs x 2 horizontal luma blocks
    dcb, dcr = [6, -6], [-11, 11]
    payload = jpeg_encode_dc_only(
        32, 8, [dcy, dcb, dcr], sampling=((2, 1), (1, 1), (1, 1))
    )
    w, h, raw = decode_jpeg_pixels(payload)
    assert (w, h) == (32, 8)
    px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    for m in range(2):
        for s in range(2):
            exp = _rgb(128 + dcy[2 * m + s], 128 + dcb[m], 128 + dcr[m])
            c0 = m * 16 + s * 8
            assert (px[:, c0 : c0 + 8] == np.array(exp)).all(), (m, s)


def test_coefficient_round_trip_fuzz():
    """Hypothesis-driven entropy-layer fuzz: random quantized
    coefficients (sparse and dense), random sampling (4:4:4 / 4:2:0 /
    4:2:2 / grayscale), random restart intervals — the encoder->decoder
    coefficient round-trip must be integer-exact every time (Huffman,
    zigzag, RLE/ZRL, stuffing, restart resync, EXTEND)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    samplings = [
        (((1, 1), (1, 1), (1, 1)), 3),
        (((2, 2), (1, 1), (1, 1)), 3),
        (((2, 1), (1, 1), (1, 1)), 3),
        (((1, 1),), 1),
    ]

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.integers(0, len(samplings) - 1),
        st.integers(1, 3),   # MCU columns
        st.integers(1, 2),   # MCU rows
        st.integers(0, 2),   # restart interval (0 = none)
        st.integers(0, 2**32 - 1),  # numpy seed
        st.floats(0.0, 0.95),       # sparsity
    )
    def case(si, mx, my, ri, seed, sparsity):
        sampling, nf = samplings[si]
        rng = np.random.default_rng(seed)
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        w, h = 8 * hmax * mx, 8 * vmax * my
        coefs = []
        for ci in range(nf):
            hi, vi = sampling[ci]
            n = mx * my * hi * vi
            c = rng.integers(-255, 256, size=(n, 64)).astype(np.int32)
            c[rng.random(size=c.shape) < sparsity] = 0
            coefs.append(c)
        payload = jpeg_encode_baseline(
            coefs, w, h, sampling=sampling, qy=1, qc=1, restart_interval=ri
        )
        out = _decode_frame(payload)
        assert out is not None
        w2, h2, comps = out
        assert (w2, h2) == (w, h)
        for ci, c in enumerate(comps):
            nat = c["coeffs"].reshape(-1, 64)
            assert (nat[:, list(ZIGZAG)] == coefs[ci]).all(), ci

    case()


def test_idct_matches_direct_cosine_sum():
    """The einsum IDCT against a literal T.81 A.3.3 double sum written
    independently here."""
    from amazon_macie_activity_generator_spark.operators.jpeg import _idct_blocks

    rng = np.random.default_rng(1)
    blocks = rng.integers(-200, 200, size=(5, 8, 8)).astype(np.int32)

    def direct(blk):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * blk[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s / 4
        return np.clip(np.floor(out + 0.5) + 128, 0, 255).astype(np.uint8)

    got = _idct_blocks(blocks)
    for i in range(len(blocks)):
        assert (got[i] == direct(blocks[i])).all(), i


def test_dispatch_and_header_dims():
    payload = jpeg_encode_dc_only(16, 8, [[0, 0], [0, 0], [0, 0]],
                                  sampling=((1, 1), (1, 1), (1, 1)))
    out = decode_pixels_bytes(payload)
    assert out is not None and out[0] == "jpeg" and out[1:3] == (16, 8)
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_image_dims,
    )

    assert _parse_image_dims(payload) == (16, 8)


def _base() -> bytes:
    return jpeg_encode_dc_only(16, 8, [[5, -10], [3, 3], [-7, 20]],
                               sampling=((1, 1), (1, 1), (1, 1)))


@pytest.mark.parametrize("mutate", [
    # progressive frame: SOF0 -> SOF2
    lambda b: b.replace(b"\xff\xc0", b"\xff\xc2"),
    # 12-bit precision
    lambda b: b.replace(b"\xff\xc0\x00\x11\x08", b"\xff\xc0\x00\x11\x0c"),
    # truncated entropy stream
    lambda b: b[: len(b) - 6],
    # zero width
    lambda b: b.replace((8).to_bytes(2, "big") + (16).to_bytes(2, "big"),
                        (8).to_bytes(2, "big") + (0).to_bytes(2, "big")),
    # bomb dims: 65535 x 65535 > _MAX_PIXELS
    lambda b: b.replace((8).to_bytes(2, "big") + (16).to_bytes(2, "big"),
                        b"\xff\xff\xff\xff"),
    # EOI immediately after SOI
    lambda b: b[:2] + b"\xff\xd9" + b[2:],
    # drop the luma DQT (table referenced but never defined)
    lambda b: b[:20] + b[89:],
])
def test_hostile_variants_quarantine(mutate):
    payload = mutate(_base())
    assert payload != _base(), "mutation must change the stream"
    assert decode_jpeg_pixels(payload) is None


def test_sof1_extended_sequential_decodes_as_baseline():
    """8-bit SOF1 is the baseline process (T.81: every baseline stream
    is valid extended-sequential) — patching the SOF marker must decode
    to identical pixels; a 12-bit SOF1 still quarantines."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        jpeg_encode_dc_only,
    )

    b = jpeg_encode_dc_only(
        32, 16, [list(range(-4, 4)), [10, -10], [-25, 25]],
        restart_interval=1,
    )
    base = decode_jpeg_pixels(b)
    assert base is not None
    at = b.find(b"\xff\xc0")
    patched = b[:at] + b"\xff\xc1" + b[at + 2:]
    assert decode_jpeg_pixels(patched) == base
    # 12-bit precision (first SOF body byte) stays quarantined
    twelve = patched[:at + 4] + bytes([12]) + patched[at + 5:]
    assert decode_jpeg_pixels(twelve) is None


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    a conforming file using them must decode identically, not quarantine
    on a garbage length read."""
    base = _base()
    want = decode_jpeg_pixels(base)
    # insert fill bytes before the DQT and SOF0 markers
    padded = base.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xc0", 1
    )
    assert padded != base
    assert decode_jpeg_pixels(padded) == want


def test_fill_bytes_before_rst_markers_decode():
    """Fill bytes are also legal before RST markers INSIDE the entropy
    stream (same T.81 B.1.1.2 clause) — the r10 review repro: one 0xFF
    inserted before the first RST0 of a conforming restart-interval file
    must decode identically, not terminate the scan early."""
    dcy = list(range(-4, 4))
    base = jpeg_encode_dc_only(32, 16, [dcy, [10, -10], [-25, 25]],
                               restart_interval=1)
    want = decode_jpeg_pixels(base)
    assert want is not None
    i = base.index(b"\xff\xd0")
    padded = base[:i] + b"\xff" + base[i:]
    assert decode_jpeg_pixels(padded) == want


def test_sampling_sum_over_spec_cap_quarantines():
    """T.81 A.1.1 caps sum(Hi*Vi) at 10 — a 4x4+1x1+1x1 frame (sum 18)
    must be rejected BEFORE the coefficient allocation it would inflate."""
    b = bytearray(_base())
    i = b.index(b"\xff\xc0")
    b[i + 4 + 7] = 0x44  # component 1 sampling 4x4
    assert decode_jpeg_pixels(bytes(b)) is None


def test_undersized_entropy_stream_quarantines_before_alloc():
    """A crafted header claiming huge dims with almost no entropy data
    must be rejected by the allocation-proportionality guard (every
    block needs >= 2 entropy bits), not staged into hundreds of MB of
    coefficient arrays."""
    b = bytearray(_base())
    i = b.index(b"\xff\xc0")
    # claim 4096 x 4096 (16M px < _MAX_PIXELS) on the same tiny stream
    b[i + 5 : i + 7] = (4096).to_bytes(2, "big")
    b[i + 7 : i + 9] = (4096).to_bytes(2, "big")
    import time as _t

    t0 = _t.perf_counter()
    assert decode_jpeg_pixels(bytes(b)) is None
    assert _t.perf_counter() - t0 < 1.0  # rejected up front, not decoded


def test_four_component_cmyk_quarantines():
    """Adobe CMYK JPEGs have 4 components; baseline support is 1 or 3."""
    b = bytearray(_base())
    i = b.index(b"\xff\xc0")
    # splice a 4th component into SOF0 (and fix nf + length)
    seglen = int.from_bytes(b[i + 2 : i + 4], "big")
    body = bytearray(b[i + 4 : i + 2 + seglen])
    body[5] = 4
    body += bytes([4, 0x11, 1])
    nb = (len(body) + 2).to_bytes(2, "big")
    payload = bytes(b[: i + 2]) + nb + bytes(body) + bytes(b[i + 2 + seglen :])
    assert decode_jpeg_pixels(payload) is None


def test_oversubscribed_huffman_table_quarantines():
    """A DHT whose BITS counts oversubscribe the code space must be
    rejected (ValueError is caught into quarantine, not propagated)."""
    b = bytearray(_base())
    i = b.index(b"\xff\xc4")
    # DC luma table: BITS start at offset i+5; claim 200 codes of length 1
    b[i + 5] = 200
    assert decode_jpeg_pixels(bytes(b)) is None


def test_non_integer_sampling_ratio_quarantines():
    """hmax=3, hi=2 -> non-integer upsample ratio: quarantine."""
    payload = jpeg_encode_baseline(
        [np.zeros((2, 64), np.int32) for _ in range(3)] , 16, 8,
        sampling=((1, 1), (1, 1), (1, 1)),
    )
    b = bytearray(payload)
    i = b.index(b"\xff\xc0")
    b[i + 4 + 7] = 0x31  # component 1 sampling 3x1
    b[i + 4 + 10] = 0x21  # component 2 sampling 2x1 (3 % 2 != 0)
    assert decode_jpeg_pixels(bytes(b)) is None


def test_synthetic_media_grammar_matches_decoder():
    """The id-parameterized grammar in synthetic_jpeg_media, replayed
    locally over a span of ids (both subsamplings, restart and not):
    decoded channel sums equal the oracle arithmetic."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        jpeg_encode_dc_only as enc,
    )

    for i in range(12):
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
        payload = enc(w, h, [dcy, dcb, dcr], sampling=sampling,
                      restart_interval=2 if i % 3 == 1 else 0)
        ww, hh, raw = decode_jpeg_pixels(payload)
        assert (ww, hh) == (w, h)
        got = np.frombuffer(raw, np.uint8).reshape(-1, 3).sum(
            axis=0, dtype=np.int64)
        exp = np.zeros(3, dtype=np.int64)
        for yb in range(n_y):
            c = yb if i % 2 == 0 else yb // 4
            exp += 64 * np.array(
                _rgb(128 + dcy[yb], 128 + dcb[c], 128 + dcr[c]),
                dtype=np.int64,
            )
        assert (got == exp).all(), i
