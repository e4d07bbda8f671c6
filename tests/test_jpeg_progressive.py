"""Progressive JPEG (SOF2) decode tests.

Strategy: the progressive encoder twin (`jpeg_encode_progressive`) and
the baseline encoder consume IDENTICAL quantized coefficient stacks, and
a fully-refining scan script reconstructs the exact coefficients — so
`decode(baseline_bytes) == decode(progressive_bytes)` pixel-for-pixel is
the correctness oracle. The two entropy layers share nothing (run/size
single-scan vs spectral-selection + successive-approximation multi-scan
with EOB runs and correction bits), so agreement through the independent
baseline path pins the progressive machinery rather than mirroring it.

Reference context: /root/reference/src/main.py has no image ops at all
(fake text content only, main.py:977-1020) — progressive decode is a
north-star training-pipeline capability for majority-JPEG crawl corpora.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators.jpeg import (
    _MAX_PROG_SCANS,
    _decode_frame,
    decode_jpeg_pixels,
    jpeg_encode_baseline,
    jpeg_encode_dc_only,
    jpeg_encode_progressive,
)
from amazon_macie_activity_generator_spark.operators.multimodal import (
    decode_pixels_bytes,
)


def _coeffs(w, h, sampling, density, seed, amp=40):
    rng = np.random.RandomState(seed)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = []
    for hi, vi in sampling:
        n = mcux * mcuy * hi * vi
        arr = np.zeros((n, 64), dtype=np.int64)
        mask = rng.rand(n, 64) < density
        arr[mask] = rng.randint(-amp, amp, size=int(mask.sum()))
        arr[:, 0] = rng.randint(-32, 32, size=n)
        out.append(arr)
    return out


def _assert_equivalent(w, h, sampling, coeffs, restart=0, scans=None):
    base = jpeg_encode_baseline(
        coeffs, w, h, sampling=sampling, restart_interval=restart
    )
    prog = jpeg_encode_progressive(
        coeffs, w, h, sampling=sampling, restart_interval=restart,
        scans=scans,
    )
    db = decode_jpeg_pixels(base)
    dp = decode_jpeg_pixels(prog)
    assert db is not None and dp is not None
    assert db == dp


@pytest.mark.parametrize(
    "w,h,sampling,restart,density",
    [
        (24, 16, ((1, 1), (1, 1), (1, 1)), 0, 0.3),
        (40, 24, ((2, 2), (1, 1), (1, 1)), 0, 0.3),
        (48, 16, ((2, 1), (1, 1), (1, 1)), 2, 0.3),
        (16, 48, ((1, 2), (1, 1), (1, 1)), 0, 0.3),
        (17, 13, ((2, 2), (1, 1), (1, 1)), 0, 0.05),
        (64, 64, ((1, 1), (1, 1), (1, 1)), 3, 0.01),
    ],
)
def test_progressive_matches_baseline(w, h, sampling, restart, density):
    coeffs = _coeffs(w, h, sampling, density, seed=w * 1000 + h)
    _assert_equivalent(w, h, sampling, coeffs, restart=restart)


def test_progressive_grayscale_matches_baseline():
    coeffs = _coeffs(24, 24, ((1, 1),), 0.2, seed=5)[:1]
    _assert_equivalent(24, 24, ((1, 1),), coeffs)


def test_long_eob_runs_across_blocks():
    # mostly-empty 128x64 4:2:0 — AC scans are dominated by EOBn symbols
    # with run counts far above 1, the path the EOB-run bookkeeping
    # (including the refine-side current-block-inclusive count) must get
    # exactly right to land on identical pixels
    sampling = ((2, 2), (1, 1), (1, 1))
    coeffs = _coeffs(128, 64, sampling, 0.002, seed=9)
    _assert_equivalent(128, 64, sampling, coeffs)


def test_eob_runs_with_restarts_reset():
    # restart markers must reset the EOB run and the DC predictors in
    # every scan kind; interval 1 forces a reset between every MCU
    sampling = ((2, 2), (1, 1), (1, 1))
    coeffs = _coeffs(64, 64, sampling, 0.01, seed=11)
    _assert_equivalent(64, 64, sampling, coeffs, restart=1)


def test_custom_spectral_split_script():
    # five-band luma split with a 3-level successive approximation —
    # deeper than the default script, so multi-pass refinement of the
    # same coefficient is exercised
    sampling = ((1, 1), (1, 1), (1, 1))
    allc = (0, 1, 2)
    scans = [
        (allc, 0, 0, 0, 3),
        ((0,), 1, 2, 0, 3), ((0,), 3, 9, 0, 3), ((0,), 10, 20, 0, 3),
        ((0,), 21, 40, 0, 3), ((0,), 41, 63, 0, 3),
        ((1,), 1, 63, 0, 3), ((2,), 1, 63, 0, 3),
        (allc, 0, 0, 3, 2), (allc, 0, 0, 2, 1), (allc, 0, 0, 1, 0),
        ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
        ((1,), 1, 63, 3, 2), ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 3, 2), ((2,), 1, 63, 2, 1), ((2,), 1, 63, 1, 0),
    ]
    coeffs = _coeffs(32, 24, sampling, 0.4, seed=13, amp=200)
    _assert_equivalent(32, 24, sampling, coeffs, scans=scans)


def test_dc_only_progressive_exact_pixels():
    # the multimodal_pixels_jpeg oracle hook: with the flat q=8 table a
    # DC-only block decodes to exactly clamp(dc + 128) regardless of the
    # entropy layout, so the progressive grammar route keeps the
    # arithmetic oracle intact
    dcs = [[10, -32, 5, 31], [3, 2, 1, 0], [-1, -2, -3, -4]]
    out = decode_jpeg_pixels(
        jpeg_encode_dc_only(16, 16, dcs, sampling=((1, 1),) * 3,
                            progressive=True)
    )
    assert out is not None
    w, h, rgb = out
    a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    y, cb, cr = 10 + 128, 3 + 128, -1 + 128
    exp = (
        y + ((91881 * (cr - 128) + 32768) >> 16),
        y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16),
        y + ((116130 * (cb - 128) + 32768) >> 16),
    )
    assert tuple(a[0, 0]) == exp


def test_dc_only_progressive_equals_baseline_all_routes():
    for i in range(12):
        w, h = 16 * (1 + i % 3), 16 * (1 + i % 2)
        n_c = (w // 16) * (h // 16)
        dcs = [
            [(i + 7 * b) % 64 - 32 for b in range(4 * n_c)],
            [(2 * i + 11 * b) % 64 - 32 for b in range(n_c)],
            [(3 * i + 5 * b) % 64 - 32 for b in range(n_c)],
        ]
        kw = dict(sampling=((2, 2), (1, 1), (1, 1)),
                  restart_interval=2 if i % 3 == 1 else 0)
        assert decode_jpeg_pixels(
            jpeg_encode_dc_only(w, h, dcs, progressive=True, **kw)
        ) == decode_jpeg_pixels(jpeg_encode_dc_only(w, h, dcs, **kw))


def test_dispatch_reports_jpeg_format():
    b = jpeg_encode_dc_only(16, 16, [[1] * 4, [2] * 4, [3] * 4],
                            sampling=((1, 1),) * 3, progressive=True)
    out = decode_pixels_bytes(b)
    assert out is not None and out[0] == "jpeg" and out[1:3] == (16, 16)


# ---------------------------------------------------------------------------
# hostile / malformed input: quarantine (None), never raise or hang
# ---------------------------------------------------------------------------


def _prog_sample() -> bytes:
    coeffs = _coeffs(32, 24, ((2, 2), (1, 1), (1, 1)), 0.2, seed=3)
    return jpeg_encode_progressive(
        coeffs, 32, 24, sampling=((2, 2), (1, 1), (1, 1)),
        restart_interval=2,
    )


def test_truncations_quarantine():
    b = _prog_sample()
    for cut in list(range(0, 64)) + list(
        range(64, len(b), max(1, len(b) // 97))
    ):
        out = decode_jpeg_pixels(b[:cut])
        assert out is None or isinstance(out, tuple)


def test_bitflips_never_raise():
    b = _prog_sample()
    rng = np.random.RandomState(0)
    for _ in range(300):
        pos = int(rng.randint(2, len(b)))
        bit = 1 << int(rng.randint(8))
        mutated = bytearray(b)
        mutated[pos] ^= bit
        out = decode_jpeg_pixels(bytes(mutated))
        assert out is None or (isinstance(out, tuple) and len(out) == 3)


def test_scan_count_cap_quarantines():
    # repeat a legal DC-refine scan header + empty-ish entropy far past
    # the cap; must quarantine instead of grinding through hundreds of
    # crafted scans
    coeffs = [np.zeros((1, 64), dtype=np.int64)] * 3
    scans = [((0, 1, 2), 0, 0, 0, 3)] + [
        ((0, 1, 2), 0, 0, 3 - (i % 3), 2 - (i % 3))
        for i in range(3)
    ]
    b = jpeg_encode_progressive(coeffs, 8, 8, sampling=((1, 1),) * 3,
                                scans=scans)
    assert decode_jpeg_pixels(b) is not None
    # splice the last refine scan in far beyond the cap
    eoi = b[-2:]
    body = b[:-2]
    sos_at = body.rfind(b"\xff\xda")
    extra = body[sos_at:]
    flood = body + extra * (_MAX_PROG_SCANS + 4) + eoi
    assert decode_jpeg_pixels(flood) is None


def test_dimension_bomb_quarantines_before_allocation():
    # SOF2 claiming near-max dims followed by a single tiny scan: the
    # remaining-bits >= total-blocks guard must reject before the
    # coefficient grids are staged
    coeffs = [np.zeros((1, 64), dtype=np.int64)] * 3
    b = bytearray(jpeg_encode_progressive(coeffs, 8, 8,
                                          sampling=((1, 1),) * 3))
    sof = bytes(b).find(b"\xff\xc2")
    h_at = sof + 5  # SOF body: precision(1) then height(2) width(2)
    b[h_at:h_at + 2] = (4000).to_bytes(2, "big")
    b[h_at + 2:h_at + 4] = (4000).to_bytes(2, "big")
    assert decode_jpeg_pixels(bytes(b)) is None


def test_ac_scan_with_multiple_components_quarantines():
    b = bytearray(_prog_sample())
    # find an AC SOS (ns == 1) and corrupt ns to 2 — progressive AC
    # scans are single-component by spec
    i = 2
    while i < len(b) - 1:
        if b[i] == 0xFF and b[i + 1] == 0xDA:
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            ns = b[i + 4]
            if ns == 1:
                b[i + 4] = 2
                break
            i += 2 + seglen
        else:
            i += 1
    assert decode_jpeg_pixels(bytes(b)) is None


def test_refine_magnitude_above_one_quarantines():
    # a refinement scan symbol with s > 1 is malformed (G.1.2.3 allows
    # only 0 or 1); craft by corrupting entropy data of a refine scan and
    # rely on the never-raise contract instead of asserting None (the
    # flip may land anywhere) — the targeted s>1 rejection is covered by
    # the decoder returning None rather than writing garbage, checked
    # here via systematic byte stomps over the final scan
    b = _prog_sample()
    last_sos = b.rfind(b"\xff\xda")
    for pos in range(last_sos + 10, min(len(b) - 2, last_sos + 60)):
        mutated = bytearray(b)
        mutated[pos] = 0xEE
        out = decode_jpeg_pixels(bytes(mutated))
        assert out is None or isinstance(out, tuple)


def test_sequential_multiscan_still_quarantines():
    # baseline (SOF0) multi-scan non-interleaved files remain out of
    # scope: a baseline header followed by a single-component scan over a
    # 3-component frame must quarantine, not decode partially
    coeffs = _coeffs(16, 16, ((1, 1),) * 3, 0.2, seed=2)
    b = bytearray(jpeg_encode_baseline(coeffs, 16, 16,
                                       sampling=((1, 1),) * 3))
    sos = bytes(b).find(b"\xff\xda")
    b[sos + 4] = 1  # claim ns=1; header length now inconsistent -> None
    assert decode_jpeg_pixels(bytes(b)) is None


def test_missing_eoi_quarantines():
    b = _prog_sample()
    assert decode_jpeg_pixels(b[:-2]) is None


def test_progressive_dims_parse_via_header_walk():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_image_dims,
    )
    b = _prog_sample()
    assert _parse_image_dims(b) == (32, 24)


# ---------------------------------------------------------------------------
# hand-authored spec streams: decoder evidence INDEPENDENT of both encoder
# twins (the GIF decoder has the same style of test) — every bit below is
# computed by hand from T.81 G.1.2 + the canonical-code rules of Annex C
# ---------------------------------------------------------------------------


def _hand_stream(scans_bits):
    """Assemble an 8x8 grayscale SOF2 file (flat q=8, Annex K DC table,
    the universal AC table) around hand-written per-scan bit strings."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        PROG_AC_TABLE,
        STD_DC_LUMA,
        _seg,
    )

    def bits_to_bytes(bitstr):
        bitstr += "1" * ((8 - len(bitstr) % 8) % 8)  # pad with 1s per spec
        raw = bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([8] * 64))
    out += _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big")
                + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    bits_dc, vals_dc = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc))
    bits_ac, vals_ac = PROG_AC_TABLE
    out += _seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac))
    for (ss, se, ahal), bits in scans_bits:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, ahal]))
        out += bits_to_bytes(bits)
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_authored_dc_scans_decode_to_known_pixels():
    """DC first (Al=1, diff=5 -> Annex K category-3 code '100' + bits
    '101'), an all-zero AC band (EOB0 = universal-table code 0x00 at
    length 8), then a DC refine bit 1: final DC = (5 << 1) | 1 = 11, and
    with q=8 a DC-only block decodes to the constant 11 + 128 = 139."""
    b = _hand_stream([
        ((0, 0, 0x01), "100" + "101"),
        ((1, 63, 0x00), "00000000"),
        ((0, 0, 0x10), "1"),
    ])
    out = decode_jpeg_pixels(b)
    assert out is not None and out[:2] == (8, 8)
    assert set(out[2]) == {139}


def test_hand_authored_ac_first_and_refine_coefficients():
    """Exercises AC newly-significant placement, history correction bits,
    and the refine-side sign/ordering rules on hand bits, checked at the
    INTEGER coefficient layer (_decode_frame) so no IDCT is involved:

    - DC first Al=1: diff=5 -> DC 10            ('100'+'101')
    - AC first band 1-63 Al=1: symbol 0x41 (run 4, size 1) + bit '1'
      places +1<<1 = 2 at zigzag k=5, then EOB0  ('01000001'+'1'+'00000000')
    - DC refine Al=0: bit 1 -> DC 11
    - AC refine Al=0: symbol 0x71 (seven zero-HISTORY cells: k=1..4 and
      6..8 — k=5 is history and does not count) + sign '1', then during
      the advance one correction bit '1' for k=5 (2 -> 3), placing +1 at
      k=9; EOB0 sweeps the rest (no nonzero cells -> no bits)
    Final zigzag: [11, 0,0,0,0, 3, 0,0,0, 1, 0...]; dequantized x8 at
    natural positions 0, 2 (ZIGZAG[5]), 24 (ZIGZAG[9])."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        ZIGZAG,
        _decode_frame,
    )

    b = _hand_stream([
        ((0, 0, 0x01), "100" + "101"),
        ((1, 63, 0x01), "01000001" + "1" + "00000000"),
        ((0, 0, 0x10), "1"),
        ((1, 63, 0x10), "01110001" + "1" + "1" + "00000000"),
    ])
    frame = _decode_frame(b)
    assert frame is not None
    w, h, comps = frame
    assert (w, h) == (8, 8) and len(comps) == 1
    coeffs = comps[0]["coeffs"].reshape(64)
    expected = np.zeros(64, dtype=np.int64)
    expected[0] = 11 * 8
    expected[ZIGZAG[5]] = 3 * 8
    expected[ZIGZAG[9]] = 1 * 8
    assert np.array_equal(coeffs, expected)


def test_between_scan_dqt_redefinition_does_not_apply_retroactively():
    """T.81 B.2.4.1 allows redefining a DQT slot between scans; libjpeg
    latches each component's table at its FIRST scan and never looks
    again. Rebuild the known DC-only stream (decodes to constant 139
    with q=8) but redefine table 0 to all-16 before the refine scan:
    with the latch the result is still 139; a last-table-wins decoder
    would dequantize 11*16 and clip to 255."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        PROG_AC_TABLE,
        STD_DC_LUMA,
        _seg,
    )

    def bb(bitstr):
        bitstr += "1" * ((8 - len(bitstr) % 8) % 8)
        raw = bytes(int(bitstr[i:i + 8], 2) for i in range(0, len(bitstr), 8))
        return raw.replace(b"\xff", b"\xff\x00")

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([8] * 64))
    out += _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big")
                + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    bits_dc, vals_dc = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc))
    bits_ac, vals_ac = PROG_AC_TABLE
    out += _seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bb("100" + "101")
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bb("00000000")
    # the redefinition under test: table 0 becomes all-16 mid-stream
    out += _seg(0xDB, b"\x00" + bytes([16] * 64))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bb("1")
    out += b"\xff\xd9"
    res = decode_jpeg_pixels(bytes(out))
    assert res is not None and res[:2] == (8, 8)
    assert set(res[2]) == {139}


# ---------------------------------------------------------------------------
# property fuzz: random coefficients, sampling, restart, script depth
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    wsel=st.integers(1, 5),
    hsel=st.integers(1, 5),
    samp=st.sampled_from([
        ((1, 1), (1, 1), (1, 1)),
        ((2, 2), (1, 1), (1, 1)),
        ((2, 1), (1, 1), (1, 1)),
        ((1, 2), (1, 1), (1, 1)),
    ]),
    density=st.sampled_from([0.0, 0.01, 0.15, 0.6]),
    restart=st.sampled_from([0, 1, 3]),
)
def test_fuzz_progressive_equals_baseline(
    seed, wsel, hsel, samp, density, restart
):
    w, h = 8 * wsel + seed % 7, 8 * hsel + seed % 5
    coeffs = _coeffs(w, h, samp, density, seed=seed, amp=120)
    _assert_equivalent(w, h, samp, coeffs, restart=restart)
