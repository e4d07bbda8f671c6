"""Equivalence pin for the r12 batched baseline-entropy lane
(``_entropy_baseline_batched`` + ``_fast_ac_lut`` + ``_chunks48``).

The batched lane must be observably identical to the scalar lane at the
``decode_jpeg_pixels`` boundary — same accept/reject decision and same
RGB bytes — on well-formed streams, bit-flipped mutants, and
truncations (the r11 LZW discipline: a vectorized lane ships only with
a fuzz pin against the scalar lane on hostile input too). Lanes are
selected by monkeypatching the entropy-bytes gate.
"""
from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators import jpeg as J


def _build(w, h, density, seed=3, rst=0, grayscale=False):
    rng = np.random.default_rng(seed)
    if grayscale:  # 1x1 sampling: the MCU is a single 8x8 block
        sizes = ((-(-w // 8)) * (-(-h // 8)),)
    else:
        nmcu = -(-w // 16) * (-(-h // 16))
        sizes = (4 * nmcu, nmcu, nmcu)
    comps = []
    for nb in sizes:
        arr = np.zeros((nb, 64), dtype=np.int32)
        arr[:, 0] = rng.integers(-32, 32, size=nb)
        mask = rng.random((nb, 63)) < density
        vals = rng.integers(-20, 21, size=(nb, 63))
        vals[vals == 0] = 1
        arr[:, 1:] = np.where(mask, vals, 0)
        comps.append(arr)
    if grayscale:
        return J.jpeg_encode_baseline(comps, w, h, sampling=((1, 1),),
                                      restart_interval=rst)
    return J.jpeg_encode_baseline(comps, w, h, restart_interval=rst)


# big enough that every payload clears the 8 KiB batched gate
_CORPUS = [
    _build(128, 128, 0.35),
    _build(128, 64, 0.6, seed=11),
    _build(128, 128, 0.1, seed=5, rst=2),
    _build(128, 128, 0.5, seed=8, grayscale=True),
]


def _both_lanes(payload: bytes, monkeypatch):
    monkeypatch.setattr(J, "_AC_FAST_MIN_ENTROPY_BYTES", 1 << 60)
    scalar = J.decode_jpeg_pixels(payload)
    monkeypatch.setattr(J, "_AC_FAST_MIN_ENTROPY_BYTES", 0)
    monkeypatch.setattr(J, "_AC_FAST_MIN_ENTROPY_BYTES_UNCACHED", 0)
    batched = J.decode_jpeg_pixels(payload)
    return scalar, batched


@pytest.mark.parametrize("idx", range(len(_CORPUS)))
def test_lanes_agree_on_wellformed(idx, monkeypatch):
    scalar, batched = _both_lanes(_CORPUS[idx], monkeypatch)
    assert scalar is not None
    assert scalar == batched


@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.integers(0, len(_CORPUS) - 1),
    st.lists(st.tuples(st.integers(0, 100_000), st.integers(0, 255)),
             min_size=1, max_size=8),
)
def test_lanes_agree_on_bitflips(idx, flips):
    payload = bytearray(_CORPUS[idx])
    for pos, val in flips:
        payload[pos % len(payload)] = val
    payload = bytes(payload)
    mp = pytest.MonkeyPatch()
    try:
        scalar, batched = _both_lanes(payload, mp)
        assert scalar == batched  # accept/reject AND pixels
    finally:
        mp.undo()


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(0, len(_CORPUS) - 1), st.integers(0, 100))
def test_lanes_agree_on_truncation(idx, pct):
    payload = _CORPUS[idx][: len(_CORPUS[idx]) * pct // 100]
    mp = pytest.MonkeyPatch()
    try:
        scalar, batched = _both_lanes(payload, mp)
        assert scalar == batched
    finally:
        mp.undo()


def test_fast_ac_lut_entries_match_general_path():
    """Every non-negative fast entry must encode exactly what the base
    LUT + bit-extract + sign-extend produce for that 16-bit window
    (checked over the standard Annex K luma AC table)."""
    bits, vals = J.STD_AC_LUMA
    base = J._decode_lut(bits, vals)
    fast = J._fast_ac_lut(base)
    for idx in range(0, 65536, 97):  # stride sample
        fe = fast[idx]
        e = base[idx]
        ln = e & 31
        rs = e >> 5
        s = rs & 15
        if ln == 0 or s == 0 or ln + s > 16:
            assert fe == -1
            continue
        v = (idx >> (16 - ln - s)) & ((1 << s) - 1)
        ext = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
        assert fe == ((ln + s) << 20) | ((rs >> 4) << 16) | (ext + 32768)


def test_gate_constants_sane():
    assert 0 < J._AC_FAST_MIN_ENTROPY_BYTES < J._AC_FAST_MIN_ENTROPY_BYTES_UNCACHED
