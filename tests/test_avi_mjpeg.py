"""MJPEG-in-AVI decode (round 12) — the container that closed the
video NotImplementedError seam for the MJPEG case.

Covers: container/frame roundtrip against the direct JPEG decode of
each frame, the arithmetic frame-sum prediction the driver oracle uses,
RIFF details (odd-size pad bytes, LIST rec interleaving, idx1
presence), timing fallbacks (avih vs strh scale/rate, zero-delay
convention), the honest-codec seam (non-MJPEG fccHandler raises),
quarantine lanes (malformed, truncated, inconsistent dims, non-JPEG
frame bytes, empty movi), the pixel budget prefix rule, and the
Spark-level sample_frames wiring. Reference context: the reference's
media surface is synthesize-then-deliver fake objects
(/root/reference/src/main.py:977-1020); real container decode is the
rebuild's extension of that surface.
"""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators import multimodal as mm
from amazon_macie_activity_generator_spark.operators.jpeg import (
    decode_jpeg_pixels,
    jpeg_encode_dc_only,
)
from amazon_macie_activity_generator_spark.operators.multimodal import (
    _avi_encode_mjpeg,
    _decode_avi_mjpeg_frames,
)


def _grammar_frames(i: int):
    """The synthetic_avi_media per-id JPEG frame list."""
    nb = 1 + i % 3
    w, h = 8 * nb, 8
    nf = 1 + i % 6
    frames = []
    for f in range(nf):
        dcy = [(i + 3 * f + 7 * b) % 64 - 32 for b in range(nb)]
        dcb = [(2 * i + 5 * f + 11 * b) % 64 - 32 for b in range(nb)]
        dcr = [(3 * i + 7 * f + 13 * b) % 64 - 32 for b in range(nb)]
        frames.append(jpeg_encode_dc_only(
            w, h, [dcy, dcb, dcr], sampling=((1, 1), (1, 1), (1, 1))))
    return frames, w, h, nf


def _predicted_frame_sum(i: int, f: int) -> int:
    nb = 1 + i % 3
    total = 0
    for b in range(nb):
        y = 128 + (i + 3 * f + 7 * b) % 64 - 32
        cb = (2 * i + 5 * f + 11 * b) % 64 - 32
        cr = (3 * i + 7 * f + 13 * b) % 64 - 32
        r = max(0, min(255, y + ((91881 * cr + 32768) >> 16)))
        g = max(0, min(255, y - ((22554 * cb + 46802 * cr + 32768) >> 16)))
        bb = max(0, min(255, y + ((116130 * cb + 32768) >> 16)))
        total += 64 * (r + g + bb)
    return total


@pytest.mark.parametrize("i", [7, 15, 23, 31, 39, 47, 103, 207])
def test_roundtrip_matches_direct_jpeg_decode_and_arithmetic(i):
    jframes, w, h, nf = _grammar_frames(i)
    out = _decode_avi_mjpeg_frames(_avi_encode_mjpeg(jframes, w, h))
    assert out is not None
    dw, dh, frames = out
    assert (dw, dh) == (w, h)
    assert len(frames) == nf
    for f, (delay, rgb) in enumerate(frames):
        assert delay == 500  # 500000 usec/frame default
        assert rgb == decode_jpeg_pixels(jframes[f])[2]
        assert sum(rgb) == _predicted_frame_sum(i, f)


def test_odd_size_frame_chunks_are_word_aligned():
    # JPEG payload sizes vary; force an odd one by checking the writer
    # pads and the reader steps over the pad without desync
    jframes, w, h, nf = _grammar_frames(23)
    odd = [f + b"\x00" if len(f) % 2 == 0 else f for f in jframes]
    # appended NUL after EOI is tolerated by the JPEG decoder's marker
    # walk; what matters here is chunk alignment across MANY frames
    assert any(len(f) % 2 == 1 for f in odd)
    out = _decode_avi_mjpeg_frames(_avi_encode_mjpeg(odd, w, h))
    assert out is not None and len(out[2]) == nf


def test_rec_list_interleaving_and_stream_prefix():
    jframes, w, h, nf = _grammar_frames(15)
    avi = _avi_encode_mjpeg(jframes, w, h)
    # rebuild the movi body with each 00dc chunk wrapped in LIST rec
    pos = avi.find(b"LIST", 12)
    # simpler: wrap manually from scratch using the module's helpers
    rec_children = b"".join(
        mm._riff_list(b"rec ", mm._riff_chunk(b"00dc", f)) for f in jframes)
    # splice: regenerate via private builder pieces
    hdrl_start = avi.index(b"LIST")
    hdrl_size = int.from_bytes(avi[hdrl_start + 4 : hdrl_start + 8], "little")
    hdrl = avi[hdrl_start : hdrl_start + 8 + hdrl_size + hdrl_size % 2]
    body = b"AVI " + hdrl + mm._riff_list(b"movi", rec_children)
    wrapped = b"RIFF" + len(body).to_bytes(4, "little") + body
    out = _decode_avi_mjpeg_frames(wrapped)
    assert out is not None and len(out[2]) == nf
    assert [sum(rgb) for _, rgb in out[2]] == [
        _predicted_frame_sum(15, f) for f in range(nf)]
    assert pos > 0  # sanity: original had a LIST


def test_timing_falls_back_to_strh_scale_rate():
    jframes, w, h, nf = _grammar_frames(31)
    avi = _avi_encode_mjpeg(jframes, w, h, usec_per_frame=0)
    # writer wrote avih usec=0 AND strh scale=0: no timeline at all
    out = _decode_avi_mjpeg_frames(avi)
    assert out is not None and all(d == 0 for d, _ in out[2])
    # patch strh dwScale to 250000 (rate stays 1e6): 250 ms/frame
    k = avi.index(b"strh") + 8 + 20
    patched = avi[:k] + (250000).to_bytes(4, "little") + avi[k + 4 :]
    out2 = _decode_avi_mjpeg_frames(patched)
    assert out2 is not None and all(d == 250 for d, _ in out2[2])


def test_non_mjpeg_codec_raises():
    jframes, w, h, _ = _grammar_frames(7)
    with pytest.raises(NotImplementedError):
        _decode_avi_mjpeg_frames(
            _avi_encode_mjpeg(jframes, w, h, handler=b"XVID"))


def test_empty_handler_falls_back_to_strf_compression():
    jframes, w, h, nf = _grammar_frames(7)
    avi = _avi_encode_mjpeg(jframes, w, h, handler=b"\x00\x00\x00\x00")
    out = _decode_avi_mjpeg_frames(avi)  # strf biCompression='MJPG'
    assert out is not None and len(out[2]) == nf


def test_quarantine_lanes_return_none():
    jframes, w, h, _ = _grammar_frames(7)
    avi = _avi_encode_mjpeg(jframes, w, h)
    assert _decode_avi_mjpeg_frames(b"") is None
    assert _decode_avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert _decode_avi_mjpeg_frames(avi[:100]) is None  # no movi yet
    # non-JPEG bytes in a declared-MJPEG frame chunk
    junk = _avi_encode_mjpeg([b"\x00" * 32], 8, 8)
    assert _decode_avi_mjpeg_frames(junk) is None
    # undecodable JPEG (SOI then garbage)
    bad = _avi_encode_mjpeg([b"\xff\xd8" + b"\x00" * 16], 8, 8)
    assert _decode_avi_mjpeg_frames(bad) is None
    # inconsistent dims between frames
    a, _, _, _ = _grammar_frames(7)    # 16x8 (nb=2)
    b, _, _, _ = _grammar_frames(15)   # 8x8  (nb=1)
    mixed = _avi_encode_mjpeg([a[0], b[0]], 16, 8)
    assert _decode_avi_mjpeg_frames(mixed) is None
    # movi with zero frames
    empty = _avi_encode_mjpeg([], 8, 8)
    assert _decode_avi_mjpeg_frames(empty) is None


def test_pixel_budget_yields_prefix(monkeypatch):
    jframes, w, h, nf = _grammar_frames(47)  # nf = 6, 24x8 frames
    assert nf == 6
    monkeypatch.setattr(mm, "_MAX_PIXELS", 24 * 8 * 3 + 10)  # 3 frames fit
    out = _decode_avi_mjpeg_frames(_avi_encode_mjpeg(jframes, w, h))
    assert out is not None and len(out[2]) == 3  # in-budget prefix


def test_sample_frames_avi_route(spark):
    import pandas as pd

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    jframes, w, h, nf = _grammar_frames(47)  # nf=6 -> sampled idx 0,2,4
    avi = _avi_encode_mjpeg(jframes, w, h)
    xvid = _avi_encode_mjpeg(jframes, w, h, handler=b"XVID")
    pdf = pd.DataFrame({
        "media_id": pd.array([47, 99], dtype="Int64"),
        "kind": "video",
        "payload": [avi, b"not a container"],
        "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = sample_frames(media, every_ms=1000, max_frames=8,
                         decode_stub=False).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    got = sorted((r["frame_idx"], r["ts_ms"]) for r in by_media[47])
    assert got == [(0, 0), (2, 1000), (4, 2000)]
    for r in by_media[47]:
        assert sum(r["frame_payload"]) == _predicted_frame_sum(
            47, r["frame_idx"])
    assert len(by_media[99]) == 1 and by_media[99][0]["frame_idx"] is None

    # the non-MJPEG codec seam stays loud through Spark too
    pdf2 = pdf.assign(payload=[xvid, avi])
    media2 = spark.createDataFrame(pdf2, schema=MEDIA_SCHEMA)
    with pytest.raises(Exception):  # NotImplementedError crosses Py4J
        sample_frames(media2, decode_stub=False).collect()


def test_synthetic_avi_media_grammar(spark):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_avi_media,
    )

    ids = spark.createDataFrame([(7,), (23,), (None,)], ["doc_id"])
    rows = {r["media_id"]: r for r in synthetic_avi_media(ids).collect()}
    assert set(rows) == {7, 23, None}
    for mid, r in rows.items():
        assert r["kind"] == "video"
        out = _decode_avi_mjpeg_frames(bytes(r["payload"]))
        i = 0 if mid is None else mid  # NULL ids build with i=0
        _, w, h, nf = _grammar_frames(i)
        assert out is not None and (out[0], out[1]) == (w, h)
        assert len(out[2]) == nf


# ------------------------------------------------- GIF interlace pin (r12)

def _gif_grammar_build(i: int) -> bytes:
    """The synthetic_gif_media per-id payload (r12 grammar)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _gif_encode_animated,
    )

    pal = bytes(v for p in range(16) for v in (p, 2 * p, 3 * p))
    w, h = 3 + i % 5, 2 + i % 4
    nf = 1 + i % 6
    if (i // 16) % 2:
        ih = max(1, h - 2)
        frames = [bytes((i + j) % 16 for j in range(w * h))] + [
            bytes((i + 3 * f + j) % 16 for j in range((w - 2) * ih))
            for f in range(1, nf)]
        rects = [None] + [(1, 1, w - 2, ih)] * (nf - 1)
        disp = [1] * nf
        tr = True
    else:
        frames = [bytes((i + 3 * f + j) % 16 for j in range(w * h))
                  for f in range(nf)]
        rects = disp = None
        tr = False
    return _gif_encode_animated(
        frames, pal, w, h, delays_cs=[50] * nf,
        interlace=bool((i // 8) % 2), rects=rects, disposals=disp,
        transparent=tr, transparent_idx=0)


def _clear_interlace_flags(gif: bytes) -> bytes:
    """Walk the GIF block structure and clear every image descriptor's
    interlace bit WITHOUT touching the (still scattered) LZW data —
    i.e. construct the file an interlace-IGNORING decoder would
    effectively see."""
    b = bytearray(gif)
    pos = 13 + 48  # header + 16-entry GCT
    cleared = 0
    while pos < len(b):
        if b[pos] == 0x21:
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif b[pos] == 0x2C:
            b[pos + 9] &= ~0x40
            cleared += 1
            pos += 10 + 1
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif b[pos] == 0x3B:
            break
        else:  # should not happen on grammar files
            raise AssertionError(hex(b[pos]))
    assert cleared > 0
    return bytes(b)


def test_gif_interlace_descatter_is_oracle_observable():
    """The r11 review noted that whole-frame sums of OPAQUE frames are
    row-permutation-invariant, so the frames oracle could not see
    interlace. The r12 grammar (partial-HEIGHT transparent patches:
    patch h-2 rows and screen h rows scatter under different four-pass
    permutations) fixes that: decoding the scattered data as if
    sequential must change the composited sums on interlaced composite
    files. This is the observability proof backing the oracle claim in
    q_multimodal_frames."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
    )

    cands = [i for i in range(3, 600, 8)
             if (i // 8) % 2 and (i // 16) % 2 and (1 + i % 6) > 1]
    assert len(cands) >= 10
    observable = 0
    for i in cands:
        g = _gif_grammar_build(i)
        real = [sum(rgb) for _, rgb in _decode_gif_frames(g)[2]]
        ign = _decode_gif_frames(_clear_interlace_flags(g))
        if ign is None or [sum(rgb) for _, rgb in ign[2]] != real:
            observable += 1
    # every interlaced composite file in the probe distinguishes the
    # decoders today; keep a margin against future grammar tweaks
    assert observable >= len(cands) * 0.8


def test_gif_grammar_full_height_patch_would_be_invariant():
    """Regression guard for the reasoning itself: with a FULL-height
    patch the screen and patch permutations coincide, the whole
    composite is one global row permutation, and sums stay invariant —
    the construction that looked interlace-sensitive but was not. Pin
    that fact so nobody 'simplifies' the grammar back to it."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _decode_gif_frames,
        _gif_encode_animated,
    )

    pal = bytes(v for p in range(16) for v in (p, 2 * p, 3 * p))
    i, w, h, nf = 27, 5, 5, 4
    frames = [bytes((i + j) % 16 for j in range(w * h))] + [
        bytes((i + 3 * f + j) % 16 for j in range((w - 2) * h))
        for f in range(1, nf)]
    g = _gif_encode_animated(
        frames, pal, w, h, delays_cs=[50] * nf, interlace=True,
        rects=[None] + [(1, 0, w - 2, h)] * (nf - 1),
        disposals=[1] * nf, transparent=True, transparent_idx=0)
    real = [sum(rgb) for _, rgb in _decode_gif_frames(g)[2]]
    ign = [sum(rgb) for _, rgb in
           _decode_gif_frames(_clear_interlace_flags(g))[2]]
    assert real == ign  # invariant by symmetry — hence the partial height


# --------------------------------------------- sampling mode (r12, late)

def test_sampling_mode_matches_decode_then_sample():
    """The decoder's sampling mode must emit exactly what decoding
    everything and then running the sampler loop would emit."""
    for i in [7, 15, 23, 31, 39, 47, 103, 207]:
        jframes, w, h, nf = _grammar_frames(i)
        avi = _avi_encode_mjpeg(jframes, w, h)
        full = _decode_avi_mjpeg_frames(avi)
        sampled = _decode_avi_mjpeg_frames(avi, sampling=(1000, 8))
        # reference: replay the sampler over the full decode
        expect = []
        t = nxt = emitted = 0
        for idx, (delay, rgb) in enumerate(full[2]):
            if emitted >= 8:
                break
            if t >= nxt:
                expect.append((idx, t, rgb))
                emitted += 1
                nxt = (t // 1000 + 1) * 1000
            t += delay
        assert sampled is not None and (sampled[0], sampled[1]) == (w, h)
        assert sampled[2] == expect


def test_sampling_mode_skips_decoding_unneeded_frames():
    """A junk chunk at a frame index the sampler never reads must NOT
    quarantine the file in sampling mode (skipped without decode) —
    while the full-decode path still rejects it."""
    jframes, w, h, nf = _grammar_frames(47)  # nf=6: sampled idx 0,2,4
    bad = list(jframes)
    bad[1] = b"\x00" * 40  # not JPEG; frame 1 is never sampled
    avi = _avi_encode_mjpeg(bad, w, h)
    assert _decode_avi_mjpeg_frames(avi) is None  # full path validates all
    sampled = _decode_avi_mjpeg_frames(avi, sampling=(1000, 8))
    assert sampled is not None
    assert [(fi, ts) for fi, ts, _ in sampled[2]] == [
        (0, 0), (2, 1000), (4, 2000)]
    for fi, ts, rgb in sampled[2]:
        assert sum(rgb) == _predicted_frame_sum(47, fi)


def test_sampling_mode_zero_delay_yields_frame_zero_only():
    jframes, w, h, nf = _grammar_frames(47)
    avi = _avi_encode_mjpeg(jframes, w, h, usec_per_frame=0)
    sampled = _decode_avi_mjpeg_frames(avi, sampling=(1000, 8))
    assert sampled is not None and len(sampled[2]) == 1
    assert sampled[2][0][:2] == (0, 0)


def test_sampling_mode_budget_counts_decoded_frames_only(monkeypatch):
    jframes, w, h, nf = _grammar_frames(47)  # 24x8 frames, nf=6
    avi = _avi_encode_mjpeg(jframes, w, h)
    # budget fits exactly two decoded frames; the full path would spend
    # it on frames 0 and 1, sampling mode spends it on 0 and 2
    monkeypatch.setattr(mm, "_MAX_PIXELS", 24 * 8 * 2)
    sampled = _decode_avi_mjpeg_frames(avi, sampling=(1000, 8))
    assert [fi for fi, _, _ in sampled[2]] == [0, 2]


def test_dropped_frame_placeholder_advances_timeline():
    """A zero-length 00dc chunk is a dropped-frame placeholder: no new
    image, but the timeline still ticks — later frames' frame_idx and
    ts_ms must match a real player's clock (ADVICE r12)."""
    jframes, w, h, _ = _grammar_frames(7)
    # frame 0, DROPPED, frame 1 — encoder writes b"" as an empty chunk
    avi = _avi_encode_mjpeg([jframes[0], b"", jframes[1]], w, h)
    # full decode: two real frames, constant per-frame delay (the
    # extended display duration of frame 0 is a documented divergence)
    full = _decode_avi_mjpeg_frames(avi)
    assert full is not None and len(full[2]) == 2
    # sampling mode at 1 ms (emit everything): the second real frame
    # sits at slot 2 / t=1000ms, not slot 1 / t=500ms
    sampled = _decode_avi_mjpeg_frames(avi, sampling=(1, 8))
    assert [(fi, ts) for fi, ts, _ in sampled[2]] == [(0, 0), (2, 1000)]


def test_blank_handler_without_strf_compression_quarantines():
    """fccHandler blank AND no parseable strf biCompression = a file
    that never declares a codec — malformed (return None), not an
    unsupported codec (ADVICE r12). A blank handler with a POSITIVE
    non-MJPEG biCompression still hits the honest codec seam."""
    jframes, w, h, _ = _grammar_frames(7)
    avi = _avi_encode_mjpeg(jframes, w, h, handler=b"\x00\x00\x00\x00")
    # break the strf chunk id so biCompression is never parsed
    k = avi.index(b"strf")
    no_strf = avi[:k] + b"strx" + avi[k + 4 :]
    assert _decode_avi_mjpeg_frames(no_strf) is None
    # positively-declared non-MJPEG biCompression: seam stays loud
    k = avi.index(b"MJPG", avi.index(b"strf"))
    xvid = avi[:k] + b"XVID" + avi[k + 4 :]
    with pytest.raises(NotImplementedError):
        _decode_avi_mjpeg_frames(xvid)


# ------------------------------------------------ DIB route (late r13)


def test_dib_avi_roundtrip_and_grammar(spark):
    """Odd id//8 files on the AVI grammar are uncompressed DIB AVIs:
    decoded frames equal the raw fill and the frame sum matches the
    oracle's direct arithmetic."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_avi_media,
    )

    ids = [15, 31, 47]  # i//8 = 1, 3, 5 — all odd
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_avi_media(df).collect()}
    for i in ids:
        nb = 1 + i % 3
        w, h, nf = 8 * nb, 8, 1 + i % 6
        b = rows[i]
        assert b[:4] == b"RIFF" and b"DIB " in b[:200], i
        out = _decode_avi_mjpeg_frames(b)
        assert out is not None and (out[0], out[1]) == (w, h)
        assert len(out[2]) == nf
        for f, (dms, rgb) in enumerate(out[2]):
            assert dms == 500
            want = bytes((i + 3 * f + j) % 256 for j in range(w * h * 3))
            assert rgb == want, (i, f)
            assert sum(rgb) == sum((i + 3 * f + j) % 256
                                   for j in range(nb * 192))


def test_dib_avi_sampling_mode_and_top_down():
    """Sampling emits even frames; a NEGATIVE strf height (top-down
    DIB) decodes without the row flip."""
    import numpy as np

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _avi_encode_dib,
    )

    w, h, nf = 16, 8, 5
    frames = [bytes((9 + 3 * f + j) % 256 for j in range(w * h * 3))
              for f in range(nf)]
    avi = _avi_encode_dib(frames, w, h)
    s = _decode_avi_mjpeg_frames(avi, sampling=(1000, 8))
    assert [r[0] for r in s[2]] == [0, 2, 4]
    assert [r[1] for r in s[2]] == [0, 1000, 2000]
    assert all(r[2] == frames[r[0]] for r in s[2])

    # flip strf height negative and store rows top-down: same decode
    b = bytearray(avi)
    at = bytes(b).find(b"strf") + 8 + 8
    b[at:at + 4] = (-h).to_bytes(4, "little", signed=True)
    stride = (w * 3 + 3) // 4 * 4
    i2 = 0
    while True:
        i2 = bytes(b).find(b"00db", i2 + 1)
        if i2 < 0:
            break
        # skip the idx1 entries, which reuse the fourcc (their second
        # field is the 0x10 keyframe flag, not the frame size)
        if int.from_bytes(b[i2 + 4:i2 + 8], "little") != stride * h:
            continue
        body = bytes(b[i2 + 8 : i2 + 8 + stride * h])
        a = np.frombuffer(body, np.uint8).reshape(h, stride)[::-1]
        b[i2 + 8 : i2 + 8 + stride * h] = a.tobytes()
    out = _decode_avi_mjpeg_frames(bytes(b))
    assert out is not None and [fr for _, fr in out[2]] == frames


def test_dib_avi_hostile_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _avi_encode_dib,
        _avi_encode_mjpeg,
    )

    frames = [bytes(16 * 8 * 3)]
    good = _avi_encode_dib(frames, 16, 8)
    assert _decode_avi_mjpeg_frames(good) is not None
    # short frame chunk: quarantine, not a crash
    cut = bytearray(good)
    at = bytes(cut).find(b"00db") + 4
    cut[at:at + 4] = (8).to_bytes(4, "little")
    assert _decode_avi_mjpeg_frames(bytes(cut)) is None
    # 16-bpp DIB: unsupported depth quarantines (not NotImplementedError)
    d16 = _avi_encode_mjpeg([b"\x00" * 64], 4, 4, handler=b"DIB ",
                            compression=bytes(4), chunk_suffix=b"db",
                            bitcount=16)
    assert _decode_avi_mjpeg_frames(d16) is None
    # blank handler + BI_RGB compression: still the DIB route
    blank = _avi_encode_mjpeg(
        [bytes(((16 * 3 + 3) // 4 * 4) * 8)], 16, 8,
        handler=b"\x00\x00\x00\x00", compression=bytes(4),
        chunk_suffix=b"db")
    assert _decode_avi_mjpeg_frames(blank) is not None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_dib_avi_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _avi_encode_dib,
    )

    frames = [bytes((15 + 3 * f + j) % 256 for j in range(16 * 8 * 3))
              for f in range(3)]
    payload = bytearray(_avi_encode_dib(frames, 16, 8))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    try:
        out = _decode_avi_mjpeg_frames(bytes(payload))
    except NotImplementedError:
        return  # a flip can rewrite the codec tags: the honest seam
    assert out is None or (out[0] > 0 and out[1] > 0)
