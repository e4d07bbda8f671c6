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
