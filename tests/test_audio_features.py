"""Real WAV PCM decode + audio feature extraction.

The audio twin of the pixel-decode tests: `_decode_wav_pcm` /
`extract_audio_features` must produce EXACT integer stats over the full
integer-PCM matrix (8 unsigned-centered / 16 / 24 sign-extended / 32 bit,
mono+stereo), truncate gracefully, and quarantine (NULL stats) anything
malformed — never raise, never a dead task.

Reference context: /root/reference/src/main.py has no media ops at all;
audio feature extraction is a north-star training-pipeline capability
(multimodal columns clause).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_macie_activity_generator_spark.operators.multimodal import (
    _decode_wav_pcm,
    _wav_bytes,
    _wav_encode,
    extract_audio_features,
    synthetic_audio_media,
)


def _grammar_samples(i: int):
    bits = (8, 16, 24)[i % 3]
    nch = 1 + i % 2
    rate = 8000 * (1 + i % 3)
    n_frames = 50 + i % 200
    j = np.arange(n_frames * nch, dtype=np.int64)
    samples = ((i * 7 + 13 * j) % 201) - 100
    return bits, nch, rate, samples.reshape(n_frames, nch)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("nch", [1, 2])
def test_pcm_round_trip_exact(bits, nch):
    rng = np.random.RandomState(bits * 10 + nch)
    lo, hi = (-128, 128) if bits == 8 else (-(1 << (bits - 2)), 1 << (bits - 2))
    frames = rng.randint(lo, hi, size=(37, nch)).astype(np.int64)
    b = _wav_encode(frames, 44100, bits)
    out = _decode_wav_pcm(b)
    assert out is not None
    rate, got = out
    assert rate == 44100 and got.shape == (37, nch)
    assert np.array_equal(got, frames)


def test_24bit_sign_extension_extremes():
    frames = np.array([[-(1 << 23)], [(1 << 23) - 1], [0], [-1]],
                      dtype=np.int64)
    out = _decode_wav_pcm(_wav_encode(frames, 8000, 24))
    assert out is not None and np.array_equal(out[1], frames)


def test_8bit_centered_convention():
    # stored unsigned 0..255; decoded centered so silence (128) is 0
    frames = np.array([[-128], [0], [127]], dtype=np.int64)
    out = _decode_wav_pcm(_wav_encode(frames, 8000, 8))
    assert out is not None and np.array_equal(out[1], frames)


def test_truncated_data_chunk_decodes_complete_frames():
    frames = np.arange(20, dtype=np.int64).reshape(10, 2) * 100
    b = _wav_encode(frames, 16000, 16)
    cut = b[: len(b) - 5]  # drops the last frame and a bit more
    out = _decode_wav_pcm(cut)
    assert out is not None
    assert out[1].shape[0] == (len(cut) - 44) // 4
    assert np.array_equal(out[1], frames[: out[1].shape[0]])


def test_legacy_wav_bytes_still_decode():
    # the r7-era duration fixture: mono 16-bit 8 kHz with byte fill
    b = _wav_bytes(11)
    out = _decode_wav_pcm(b)
    assert out is not None
    rate, frames = out
    assert rate == 8000 and frames.shape == (100 + 11 % 400, 1)


@pytest.mark.parametrize("mutate", [
    lambda b: b"",                                       # empty
    lambda b: b[:30],                                    # truncated header
    lambda b: b.replace(b"RIFF", b"RIFX", 1),            # wrong magic
    lambda b: b.replace(b"WAVE", b"AVI ", 1),            # not WAVE
    lambda b: b[:20] + (3).to_bytes(2, "little") + b[22:],   # float fmt
    lambda b: b[:20] + (2).to_bytes(2, "little") + b[22:],   # MS-ADPCM tag on a PCM-shaped fmt (no ext => no spb/coefs): malformed (real 0x02 decode since r13)
    lambda b: b[:34] + (12).to_bytes(2, "little") + b[36:],  # 12-bit depth
    lambda b: b[:32] + (7).to_bytes(2, "little") + b[34:],   # bad align
    lambda b: b[:24] + (0).to_bytes(4, "little") + b[28:],   # zero rate
    lambda b: b.replace(b"data", b"LIST", 1),            # no data chunk
])
def test_hostile_variants_quarantine(mutate):
    good = _wav_encode(np.zeros((8, 1), dtype=np.int64), 8000, 16)
    assert _decode_wav_pcm(mutate(good)) is None


def test_sample_budget_bomb_quarantines():
    # a REAL over-budget payload (one sample past the 16M cap, ~32 MB of
    # zeros) must quarantine before feature math runs
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _MAX_SAMPLES,
    )
    n = _MAX_SAMPLES + 1
    data = bytes(2 * n)  # 16-bit mono zeros
    b = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
         + b"fmt " + (16).to_bytes(4, "little")
         + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
         + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
         + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
         + b"data" + len(data).to_bytes(4, "little") + data)
    assert _decode_wav_pcm(b) is None
    # the same file one frame shorter decodes (csize still claims n,
    # the slice truncates to the n-1 complete frames actually present)
    assert _decode_wav_pcm(b[:-4]) is not None


def test_claimed_oversize_data_chunk_truncates_not_allocates():
    # a data chunk CLAIMING 1 GB over an 8-frame file must decode the 8
    # real frames (the slice bounds it), not stage a giant buffer
    b = bytearray(_wav_encode(np.ones((8, 1), dtype=np.int64), 8000, 16))
    at = bytes(b).find(b"data") + 4
    b[at:at + 4] = (1 << 30).to_bytes(4, "little")
    out = _decode_wav_pcm(bytes(b))
    assert out is not None and out[1].shape == (8, 1)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=2048))
def test_random_bytes_never_raise(data):
    out = _decode_wav_pcm(data)
    assert out is None or (out[0] > 0 and out[1].ndim == 2)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_wavs_never_raise(flips):
    payload = bytearray(_wav_encode(
        (np.arange(60, dtype=np.int64).reshape(30, 2) * 7 % 1000) - 500,
        22050, 24,
    ))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    assert out is None or (out[0] > 0 and out[1].ndim == 2)


# ---------------------------------------------------------------------------
# Float (wFormatTag 3) + WAVE_FORMAT_EXTENSIBLE lanes (round 11)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [32, 64])
@pytest.mark.parametrize("nch", [1, 2])
def test_float_lane_maps_to_16bit_lattice_exact(bits, nch):
    # integers k in [-32768, 32767] stored as k/32768 are exact in f32
    # (|k| < 2^24) and must decode back to exactly k
    rng = np.random.RandomState(bits + nch)
    k = rng.randint(-32768, 32768, size=(41, nch)).astype(np.int64)
    b = _wav_encode(k / 32768.0, 48000, bits, fmt="float")
    out = _decode_wav_pcm(b)
    assert out is not None
    rate, got = out
    assert rate == 48000 and np.array_equal(got, k)


def test_float_lane_clips_out_of_range():
    b = _wav_encode(np.array([[1.5], [-2.0], [0.0]]), 8000, 32, fmt="float")
    out = _decode_wav_pcm(b)
    assert out is not None
    assert out[1].ravel().tolist() == [32767, -32768, 0]


def test_float_lane_nonfinite_quarantines():
    for bad in (np.nan, np.inf, -np.inf):
        b = _wav_encode(np.array([[0.5], [bad]]), 8000, 32, fmt="float")
        assert _decode_wav_pcm(b) is None


def test_float_lane_rejects_integer_depths():
    # tag 3 with a 16-bit container is malformed — quarantine, not decode
    b = bytearray(_wav_encode(np.zeros((8, 1), dtype=np.int64), 8000, 16))
    b[20:22] = (3).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None


@pytest.mark.parametrize("fmt,bits", [("pcm", 16), ("pcm", 24),
                                      ("float", 32)])
def test_extensible_wrapper_round_trip(fmt, bits):
    if fmt == "float":
        k = np.arange(-10, 10, dtype=np.int64).reshape(10, 2)
        frames = k / 32768.0
        want = k
    else:
        frames = want = (np.arange(20, dtype=np.int64).reshape(10, 2)
                         * 99 - 500)
    b = _wav_encode(frames, 22050, bits, fmt=fmt, extensible=True)
    # wrapper sanity: fmt chunk is 40 bytes and the tag is 0xFFFE
    assert b[16:20] == (40).to_bytes(4, "little")
    assert b[20:22] == (0xFFFE).to_bytes(2, "little")
    out = _decode_wav_pcm(b)
    assert out is not None
    rate, got = out
    assert rate == 22050 and np.array_equal(got, want)


def test_extensible_unknown_guid_quarantines():
    b = bytearray(_wav_encode(np.ones((8, 1), dtype=np.int64), 8000, 16,
                              extensible=True))
    b[34] ^= 0xFF  # corrupt a GUID tail byte (offset 32+2 into fmt at 20)
    assert _decode_wav_pcm(bytes(b)) is None


def test_extensible_truncated_fmt_quarantines():
    # claims 0xFFFE but the fmt chunk is only the 16 base bytes
    b = bytearray(_wav_encode(np.ones((8, 1), dtype=np.int64), 8000, 16))
    b[20:22] = (0xFFFE).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None


def test_undersized_fmt_chunk_rejected_not_misparsed():
    # a fmt chunk declaring csize 12 would have the data chunk's header
    # read as its rate/align fields — both decoders must reject it
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_wav_duration_ms,
    )

    good = _wav_encode(np.ones((8, 1), dtype=np.int64), 8000, 16)
    bad = bytearray(good)
    bad[16:20] = (12).to_bytes(4, "little")  # fmt csize: 16 -> 12
    assert _decode_wav_pcm(bytes(bad)) is None
    assert _parse_wav_duration_ms(bytes(bad)) is None
    assert _parse_wav_duration_ms(good) is not None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_float_extensible_never_raise(flips):
    payload = bytearray(_wav_encode(
        np.linspace(-0.9, 0.9, 64).reshape(32, 2), 16000, 32,
        fmt="float", extensible=True,
    ))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    assert out is None or (out[0] > 0 and out[1].ndim == 2)


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------


def test_extract_audio_features_stage_exact(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    media = synthetic_audio_media(ids)
    got = {
        r["media_id"]: r
        for r in extract_audio_features(media).collect()
    }
    assert len(got) == 24
    for i in range(24):
        bits, nch, rate, frames = _grammar_samples(i)
        if i % 7 == 5:  # r12 IMA ADPCM lane: mono, lossy — the expected
            # samples are the codec's decoded track, not the input
            nch = 1
            track = _ima_reference_track(
                [((i * 7 + 13 * j) % 201) - 100
                 for j in range(50 + i % 200)],
                9 + 8 * (i % 3))
            frames = np.array(track, dtype=np.int64).reshape(-1, 1)
        elif i % 7 == 3:  # r13 MS-ADPCM lane: mono, lossy likewise
            nch = 1
            track = _ms_reference_track(
                [((i * 7 + 13 * j) % 201) - 100
                 for j in range(50 + i % 200)],
                10 + 8 * (i % 3), (i // 7) % 7, 16 + (i % 11) * 9)
            frames = np.array(track, dtype=np.int64).reshape(-1, 1)
        elif i % 7 in (1, 6):  # r13 G.711 lanes: stateless companding
            law = "ulaw" if i % 7 == 1 else "alaw"
            nf = 50 + i % 200
            frames = np.array([
                _g711_reference(((i * 7 + 13 * j) % 201 - 100) * 327, law)
                for j in range(nf * nch)
            ], dtype=np.int64).reshape(nf, nch)
        flat = frames.ravel()
        r = got[i]
        assert r["sample_rate"] == rate
        assert r["n_channels"] == nch
        assert r["n_frames"] == frames.shape[0]
        assert r["duration_ms"] == frames.shape[0] * 1000 // rate
        assert r["sample_sum"] == int(flat.sum())
        assert r["abs_peak"] == int(np.abs(flat).max())
        assert r["rms"] == pytest.approx(
            float(np.sqrt(np.mean(flat.astype(np.float64) ** 2)))
        )


def test_extract_audio_features_quarantines_garbage(spark):
    import pandas as pd

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    pdf = pd.DataFrame({
        "media_id": pd.array([1, 2, 3], dtype="Int64"),
        "kind": "audio",
        "payload": [b"not a wav", None,
                    _wav_encode(np.ones((4, 1), dtype=np.int64), 8000, 16)],
        "source_uri": "x",
    })
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert rows[1]["sample_rate"] is None and rows[1]["rms"] is None
    assert rows[2]["sample_rate"] is None
    assert rows[3]["sample_sum"] == 4 and rows[3]["abs_peak"] == 1


def test_null_id_still_yields_row(spark):
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": pd.array([None, 5], dtype="Int64")})
    df = spark.createDataFrame(pdf)
    out = extract_audio_features(synthetic_audio_media(df)).collect()
    assert len(out) == 2
    assert any(r["media_id"] is None and r["n_frames"] is not None
               for r in out)  # NULL id synthesizes id 0's payload


# ----------------------------------------------------- IMA ADPCM (r12)

IT = (-1, -1, -1, -1, 2, 4, 6, 8)
ST = (7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)


def _ima_reference_track(xs, spb):
    """Independent encode-by-decode state replay (the oracle's recursive
    CTE in Python form): the decoded track of _wav_encode_ima_adpcm."""
    out = []
    pred = idx = 0
    for t, x in enumerate(xs):
        if t % spb == 0:
            pred = max(-32768, min(32767, int(x)))
            out.append(pred)
            continue
        d = x - pred
        sign = d < 0
        if sign:
            d = -d
        step = ST[idx]
        n = 0
        if d >= step:
            n |= 4
            d -= step
        if d >= step >> 1:
            n |= 2
            d -= step >> 1
        if d >= step >> 2:
            n |= 1
        diff = step >> 3
        if n & 4:
            diff += step
        if n & 2:
            diff += step >> 1
        if n & 1:
            diff += step >> 2
        pred = pred - diff if sign else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IT[n]))
        out.append(pred)
    return out


@pytest.mark.parametrize("i", [5, 12, 19, 26, 47, 103, 215, 397])
def test_ima_adpcm_grammar_roundtrip(i):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ima_adpcm,
    )

    rate = 8000 * (1 + i % 3)
    nf = 50 + i % 200
    spb = 9 + 8 * (i % 3)
    xs = [((i * 7 + 13 * j) % 201) - 100 for j in range(nf)]
    wav = _wav_encode_ima_adpcm(np.array(xs).reshape(-1, 1), rate, spb)
    out = _decode_wav_pcm(wav)
    assert out is not None
    r, frames = out
    assert r == rate and frames.shape == (nf, 1)
    assert frames[:, 0].tolist() == _ima_reference_track(xs, spb)


def test_ima_adpcm_stereo_roundtrip():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ima_adpcm,
    )

    rng = np.random.default_rng(5)
    xs = rng.integers(-3000, 3000, size=(101, 2))
    out = _decode_wav_pcm(_wav_encode_ima_adpcm(xs, 22050, 9))
    assert out is not None and out[1].shape == (101, 2)
    for ch in range(2):
        assert out[1][:, ch].tolist() == _ima_reference_track(
            [int(v) for v in xs[:, ch]], 9)


def test_ima_adpcm_fact_truncates_padded_final_block():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ima_adpcm,
    )

    xs = np.arange(20).reshape(-1, 1) * 50  # 20 frames, spb=9 -> 3 blocks
    wav = _wav_encode_ima_adpcm(xs, 8000, 9)
    out = _decode_wav_pcm(wav)
    assert out is not None and out[1].shape == (20, 1)  # not 27
    # without the fact chunk, all blocks count as full
    at = wav.index(b"fact")
    no_fact = wav[:at] + wav[at + 12 :]
    out2 = _decode_wav_pcm(no_fact)
    assert out2 is not None and out2[1].shape == (27, 1)
    assert out2[1][:20, 0].tolist() == out[1][:, 0].tolist()


def test_ima_adpcm_hostile_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ima_adpcm,
    )

    wav = _wav_encode_ima_adpcm(np.arange(100).reshape(-1, 1), 8000, 9)
    assert _decode_wav_pcm(wav) is not None
    # declared samples-per-block inconsistent with block align
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 8 + 18
    b[k : k + 2] = (11).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None
    # hostile header step index > 88
    b = bytearray(wav)
    b[wav.index(b"data") + 8 + 2] = 200
    assert _decode_wav_pcm(bytes(b)) is None
    # 3-channel ADPCM unsupported
    b = bytearray(wav)
    b[wav.index(b"fmt ") + 8 + 2 : wav.index(b"fmt ") + 8 + 4] = (
        (3).to_bytes(2, "little"))
    assert _decode_wav_pcm(bytes(b)) is None


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_adpcm_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ima_adpcm,
    )

    good = _wav_encode_ima_adpcm(
        (np.arange(150) * 37 % 401 - 200).reshape(-1, 1), 8000, 17)
    payload = bytearray(good)
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    if out is not None:
        rate, frames = out
        assert frames.ndim == 2 and frames.shape[0] >= 1


# ----------------------------------------------------- MS-ADPCM (r13)

MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64),
            (240, 0), (460, -208), (392, -232))
MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614, 768)  # by |code|


def _ms_reference_track(xs, spb, predictor, d0):
    """Independent encode-by-decode state replay (the oracle's recursive
    CTE in Python form): the decoded track of _wav_encode_ms_adpcm."""
    c1, c2 = MS_COEFS[predictor]
    out = []
    s1 = s2 = dlt = 0
    for t, x in enumerate(xs):
        pos = t % spb
        if pos == 0:
            d, dlt = int(x), d0
            s1, s2 = d, s1
        elif pos == 1:
            d = int(x)
            s1, s2 = d, s1
        else:
            p = (s1 * c1 + s2 * c2) >> 8
            c = max(-8, min(7, (int(x) - p) // dlt))
            d = max(-32768, min(32767, p + c * dlt))
            dlt = max(16, (MS_ADAPT[abs(c)] * dlt) >> 8)
            s1, s2 = d, s1
        out.append(d)
    return out


@pytest.mark.parametrize("i", [3, 10, 17, 24, 31, 38, 45, 101, 213, 395])
def test_ms_adpcm_grammar_roundtrip(i):
    """Grammar-shaped files: decoder output == the independent state
    replay, for every standard coefficient pair ((i//7)%7 walks all 7)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ms_adpcm,
    )

    rate = 8000 * (1 + i % 3)
    nf = 50 + i % 200
    spb = 10 + 8 * (i % 3)
    pred, d0 = (i // 7) % 7, 16 + (i % 11) * 9
    xs = [((i * 7 + 13 * j) % 201) - 100 for j in range(nf)]
    wav = _wav_encode_ms_adpcm(
        np.array(xs).reshape(-1, 1), rate, spb, predictor=pred, init_delta=d0)
    out = _decode_wav_pcm(wav)
    assert out is not None
    r, frames = out
    assert r == rate and frames.shape == (nf, 1)
    assert frames[:, 0].tolist() == _ms_reference_track(xs, spb, pred, d0)


def test_ms_adpcm_stereo_roundtrip():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ms_adpcm,
    )

    rng = np.random.default_rng(13)
    xs = rng.integers(-3000, 3000, size=(101, 2))
    out = _decode_wav_pcm(
        _wav_encode_ms_adpcm(xs, 22050, 18, predictor=1, init_delta=40))
    assert out is not None and out[1].shape == (101, 2)
    for ch in range(2):
        assert out[1][:, ch].tolist() == _ms_reference_track(
            [int(v) for v in xs[:, ch]], 18, 1, 40)


def test_ms_adpcm_fact_truncates_padded_final_block():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ms_adpcm,
    )

    xs = np.arange(23).reshape(-1, 1) * 50  # 23 frames, spb=10 -> 3 blocks
    wav = _wav_encode_ms_adpcm(xs, 8000, 10)
    out = _decode_wav_pcm(wav)
    assert out is not None and out[1].shape == (23, 1)  # not 30
    at = wav.index(b"fact")
    no_fact = wav[:at] + wav[at + 12 :]
    out2 = _decode_wav_pcm(no_fact)
    assert out2 is not None and out2[1].shape == (30, 1)
    assert out2[1][:23, 0].tolist() == out[1][:, 0].tolist()


def test_ms_adpcm_hostile_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ms_adpcm,
    )

    wav = _wav_encode_ms_adpcm(np.arange(100).reshape(-1, 1), 8000, 10)
    assert _decode_wav_pcm(wav) is not None
    # declared samples-per-block inconsistent with block align
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 8 + 18
    b[k : k + 2] = (12).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None
    # hostile block predictor index beyond the declared coefficient set
    b = bytearray(wav)
    b[wav.index(b"data") + 8] = 9
    assert _decode_wav_pcm(bytes(b)) is None
    # 3-channel unsupported
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 8 + 2
    b[k : k + 2] = (3).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None
    # coefficient table truncated out of the fmt ext (wNumCoef says 7
    # but csize only covers the first pair): coefs gate quarantines
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 4
    b[k : k + 4] = (16 + 6 + 4).to_bytes(4, "little")
    assert _decode_wav_pcm(bytes(b)) is None


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_ms_adpcm_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_ms_adpcm,
    )

    good = _wav_encode_ms_adpcm(
        (np.arange(150) * 37 % 401 - 200).reshape(-1, 1), 8000, 18,
        predictor=5, init_delta=25)
    payload = bytearray(good)
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    if out is not None:
        rate, frames = out
        assert frames.ndim == 2 and frames.shape[0] >= 1


# ----------------------------------------------------- G.711 (r13)


def _g711_reference(x: int, law: str) -> int:
    """decode(encode(x)) re-derived with the oracle's arithmetic (the
    SQL branch in SQL_MULTIMODAL_AUDIO, in Python form)."""
    if law == "ulaw":
        a = min(abs(x), 32635) + 132
        p = 1
        while a >= 256 * p and p < 128:
            p *= 2
        v = (((a // (8 * p)) % 16) * 8 + 132) * p - 132
        return -v if x < 0 else v
    m = x // 8 if x >= 0 else (-x - 1) // 8
    seg = next(i for i, e in enumerate(
        (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF)) if m <= e) \
        if m <= 0x7FF else 7
    mant = (m // 2) % 16 if seg < 2 else (m >> seg) & 15
    base = mant * 16 + (8 if seg == 0 else 264)
    t = base * (1 << (seg - 1)) if seg >= 2 else base
    return t if x >= 0 else -t


def test_g711_known_values():
    """ITU G.711 pins: µ-law zero is 0xFF, µ-law peak decodes 32124,
    A-law peak decodes 32256 (byte 0xAA)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _g711_decode_lut,
        _g711_encode,
    )

    assert _g711_encode([0], "ulaw").tolist() == [0xFF]
    assert _g711_decode_lut("ulaw")[0xFF] == 0
    assert _g711_encode([32767], "ulaw").tolist() == [0x80]
    assert _g711_decode_lut("ulaw")[0x80] == 32124
    assert _g711_encode([32767], "alaw").tolist() == [0xAA]
    assert _g711_decode_lut("alaw")[0xAA] == 32256


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_full_domain_roundtrip(law):
    """Over the FULL int16 domain: decode(encode(x)) must equal the
    oracle's arithmetic re-derivation, be monotone non-decreasing in x,
    and be an idempotent quantizer (re-encoding a decoded value is a
    fixed point)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _g711_decode_lut,
        _g711_encode,
    )

    xs = np.arange(-32768, 32768, dtype=np.int64)
    dec = _g711_decode_lut(law)[_g711_encode(xs, law)]
    # oracle arithmetic, vectorized spot-grid + dense boundary sweep
    grid = np.concatenate([xs[::97], xs[:2048], xs[-2048:]])
    for x in grid:
        assert dec[int(x) + 32768] == _g711_reference(int(x), law), x
    assert (np.diff(dec) >= 0).all()
    again = _g711_decode_lut(law)[_g711_encode(dec, law)]
    assert np.array_equal(again, dec)
    assert np.abs(dec - xs).max() <= 1024


@pytest.mark.parametrize("i", [1, 8, 15, 22, 6, 13, 20, 27, 209, 412])
def test_g711_grammar_roundtrip(i):
    """Grammar-shaped files (id%7==1 µ-law / ==6 A-law, mono+stereo,
    amplified x327): WAV decode == per-sample reference."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_g711,
    )

    law = "ulaw" if i % 7 == 1 else "alaw"
    rate = 8000 * (1 + i % 3)
    nf, nch = 50 + i % 200, 1 + i % 2
    j = np.arange(nf * nch, dtype=np.int64)
    xs = (((i * 7 + 13 * j) % 201) - 100) * 327
    wav = _wav_encode_g711(xs.reshape(nf, nch), rate, law)
    out = _decode_wav_pcm(wav)
    assert out is not None
    r, frames = out
    assert r == rate and frames.shape == (nf, nch)
    assert frames.reshape(-1).tolist() == [
        _g711_reference(int(v), law) for v in xs]


def test_g711_fact_truncates():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_g711,
    )

    wav = _wav_encode_g711(np.arange(20).reshape(-1, 1) * 100, 8000, "ulaw")
    at = wav.index(b"fact") + 8
    trunc = wav[:at] + (12).to_bytes(4, "little") + wav[at + 4 :]
    out = _decode_wav_pcm(trunc)
    assert out is not None and out[1].shape == (12, 1)


def test_g711_hostile_quarantines():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_g711,
    )

    wav = _wav_encode_g711(np.arange(20).reshape(10, 2) * 100, 8000, "alaw")
    assert _decode_wav_pcm(wav) is not None
    # bits != 8
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 8 + 14
    b[k : k + 2] = (16).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None
    # block_align != nch
    b = bytearray(wav)
    k = wav.index(b"fmt ") + 8 + 12
    b[k : k + 2] = (5).to_bytes(2, "little")
    assert _decode_wav_pcm(bytes(b)) is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_g711_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _wav_encode_g711,
    )

    good = _wav_encode_g711(
        (np.arange(150) * 37 % 401 - 200).reshape(75, 2) * 150, 8000, "ulaw")
    payload = bytearray(good)
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    if out is not None:
        rate, frames = out
        assert frames.ndim == 2 and frames.shape[0] >= 1


# ----------------------------------------------------- AIFF (late r13)


def test_aiff_roundtrip_all_depths():
    """Big-endian AIFF PCM decodes to the exact samples at every depth
    (8-bit SIGNED — no centering shift), both channel counts, with and
    without an SSND offset prefix, including odd-length SSND bodies
    that exercise the IFF pad byte."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_encode,
    )

    rng = np.random.default_rng(5)
    for bits, lim in ((8, 100), (16, 30000), (24, 8_000_000)):
        for nch in (1, 2):
            for off in (0, 4):
                for n in (1, 7, 251):  # 251*1 bytes: odd SSND at 8-bit
                    fr = rng.integers(-lim, lim + 1, (n, nch)).astype(
                        np.int64)
                    out = _decode_wav_pcm(
                        _aiff_encode(fr, 22050, bits, ssnd_offset=off))
                    assert out is not None, (bits, nch, off, n)
                    assert out[0] == 22050
                    assert (out[1] == fr).all(), (bits, nch, off, n)


def test_aiff_grammar_route_matches_wav_stats(spark):
    """The (id//7)%3==1 PCM sub-route ships AIFF containers whose
    decoded stats are identical to the WAV form — the oracle is
    container-blind, so its unchanged hash proves the AIFF parse."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_encode,
    )

    ids = [7, 9, 11, 28, 30, 32, 49, 51]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_audio_media(df).collect()}
    for i in ids:
        assert rows[i][:4] == b"FORM" and rows[i][8:12] == b"AIFF", i
        rate = 8000 * (1 + i % 3)
        n_frames = 50 + i % 200
        bits = (8, 16, 24)[i % 3]
        nch = 1 + i % 2
        j = np.arange(n_frames * nch, dtype=np.int64)
        fr = (((i * 7 + 13 * j) % 201) - 100).reshape(n_frames, nch)
        out = _decode_wav_pcm(rows[i])
        assert out is not None and out[0] == rate
        assert (out[1] == fr).all(), i
    # a WAV-route neighbor stays RIFF
    df2 = spark.createDataFrame([(0,)], "doc_id long")
    b0 = bytes(synthetic_audio_media(df2).collect()[0].payload)
    assert b0[:4] == b"RIFF"


def test_aiff_f80_rate_edge_cases():
    """The 80-bit extended-float rate parser: integers round-trip,
    negative/fractional/absurd rates quarantine."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_f80_decode,
        _aiff_f80_encode,
    )

    for v in (1, 8000, 22050, 44100, 96000, 10_000_000):
        assert _aiff_f80_decode(_aiff_f80_encode(v)) == v
    assert _aiff_f80_decode(b"\x80" + b"\x00" * 9) is None  # negative
    assert _aiff_f80_decode(b"\x00" * 10) is None           # zero
    # 0.5: exponent 16382, mantissa leading 1
    assert _aiff_f80_decode(
        (16382).to_bytes(2, "big") + (1 << 63).to_bytes(8, "big")) is None
    assert _aiff_f80_decode(
        (16383 + 40).to_bytes(2, "big")
        + (1 << 63).to_bytes(8, "big")) is None              # absurd
    assert _aiff_f80_decode(b"\x00" * 9) is None             # short


def test_aiff_hostile_variants_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_encode,
    )

    fr = np.arange(-50, 50, dtype=np.int64).reshape(50, 2)
    good = _aiff_encode(fr, 8000, 16)
    assert _decode_wav_pcm(good) is not None
    # AIFC (compressed) form type: not this lane
    assert _decode_wav_pcm(good[:8] + b"AIFC" + good[12:]) is None
    # SSND offset pointing past the chunk
    bad = bytearray(good)
    ssnd = good.index(b"SSND")
    bad[ssnd + 8 : ssnd + 12] = (1 << 20).to_bytes(4, "big")
    assert _decode_wav_pcm(bytes(bad)) is None
    # COMM declaring an unsupported depth
    bad = bytearray(good)
    comm = good.index(b"COMM")
    bad[comm + 14 : comm + 16] = (12).to_bytes(2, "big")
    assert _decode_wav_pcm(bytes(bad)) is None
    # truncated SSND: decodes the complete frames present
    cut = _decode_wav_pcm(good[:-13])
    assert cut is not None and cut[1].shape[0] < 50
    # header only, no chunks at all
    assert _decode_wav_pcm(good[:12]) is None


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_aiff_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_encode,
    )

    fr = (np.arange(120, dtype=np.int64) % 201 - 100).reshape(60, 2)
    for payload in (bytearray(_aiff_encode(fr, 8000, 24, ssnd_offset=4)),
                    bytearray(_aiff_encode(fr, 16000, 8))):
        for pos, val in flips:
            payload[pos % len(payload)] = val
        out = _decode_wav_pcm(bytes(payload))
        assert out is None or (out[0] > 0 and out[1].ndim == 2)


# ------------------------------------------------- Sun .au (late r13)


def test_au_roundtrip_all_depths():
    """Sun/NeXT .au big-endian signed PCM decodes exactly at 8/16/24
    bits, mono+stereo, with and without annotation padding."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _au_encode,
    )

    rng = np.random.default_rng(9)
    for bits, lim in ((8, 100), (16, 30000), (24, 8_000_000)):
        for nch in (1, 2):
            for ann in (b"", b"note\x00\x00"):
                fr = rng.integers(-lim, lim + 1, (37, nch)).astype(np.int64)
                out = _decode_wav_pcm(
                    _au_encode(fr, 16000, bits, annotation=ann))
                assert out is not None, (bits, nch, ann)
                assert out[0] == 16000 and (out[1] == fr).all()


def test_au_grammar_route_matches_wav_stats(spark):
    """The (id//7)%3==2 PCM sub-route ships .au containers whose
    decoded stats are identical to the WAV form."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_audio_media,
    )

    ids = [i for i in range(120)
           if i % 7 in (0, 2, 4) and (i // 7) % 3 == 2][:6]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.media_id: bytes(r.payload)
            for r in synthetic_audio_media(df).collect()}
    for i in ids:
        assert rows[i][:4] == b".snd", i
        rate = 8000 * (1 + i % 3)
        n_frames = 50 + i % 200
        nch = 1 + i % 2
        j = np.arange(n_frames * nch, dtype=np.int64)
        fr = (((i * 7 + 13 * j) % 201) - 100).reshape(n_frames, nch)
        out = _decode_wav_pcm(rows[i])
        assert out is not None and out[0] == rate and (out[1] == fr).all(), i


def test_au_hostile_variants_quarantine():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _au_encode,
        _decode_au_pcm,
    )

    fr = np.arange(-40, 40, dtype=np.int64).reshape(40, 2)
    good = _au_encode(fr, 8000, 16)
    assert _decode_au_pcm(good) is not None
    # µ-law encoding (1): quarantines here — G.711 is the WAV lane
    bad = bytearray(good)
    bad[12:16] = (1).to_bytes(4, "big")
    assert _decode_au_pcm(bytes(bad)) is None
    # float encoding (6)
    bad[12:16] = (6).to_bytes(4, "big")
    assert _decode_au_pcm(bytes(bad)) is None
    # data offset inside the header
    bad = bytearray(good)
    bad[4:8] = (12).to_bytes(4, "big")
    assert _decode_au_pcm(bytes(bad)) is None
    # absurd channel count
    bad = bytearray(good)
    bad[20:24] = (1000).to_bytes(4, "big")
    assert _decode_au_pcm(bytes(bad)) is None
    # unknown-size sentinel decodes everything present
    unk = bytearray(good)
    unk[8:12] = (0xFFFFFFFF).to_bytes(4, "big")
    out = _decode_au_pcm(bytes(unk))
    assert out is not None and out[1].shape == (40, 2)
    # truncated data: complete frames only
    cut = _decode_au_pcm(good[:-5])
    assert cut is not None and cut[1].shape[0] == 38


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                min_size=1, max_size=8))
def test_bitflipped_au_never_raises(flips):
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _au_encode,
    )

    fr = (np.arange(90, dtype=np.int64) % 201 - 100).reshape(45, 2)
    payload = bytearray(_au_encode(fr, 8000, 24, annotation=b"x\x00"))
    for pos, val in flips:
        payload[pos % len(payload)] = val
    out = _decode_wav_pcm(bytes(payload))
    assert out is None or (out[0] > 0 and out[1].ndim == 2)
