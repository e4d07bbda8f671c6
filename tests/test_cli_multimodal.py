"""CLI entrypoint, multimodal resize/frame-sample stages, and the
all-six-shapes golden blueprint (the SampleBlueprint kitchen-sink shape
coverage: every generator shape + every target type in one run)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.config import parse_blueprint
from amazon_macie_activity_generator_spark.operators.multimodal import (
    documents_as_media,
    resize_images,
    sample_frames,
)
from amazon_macie_activity_generator_spark.plans.pipeline import run_blueprint
from amazon_macie_activity_generator_spark.sources.tables import load_table


# ------------------------------------------------------------- multimodal

def test_resize_images_stub(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(50))
    out = resize_images(media, width=64, height=64).collect()
    assert len(out) == 50
    for r in out[:5]:
        assert (r.width, r.height) == (64, 64)
        assert len(r.payload) == 64 * 64 // 64
    # deterministic: same payload -> same fake pixels
    again = resize_images(media, width=64, height=64).collect()
    assert sorted(r.media_id for r in out) == sorted(r.media_id for r in again)
    assert {r.media_id: bytes(r.payload) for r in out} == {
        r.media_id: bytes(r.payload) for r in again
    }


def test_resize_real_decodes_and_quarantines(spark, sf_dir):
    """decode_stub=False is REAL since round 8: decodable payloads
    (BMP/PPM/PNG via synthetic_pixel_media) nearest-neighbor resize to
    raw RGB with the standard (y*h//H, x*w//W) source mapping — verified
    arithmetically against the id-parameterized fill — while undecodable
    payloads (docs-as-media text bytes) quarantine to NULL payload."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _raw_fill,
        synthetic_pixel_media,
    )

    ids = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        "doc_id >= 0 AND doc_id < 12"
    )
    W = H = 8
    rows = {r.media_id: r for r in resize_images(
        synthetic_pixel_media(ids), width=W, height=H, decode_stub=False
    ).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        w, h = 1 + i % 32, 1 + i % 24
        raw = _raw_fill(i, w, h)
        got = bytes(r.payload)
        assert len(got) == W * H * 3
        for y in range(H):
            for x in range(W):
                sy, sx = (y * h) // H, (x * w) // W
                src = raw[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
                assert got[(y * W + x) * 3 : (y * W + x) * 3 + 3] == src, (i, x, y)

    # undecodable payloads quarantine, never a dead task
    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(2))
    out = resize_images(media, decode_stub=False).collect()
    assert len(out) == 2 and all(r.payload is None for r in out)


def test_sample_frames_flatmap(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(30), kind="video")
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    rows = frames.collect()
    assert len(rows) >= 30  # flat map: >= one frame per video
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
    for mid, fr in per.items():
        assert len(fr) <= 8
        idxs = sorted(f.frame_idx for f in fr)
        assert idxs == list(range(len(fr)))  # dense frame indices
        assert all(f.ts_ms == f.frame_idx * 1000 for f in fr)


# ---------------------------------------------- all-six-shapes golden e2e

ALL_SHAPES_BLUEPRINT = {
    "commons": {"num_points": 30, "signal_min": 1, "signal_max": 10},
    "generators": [
        {"id": "ts1", "shape": "sinusoidal", "config": {"frequency": 0.25}},
        {"id": "ts2", "shape": "constant", "config": {"num_points": 15, "constant": 20}},
        {"id": "ts3", "shape": "random", "config": {"type": "uniform"}},
        {"id": "ts4", "shape": "square",
         "config": {"high_value": 40, "low_value": 10, "high_width": 5, "low_width": 10}},
        {"id": "ts5", "shape": "real", "config": {"path": "__SET__"}},
        {"id": "ts6", "shape": "custom", "config": {"formula": "t * 10"}},
    ],
    "targets": [
        {"type": "s3", "prefix": "sensitive/", "action": "put",
         "generators": ["ts1", "ts2"],
         "fake_types": ["bban", "iban", "credit_card_full", "phone_number", "ssn", "address"],
         "fake_counts": 3},
        {"type": "s3", "action": "get", "slice_size": 100, "generators": ["ts3", "ts4"]},
        {"type": "lambda", "function": "test", "generators": ["ts1"], "group_datapoints": True},
        {"type": "cloudwatch", "namespace": "Test/Timeseries",
         "generators": ["ts1", "ts2", "ts3", "ts4", "ts5", "ts6"], "group_datapoints": True},
    ],
}


def test_all_shapes_blueprint_end_to_end(spark, tmp_path):
    series_file = tmp_path / "real_series.txt"
    series_file.write_text("\n".join(["5", "9", "", "14", "3", "8"]) + "\n")
    doc = json.loads(json.dumps(ALL_SHAPES_BLUEPRINT))
    doc["generators"][4]["config"]["path"] = str(series_file)
    bp = parse_blueprint(doc)

    out = run_blueprint(spark, bp, str(tmp_path / "out"), run_id="kitchen")
    fact = spark.read.parquet(str(tmp_path / "out" / "queue"))
    assert fact.count() == 30  # grid = max num_points

    cw = next(t for t in out["targets"] if t["type"] == "cloudwatch")
    metrics = spark.read.parquet(cw["metrics"])
    assert metrics.count() == 6 * 30
    by_shape = {
        r.dim_shape: r["count"] for r in metrics.groupBy("dim_shape").count().collect()
    }
    assert by_shape == {
        "sinusoidal": 30, "constant": 30, "random": 30,
        "square": 30, "real": 30, "custom": 30,
    }
    # value sanity per shape semantics
    vals = {r.dim_id: r for r in metrics.groupBy(F.col("dim_id")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")).collect()}
    assert vals["ts2"].hi == 20 and vals["ts2"].lo == 0   # constant, zero-filled past slot 15
    assert vals["ts4"].hi == 40 and vals["ts4"].lo == 10  # square, full grid
    assert 1 <= vals["ts1"].lo and vals["ts1"].hi <= 10   # signal-scaled
    assert 1 <= vals["ts3"].lo and vals["ts3"].hi <= 10
    # real: zero-padded to the grid BEFORE scaling (S2, main.py:510-529),
    # so padded zeros land at signal_min
    assert vals["ts5"].lo == 1 and vals["ts5"].hi <= 10

    put = next(t for t in out["targets"] if t.get("objects"))
    manifest = spark.read.parquet(put["manifest"])
    providers = {r.provider for r in manifest.select("provider").distinct().collect()}
    assert providers <= {"bban", "iban", "credit_card_full", "phone_number", "ssn", "address"}
    assert len(providers) >= 3


# -------------------------------------------------------------------- CLI

def test_cli_generate_and_run(spark, tmp_path):
    from amazon_macie_activity_generator_spark.__main__ import main

    bp_path = tmp_path / "bp.json"
    bp_path.write_text(json.dumps({
        "commons": {"num_points": 12},
        "generators": [
            {"id": "a", "shape": "constant", "config": {"constant": 3}},
            {"id": "b", "shape": "custom", "config": {"formula": "t + 1"}},
        ],
        "targets": [
            {"type": "cloudwatch", "namespace": "X", "generators": ["a", "b"],
             "group_datapoints": True},
        ],
    }))
    assert main(["generate", str(bp_path), str(tmp_path / "fact"), "--run-id", "cli1"]) == 0
    fact = spark.read.parquet(str(tmp_path / "fact"))
    assert fact.count() == 24
    assert main(["run", str(bp_path), str(tmp_path / "runout"), "--run-id", "cli2"]) == 0
    assert spark.read.parquet(str(tmp_path / "runout" / "queue")).count() == 12
    assert main(["replay", str(tmp_path / "runout" / "queue"), str(tmp_path / "rp")]) == 0
    assert spark.read.parquet(str(tmp_path / "rp" / "delivered")).count() == 12


# ------------------------------------------------- real header decoding

def test_parse_image_dims_all_formats():
    """Handcrafted minimal headers for every supported format decode to
    the right dimensions; garbage and truncated bytes yield None."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _bmp_bytes,
        _parse_image_dims,
    )

    # BMP via our own writer (id 10 -> 11 x 11)
    assert _parse_image_dims(_bmp_bytes(10)) == (11, 11)
    # PNG: signature + IHDR length/type + 320x200 big-endian
    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (320).to_bytes(4, "big") + (200).to_bytes(4, "big") + b"\x08\x02\x00\x00\x00")
    assert _parse_image_dims(png) == (320, 200)
    gif = b"GIF89a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little") + b"\x00" * 4
    assert _parse_image_dims(gif) == (640, 480)
    ppm = b"P6\n# comment\n123 77\n255\n" + b"\x00" * 16
    assert _parse_image_dims(ppm) == (123, 77)
    # JPEG: SOI, APP0 stub segment, SOF0 with 33 wide x 22 high
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF"
            + b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + (22).to_bytes(2, "big") + (33).to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    assert _parse_image_dims(jpeg) == (33, 22)
    assert _parse_image_dims(b"not an image at all") is None
    assert _parse_image_dims(b"BM") is None
    assert _parse_image_dims(None) is None


def test_parse_wav_duration():
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_wav_duration_ms,
        _wav_bytes,
    )

    # id 7 -> n_samples 107 -> 107 * 1000 // 8000 = 13 ms
    assert _parse_wav_duration_ms(_wav_bytes(7)) == 13
    assert _parse_wav_duration_ms(_wav_bytes(399)) == (100 + 399 % 400) * 1000 // 8000
    assert _parse_wav_duration_ms(b"RIFFxxxxWAVE") is None
    assert _parse_wav_duration_ms(b"\x00" * 64) is None
    assert _parse_wav_duration_ms(None) is None


def test_real_decode_roundtrip_spark(spark):
    """synthetic_media -> decode_stub=False over Spark: decoded values
    equal the generator's parameterization (real bytes, real parse)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        extract_media_features,
        synthetic_media,
    )

    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = extract_media_features(
        synthetic_media(ids), decode_stub=False
    ).collect()
    assert len(out) == 20
    for r in out:
        if r.media_id % 2 == 0:
            assert r.kind == "image"
            assert r.width == 1 + r.media_id % 64
            assert r.height == 1 + r.media_id % 48
            assert r.duration_ms is None
        else:
            assert r.kind == "audio"
            assert r.width is None and r.height is None
            assert r.duration_ms == (100 + r.media_id % 400) * 1000 // 8000
        assert len(r.content_hash) == 64


def test_synthetic_media_survives_null_id(spark):
    """NULL-id job-killer pin (r7 review finding): a NULL id arrives in
    the pandas batch as NaN, and the old astype('int64') raised — one
    id-less manifest row must not kill the stage. A NULL id synthesizes
    deterministically as id 0 with media_id kept NULL."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        extract_media_features,
        synthetic_media,
    )

    ids = spark.range(0, 5).select(
        F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("id")).alias("doc_id")
    )
    rows = extract_media_features(synthetic_media(ids), decode_stub=False).collect()
    assert len(rows) == 5
    null_rows = [r for r in rows if r.media_id is None]
    zero_rows = [r for r in rows if r.media_id == 0]
    assert len(null_rows) == 1 and len(zero_rows) == 1
    # NULL id synthesized as id 0: identical decoded media, NULL identity
    assert null_rows[0].content_hash == zero_rows[0].content_hash
    assert null_rows[0].kind == "image" and null_rows[0].width == 1


def test_parse_image_dims_late_r13_containers():
    """The cheap header pass must agree with the full decoders on the
    late-r13 containers: QOI, TIFF (both byte orders), footer-sniffed
    TGA."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _parse_image_dims,
        _qoi_encode,
        _raw_fill,
        _tga_encode,
        _tiff_encode,
    )

    raw = _raw_fill(5, 13, 9)
    assert _parse_image_dims(_qoi_encode(raw, 13, 9)) == (13, 9)
    assert _parse_image_dims(_tiff_encode(raw, 13, 9)) == (13, 9)
    assert _parse_image_dims(
        _tiff_encode(raw, 13, 9, big_endian=True, lzw=True)) == (13, 9)
    assert _parse_image_dims(_tga_encode(raw, 13, 9)) == (13, 9)
    assert _parse_image_dims(_tga_encode(raw, 13, 9, rle=True,
                                         bpp32=True)) == (13, 9)
    # truncated TIFF IFD quarantines instead of misreading
    t = _tiff_encode(raw, 13, 9)
    assert _parse_image_dims(t[:12]) is None


def test_parse_audio_duration_late_r13_containers():
    """Duration header pass for AIFF and .au matches the WAV result on
    identical samples."""
    import numpy as np

    from amazon_macie_activity_generator_spark.operators.multimodal import (
        _aiff_encode,
        _au_encode,
        _parse_wav_duration_ms,
        _wav_encode,
    )

    fr = (np.arange(3000, dtype=np.int64) % 201 - 100).reshape(1500, 2)
    want = _parse_wav_duration_ms(_wav_encode(fr, 8000, 16))
    assert want == 187  # 1500 frames / 8000 Hz, floored ms
    assert _parse_wav_duration_ms(_aiff_encode(fr, 8000, 16)) == want
    assert _parse_wav_duration_ms(
        _au_encode(fr, 8000, 16, annotation=b"x\x00")) == want
    # unknown-size .au sentinel: everything present counts
    au = bytearray(_au_encode(fr, 8000, 16))
    au[8:12] = (0xFFFFFFFF).to_bytes(4, "big")
    assert _parse_wav_duration_ms(bytes(au)) == want
    # mu-law .au (enc 1) is not this lane
    au[12:16] = (1).to_bytes(4, "big")
    assert _parse_wav_duration_ms(bytes(au)) is None
