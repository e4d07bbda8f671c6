"""Pixel-decode throughput bench (round 9, VERDICT r8 ask #2).

Measures the REAL decode path — ``operators/multimodal.py::decode_pixels``,
the Arrow-batched mapInPandas stage — on realistically-sized images
(default 256x256 RGB, ~197 KB raw each) at 1x/4x/8x payload volume on
local[32], and the per-filter PNG reconstruction micro-throughput that
dominates it. Results go in SCALE.md ("Decode throughput" section).

Corpus: K base images per container format (BMP 24-bpp, PPM P6, PNG
truecolor with the encoder's rotating r % 5 filters, palette PNG, GIF
via the real LZW compressor), replicated JVM-side to the target volume
through a broadcast pool join — the decode stage sees distinct rows of
full-size payload bytes, exactly the production shape.

Run: ``python scripts/decode_bench.py [--size 256] [--scales 1,4,8]
[--base-images 64] [--reps 2] [--micro]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from amazon_macie_activity_generator_spark.operators.multimodal import (  # noqa: E402
    _gif_encode,
    _paeth,
    _png_chunk,
    _png_encode,
    _ppm_encode,
    decode_pixels,
    decode_pixels_bytes,
)

FORMATS = ("bmp", "ppm", "png", "plte", "gif")


def _bmp_encode_fast(raw: bytes, w: int, h: int) -> bytes:
    """Vectorized twin of multimodal._bmp_encode (same layout, numpy body)
    — the per-pixel reference encoder is fine for 32x24 catalog payloads
    but too slow to synthesize megapixel bench corpora."""
    stride = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)[:, :, ::-1]  # RGB->BGR
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px.reshape(h, w * 3)
    body = body[::-1]  # bottom-up
    header = (
        b"BM" + (54 + body.size).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + body.size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + (0).to_bytes(4, "little") * 2
    )
    return header + body.tobytes()


def _png_encode_fast(raw: bytes, w: int, h: int) -> bytes:
    """Vectorized twin of multimodal._png_encode (same rotating r % 5
    filters, numpy row arithmetic) for bench-corpus synthesis."""
    stride = w * 3
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride).astype(np.int16)
    prior = np.vstack([np.zeros((1, stride), np.int16), px[:-1]])
    left = np.zeros_like(px)
    left[:, 3:] = px[:, :-3]
    upleft = np.zeros_like(px)
    upleft[:, 3:] = prior[:, :-3]
    out = bytearray()
    for r in range(h):
        f = r % 5
        out.append(f)
        if f == 0:
            row = px[r]
        elif f == 1:
            row = px[r] - left[r]
        elif f == 2:
            row = px[r] - prior[r]
        elif f == 3:
            row = px[r] - (left[r] + prior[r]) // 2
        else:
            a, b, c = left[r], prior[r], upleft[r]
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            row = px[r] - pred
        out += (row & 0xFF).astype(np.uint8).tobytes()
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def build_pool(n_base: int, size: int, seed: int = 7) -> list[tuple[str, bytes, int]]:
    """(fmt, payload, raw_bytes) pool: n_base images spread over FORMATS."""
    rng = np.random.default_rng(seed)
    w = h = size
    pool: list[tuple[str, bytes, int]] = []
    for i in range(n_base):
        fmt = FORMATS[i % len(FORMATS)]
        raw = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        if fmt == "bmp":
            payload = _bmp_encode_fast(raw, w, h)
        elif fmt == "ppm":
            payload = _ppm_encode(raw, w, h)
        elif fmt == "png":
            payload = _png_encode_fast(raw, w, h)
        elif fmt == "plte":
            pal = rng.integers(0, 256, size=768, dtype=np.uint8).tobytes()
            idx = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payload = _png_encode(idx, w, h, bpp=1, ctype=3, plte=pal)
            raw = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
                np.frombuffer(idx, np.uint8)].tobytes()
        else:  # gif
            pal = rng.integers(0, 256, size=768, dtype=np.uint8).tobytes()
            idx = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
            payload = _gif_encode(idx, pal, w, h)
            raw = np.frombuffer(pal, np.uint8).reshape(-1, 3)[
                np.frombuffer(idx, np.uint8)].tobytes()
        got = decode_pixels_bytes(payload)
        assert got is not None and got[3] == raw, f"pool self-check failed: {fmt}"
        pool.append((fmt, payload, w * h * 3))
    return pool


def micro_filter_table(size: int, reps: int) -> dict[str, float]:
    """Per-filter PNG reconstruction MB/s (whole-file decode, one filter
    per image, so each row isolates one reconstruction path)."""
    w = h = size
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    out: dict[str, float] = {}
    stride = w * 3
    for f in range(5):
        body = bytearray()
        prior = bytes(stride)
        for r in range(h):
            row = raw[r * stride : (r + 1) * stride]
            body.append(f)
            if f == 0:
                body += row
            elif f == 1:
                body += bytes((row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                              for i in range(stride))
            elif f == 2:
                body += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
            elif f == 3:
                body += bytes((row[i] - ((row[i - 3] if i >= 3 else 0) + prior[i]) // 2) & 0xFF
                              for i in range(stride))
            else:
                body += bytes((row[i] - _paeth(row[i - 3] if i >= 3 else 0, prior[i],
                                               prior[i - 3] if i >= 3 else 0)) & 0xFF
                              for i in range(stride))
            prior = row
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
        payload = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                   + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
                   + _png_chunk(b"IEND", b""))
        got = decode_pixels_bytes(payload)
        assert got is not None and got[3] == raw, f"filter {f} round trip"
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            decode_pixels_bytes(payload)
            best = min(best, time.perf_counter() - t0)
        out[f"filter_{f}"] = round(len(raw) / best / 1e6, 1)
    return out


def per_format_table(size: int, reps: int) -> dict[str, float]:
    """Single-thread decode MB/s (of raw pixel bytes) per container
    format — the per-format bottleneck ranking (r10, VERDICT r9 ask #6:
    the GIF/LZW path was quoted in prose but had no table row). JPEG is
    a DC-only 4:2:0 payload from the real entropy encoder, the same
    grammar class the catalog entry decodes."""
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        jpeg_encode_dc_only,
    )

    rng = np.random.default_rng(13)
    w = h = size
    raw = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    pal = rng.integers(0, 256, size=768, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
    n_mcu = -(-w // 16) * -(-h // 16)  # ceil: the MCU grid pads partial edges
    payloads = {
        "bmp": _bmp_encode_fast(raw, w, h),
        "ppm": _ppm_encode(raw, w, h),
        "png": _png_encode_fast(raw, w, h),
        "plte": _png_encode(idx, w, h, bpp=1, ctype=3, plte=pal),
        "gif": _gif_encode(idx, pal, w, h),
        "jpeg": jpeg_encode_dc_only(
            w, h,
            [[int(v) for v in rng.integers(-32, 32, size=4 * n_mcu)],
             [int(v) for v in rng.integers(-32, 32, size=n_mcu)],
             [int(v) for v in rng.integers(-32, 32, size=n_mcu)]],
        ),
        # progressive twin of the same DC-only grammar: the multi-scan
        # layer's per-symbol cost vs the inlined baseline loop
        "jpeg_prog": jpeg_encode_dc_only(
            w, h,
            [[int(v) for v in rng.integers(-32, 32, size=4 * n_mcu)],
             [int(v) for v in rng.integers(-32, 32, size=n_mcu)],
             [int(v) for v in rng.integers(-32, 32, size=n_mcu)]],
            progressive=True,
        ),
    }
    out: dict[str, float] = {}
    for fmt, payload in payloads.items():
        got = decode_pixels_bytes(payload)
        assert got is not None and got[1] == w and got[2] == h, fmt
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            decode_pixels_bytes(payload)
            best = min(best, time.perf_counter() - t0)
        out[fmt] = round(w * h * 3 / best / 1e6, 2)
    return out


def ac_dense_table(reps: int) -> dict:
    """Interleaved A/B of the scalar vs batched (r12) baseline JPEG
    entropy lanes on AC-dense (photo-like) shapes — the measurement
    behind the _AC_FAST_MIN_ENTROPY_BYTES gate and the SCALE.md
    'batched baseline entropy lane' paragraph. Lanes alternate within
    each rep so box contention cancels; pixel equality is asserted per
    decode."""
    from amazon_macie_activity_generator_spark.operators import jpeg as J
    from amazon_macie_activity_generator_spark.operators.jpeg import (
        decode_jpeg_pixels,
        jpeg_encode_baseline,
    )

    def build(w, h, density, seed=3, rst=0):
        rng = np.random.default_rng(seed)
        nmcu = -(-w // 16) * (-(-h // 16))
        comps = []
        for nb in (4 * nmcu, nmcu, nmcu):
            arr = np.zeros((nb, 64), dtype=np.int32)
            arr[:, 0] = rng.integers(-32, 32, size=nb)
            mask = rng.random((nb, 63)) < density
            vals = rng.integers(-20, 21, size=(nb, 63))
            vals[vals == 0] = 1
            arr[:, 1:] = np.where(mask, vals, 0)
            comps.append(arr)
        return jpeg_encode_baseline(comps, w, h, restart_interval=rst)

    decode_jpeg_pixels(build(64, 64, 0.35))  # warm the std fast-AC cache
    shapes = [("dense35_128", 128, 128, 0.35, 0),
              ("dense35_256", 256, 256, 0.35, 0),
              ("dense15_256", 256, 256, 0.15, 0),
              ("dense35_512", 512, 512, 0.35, 0),
              ("rst_dense35_256", 256, 256, 0.35, 2)]
    out: dict = {}
    saved = J._AC_FAST_MIN_ENTROPY_BYTES
    try:
        for tag, w, h, d, rst in shapes:
            payload = build(w, h, d, rst=rst)
            ref = decode_jpeg_pixels(payload)
            best = {"scalar": float("inf"), "batched": float("inf")}
            for _ in range(max(reps, 5)):
                for lane, gate in (("scalar", 1 << 60), ("batched", 0)):
                    J._AC_FAST_MIN_ENTROPY_BYTES = gate
                    t0 = time.perf_counter()
                    got = decode_jpeg_pixels(payload)
                    best[lane] = min(best[lane], time.perf_counter() - t0)
                    assert got == ref, (tag, lane)
            mbs = lambda t: round(w * h * 3 / t / 1e6, 2)  # noqa: E731
            out[tag] = {
                "scalar_mbs": mbs(best["scalar"]),
                "batched_mbs": mbs(best["batched"]),
                "ratio": round(best["scalar"] / best["batched"], 2),
            }
    finally:
        J._AC_FAST_MIN_ENTROPY_BYTES = saved
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--scales", default="1,4,8")
    ap.add_argument("--base-images", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--micro", action="store_true",
                    help="also print the per-filter PNG micro table")
    ap.add_argument("--per-format", action="store_true",
                    help="also print single-thread MB/s per container format")
    ap.add_argument("--ac-dense", action="store_true",
                    help="A/B the scalar vs batched JPEG entropy lanes "
                         "on AC-dense shapes, then exit")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    result: dict = {"size": args.size, "base_images": args.base_images}
    if args.ac_dense:
        print(json.dumps({"ac_dense": ac_dense_table(args.reps)}))
        return
    if args.micro:
        result["micro_png_filter_mbs"] = micro_filter_table(args.size, max(args.reps, 3))
        print(json.dumps({"micro": result["micro_png_filter_mbs"]}))
    if args.per_format:
        result["per_format_mbs"] = per_format_table(args.size, max(args.reps, 3))
        print(json.dumps({"per_format": result["per_format_mbs"]}))

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pool = build_pool(args.base_images, args.size)
    pool_df = spark.createDataFrame(
        pd.DataFrame({
            "pool_id": range(len(pool)),
            "kind": "image",
            "payload": [p for _, p, _ in pool],
            "source_uri": [f"bench://{f}/{i}" for i, (f, _, _) in enumerate(pool)],
        })
    )
    raw_bytes_per_pool = sum(r for _, _, r in pool)  # exact int for the checks

    rows = []
    for k in scales:
        n = args.base_images * k
        media = (
            spark.range(n)
            .withColumn("pool_id", F.col("id") % args.base_images)
            .join(F.broadcast(pool_df), "pool_id")
            .select(F.col("id").alias("media_id"), "kind", "payload", "source_uri")
            .repartition(32, "media_id")
        )
        raw_bytes = raw_bytes_per_pool * k
        raw_mb = raw_bytes / 1e6
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            agg = decode_pixels(media).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_pixels").alias("px"),
                F.count("fmt").alias("decoded"),
            ).collect()[0]
            best = min(best, time.perf_counter() - t0)
            assert agg["n"] == n and agg["decoded"] == n, agg
            # exact integer compare — a float round trip through /1e6
            # truncates off-by-one for some sizes
            assert agg["px"] * 3 == raw_bytes, agg
        rows.append({"scale": k, "images": n, "raw_mb": round(raw_mb, 1),
                     "wall_s": round(best, 2), "mb_per_s": round(raw_mb / best, 1)})
        print(json.dumps(rows[-1]))

    result["volume"] = rows
    print(json.dumps(result))


if __name__ == "__main__":
    main()
