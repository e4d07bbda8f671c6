"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media bytes travel as a ``binary`` column with a
typed ``meta`` struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so each task streams batches
without materializing a partition in memory. Partitioning: media rows
are fat — ``repartition`` by id before the decode stage to spread bytes,
and keep decode output narrow (features, not pixels) so downstream
shuffles move features only.

Codec status: ``decode_stub=True`` derives deterministic fake
width/height/duration from the payload bytes. ``decode_stub=False`` does
REAL header-level decoding with no third-party libs — image dimensions
from BMP/PNG/GIF/PPM/JPEG headers and audio duration from a RIFF/WAVE
chunk walk (all public file-format layouts); formats that need a full
codec stack (compressed video) yield NULL fields rather than crashing
the task, matching large-pipeline robustness norms.

PIXEL decode is REAL for the stdlib-decodable formats (rounds 8-10):
``decode_pixels`` parses BMP (24-bpp padded BGR and 32-bpp BGRA,
bottom-up or top-down via negative height), binary PPM ``P6`` (maxval
255, ``#`` comments), PNG (the full spec 11.2.2 depth/color-type
matrix: 8- and 16-bit grayscale/RGB/gray+alpha/RGBA, 1/2/4/8-bit
palette and sub-byte grayscale, interlaced or not — full ``zlib``
inflate, per-row reconstruction of all five filter types
None/Sub/Up/Average/Paeth with spec-correct bpp-sized neighbors
(1 byte over packed sub-byte rows), Adam7 deinterlacing), GIF87a/89a
(a from-scratch variable-width LZW decoder + global/local color tables;
interop-verified against a real-world-encoded file), and JPEG
(``operators/jpeg.py``, round 10: baseline SOF0 Huffman scans with byte
stuffing and restart markers, table-driven Huffman decode, vectorized
IDCT, replication chroma upsampling for 4:4:4/4:2:0/4:2:2, fixed-point
YCbCr->RGB — plus progressive SOF2 multi-scan streams: spectral
selection and successive approximation per T.81 G.1.2, DC/AC
first+refine with EOB runs) — all canonicalized into a top-down RGB
byte stream — then
emits per-channel sums / pixel counts / a pixel sha256 (features, not
pixels, so downstream shuffles stay narrow). Malformed, truncated, or
unsupported payloads yield a NULL-stats row, never a dead task, and a
decompression-bomb guard caps claimed dimensions and inflate output.
``resize_images(decode_stub=False)`` rides the same decoders: real
nearest-neighbor resize for the decodable formats, NULL-payload quarantine
otherwise. The AUDIO leg is real too: ``extract_audio_features`` decodes
RIFF/WAVE PCM — integer (8-bit unsigned-centered / 16 / 24 sign-extended
/ 32-bit), IEEE float (fmt 3, 32/64-bit, mapped onto the 16-bit integer
lattice), and WAVE_FORMAT_EXTENSIBLE wrappers around either (round 11) —
plus the sibling containers AIFF (big-endian IFF, signed 8-bit, 80-bit
extended-float rate) and Sun/NeXT .au (late round 13), all off the same
entry point — mono+multichannel, truncation-tolerant, 16M-sample bomb
guard — and
emits exact int64 stats (sample_sum / abs_peak / duration) plus a
float64 rms; narrow features out, never the samples. And the
MULTI-FRAME leg: ``sample_frames(decode_stub=False)`` decodes animated
GIF for real with FULL COMPOSITING (round 11: partial frames onto the
logical screen, disposal methods 0-3, GCE transparency — each sampled
frame is the composited screen, GCE-timestamped, work and memory
bounded by a cumulative pixel budget) and samples frames at ``every_ms``
boundaries — and, round 12, MJPEG-in-AVI for real (RIFF chunk walk +
the in-repo JPEG decoder, dwMicroSecPerFrame timestamps, same pixel
budget), and, late round 13, uncompressed DIB AVI (bottom-up padded
BGR frames at the strf geometry — the second real AVI codec);
containers that genuinely need ffmpeg (ISO-BMFF/EBML, AVIs declaring a
compressed non-MJPEG codec) raise NotImplementedError — that seam
stays loud. Arithmetic-coded/
12-bit/hierarchical JPEG quarantines (baseline + progressive together
cover effectively all crawl JPEGs; arithmetic coding is patent-era rare
and unsupported by most browsers, so crawl corpora barely contain it).

THE NATIVE-CODEC SEAM: at 100 TB of real images the decode engine should
be a native codec (libpng / libjpeg-turbo / ffmpeg), and it slots in at
exactly the boundary this module already has — the per-format dispatch
inside ``decode_pixels_bytes`` under the ``decode_pixels`` /
``resize_images`` / ``sample_frames`` mapInPandas stages. The stage
contract (binary payload in → narrow typed features out, NULL-stats
quarantine, bomb guards) and therefore the schema, partitioning, batch
shape, and downstream plan are codec-agnostic; these pure-Python decoders
(throughput measured in scripts/decode_bench.py, SCALE.md "Decode
throughput") remain the zero-dependency reference implementation and the
correctness oracle for any native swap-in.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("payload", BinaryType(), True),
    StructField("source_uri", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("content_hash", StringType(), False),
])


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    multimodal plumbing is exercisable on the driver's testdata. NULL
    text becomes a zero-byte payload (not a NULL one), so downstream
    decode stages see the same "empty media" case in both engines."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("source_uri"),
    )


def _parse_image_dims(b: bytes | None) -> tuple[int, int] | None:
    """Width/height from BMP, PNG, GIF, PPM (P3/P6), JPEG, QOI, TIFF,
    or (footer-sniffed) TGA header bytes. Pure-stdlib parsing of the
    public file-format layouts; returns None for anything unrecognized
    or truncated — kept in step with the full decoders so a cheap
    header pass and a full decode agree on which rows are media."""
    if not b or len(b) < 10:
        return None
    try:
        if b[:4] == b"qoif" and len(b) >= 14:
            w = int.from_bytes(b[4:8], "big")
            h = int.from_bytes(b[8:12], "big")
            return (w, h) if w > 0 and h > 0 else None
        if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a") and len(b) >= 14:
            bo = "little" if b[0] == 0x49 else "big"
            ifd = int.from_bytes(b[4:8], bo)
            if ifd + 2 > len(b):
                return None
            nent = int.from_bytes(b[ifd : ifd + 2], bo)
            w = h = None
            for k in range(nent):
                e = ifd + 2 + 12 * k
                if e + 12 > len(b):
                    return None
                tag = int.from_bytes(b[e : e + 2], bo)
                typ = int.from_bytes(b[e + 2 : e + 4], bo)
                if tag in (256, 257):
                    v = int.from_bytes(
                        b[e + 8 : e + 10] if typ == 3 else b[e + 8 : e + 12],
                        bo)
                    if tag == 256:
                        w = v
                    else:
                        h = v
            return (w, h) if w and h else None
        if len(b) >= 44 and b[-26:][8:] == _TGA_FOOTER:  # TGA v2 footer
            w = int.from_bytes(b[12:14], "little")
            h = int.from_bytes(b[14:16], "little")
            return (w, h) if w > 0 and h > 0 else None
        if b[:2] == b"BM" and len(b) >= 26:  # BITMAPINFOHEADER
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = int.from_bytes(b[22:26], "little", signed=True)
            return (w, abs(h)) if w > 0 and h != 0 else None
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:  # IHDR
            return (
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        if b[:6] in (b"GIF87a", b"GIF89a"):  # logical screen descriptor
            return (
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        if b[:2] in (b"P3", b"P5", b"P6"):  # netpbm: ASCII header
            toks: list[int] = []
            for line in b[2:64].split(b"\n"):
                body = line.split(b"#", 1)[0]
                toks.extend(int(t) for t in body.split() if t.isdigit())
                if len(toks) >= 2:
                    return (toks[0], toks[1])
            return None
        if b[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOFn segment
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    return None
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            return None
    except (ValueError, IndexError):
        return None
    return None


def _parse_wav_duration_ms(b: bytes | None) -> int | None:
    """Duration in ms from a RIFF/WAVE file via the standard chunk walk:
    block-align and sample-rate from the fmt chunk, frame count from the
    data chunk size. Late r13 also reads the sibling audio containers
    the full decoder accepts — AIFF (COMM frame count over the 80-bit
    extended rate) and Sun .au (data size over block align) — so the
    header pass and the full decode agree on which rows carry audio.
    Returns None for anything else or malformed bytes."""
    if b is not None and len(b) >= 12 and b[:4] == b"FORM" \
            and b[8:12] == b"AIFF":
        i = 12
        while i + 8 <= len(b):
            if b[i : i + 4] == b"COMM":
                body = b[i + 8 : i + 8 + int.from_bytes(b[i + 4 : i + 8],
                                                        "big")]
                if len(body) < 18:
                    return None
                nframes = int.from_bytes(body[2:6], "big")
                rate = _aiff_f80_decode(body[8:18])
                return nframes * 1000 // rate if rate else None
            i += 8 + int.from_bytes(b[i + 4 : i + 8], "big")
            i += i % 2
        return None
    if b is not None and len(b) >= 24 and b[:4] == b".snd":
        off = int.from_bytes(b[4:8], "big")
        size = int.from_bytes(b[8:12], "big")
        enc = int.from_bytes(b[12:16], "big")
        rate = int.from_bytes(b[16:20], "big")
        nch = int.from_bytes(b[20:24], "big")
        if off < 24 or off > len(b) or not rate or not 1 <= nch <= 64 \
                or enc not in (2, 3, 4):
            return None
        avail = len(b) - off if size == 0xFFFFFFFF else min(size,
                                                            len(b) - off)
        return avail // (nch * (enc - 1)) * 1000 // rate
    if not b or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    sample_rate = block_align = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b) and csize >= 16:
            # csize < 16 would read the NEXT chunk's header bytes as fmt
            # fields — reject the chunk instead of parsing garbage
            sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
            block_align = int.from_bytes(b[i + 20 : i + 22], "little")
        elif cid == b"data":
            data_size = min(csize, len(b) - i - 8)
        i += 8 + csize + (csize % 2)  # chunks are word-aligned
    if not sample_rate or not block_align or data_size is None:
        return None
    return (data_size // block_align) * 1000 // sample_rate


# audio decompression-bomb guard: total samples (frames x channels),
# the audio twin of _MAX_PIXELS (16M samples of int32 stage = 64 MB)
_MAX_SAMPLES = 1 << 24

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail (bytes 2..16 of the
# KSDATAFORMAT_SUBTYPE_* media GUIDs — the leading 2 bytes carry the
# classic wFormatTag code, 1 = PCM, 3 = IEEE float)
_WAVE_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


# IMA/DVI ADPCM tables (round 12 — the first compressed-audio lane):
# fixed by the IMA Digital Audio Pack spec; the encoder twin, this
# decoder, and the DuckDB oracle's recursive state replay all share them
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_decode_nibbles(pred: int, idx: int, nibbles, out: list) -> None:
    """Standard IMA ADPCM nibble expansion, appending int16-range
    predictions to ``out``. The predictor recurrence is inherently
    sequential WITHIN a block, but every block restates (pred, index) in
    its header, so blocks decode independently — that per-block
    independence is the parallelism seam at scale, not SIMD."""
    st = _IMA_STEP_TABLE
    it = _IMA_INDEX_TABLE
    for code in nibbles:
        n = code & 7
        step = st[idx]
        diff = step >> 3
        if n & 4:
            diff += step
        if n & 2:
            diff += step >> 1
        if n & 1:
            diff += step >> 2
        pred = pred - diff if code & 8 else pred + diff
        if pred > 32767:
            pred = 32767
        elif pred < -32768:
            pred = -32768
        idx += it[n]
        if idx < 0:
            idx = 0
        elif idx > 88:
            idx = 88
        out.append(pred)


def _decode_wav_ima(sample_rate, nch, bits, block_align, spb, fact, data):
    """IMA ADPCM (wFormatTag 0x11) -> (rate, int32 (n, nch)) or None.
    Accepted shape: 4-bit nibbles, mono or stereo, block =
    4-byte (predictor int16, step index, reserved) header per channel +
    nibble words (stereo interleaves 4-byte groups per channel, spec
    layout); spb (wSamplesPerBlock from the fmt extension) must satisfy
    block_align = 4*nch + (spb-1)*nch/2 with whole nibble bytes (mono:
    spb odd) / whole 4-byte groups (stereo: spb-1 % 8 == 0) — mismatched
    declarations quarantine rather than desync. Sample 0 of each block
    IS the header predictor; the `fact` chunk truncates the padded final
    block to the real frame count (absent fact = all blocks full). A
    trailing partial block is dropped (the PCM truncation tolerance);
    a header step index > 88 quarantines (hostile state injection)."""
    import numpy as np

    if bits != 4 or nch not in (1, 2) or not spb or spb < 1:
        return None
    per_ch = spb - 1
    if nch == 1:
        if per_ch % 2:
            return None
    elif per_ch % 8:
        return None
    if block_align != 4 * nch + per_ch * nch // 2:
        return None
    nblocks = len(data) // block_align
    if nblocks == 0:
        return None
    total = nblocks * spb
    n = min(fact, total) if fact is not None else total
    if n <= 0 or n * nch > _MAX_SAMPLES:
        return None
    chans: list[list] = [[] for _ in range(nch)]
    for blk_no in range(nblocks):
        blk = data[blk_no * block_align : (blk_no + 1) * block_align]
        preds = []
        idxs = []
        for ch in range(nch):
            h = blk[4 * ch : 4 * ch + 4]
            pred = int.from_bytes(h[:2], "little", signed=True)
            idx = h[2]
            if idx > 88:
                return None
            chans[ch].append(pred)
            preds.append(pred)
            idxs.append(idx)
        body = blk[4 * nch :]
        for ch in range(nch):
            nibs = []
            for g in range(4 * ch, len(body), 4 * nch):
                for byte in body[g : g + 4]:
                    nibs.append(byte & 15)
                    nibs.append(byte >> 4)
            _ima_decode_nibbles(preds[ch], idxs[ch], nibs[:per_ch], chans[ch])
    frames = np.array(chans, dtype=np.int32).T[:n]
    return sample_rate, frames


def _wav_encode_ima_adpcm(samples, rate: int, samples_per_block: int) -> bytes:
    """IMA ADPCM WAV writer twin of :func:`_decode_wav_ima`: fmt 0x11
    (cbSize=2 + wSamplesPerBlock) + a `fact` chunk carrying the true
    frame count + headered blocks, final block zero-nibble padded. The
    quantizer tracks the DECODER's state (encode-by-decode), so the
    decoded output is exactly the predictor track this encoder computed
    — which is what lets the DuckDB oracle replay the codec as a
    recursive state machine and predict the decoded stats of a LOSSY
    format arithmetically."""
    import numpy as np

    st = _IMA_STEP_TABLE
    it = _IMA_INDEX_TABLE
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    spb = samples_per_block
    per_ch = spb - 1
    block_align = 4 * nch + per_ch * nch // 2
    out = bytearray()
    idxs = [0] * nch
    for lo in range(0, n, spb):
        chunk = arr[lo : lo + spb]
        headers = bytearray()
        nib_streams: list[list] = []
        for ch in range(nch):
            xs = [int(v) for v in chunk[:, ch]]
            pred = max(-32768, min(32767, xs[0]))
            idx = idxs[ch]
            headers += (pred & 0xFFFF).to_bytes(2, "little") + bytes([idx, 0])
            nibs = []
            for x in xs[1:]:
                d = x - pred
                sign = 8 if d < 0 else 0
                if d < 0:
                    d = -d
                step = st[idx]
                code = 0
                if d >= step:
                    code |= 4
                    d -= step
                if d >= step >> 1:
                    code |= 2
                    d -= step >> 1
                if d >= step >> 2:
                    code |= 1
                nibs.append(sign | code)
                diff = step >> 3
                if code & 4:
                    diff += step
                if code & 2:
                    diff += step >> 1
                if code & 1:
                    diff += step >> 2
                pred = pred - diff if sign else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + it[code]))
            nibs += [0] * (per_ch - len(nibs))  # pad the final block
            idxs[ch] = idx
            nib_streams.append(nibs)
        chbytes = []
        for ch in range(nch):
            nibs = nib_streams[ch]
            bb = bytearray()
            for k in range(0, per_ch, 2):  # low nibble first, per spec
                bb.append(nibs[k] | (nibs[k + 1] << 4))
            chbytes.append(bb)
        if nch == 1:
            body = chbytes[0]
        else:  # stereo: 4-byte groups, round-robin per channel
            body = bytearray()
            for g in range(0, len(chbytes[0]), 4):
                for ch in range(nch):
                    body += chbytes[ch][g : g + 4]
        out += headers + body
    avg = rate * block_align // spb if spb else 0
    fmt = (
        (0x11).to_bytes(2, "little") + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + avg.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + spb.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
        + b"data" + len(out).to_bytes(4, "little") + bytes(out)
        + (b"\x00" if len(out) % 2 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# MS-ADPCM (WAVE_FORMAT_ADPCM, wFormatTag 0x02) fixed tables — round 13,
# the second compressed-audio lane. The 7 standard coefficient pairs
# (iCoef1, iCoef2) every writer emits, and the 16-entry delta-adaptation
# table. The adaptation table is SYMMETRIC in the signed nibble
# (ADAPT[c & 0xF] == ADAPT[abs(c)] for c in -8..7), which is what lets
# the DuckDB oracle index it by abs(code).
_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232))
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _decode_wav_ms(sample_rate, nch, bits, block_align, spb, coefs,
                   fact, data):
    """MS-ADPCM (wFormatTag 0x02) -> (rate, int32 (n, nch)) or None.
    The second compressed-audio lane (round 13; VERDICT r12 ask #4),
    structured exactly like :func:`_decode_wav_ima`: headered blocks
    that restate the full predictor state (so blocks decode
    independently — the parallelism seam at scale), a `fact` chunk
    truncating the padded final block, and quarantine on mismatched
    declarations rather than desync.

    Block layout (channel-interleaved header fields per the spec):
    bPredictor per channel (1 byte, an index into the fmt-declared
    coefficient pairs), iDelta per channel (int16), iSamp1 per channel
    (int16), iSamp2 per channel (int16), then 4-bit nibbles — HIGH
    nibble first (the opposite of IMA), stereo alternating channels
    per nibble. Samples 0 and 1 of each block ARE iSamp2 and iSamp1
    (in that order — the header carries them newest-first). Per
    nibble, with signed code c in [-8, 7]:

        pred   = (samp1*coef1 + samp2*coef2) >> 8   (arithmetic shift)
        sample = clamp_int16(pred + c*delta)
        delta  = max(16, (ADAPT[c & 0xF] * delta) >> 8)
        samp2, samp1 = samp1, sample

    Constraints enforced (quarantine on violation): bits == 4, mono or
    stereo, spb >= 2, block_align == 7*nch + (spb-2)*nch/2 with whole
    nibble bytes (mono: spb even), a header bPredictor within the
    declared coefficient count (hostile state injection, the IMA
    step-index>88 sibling). A trailing partial block is dropped."""
    import numpy as np

    if bits != 4 or nch not in (1, 2) or not spb or spb < 2 or not coefs:
        return None
    per_ch = spb - 2
    if nch == 1 and per_ch % 2:
        return None
    if block_align != 7 * nch + per_ch * nch // 2:
        return None
    nblocks = len(data) // block_align
    if nblocks == 0:
        return None
    total = nblocks * spb
    n = min(fact, total) if fact is not None else total
    if n <= 0 or n * nch > _MAX_SAMPLES:
        return None
    at = _MS_ADAPT
    chans: list[list] = [[] for _ in range(nch)]
    for blk_no in range(nblocks):
        blk = blk_no * block_align
        c1s, c2s, deltas, s1s, s2s = [], [], [], [], []
        for ch in range(nch):
            pidx = data[blk + ch]
            if pidx >= len(coefs):
                return None  # hostile predictor index
            c1s.append(coefs[pidx][0])
            c2s.append(coefs[pidx][1])
            deltas.append(int.from_bytes(
                data[blk + nch + 2 * ch : blk + nch + 2 * ch + 2],
                "little", signed=True))
            s1s.append(int.from_bytes(
                data[blk + 3 * nch + 2 * ch : blk + 3 * nch + 2 * ch + 2],
                "little", signed=True))
            s2s.append(int.from_bytes(
                data[blk + 5 * nch + 2 * ch : blk + 5 * nch + 2 * ch + 2],
                "little", signed=True))
            # header carries them newest-first; emit oldest-first
            chans[ch].append(s2s[ch])
            chans[ch].append(s1s[ch])
        body = data[blk + 7 * nch : blk + block_align]
        nibs = []
        for byte in body:
            nibs.append(byte >> 4)   # HIGH nibble first (spec)
            nibs.append(byte & 15)
        for k, nib in enumerate(nibs):
            ch = k % nch  # stereo alternates per nibble; mono trivially 0
            c = nib - 16 if nib >= 8 else nib
            pred = (s1s[ch] * c1s[ch] + s2s[ch] * c2s[ch]) >> 8
            s = pred + c * deltas[ch]
            if s > 32767:
                s = 32767
            elif s < -32768:
                s = -32768
            deltas[ch] = max(16, (at[nib] * deltas[ch]) >> 8)
            s2s[ch] = s1s[ch]
            s1s[ch] = s
            chans[ch].append(s)
    frames = np.array(chans, dtype=np.int32).T[:n]
    return sample_rate, frames


def _wav_encode_ms_adpcm(samples, rate: int, samples_per_block: int,
                         predictor: int = 0, init_delta: int = 16) -> bytes:
    """MS-ADPCM WAV writer twin of :func:`_decode_wav_ms`: fmt 0x02
    (cbSize=32: wSamplesPerBlock + wNumCoef=7 + the 7 standard pairs)
    + a `fact` chunk with the true frame count + headered blocks, final
    block padded with code-0 nibbles. Encode-by-decode: the quantizer
    (c = clamp(floor((x - pred) / delta), -8, 7), floored division)
    tracks the decoder's reconstruction exactly, so the decoded output
    is the predictor track this encoder computed — the property that
    lets the DuckDB oracle replay the LOSSY codec as a recursive state
    machine (the IMA pattern, queries_ext5.py). ``predictor`` selects
    which standard coefficient pair every block uses (a real encoder
    picks per-block; fixing it keeps the oracle a single recurrence),
    ``init_delta`` (>= 16) is each block's starting iDelta."""
    import numpy as np

    at = _MS_ADAPT
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    spb = samples_per_block
    per_ch = spb - 2
    block_align = 7 * nch + per_ch * nch // 2
    c1, c2 = _MS_COEFS[predictor]
    out = bytearray()
    for lo in range(0, n, spb):
        chunk = arr[lo : lo + spb]
        s2s, s1s, deltas = [], [], []
        for ch in range(nch):
            xs = [int(v) for v in chunk[:, ch]]
            s2s.append(max(-32768, min(32767, xs[0])))
            s1s.append(max(-32768, min(32767,
                                       xs[1] if len(xs) > 1 else xs[0])))
            deltas.append(init_delta)
        hdr = bytes([predictor] * nch)
        for vals in (deltas, s1s, s2s):
            for v in vals:
                hdr += (v & 0xFFFF).to_bytes(2, "little")
        nibs = []
        for k in range(2 * nch, spb * nch):  # frame-major, channel-minor
            ch = k % nch
            fr = k // nch
            x = int(chunk[fr, ch]) if fr < len(chunk) else None
            pred = (s1s[ch] * c1 + s2s[ch] * c2) >> 8
            if x is None:
                c = 0  # pad the final block: sample = pred
            else:
                c = max(-8, min(7, (x - pred) // deltas[ch]))
            s = max(-32768, min(32767, pred + c * deltas[ch]))
            nib = c & 0xF
            deltas[ch] = max(16, (at[nib] * deltas[ch]) >> 8)
            s2s[ch] = s1s[ch]
            s1s[ch] = s
            nibs.append(nib)
        body = bytearray()
        for k in range(0, len(nibs), 2):  # HIGH nibble first
            body.append((nibs[k] << 4) | nibs[k + 1])
        out += hdr + body
    avg = rate * block_align // spb if spb else 0
    fmt = (
        (0x02).to_bytes(2, "little") + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + avg.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (32).to_bytes(2, "little") + spb.to_bytes(2, "little")
        + (7).to_bytes(2, "little")
        + b"".join((a & 0xFFFF).to_bytes(2, "little")
                   + (b & 0xFFFF).to_bytes(2, "little")
                   for a, b in _MS_COEFS)
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
        + b"data" + len(out).to_bytes(4, "little") + bytes(out)
        + (b"\x00" if len(out) % 2 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# G.711 companding (round 13): wFormatTag 0x07 = µ-law, 0x06 = A-law —
# the telephony WAV formats. Both are STATELESS per-sample quantizers
# (no predictor, no block state), which is why their DuckDB oracle is
# plain per-sample arithmetic rather than a recursive state replay.
# Formulas are the CCITT reference arithmetic; known-value pins
# (µ: 0 <-> 0xFF, peak 32124; A: peak 32256 at 0xAA) plus full-domain
# monotonicity/idempotence are tested in tests/test_audio_features.py.


def _g711_decode_lut(law: str):
    """256-entry int32 decode table for 'ulaw' / 'alaw' (content-cached:
    built once per process, decode is then a single numpy take)."""
    import numpy as np

    cached = _g711_decode_lut.__dict__.get(law)
    if cached is not None:
        return cached
    out = np.empty(256, dtype=np.int32)
    for byte in range(256):
        if law == "ulaw":
            u = ~byte & 0xFF
            x = ((((u & 0xF) << 3) + 132) << ((u >> 4) & 7)) - 132
            out[byte] = -x if u & 0x80 else x
        else:
            a = byte ^ 0x55
            t = (a & 0xF) << 4
            seg = (a >> 4) & 7
            t += 8 if seg == 0 else 0x108
            if seg >= 2:
                t <<= seg - 1
            out[byte] = t if a & 0x80 else -t
    _g711_decode_lut.__dict__[law] = out
    return out


def _decode_wav_g711(sample_rate, nch, bits, block_align, law, fact, data):
    """G.711 µ-law / A-law -> (rate, int32 (n, nch)) or None. 8 bits per
    sample, block_align == nch (quarantine otherwise); `fact` truncates
    like the ADPCM lanes; a trailing partial frame is dropped. Being a
    pure 256-entry LUT, decode runs at numpy take speed — like integer
    PCM, never the seam."""
    import numpy as np

    if bits != 8 or not nch or nch > 8 or block_align != nch:
        return None
    n_frames = len(data) // nch
    n = min(fact, n_frames) if fact is not None else n_frames
    if n <= 0 or n * nch > _MAX_SAMPLES:
        return None
    raw = np.frombuffer(data[: n_frames * nch], dtype=np.uint8)
    frames = _g711_decode_lut(law)[raw].reshape(n_frames, nch)[:n]
    return sample_rate, frames


def _g711_encode(arr, law: str):
    """Vectorized CCITT encode of an int array -> uint8 codes."""
    import numpy as np

    x = np.asarray(arr, dtype=np.int64)
    if law == "ulaw":
        a = np.minimum(np.abs(x), 32635) + 132
        exp = np.searchsorted(
            np.array([256, 512, 1024, 2048, 4096, 8192, 16384]),
            a, side="right")
        mant = (a >> (exp + 3)) & 0xF
        sign = np.where(x < 0, 0x80, 0)
        return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)
    # clamping m to 0xFFF reproduces CCITT's seg>=8 saturation branch
    # (seg 7 / mant 15) for out-of-int16 magnitudes
    m = np.minimum(np.where(x >= 0, x >> 3, (-x - 1) >> 3), 0xFFF)
    seg = np.searchsorted(
        np.array([0x20, 0x40, 0x80, 0x100, 0x200, 0x400, 0x800]),
        m, side="right")
    mant = np.where(seg < 2, (m >> 1) & 0xF, (m >> seg) & 0xF)
    return (((seg << 4) | mant)
            ^ np.where(x >= 0, 0xD5, 0x55)).astype(np.uint8)


def _wav_encode_g711(samples, rate: int, law: str) -> bytes:
    """G.711 WAV writer twin of :func:`_decode_wav_g711`: fmt 0x07
    (µ-law) / 0x06 (A-law) with cbSize=0, a `fact` chunk (required for
    non-PCM WAVE per the spec), one byte per sample. The companding is
    lossy but STATELESS, so decode(encode(x)) is a pure function of x
    and the oracle re-derives it arithmetically per sample."""
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    data = _g711_encode(arr.reshape(-1), law).tobytes()
    tag = 0x07 if law == "ulaw" else 0x06
    fmt = (
        tag.to_bytes(2, "little") + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * nch).to_bytes(4, "little")
        + nch.to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(2, "little")  # cbSize = 0
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _decode_wav_pcm(b: bytes | None):
    """RIFF/WAVE PCM decode -> (sample_rate, frames) where ``frames`` is
    an int32 ndarray of shape (n_frames, n_channels) — or None to
    quarantine (non-WAV, malformed, unsupported codecs, over-budget
    sample counts). Accepted fmt lanes: classic integer PCM (wFormatTag
    1), IEEE float (tag 3, 32/64-bit), IMA ADPCM (tag 0x11, round 12 —
    see :func:`_decode_wav_ima`), MS-ADPCM (tag 0x02, round 13 — see
    :func:`_decode_wav_ms`; MP3 and other compressed tags still
    quarantine), and WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE) wrapping integer or float PCM — the SubFormat GUID must carry the
    standard KSDATAFORMAT tail, and the sample data is decoded at the
    container depth (valid-bits-left-justified storage per the spec, so
    the container read IS the sample value). Stated limitation: a file
    declaring wValidBitsPerSample < container bits is accepted but NOT
    right-shifted — its stats come out scaled by 2^(container-valid)
    relative to the valid-bit lattice. The encoder twin always writes
    validBits == container bits, so oracle/tests are self-consistent;
    external files with padded containers keep the left-justified
    convention rather than being silently rescaled. Depth conventions: 8-bit
    samples are unsigned per spec and are CENTERED here (value - 128, so
    silence is 0 at every depth); 16/24/32-bit are signed little-endian
    (24-bit sign-extended from 3 bytes). FLOAT lane convention (defined
    here, documented for oracle use): nominal-range floats map onto the
    16-bit integer lattice — i = clip(rint(x * 32768), -32768, 32767) —
    so float stats are directly comparable with 16-bit PCM stats; any
    non-finite sample (NaN/Inf) quarantines the file, matching the
    engine's finite-gate convention, since garbage stats are worse than
    an honest NULL row. A fmt chunk whose declared size is under the
    16 fixed bytes is rejected (it would read the next chunk's header
    bytes as fmt fields). A data chunk longer than the remaining bytes
    truncates to the complete frames actually present — the same
    tolerance as `_parse_wav_duration_ms`, so a tail-truncated upload
    yields stats over its real audio instead of a dead row."""
    import numpy as np

    if b is not None and len(b) >= 12 and b[:4] == b"FORM" \
            and b[8:12] == b"AIFF":
        return _decode_aiff_pcm(b)  # big-endian sibling (late r13)
    if b is not None and len(b) >= 24 and b[:4] == b".snd":
        return _decode_au_pcm(b)  # Sun/NeXT .au sibling (late r13)
    if not b or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt_code = sample_rate = block_align = bits = nch = None
    spb = fact = None
    ms_coefs: list | None = None
    data: bytes | None = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b) and csize >= 16:
            fmt_code = int.from_bytes(b[i + 8 : i + 10], "little")
            nch = int.from_bytes(b[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
            block_align = int.from_bytes(b[i + 20 : i + 22], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
            if fmt_code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                # 40-byte fmt: cbSize(2) validBits(2) channelMask(4)
                # SubFormat GUID(16); the GUID's first 2 bytes are the
                # real format code, the tail must be the standard one
                if csize < 40 or i + 48 > len(b):
                    return None
                sub = b[i + 32 : i + 48]
                if sub[2:] != _WAVE_GUID_TAIL:
                    return None
                fmt_code = int.from_bytes(sub[:2], "little")
            elif fmt_code == 0x11:  # IMA ADPCM: ext carries samples/block
                if csize >= 20 and i + 28 <= len(b):
                    spb = int.from_bytes(b[i + 26 : i + 28], "little")
            elif fmt_code == 0x02:  # MS-ADPCM: ext has spb + coef pairs
                if csize >= 22 and i + 30 <= len(b):
                    spb = int.from_bytes(b[i + 26 : i + 28], "little")
                    ncoef = int.from_bytes(b[i + 28 : i + 30], "little")
                    if 30 + 4 * ncoef <= 8 + csize and i + 30 + 4 * ncoef <= len(b):
                        ms_coefs = [
                            (int.from_bytes(b[o : o + 2], "little", signed=True),
                             int.from_bytes(b[o + 2 : o + 4], "little", signed=True))
                            for o in range(i + 30, i + 30 + 4 * ncoef, 4)
                        ]
        elif cid == b"fact" and csize >= 4 and i + 12 <= len(b):
            fact = int.from_bytes(b[i + 8 : i + 12], "little")
        elif cid == b"data":
            data = b[i + 8 : i + 8 + csize]
        i += 8 + csize + (csize % 2)  # chunks are word-aligned
    if fmt_code == 0x11 and data is not None and sample_rate:
        # IMA ADPCM (round 12) — the first compressed-audio lane; an
        # extensible-wrapped 0x11 lands here with spb=None and
        # quarantines (its fmt layout has no wSamplesPerBlock field)
        return _decode_wav_ima(
            sample_rate, nch, bits, block_align, spb, fact, data)
    if fmt_code == 0x02 and data is not None and sample_rate:
        # MS-ADPCM (round 13) — the second compressed-audio lane; a
        # fmt ext that never declared coefficients (ms_coefs None)
        # quarantines inside _decode_wav_ms via the coefs gate
        return _decode_wav_ms(
            sample_rate, nch, bits, block_align, spb, ms_coefs, fact, data)
    if fmt_code in (0x06, 0x07) and data is not None and sample_rate:
        # G.711 A-law / µ-law (round 13) — stateless companding lanes
        return _decode_wav_g711(
            sample_rate, nch, bits, block_align,
            "alaw" if fmt_code == 0x06 else "ulaw", fact, data)
    if (fmt_code not in (1, 3) or not sample_rate or not nch or not bits
            or data is None):
        return None  # MP3 / other compressed tags / unknown-GUID quarantine
    if fmt_code == 3:
        if bits not in (32, 64):
            return None
    elif bits not in (8, 16, 24, 32):
        return None
    if block_align != nch * (bits // 8):
        return None
    n_frames = len(data) // block_align
    if n_frames == 0 or n_frames * nch > _MAX_SAMPLES:
        return None
    data = data[: n_frames * block_align]
    if fmt_code == 3:
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8")
        if not np.isfinite(x).all():
            return None  # NaN/Inf: finite-gate quarantine (docstring)
        samples = np.clip(
            np.rint(x.astype(np.float64) * 32768), -32768, 32767
        ).astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:  # 24-bit: 3-byte LE, sign-extended
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = (raw[:, 0].astype(np.int32)
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        samples = (x ^ 0x800000) - 0x800000
    return sample_rate, samples.reshape(n_frames, nch)


def _decode_au_pcm(b: bytes):
    """Sun/NeXT .au (the NIST-corpus container) integer PCM ->
    (sample_rate, int32 (n_frames, n_channels)) or None. Header: magic
    '.snd', data offset (>= 24), data size (0xFFFFFFFF = unknown ->
    everything present), encoding, rate, channels — all big-endian.
    Encodings accepted: 2/3/4 = signed linear PCM 8/16/24 big-endian
    (8-bit is SIGNED here, like AIFF); µ-law (1) and other compressed
    encodings quarantine — G.711 lives in the WAV lane with its oracle
    and double-routing it here would silently skip that contract. A
    data size beyond the buffer truncates to complete frames."""
    import numpy as np

    if len(b) < 24 or b[:4] != b".snd":
        return None
    off = int.from_bytes(b[4:8], "big")
    size = int.from_bytes(b[8:12], "big")
    enc = int.from_bytes(b[12:16], "big")
    rate = int.from_bytes(b[16:20], "big")
    nch = int.from_bytes(b[20:24], "big")
    if off < 24 or off > len(b) or not 1 <= nch <= 64 \
            or not 0 < rate <= 10_000_000 or enc not in (2, 3, 4):
        return None
    data = b[off:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    width = enc - 1  # bytes per sample: 1/2/3
    ba = nch * width
    n = len(data) // ba
    if n == 0 or n * nch > _MAX_SAMPLES:
        return None
    data = data[: n * ba]
    if width == 1:
        samples = np.frombuffer(data, dtype=np.int8).astype(np.int32)
    elif width == 2:
        samples = np.frombuffer(data, dtype=">i2").astype(np.int32)
    else:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8)
             | raw[:, 2].astype(np.int32))
        samples = (x ^ 0x800000) - 0x800000
    return rate, samples.reshape(n, nch)


def _au_encode(frames, rate: int, bits: int,
               annotation: bytes = b"") -> bytes:
    """.au writer twin of :func:`_decode_au_pcm`: big-endian signed
    PCM, optional annotation text padding the data offset past 24."""
    import numpy as np

    frames = np.asarray(frames)
    n, nch = frames.shape
    if bits == 8:
        payload = frames.astype(np.int8).tobytes()
    elif bits == 16:
        payload = frames.astype(">i2").tobytes()
    else:
        x = frames.astype(np.int64).reshape(-1) & 0xFFFFFF
        arr = np.empty((x.size, 3), np.uint8)
        arr[:, 0] = (x >> 16) & 0xFF
        arr[:, 1] = (x >> 8) & 0xFF
        arr[:, 2] = x & 0xFF
        payload = arr.tobytes()
    off = 24 + len(annotation)
    return (b".snd" + off.to_bytes(4, "big")
            + len(payload).to_bytes(4, "big")
            + (bits // 8 + 1).to_bytes(4, "big")
            + rate.to_bytes(4, "big") + nch.to_bytes(4, "big")
            + annotation + payload)


def _aiff_f80_decode(e: bytes) -> int | None:
    """AIFF COMM sample rate: 80-bit IEEE extended float (1 sign, 15
    exponent, 64 mantissa with EXPLICIT leading 1) -> positive integer
    rate, or None for negative/zero/non-integer/absurd values (a
    fractional or >10 MHz "rate" is a malformed file, not a lane)."""
    if len(e) != 10:
        return None
    se = int.from_bytes(e[:2], "big")
    mant = int.from_bytes(e[2:], "big")
    if se & 0x8000 or (se == 0 and mant == 0):
        return None
    shift = se - 16383 - 63
    if shift > 0:
        if shift > 16:
            return None
        val = mant << shift
    else:
        if shift < -63 or mant & ((1 << -shift) - 1):
            return None
        val = mant >> -shift
    return val if 0 < val <= 10_000_000 else None


def _aiff_f80_encode(v: int) -> bytes:
    """Writer twin of :func:`_aiff_f80_decode` for positive integers."""
    bl = v.bit_length()
    return (16382 + bl).to_bytes(2, "big") + (v << (64 - bl)).to_bytes(
        8, "big")


def _decode_aiff_pcm(b: bytes):
    """AIFF (big-endian IFF: FORM/AIFF with COMM + SSND chunks) integer
    PCM -> (sample_rate, int32 (n_frames, n_channels)) or None — the
    Apple-ecosystem sibling of :func:`_decode_wav_pcm`, which
    dispatches here on the FORM/AIFF magic. Conventions flipped vs
    WAV: every depth is big-endian and 8-bit is SIGNED (so silence is
    0 without the centering shift); chunks pad to even length (IFF);
    SSND carries an offset field whose bytes are skipped. COMM's
    n_frames caps the frame count; a data chunk shorter than declared
    truncates to complete frames (the WAV tolerance). AIFC
    (compressed, FORM type 'AIFC') quarantines — its COMM carries a
    codec id this PCM lane must not misread."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        return None
    nch = nframes = bits = rate = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        csize = int.from_bytes(b[i + 4 : i + 8], "big")
        body = b[i + 8 : i + 8 + csize]
        if cid == b"COMM" and len(body) >= 18:
            nch = int.from_bytes(body[0:2], "big", signed=True)
            nframes = int.from_bytes(body[2:6], "big")
            bits = int.from_bytes(body[6:8], "big")
            rate = _aiff_f80_decode(body[8:18])
        elif cid == b"SSND" and len(body) >= 8:
            off = int.from_bytes(body[0:4], "big")
            if off > len(body) - 8:
                return None
            data = body[8 + off :]
        i += 8 + csize + (csize % 2)  # IFF chunks are word-aligned
    if (not nch or nch < 1 or not rate or bits not in (8, 16, 24)
            or nframes is None or data is None):
        return None
    ba = nch * (bits // 8)
    n = min(nframes, len(data) // ba)
    if n == 0 or n * nch > _MAX_SAMPLES:
        return None
    data = data[: n * ba]
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.int8).astype(np.int32)
    elif bits == 16:
        samples = np.frombuffer(data, dtype=">i2").astype(np.int32)
    else:  # 24-bit: 3-byte BIG-endian, sign-extended
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8)
             | raw[:, 2].astype(np.int32))
        samples = (x ^ 0x800000) - 0x800000
    return rate, samples.reshape(n, nch)


def _aiff_encode(frames, rate: int, bits: int,
                 ssnd_offset: int = 0) -> bytes:
    """AIFF writer twin of :func:`_decode_aiff_pcm`: big-endian PCM at
    8 (signed) / 16 / 24 bits, 80-bit extended-float rate, IFF even
    padding, and an optional SSND offset prefix (zero bytes the
    decoder must skip)."""
    import numpy as np

    frames = np.asarray(frames)
    n, nch = frames.shape
    if bits == 8:
        payload = frames.astype(np.int8).tobytes()
    elif bits == 16:
        payload = frames.astype(">i2").tobytes()
    else:
        x = (frames.astype(np.int64).reshape(-1) & 0xFFFFFF)
        arr = np.empty((x.size, 3), np.uint8)
        arr[:, 0] = (x >> 16) & 0xFF
        arr[:, 1] = (x >> 8) & 0xFF
        arr[:, 2] = x & 0xFF
        payload = arr.tobytes()
    comm = (nch.to_bytes(2, "big") + n.to_bytes(4, "big")
            + bits.to_bytes(2, "big") + _aiff_f80_encode(rate))
    ssnd = (ssnd_offset.to_bytes(4, "big") + (0).to_bytes(4, "big")
            + b"\x00" * ssnd_offset + payload)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (cid + len(body).to_bytes(4, "big") + body
                + (b"\x00" if len(body) % 2 else b""))

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + len(body).to_bytes(4, "big") + body


AUDIO_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("sample_rate", LongType(), True),
    StructField("n_channels", LongType(), True),
    StructField("n_frames", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("sample_sum", LongType(), True),
    StructField("abs_peak", LongType(), True),
    StructField("rms", DoubleType(), True),
])


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over RIFF/WAVE PCM payloads —
    the audio twin of :func:`decode_pixels`: Arrow-batched mapInPandas,
    narrow typed stats out (never the samples, so downstream shuffles
    stay narrow), NULL-stats quarantine for anything
    :func:`_decode_wav_pcm` rejects. ``sample_sum`` and ``abs_peak`` are
    exact int64 (centered-sample convention above — bounded by
    2^31 * 2^24 so they cannot overflow); ``rms`` is the float64
    root-mean-square over all channels. duration_ms floors, matching
    `_parse_wav_duration_ms`."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                try:
                    out = _decode_wav_pcm(b)
                except (ValueError, IndexError, OverflowError, MemoryError):
                    out = None
                if out is None:
                    rows.append({"media_id": mid})
                    continue
                rate, frames = out
                n_frames, nch = frames.shape
                flat = frames.ravel()
                rows.append({
                    "media_id": mid,
                    "sample_rate": rate,
                    "n_channels": nch,
                    "n_frames": n_frames,
                    "duration_ms": n_frames * 1000 // rate,
                    "sample_sum": int(flat.sum(dtype=np.int64)),
                    "abs_peak": int(np.abs(flat.astype(np.int64)).max()),
                    "rms": float(
                        np.sqrt(np.mean(flat.astype(np.float64) ** 2))
                    ),
                })
            out_pdf = pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_channels",
                         "n_frames", "duration_ms", "sample_sum",
                         "abs_peak", "rms"],
            )
            for c in ("media_id", "sample_rate", "n_channels", "n_frames",
                      "duration_ms", "sample_sum", "abs_peak"):
                out_pdf[c] = out_pdf[c].astype("Int64")
            out_pdf["rms"] = out_pdf["rms"].astype("float64")
            yield out_pdf

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


def _decode_batch(pdf: "pd.DataFrame", stub: bool) -> "pd.DataFrame":
    import hashlib

    import pandas as pd

    if not stub:
        # Real header-level decode (module docstring): dims for the
        # parseable image formats, duration for RIFF/WAVE audio; NULL
        # fields for formats needing a full codec stack (e.g. video).
        # column-wise zip, not iterrows: per-row Series construction is
        # the exact row-at-a-time tax this Arrow-batched stage avoids
        rows = []
        for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            dims = _parse_image_dims(b) if kind == "image" else None
            dur = _parse_wav_duration_ms(b) if kind == "audio" else None
            rows.append({
                "media_id": mid,
                "kind": kind,
                "n_bytes": len(b) if b is not None else 0,
                "width": dims[0] if dims else None,
                "height": dims[1] if dims else None,
                "duration_ms": dur,
                "content_hash": hashlib.sha256(b or b"").hexdigest(),
            })
        out = pd.DataFrame(
            rows,
            columns=["media_id", "kind", "n_bytes", "width", "height",
                     "duration_ms", "content_hash"],
        )
        for c in ("width", "height", "duration_ms"):
            out[c] = out[c].astype("Int64")
        out["n_bytes"] = out["n_bytes"].astype("int64")
        return out

    payloads = pdf["payload"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
    digest = payloads.map(
        lambda b: hashlib.sha256(b if b is not None else b"").hexdigest()
    )
    # deterministic fake dimensions derived from content
    h16 = digest.map(lambda d: int(d[:8], 16))
    width = (h16 % 1920) + 1
    height = (h16 // 1920 % 1080) + 1
    duration = (h16 % 600000)
    is_image = pdf["kind"] == "image"
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "n_bytes": n_bytes.astype("int64"),
        "width": width.where(is_image).astype("Int64"),
        "height": height.where(is_image).astype("Int64"),
        "duration_ms": duration.where(~is_image).astype("Int64"),
        "content_hash": digest,
    })


def _bmp_bytes(media_id: int) -> bytes:
    """A complete, valid 24-bpp BMP whose dimensions derive from the id:
    width = 1 + id % 64, height = 1 + id % 48 (rows padded to 4 bytes,
    deterministic pixel fill). Used to exercise the REAL decode path on
    genuinely well-formed bytes."""
    w = 1 + media_id % 64
    h = 1 + media_id % 48
    row = (w * 3 + 3) // 4 * 4
    img_size = row * h
    header = (
        b"BM"
        + (54 + img_size).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + bytes((media_id + j) % 256 for j in range(img_size))


def _wav_bytes(media_id: int) -> bytes:
    """A complete PCM mono 16-bit 8 kHz RIFF/WAVE file with
    n_samples = 100 + id % 400 (so duration_ms = n_samples * 1000 // 8000),
    deterministic sample fill."""
    n_samples = 100 + media_id % 400
    data_size = 2 * n_samples
    header = (
        b"RIFF"
        + (36 + data_size).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")      # PCM
        + (1).to_bytes(2, "little")      # mono
        + (8000).to_bytes(4, "little")   # sample rate
        + (16000).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")      # block align
        + (16).to_bytes(2, "little")     # bits/sample
        + b"data"
        + data_size.to_bytes(4, "little")
    )
    return header + bytes((media_id + j) % 256 for j in range(data_size))


def _wav_encode(
    frames,
    sample_rate: int,
    bits: int,
    fmt: str = "pcm",
    extensible: bool = False,
) -> bytes:
    """RIFF/WAVE writer over an (n_frames, n_channels) array — the
    encoder twin of :func:`_decode_wav_pcm`. ``fmt='pcm'`` takes ints
    (8-bit stored unsigned per spec, i.e. value + 128; 16/24/32 signed
    LE); ``fmt='float'`` takes floats stored as IEEE ``<f4``/``<f8``
    (bits 32/64, wFormatTag 3). ``extensible=True`` wraps either lane in
    a 40-byte WAVE_FORMAT_EXTENSIBLE fmt chunk (tag 0xFFFE, cbSize 22,
    validBits = container bits, the standard KSDATAFORMAT GUID).
    Odd-length data chunks get the RIFF pad byte."""
    import numpy as np

    if fmt == "float":
        if bits not in (32, 64):
            raise ValueError(f"unsupported float depth {bits}")
        arr = np.asarray(frames, dtype=np.float64)
        n_frames, nch = arr.shape
        data = arr.astype("<f4" if bits == 32 else "<f8").tobytes()
        tag = 3
    else:
        arr = np.asarray(frames, dtype=np.int64)
        n_frames, nch = arr.shape
        if bits == 8:
            data = (arr + 128).astype(np.uint8).tobytes()
        elif bits == 16:
            data = arr.astype("<i2").tobytes()
        elif bits == 32:
            data = arr.astype("<i4").tobytes()
        elif bits == 24:
            x = arr & 0xFFFFFF
            data = np.stack(
                [x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF], axis=-1
            ).astype(np.uint8).tobytes()
        else:
            raise ValueError(f"unsupported bit depth {bits}")
        tag = 1
    block_align = nch * (bits // 8)
    fmt_body = (
        (0xFFFE if extensible else tag).to_bytes(2, "little")
        + nch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    if extensible:
        fmt_body += (
            (22).to_bytes(2, "little")       # cbSize
            + bits.to_bytes(2, "little")     # wValidBitsPerSample
            + (0).to_bytes(4, "little")      # dwChannelMask
            + tag.to_bytes(2, "little") + _WAVE_GUID_TAIL
        )
    header = (
        b"RIFF"
        + (20 + len(fmt_body) + len(data) + (len(data) % 2)).to_bytes(
            4, "little")
        + b"WAVE"
        + b"fmt "
        + len(fmt_body).to_bytes(4, "little")
        + fmt_body
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return header + data + (b"\x00" if len(data) % 2 else b"")


def synthetic_audio_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV media spanning the integer-PCM decode matrix
    plus compressed lanes: IMA ADPCM (round 12) and MS-ADPCM (round
    13) — the audio sibling of :func:`synthetic_pixel_media`. Grammar
    (ids >= 0, same NULL conventions as the siblings): rate =
    8000 * (1 + id % 3), n_frames = 50 + id % 200, flat input sample j
    (frame-major, channel-minor) is ((id * 7 + 13 * j) % 201) - 100.
    id % 7 == 5 files are MONO IMA ADPCM (samples/block 9/17/25 by
    id % 3 — multi-block, padded final block, fact-chunk truncation).
    id % 7 == 3 files are MONO MS-ADPCM (samples/block 10/18/26 by
    id % 3, coefficient pair (id // 7) % 7 — the slice exercises all
    seven standard pairs — per-file initial iDelta 16 + (id % 11) * 9).
    Both ADPCM formats are LOSSY with per-block state, so decoded
    stats are predicted by replaying the encoder+decoder state machine
    (the oracle does this as recursive CTEs), not by the input
    formula. id % 7 == 1 / id % 7 == 6 files are G.711 µ-law / A-law
    (round 13; mono+stereo, input amplified x327 to sweep all 8
    companding segments) — lossy but STATELESS, so the oracle
    re-derives decode(encode(x)) arithmetically per sample. Remaining
    ids (%7 in 0/2/4) are lossless integer PCM with bits =
    (8, 16, 24)[id % 3], channels = 1 + id % 2 — decoded samples ARE
    the input formula at every depth; of those, (id // 7) % 3 == 1
    files ship the same samples in an AIFF container (late r13:
    big-endian, signed 8-bit, 80-bit extended-float rate, IFF pad
    bytes, alternating SSND offset) and (id // 7) % 3 == 2 files in a
    Sun/NeXT .au container (big-endian signed PCM, alternating
    annotation padding) instead of RIFF/WAVE, so the unchanged oracle
    also proves both parses."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def build(i: int) -> bytes:
            rate = 8000 * (1 + i % 3)
            n_frames = 50 + i % 200
            if i % 7 == 5:
                # IMA ADPCM lane (round 12): mono, samples/block
                # 9/17/25 by id%3 (multi-block files with a padded
                # final block + fact truncation). LOSSY — the oracle
                # replays the codec state machine, not the input.
                j = np.arange(n_frames, dtype=np.int64)
                samples = ((i * 7 + 13 * j) % 201) - 100
                return _wav_encode_ima_adpcm(
                    samples.reshape(n_frames, 1), rate, 9 + 8 * (i % 3))
            if i % 7 == 3:
                # MS-ADPCM lane (round 13): mono, samples/block
                # 10/18/26, coefficient pair (i//7)%7 (i = 7k+3 walks
                # all 7 standard pairs), init iDelta 16 + (i%11)*9.
                # LOSSY — the oracle replays the codec state machine.
                j = np.arange(n_frames, dtype=np.int64)
                samples = ((i * 7 + 13 * j) % 201) - 100
                return _wav_encode_ms_adpcm(
                    samples.reshape(n_frames, 1), rate, 10 + 8 * (i % 3),
                    predictor=(i // 7) % 7, init_delta=16 + (i % 11) * 9)
            if i % 7 in (1, 6):
                # G.711 lanes (round 13): µ-law (i%7==1) / A-law
                # (i%7==6), mono+stereo — stateless companding, so the
                # input is AMPLIFIED x327 (±32700) to sweep all 8
                # segments and the µ-law 32635 clip; the oracle
                # re-derives decode(encode(x)) per sample.
                nch = 1 + i % 2
                j = np.arange(n_frames * nch, dtype=np.int64)
                samples = (((i * 7 + 13 * j) % 201) - 100) * 327
                return _wav_encode_g711(
                    samples.reshape(n_frames, nch), rate,
                    "ulaw" if i % 7 == 1 else "alaw")
            bits = (8, 16, 24)[i % 3]
            nch = 1 + i % 2
            j = np.arange(n_frames * nch, dtype=np.int64)
            samples = ((i * 7 + 13 * j) % 201) - 100
            if (i // 7) % 3 == 1:
                # AIFF container sub-route (late r13): the same PCM
                # samples big-endian in FORM/AIFF (8-bit becomes
                # SIGNED, which encodes the identical centered values),
                # odd-length SSND exercising the IFF pad byte whenever
                # n_frames*nch*bytes is odd, and an SSND offset prefix
                # on alternating files. Lossless — decoded stats (and
                # the oracle) are unchanged.
                return _aiff_encode(samples.reshape(n_frames, nch),
                                    rate, bits,
                                    ssnd_offset=4 * ((i // 21) % 2))
            if (i // 7) % 3 == 2:
                # Sun .au sub-route (late r13): same samples big-endian
                # signed, alternating annotation padding before the
                # data offset. Lossless — oracle unchanged.
                return _au_encode(samples.reshape(n_frames, nch),
                                  rate, bits,
                                  annotation=b"amg\x00" * ((i // 21) % 2))
            return _wav_encode(samples.reshape(n_frames, nch), rate, bits)

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "audio",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-wav://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media table from an id column: even ids get a
    valid BMP (kind=image), odd ids a valid PCM WAV (kind=audio) — both
    fully parameterized by the id, so an oracle can predict the decoded
    dimensions/duration arithmetically while the engine actually parses
    the bytes. Arrow-batched mapInPandas, same fat-row discipline as the
    other media stages."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # nullable Int64, NOT astype("int64"): a NULL id arrives from
            # Arrow as NaN in a float column and the plain int cast
            # raises, killing the task — the job-killer class the
            # nullable MEDIA_SCHEMA exists for. A NULL id synthesizes as
            # id 0 (deterministic), with media_id kept NULL.
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            even = filled % 2 == 0
            yield pd.DataFrame({
                "media_id": mids,
                "kind": even.map({True: "image", False: "audio"}),
                "payload": filled.map(
                    lambda i: _bmp_bytes(int(i)) if i % 2 == 0 else _wav_bytes(int(i))
                ),
                "source_uri": "synthetic://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_media_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract stage as Arrow-batched mapInPandas."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield _decode_batch(pdf, stub=decode_stub)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Resize stage (the training-pipeline normalization step) as
    Arrow-batched mapInPandas. Stub mode emits a deterministic payload
    digest sized ``width*height//64`` bytes in place of real pixels;
    schema/batching/partitioning are the real production shape — fat rows
    in, fat rows out, so run it AFTER any repartition that spreads
    payload bytes.

    ``decode_stub=False`` is REAL since round 8: payloads decodable by
    :func:`decode_pixels_bytes` (BMP/PPM/PNG/GIF/JPEG incl. progressive)
    are nearest-neighbor resized to ``width x height`` raw RGB (src pixel
    (y*h//H, x*w//W) — the standard NN mapping, exactly reproducible by
    an oracle or test arithmetically). Undecodable payloads (video,
    arithmetic-coded JPEG, garbage) quarantine to a NULL payload row,
    the same never-a-dead-task contract as decode_pixels."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        def real_resize(b: bytes | None) -> bytes | None:
            out = decode_pixels_bytes(b)
            if out is None:
                return None
            _, w, h, raw = out
            px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
            rows = (np.arange(height) * h) // height
            cols = (np.arange(width) * w) // width
            return px[rows][:, cols].tobytes()

        for pdf in batches:
            if not decode_stub:
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(real_resize),
                    "width": width,
                    "height": height,
                })
                continue
            n = max(1, width * height // 64)

            def fake_pixels(b: bytes | None) -> bytes:
                seed = hashlib.sha256(b or b"").digest()
                return (seed * (n // len(seed) + 1))[:n]

            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": pdf["payload"].map(fake_pixels),
                "width": width,
                "height": height,
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    # nullable since the real decode path landed: a quarantined payload
    # yields one all-NULL-fields row (same signal as the NULL-stats rows
    # of decode_pixels), never zero rows and never a dead task
    StructField("frame_idx", LongType(), True),
    StructField("ts_ms", LongType(), True),
    StructField("frame_payload", BinaryType(), True),
])

# magic prefixes of true video containers. Round 12: AVI carrying MJPEG
# decodes for real (RIFF walk + in-repo JPEG decoder); ISO-BMFF/EBML —
# and AVIs declaring any non-MJPEG codec — still raise the package's
# honest NotImplementedError rather than silently quarantining
_VIDEO_MAGIC = (b"\x1aE\xdf\xa3",)  # EBML (webm/mkv)


def _is_video_container(b: bytes) -> bool:
    if len(b) < 12:
        return False
    if b[:4] in _VIDEO_MAGIC:
        return True
    if b[4:8] == b"ftyp":  # ISO BMFF (mp4/mov), size-prefixed
        return True
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return True
    return False


def _riff_chunk(fcc: bytes, body: bytes) -> bytes:
    """One RIFF chunk: fourcc + LE size + body + word-align pad byte."""
    return fcc + len(body).to_bytes(4, "little") + body + (
        b"\x00" if len(body) % 2 else b"")


def _riff_list(ltype: bytes, children: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + children)


def _avi_encode_mjpeg(
    jpeg_frames: list, w: int, h: int, usec_per_frame: int = 500000,
    handler: bytes = b"MJPG", compression: bytes = b"MJPG",
    chunk_suffix: bytes = b"dc", bitcount: int = 24,
) -> bytes:
    """Minimal spec-shaped AVI 1.0 writer for an MJPEG video stream —
    the container twin of :func:`_gif_encode_animated`, used by the
    ``synthetic_avi_media`` grammar and the AVI decode tests. Layout is
    the classic RIFF('AVI ') tree: LIST hdrl [avih, LIST strl [strh
    'vids'/<handler>, strf BITMAPINFOHEADER biCompression='MJPG']],
    LIST movi ['00dc' chunks, word-aligned], idx1 (one keyframe entry
    per frame, offsets relative to the 'movi' fourcc per AVI 1.0
    convention). Timing is written consistently in both places players
    read it from: avih.dwMicroSecPerFrame and strh dwScale/dwRate
    (scale=usec, rate=1e6). ``handler`` is parameterizable so tests can
    write a non-MJPEG fourcc and pin the honest-codec-seam behavior."""
    nf = len(jpeg_frames)
    bufsize = max((len(f) for f in jpeg_frames), default=0)
    avih = b"".join(v.to_bytes(4, "little") for v in (
        max(0, usec_per_frame), 0, 0, 0x10, nf, 0, 1, bufsize, w, h,
        0, 0, 0, 0,
    ))
    strh = (
        b"vids" + handler
        + b"".join(v.to_bytes(4, "little") for v in (
            0, 0, 0, max(0, usec_per_frame), 1000000, 0, nf, bufsize,
            0, 0,
        ))
        + b"".join(v.to_bytes(2, "little") for v in (0, 0, w % 65536, h))
    )
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + bitcount.to_bytes(2, "little")
        + compression + (w * h * 3).to_bytes(4, "little")
        + bytes(16)
    )
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih) + _riff_list(
        b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)))
    movi_children = b""
    idx = b""
    cid = b"00" + chunk_suffix
    for frame in jpeg_frames:
        # idx1 offsets point at the chunk's fourcc, relative to the
        # 'movi' fourcc itself (offset 4 = first chunk)
        idx += (cid + (0x10).to_bytes(4, "little")
                + (4 + len(movi_children)).to_bytes(4, "little")
                + len(frame).to_bytes(4, "little"))
        movi_children += _riff_chunk(cid, frame)
    body = (b"AVI " + hdrl + _riff_list(b"movi", movi_children)
            + _riff_chunk(b"idx1", idx))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _avi_encode_dib(
    rgb_frames: list, w: int, h: int, usec_per_frame: int = 500000,
) -> bytes:
    """Uncompressed (DIB) AVI writer twin (late r13): each frame is a
    bottom-up BGR DIB with rows padded to 4 bytes — the BMP body layout
    — in '00db' chunks, fccHandler 'DIB ' and strf biCompression 0
    (BI_RGB). Frames take top-down RGB bytes like every other twin."""
    import numpy as np

    stride = (w * 3 + 3) // 4 * 4
    dibs = []
    for rgb in rgb_frames:
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)[::-1, :, ::-1]
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = a.reshape(h, w * 3)
        dibs.append(rows.tobytes())
    return _avi_encode_mjpeg(
        dibs, w, h, usec_per_frame=usec_per_frame, handler=b"DIB ",
        compression=bytes(4), chunk_suffix=b"db")


def _decode_avi_mjpeg_frames(
    b: bytes,
    sampling: tuple[int, int] | None = None,
) -> tuple[int, int, list] | None:
    """AVI/MJPEG -> (w, h, [(delay_ms, rgb), ...]) — the video-container
    decode that closed the package's one NotImplementedError seam for
    the MJPEG case (VERDICT r11 ask #1): AVI is RIFF (the same chunk
    walk as the WAV path, :func:`_decode_wav_pcm`) and every MJPEG
    frame is a self-contained JPEG the in-repo decoder already handles
    (``operators/jpeg.py:decode_jpeg_pixels``), so no new codec is
    needed. Contract mirrors :func:`_decode_gif_frames`:

    - returns None to QUARANTINE malformed files (not RIFF/AVI, no
      vids stream header, no movi list / no frames, a declared-MJPEG
      frame that is not decodable JPEG, frames whose decoded
      dimensions disagree with each other);
    - raises NotImplementedError for an AVI whose video stream
      declares a NON-MJPEG codec (fccHandler / biCompression other
      than MJPG/empty) — that genuinely needs ffmpeg and the seam
      stays loud (ISO-BMFF/EBML are gated upstream in
      :func:`sample_frames`);
    - per-frame delay_ms comes from avih.dwMicroSecPerFrame (fallback
      strh dwScale/dwRate when avih is absent or zero), floor-divided
      to ms and kept raw — a zero-delay file has no timeline and the
      sampler emits only frame 0, the GIF convention;
    - work/memory are bounded by the cumulative decoded-pixel budget
      ``_MAX_PIXELS``: an over-budget file yields its in-budget PREFIX
      of frames (documented truncation, same as GIF).

    Frame chunks are ``NNdc``/``NNdb`` for the FIRST vids stream
    (stream 00 in the writer; the walker keys on the declared stream
    index), found directly in the movi list or inside nested
    ``LIST rec`` groups (interleaved-AVI convention).

    ``sampling=(every_ms, max_frames)`` switches to SAMPLING MODE, the
    scale path :func:`sample_frames` rides: because MJPEG frames are
    self-contained (unlike GIF, where LZW + compositing need every
    prior frame), frames the sampler will not emit are skipped WITHOUT
    entropy decode — a 30 fps video sampled at 1 Hz decodes ~1/30 of
    its frames. Returns (w, h, [(frame_idx, ts_ms, rgb), ...]) — the
    emitted rows directly, produced by the exact sampler recurrence
    (emit when t >= boundary, then boundary = next multiple of
    every_ms; zero-delay files yield only frame 0). Two deliberate
    divergences from decode-everything-then-sample, both documented
    behavior: skipped frames are not validated (a junk chunk the
    sampler never reads cannot quarantine the file — what a real
    player does), and the ``_MAX_PIXELS`` budget is spent on DECODED
    pixels only (deep sample points in long videos stay reachable)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    usec: int | None = None
    scale = rate = None
    vids_handler: bytes | None = None
    compression: bytes | None = None
    strf_w = strf_h = bitcount = None
    saw_vids = False
    movi: tuple[int, int] | None = None
    stream_no = 0
    n_streams_seen = 0

    def walk(lo: int, hi: int) -> None:
        nonlocal usec, scale, rate, vids_handler, compression
        nonlocal strf_w, strf_h, bitcount
        nonlocal saw_vids, movi, stream_no, n_streams_seen
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            body_lo = i + 8
            body_hi = min(hi, body_lo + csize)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                ltype = b[body_lo : body_lo + 4]
                if ltype == b"movi" and movi is None:
                    movi = (body_lo + 4, body_hi)
                elif ltype in (b"hdrl", b"strl"):
                    walk(body_lo + 4, body_hi)
            elif cid == b"avih" and csize >= 4:
                usec = int.from_bytes(b[body_lo : body_lo + 4], "little")
            elif cid == b"strh" and csize >= 32:
                if b[body_lo : body_lo + 4] == b"vids" and not saw_vids:
                    saw_vids = True
                    stream_no = n_streams_seen
                    vids_handler = b[body_lo + 4 : body_lo + 8]
                    scale = int.from_bytes(
                        b[body_lo + 20 : body_lo + 24], "little")
                    rate = int.from_bytes(
                        b[body_lo + 24 : body_lo + 28], "little")
                n_streams_seen += 1
            elif cid == b"strf" and csize >= 20 and saw_vids and (
                    compression is None and n_streams_seen == stream_no + 1):
                compression = b[body_lo + 16 : body_lo + 20]
                strf_w = int.from_bytes(b[body_lo + 4 : body_lo + 8],
                                        "little", signed=True)
                strf_h = int.from_bytes(b[body_lo + 8 : body_lo + 12],
                                        "little", signed=True)
                bitcount = int.from_bytes(b[body_lo + 14 : body_lo + 16],
                                          "little")
            i = body_lo + csize + (csize % 2)

    walk(12, len(b))
    if not saw_vids or movi is None:
        return None  # malformed: no video stream / no frame data
    mjpeg_tags = (b"MJPG", b"mjpg", b"MJPA", b"dmb1")
    blank_handler = vids_handler in (b"\x00\x00\x00\x00", b"    ")
    is_mjpeg = (vids_handler in mjpeg_tags
                or (blank_handler and compression in mjpeg_tags))
    # uncompressed DIB route (late r13): fccHandler 'DIB ' or a blank
    # handler whose strf declares BI_RGB (biCompression 0) — frames are
    # raw bottom-up BGR at the strf geometry, no codec needed
    is_dib = not is_mjpeg and (
        vids_handler in (b"DIB ", b"dib ")
        or (blank_handler and compression == bytes(4)))
    if is_dib:
        if (not strf_w or strf_w <= 0 or not strf_h
                or bitcount not in (24, 32)
                or strf_w * abs(strf_h) > _MAX_PIXELS):
            return None  # malformed/unsupported-depth DIB geometry
    elif not is_mjpeg:
        if blank_handler and compression is None:
            # fccHandler blank AND no biCompression parsed (strf
            # missing/truncated): the file never declares a codec at
            # all — that is malformed, not an unsupported codec, so
            # QUARANTINE it; NotImplementedError is reserved for files
            # that positively declare a non-MJPEG codec
            return None
        raise NotImplementedError(
            "video codecs not available in this environment")
    if not usec and scale and rate:
        usec = (scale * 1000000) // rate
    delay_ms = (usec or 0) // 1000

    from .jpeg import decode_jpeg_pixels

    prefix = f"{stream_no:02d}".encode()
    frames: list = []
    w = h = None
    px_budget = _MAX_PIXELS
    # sampling mode state: MJPEG frames are self-contained, so frames
    # the sampler will not emit are SKIPPED without entropy decode —
    # the independence win GIF cannot have (LZW + compositing need
    # every prior frame). t/next_sample/emitted mirror sample_frames'
    # own loop exactly.
    every_ms = max_emit = None
    if sampling is not None:
        every_ms, max_emit = sampling
    t = 0
    next_sample = 0
    emitted = 0
    frame_idx = 0

    def collect(lo: int, hi: int) -> bool:
        """Walk a movi(-or-rec) body; False = budget exhausted or (in
        sampling mode) the emit cap was reached."""
        nonlocal w, h, px_budget, t, next_sample, emitted, frame_idx
        i = lo
        while i + 8 <= hi:
            cid = b[i : i + 4]
            csize = int.from_bytes(b[i + 4 : i + 8], "little")
            body_lo = i + 8
            body_hi = min(hi, body_lo + csize)
            if cid == b"LIST" and body_hi - body_lo >= 4:
                if b[body_lo : body_lo + 4] == b"rec " and not collect(
                        body_lo + 4, body_hi):
                    return False
            elif cid[:2] == prefix and cid[2:] in (b"dc", b"db"):
                payload = b[body_lo:body_hi]
                if len(payload) == 0:
                    # dropped-frame placeholder: no new image, but the
                    # timeline still advances one tick (a real player
                    # keeps showing the previous frame) — advance
                    # t/frame_idx so every later frame's ts_ms and
                    # frame_idx match the real timeline. In
                    # non-sampling mode the per-frame delay stays
                    # constant, so the previous frame's EXTENDED
                    # display duration is not represented — documented
                    # divergence, matching the GIF convention of one
                    # (delay, rgb) pair per decoded frame.
                    t += delay_ms
                    frame_idx += 1
                    i = body_lo + csize + (csize % 2)
                    continue
                if sampling is not None:
                    if emitted >= max_emit:
                        return False
                    if t < next_sample:  # sampler would skip: no decode
                        t += delay_ms
                        frame_idx += 1
                        i = body_lo + csize + (csize % 2)
                        continue
                if is_dib:
                    import numpy as np

                    nch = bitcount // 8
                    fh = abs(strf_h)
                    stride = (strf_w * nch + 3) // 4 * 4
                    if len(payload) < stride * fh:
                        raise ValueError("short DIB frame")
                    a = np.frombuffer(
                        payload, np.uint8, count=stride * fh,
                    ).reshape(fh, stride)[:, : strf_w * nch]
                    a = a.reshape(fh, strf_w, nch)[..., :3]
                    if strf_h > 0:  # positive height = bottom-up
                        a = a[::-1]
                    fw, rgb = strf_w, a[..., ::-1].tobytes()
                else:
                    if payload[:2] != b"\xff\xd8":
                        raise ValueError("declared-MJPEG frame is not JPEG")
                    out = decode_jpeg_pixels(payload)
                    if out is None:
                        raise ValueError("undecodable MJPEG frame")
                    fw, fh, rgb = out
                if w is None:
                    w, h = fw, fh
                elif (fw, fh) != (w, h):
                    raise ValueError("inconsistent frame dimensions")
                if fw * fh > px_budget:
                    return False  # in-budget prefix, same as GIF
                px_budget -= fw * fh
                if sampling is None:
                    frames.append((delay_ms, rgb))
                else:
                    frames.append((frame_idx, t, rgb))
                    emitted += 1
                    next_sample = (t // every_ms + 1) * every_ms
                    t += delay_ms
                    frame_idx += 1
            i = body_lo + csize + (csize % 2)
        return True

    try:
        collect(movi[0], movi[1])
    except (ValueError, IndexError, OverflowError, MemoryError):
        return None
    if not frames:
        return None
    return w, h, frames


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for multi-frame media: one output row per sampled
    frame — mapInPandas here is a flat map (output rows != input rows),
    which is why this is a mapInPandas stage and not a scalar UDF. Stub
    mode derives a deterministic frame count from the payload digest.

    ``decode_stub=False`` is REAL for animated GIF (the one multi-frame
    format decodable stdlib-only; see :func:`_decode_gif_frames` — round
    11: full compositing, i.e. partial frames, disposal methods 0-3 and
    GCE transparency, each sampled frame being the composited logical
    screen): frames are decoded with cumulative GCE timestamps, then
    sampled — frame 0 always, thereafter the first frame at or past each
    ``every_ms`` boundary. ``max_frames`` caps EMITTED rows only; decode
    work/memory are bounded inside the decoder by a cumulative
    ``_MAX_PIXELS`` budget over LZW output and buffered screens (16.7M
    px — >4000 frames at 64x64), so long animations' later boundaries
    stay reachable instead of hitting a fixed decoded-frame horizon; a
    file past the budget contributes only its in-budget prefix of the
    timeline (documented truncation, see the decoder docstring). A
    zero-delay animation yields just frame 0 — with no timeline there is
    nothing at later sample points. Round 12: MJPEG-in-AVI is REAL too
    (:func:`_decode_avi_mjpeg_frames` — RIFF walk + the in-repo JPEG
    decoder, per-frame timestamps from dwMicroSecPerFrame), so the
    NotImplementedError seam narrows to containers that genuinely need
    ffmpeg: ISO-BMFF/EBML magic, and AVIs declaring a non-MJPEG codec —
    those stay loud rather than silently quarantined. Anything else
    (malformed, non-media bytes) yields one NULL-fields quarantine row,
    the same never-a-dead-task contract as decode_pixels."""
    if every_ms <= 0 or max_frames <= 0:
        # fail at the API boundary, not as a ZeroDivisionError mid-task
        raise ValueError("every_ms and max_frames must be positive")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        cols = ["media_id", "frame_idx", "ts_ms", "frame_payload"]
        for pdf in batches:
            out: list[dict] = []
            if decode_stub:
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    digest = hashlib.sha256(payload or b"").digest()
                    duration_ms = int.from_bytes(digest[:4], "big") % 600000
                    n = min(max_frames, max(1, duration_ms // every_ms))
                    for i in range(n):
                        out.append({
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame_payload": digest + i.to_bytes(4, "big"),
                        })
                yield pd.DataFrame(out, columns=cols)
                continue
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = None
                if payload is not None and _is_video_container(payload):
                    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                        # MJPEG-in-AVI decodes for real (round 12) in
                        # SAMPLING MODE — frames between sample
                        # boundaries are skipped without entropy decode
                        # (self-contained frames, unlike GIF). An AVI
                        # declaring any other codec raises from the
                        # decoder — the honest seam, kept loud.
                        got = _decode_avi_mjpeg_frames(
                            payload, sampling=(every_ms, max_frames))
                        if got is None:
                            out.append({"media_id": mid})  # quarantine
                        else:
                            for fi, ts, rgb in got[2]:
                                out.append({
                                    "media_id": mid,
                                    "frame_idx": fi,
                                    "ts_ms": ts,
                                    "frame_payload": rgb,
                                })
                        continue
                    else:
                        raise NotImplementedError(
                            "video codecs not available in this environment"
                        )
                elif payload is not None:
                    try:
                        decoded = _decode_gif_frames(payload)
                    except (ValueError, IndexError, OverflowError,
                            MemoryError):
                        decoded = None
                if decoded is None:
                    out.append({"media_id": mid})  # quarantine row
                    continue
                _w, _h, frames = decoded
                # frame i displays for delay_ms[i], so it appears at the
                # sum of the PRIOR frames' delays
                t = 0
                next_sample = 0
                emitted = 0
                for i, (delay_ms, rgb) in enumerate(frames):
                    if emitted >= max_frames:
                        break
                    if t >= next_sample:
                        out.append({
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": t,
                            "frame_payload": rgb,
                        })
                        emitted += 1
                        next_sample = (t // every_ms + 1) * every_ms
                    t += delay_ms
            pdf_out = pd.DataFrame(out, columns=cols)
            for c in ("media_id", "frame_idx", "ts_ms"):
                pdf_out[c] = pdf_out[c].astype("Int64")
            yield pdf_out

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real pixel decode (round 8): BMP / PPM / PNG -> canonical RGB, stdlib only.
#
# The synthetic payloads are id-parameterized so a DuckDB oracle predicts the
# per-channel sums arithmetically: raw top-down RGB byte j of media ``id`` is
# (id + j) % 256. A matching sum therefore proves the engine decoded every
# byte through the real container format — including the PNG path, whose
# encoder rotates the row filter (r % 5) so a decoder that does not
# reconstruct Sub/Up/Average/Paeth correctly cannot reproduce the raw stream.
# (Reference context: the fake-object content generator,
# /root/reference/src/main.py:977-1020, is the analogous synthesize-then-
# deliver media surface.)
# ---------------------------------------------------------------------------

_MAX_PIXELS = 1 << 24  # decompression-bomb guard: ~16M px, far above any test


def _raw_fill(media_id: int, w: int, h: int) -> bytes:
    """Deterministic raw RGB stream (top-down rows, RGB order)."""
    n = w * h * 3
    # (id + j) % 256 for j in range(n) == the byte ring rotated by id
    ring = bytes(range(256)) * (n // 256 + 2)
    return ring[media_id % 256 : media_id % 256 + n]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass, spec order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_filter_rows(rows: bytes, pw: int, ph: int, bpp: int) -> bytearray:
    """Filter ``ph`` rows of ``pw * bpp`` bytes with rotating filter type
    r % 5 and the SPEC's bpp-sized left neighbor — shared by the plain
    and per-Adam7-pass encode paths."""
    stride = pw * bpp
    out = bytearray()
    prior = bytes(stride)
    for r in range(ph):
        row = rows[r * stride : (r + 1) * stride]
        f = r % 5
        out.append(f)
        left = lambda i: row[i - bpp] if i >= bpp else 0  # noqa: E731
        upleft = lambda i: prior[i - bpp] if i >= bpp else 0  # noqa: E731
        if f == 0:
            out += row
        elif f == 1:  # Sub
            out += bytes((row[i] - left(i)) & 0xFF for i in range(stride))
        elif f == 2:  # Up
            out += bytes((row[i] - prior[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            out += bytes((row[i] - (left(i) + prior[i]) // 2) & 0xFF
                         for i in range(stride))
        else:  # Paeth
            out += bytes((row[i] - _paeth(left(i), prior[i], upleft(i))) & 0xFF
                         for i in range(stride))
        prior = row
    return out


def _png_encode(
    raw: bytes, w: int, h: int, bpp: int = 3, ctype: int = 2,
    plte: bytes | None = None, bitdepth: int = 8, interlace: int = 0,
) -> bytes:
    """Minimal PNG writer over pre-pixel bytes of width ``bpp`` BYTES
    (ctype 0 grayscale / 2 RGB / 3 palette indices + ``plte`` / 4
    gray+alpha / 6 RGBA; for ``bitdepth=16`` the caller supplies
    big-endian 2-byte samples and bpp counts bytes, e.g. RGB16 -> 6).
    Row r uses filter type r % 5 with the SPEC's bpp-sized left
    neighbor; ``interlace=1`` emits the seven Adam7 passes, each
    independently filtered (empty passes contribute no bytes, per spec),
    so the encoded stream exercises every filter at every pixel width
    AND the deinterlace scatter. For sub-byte depths (1/2/4, ctype 0 or
    3) ``raw`` is one byte PER SAMPLE (< 2^bitdepth) and rows are packed
    MSB-first with byte padding before filtering (bpp is ignored)."""
    import zlib

    import numpy as np

    if bitdepth < 8:
        if interlace:
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
            out = bytearray()
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                sub = arr[y0::dy, x0::dx].tobytes()  # C-order copy
                out += _png_pack_subbyte_rows(sub, pw, ph, bitdepth)
        else:
            out = _png_pack_subbyte_rows(raw, w, h, bitdepth)
    elif interlace:
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, bpp)
        out = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = arr[y0::dy, x0::dx].tobytes()
            out += _png_filter_rows(sub, pw, ph, bpp)
    else:
        out = _png_filter_rows(raw, w, h, bpp)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([bitdepth, ctype, 0, 0, interlace]))
    chunks = _png_chunk(b"IHDR", ihdr)
    if plte is not None:  # spec: PLTE sits between IHDR and IDAT
        chunks += _png_chunk(b"PLTE", plte)
    return (b"\x89PNG\r\n\x1a\n"
            + chunks
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _ppm_encode(raw: bytes, w: int, h: int) -> bytes:
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + raw


def _bmp_encode(raw: bytes, w: int, h: int) -> bytes:
    """24-bpp bottom-up BGR BMP with 4-byte row padding around ``raw``
    (top-down RGB) — the standard layout _parse_image_dims already reads."""
    stride = (w * 3 + 3) // 4 * 4
    pad = bytes(stride - w * 3)
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = raw[r * w * 3 : (r + 1) * w * 3]
        for c in range(w):
            px = row[c * 3 : c * 3 + 3]
            body += bytes((px[2], px[1], px[0]))  # RGB -> BGR
        body += pad
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + bytes(body)


def _bmp_encode_palette(indices: bytes, pal: bytes, w: int, h: int,
                        rle: bool = False) -> bytes:
    """8-bit palette BMP twin of the :func:`_decode_bmp_pixels` palette
    lane: BGRX color table, bottom-up rows — BI_RGB padded to 4 bytes,
    or BI_RLE8 (runs >= 3 as run tokens, literal stretches >= 3 as
    absolute mode with its word pad, shorter ones as 1-pixel runs, EOL
    per row, EOB at the end)."""
    ncol = len(pal) // 3
    table = bytearray()
    for c in range(ncol):
        table += bytes((pal[3 * c + 2], pal[3 * c + 1], pal[3 * c], 0))
    body = bytearray()
    if not rle:
        stride = (w + 3) // 4 * 4
        for r in range(h - 1, -1, -1):
            body += indices[r * w : (r + 1) * w] + bytes(stride - w)
        comp = 0
    else:
        for r in range(h - 1, -1, -1):
            row = indices[r * w : (r + 1) * w]
            x = 0
            while x < w:
                run = 1
                while x + run < w and run < 255 and row[x + run] == row[x]:
                    run += 1
                if run >= 3:
                    body += bytes((run, row[x]))
                    x += run
                    continue
                j = x
                lit = 0
                while j < w and lit < 255:
                    rr = 1
                    while j + rr < w and rr < 3 and row[j + rr] == row[j]:
                        rr += 1
                    if rr >= 3:
                        break
                    j += 1
                    lit += 1
                if lit >= 3:
                    body += bytes((0, lit)) + row[x:j]
                    if lit % 2:
                        body += b"\x00"  # absolute mode word pad
                else:
                    for p in range(x, j):
                        body += bytes((1, row[p]))
                x = j
            body += b"\x00\x00"  # EOL
        body += b"\x00\x01"  # EOB
        comp = 1
    data_off = 54 + len(table)
    header = (
        b"BM"
        + (data_off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + comp.to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + ncol.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return header + bytes(table) + bytes(body)


def _bmp_rle8_decode(b: bytes, off: int, w: int, h: int):
    """BI_RLE8 (late r13) -> (h, w) uint8 index grid in STORED
    (bottom-up) row order, or None. Tokens: (n>0, v) runs; escapes
    (0,0) end-of-line, (0,1) end-of-bitmap, (0,2) dx,dy cursor delta
    (skipped pixels keep index 0, the common decoder convention),
    (0, n>=3) absolute literals padded to word alignment. Runs or
    literals crossing a row end, cursor escapes leaving the grid, and
    stream overruns all quarantine."""
    import numpy as np

    grid = np.zeros((h, w), np.uint8)
    x = y = 0  # cursor in stored order: row 0 = bottom image row
    i, n = off, len(b)
    while True:
        if i + 2 > n:
            return None  # stream ended without EOB
        c, v = b[i], b[i + 1]
        i += 2
        if c:
            if y >= h or x + c > w:
                return None
            grid[y, x : x + c] = v
            x += c
        elif v == 0:  # EOL
            y += 1
            x = 0
            if y > h:
                return None
        elif v == 1:  # EOB: anything not yet written stays index 0
            return grid
        elif v == 2:  # delta
            if i + 2 > n:
                return None
            x += b[i]
            y += b[i + 1]
            i += 2
            if x > w or y > h:
                return None
        else:  # absolute mode
            if y >= h or x + v > w or i + v > n:
                return None
            grid[y, x : x + v] = np.frombuffer(b, np.uint8, count=v,
                                               offset=i)
            x += v
            i += v + (v & 1)  # literals pad to word alignment


def _decode_bmp_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h_raw = int.from_bytes(b[22:26], "little", signed=True)
    bits = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    clr_used = int.from_bytes(b[46:50], "little")
    if w <= 0 or h_raw == 0:
        return None
    h = abs(h_raw)
    if w * h > _MAX_PIXELS:
        return None
    if bits == 8 and compression in (0, 1):
        # 8-bit palette lane (late r13): BGRX color table after the
        # info header, BI_RGB padded rows or BI_RLE8 (bottom-up only,
        # per spec — a negative height with RLE8 is malformed)
        import numpy as np

        ncol = clr_used or 256
        if ncol > 256 or hdr_size < 40:
            return None
        pal_off = 14 + hdr_size
        if pal_off + 4 * ncol > len(b) or data_off < pal_off + 4 * ncol:
            return None
        pal = np.frombuffer(b, np.uint8, count=4 * ncol,
                            offset=pal_off).reshape(ncol, 4)[:, 2::-1]
        if compression == 0:
            stride = (w + 3) // 4 * 4
            if data_off + stride * h > len(b):
                return None
            idx = np.frombuffer(b, np.uint8, count=stride * h,
                                offset=data_off).reshape(h, stride)[:, :w]
        else:
            if h_raw < 0:
                return None
            idx = _bmp_rle8_decode(b, data_off, w, h)
            if idx is None:
                return None
        if int(idx.max(initial=0)) >= ncol:
            return None  # index beyond the declared palette
        px = pal[idx]
        if h_raw > 0:
            px = px[::-1]
        return w, h, px.tobytes()
    # BI_RGB 24-bpp (BGR, rows padded to 4) and 32-bpp (BGRA/BGRX, alpha
    # byte dropped) — the two uncompressed truecolor layouts in the wild
    if bits not in (24, 32) or compression != 0:
        return None
    nch = bits // 8
    stride = (w * nch + 3) // 4 * 4
    # lower-bound data_off too: an offset inside the 54-byte header would
    # "decode" the header bytes themselves as pixels
    if data_off < 54 or data_off + stride * h > len(b):
        return None
    # vectorized: a per-pixel Python loop costs ~0.4 s/Mpx, which turns
    # one max-size hostile payload into a multi-second straggler task
    import numpy as np

    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)[:, : w * nch]
    px = rows.reshape(h, w, nch)[..., :3]  # 32-bpp: drop the A/X byte
    if h_raw > 0:  # positive height = bottom-up storage; negative = top-down
        px = px[::-1]
    # tobytes() already emits a C-order copy of a non-contiguous view —
    # an ascontiguousarray here would copy the whole image twice
    return w, h, px[..., ::-1].tobytes()  # BGR -> RGB


def _decode_ppm_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """P6 (binary RGB) and, late r13, P5 (binary grayscale, expanded
    g -> (g, g, g) like the other gray lanes) netpbm decode. maxval
    must be 255; '#' comments and the exact one-whitespace separator
    rule apply to both."""
    if len(b) < 10 or b[:2] not in (b"P5", b"P6"):
        return None
    gray = b[:2] == b"P5"
    # header: three whitespace-separated ints, '#' comments to end-of-line
    toks: list[int] = []
    i, n = 2, len(b)
    while i < n and len(toks) < 3:
        ch = b[i]
        if ch == 0x23:  # '#'
            while i < n and b[i] not in (0x0A, 0x0D):
                i += 1
        elif ch in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
            i += 1
        elif 0x30 <= ch <= 0x39:
            j = i
            while j < n and 0x30 <= b[j] <= 0x39:
                j += 1
            toks.append(int(b[i:j]))
            i = j
        else:
            return None
    if len(toks) < 3 or i >= n:
        return None
    w, h, maxval = toks
    if w <= 0 or h <= 0 or maxval != 255 or w * h > _MAX_PIXELS:
        return None
    # exactly one whitespace byte separates maxval from pixel data — a
    # non-whitespace byte there (e.g. "255X...") is a malformed header
    if b[i] not in (0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C):
        return None
    i += 1
    if gray:
        if i + w * h > n:
            return None
        import numpy as np

        px = np.frombuffer(b, np.uint8, count=w * h, offset=i)
        return w, h, np.repeat(px, 3).tobytes()
    if i + w * h * 3 > n:
        return None
    return w, h, b[i : i + w * h * 3]


# TGA v2 footer signature — TGA has NO leading magic, so the engine
# requires the spec-blessed 26-byte footer (TGA 2.0) to sniff the format
# deterministically; the encoder twin always writes it.
_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def _decode_tga_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """TGA (Truevision TARGA, round 13) -> (w, h, top-down RGB) or None.
    Accepted: truecolor image types 2 (uncompressed) and 10 (RLE),
    24/32 bpp BGR(A) with the attribute/alpha byte dropped (the BMP
    32-bpp convention), bottom-up rows unless descriptor bit 5 is set.
    Color-mapped/grayscale types, other depths, over-budget dims, RLE
    packets that overrun the pixel count or the buffer, and truncated
    data all quarantine. Requires the TGA 2.0 footer (see _TGA_FOOTER)
    — sniffed in decode_pixels_bytes, re-checked here."""
    import numpy as np

    if len(b) < 18 + 26 or b[-26:][8:] != _TGA_FOOTER:
        return None
    idlen, cmaptype, imgtype = b[0], b[1], b[2]
    w = int.from_bytes(b[12:14], "little")
    h = int.from_bytes(b[14:16], "little")
    bits, desc = b[16], b[17]
    if cmaptype != 0 or imgtype not in (2, 10) or bits not in (24, 32):
        return None
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        return None
    nch = bits // 8
    i = 18 + idlen
    end = len(b) - 26
    need = w * h * nch
    if imgtype == 2:
        if i + need > end:
            return None
        px = np.frombuffer(b, np.uint8, count=need, offset=i)
    else:
        # RLE: header bit 7 = run packet (one pixel repeated count
        # times), else raw packet of count pixels; count = low7 + 1.
        # Each packet yields >= nch bytes, so the loop is bounded by
        # need/nch iterations (the budget check above bounds need).
        out = bytearray()
        while len(out) < need:
            if i >= end:
                return None
            hdr = b[i]
            i += 1
            cnt = (hdr & 0x7F) + 1
            if hdr & 0x80:
                if i + nch > end:
                    return None
                out += b[i : i + nch] * cnt
                i += nch
            else:
                if i + cnt * nch > end:
                    return None
                out += b[i : i + cnt * nch]
                i += cnt * nch
        if len(out) != need:
            return None  # a packet overran the declared pixel count
        px = np.frombuffer(bytes(out), np.uint8)
    px = px.reshape(h, w, nch)[..., :3]
    if not desc & 0x20:  # bit 5 clear = bottom-up storage
        px = px[::-1]
    return w, h, px[..., ::-1].tobytes()  # BGR -> RGB


def _tga_encode(raw_rgb: bytes, w: int, h: int, rle: bool = False,
                top_down: bool = True, bpp32: bool = False) -> bytes:
    """TGA writer twin of :func:`_decode_tga_pixels`: truecolor type
    2/10, BGR(A) from top-down RGB input, descriptor bit 5 per
    ``top_down``, always footed with the v2 signature."""
    import numpy as np

    nch = 4 if bpp32 else 3
    px = np.frombuffer(raw_rgb, np.uint8).reshape(h, w, 3)[..., ::-1]
    if bpp32:
        px = np.concatenate(
            [px, np.full((h, w, 1), 255, np.uint8)], axis=2)
    if not top_down:
        px = px[::-1]
    body = px.tobytes()
    if rle:
        # greedy run packets over identical consecutive pixels, raw
        # packets otherwise, never crossing the 128 cap
        flat = [body[k : k + nch] for k in range(0, len(body), nch)]
        enc = bytearray()
        k = 0
        while k < len(flat):
            run = 1
            while (k + run < len(flat) and run < 128
                   and flat[k + run] == flat[k]):
                run += 1
            if run > 1:
                enc.append(0x80 | (run - 1))
                enc += flat[k]
                k += run
            else:
                j = k + 1
                while (j < len(flat) and j - k < 128
                       and (j + 1 >= len(flat) or flat[j] != flat[j + 1])):
                    j += 1
                enc.append(j - k - 1)
                enc += b"".join(flat[k:j])
                k = j
        body = bytes(enc)
    hdr = bytes([
        0, 0, 10 if rle else 2,
        0, 0, 0, 0, 0,  # no color map
        0, 0, 0, 0,     # origin
    ]) + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([
        8 * nch, (0x20 if top_down else 0) | (8 if bpp32 else 0),
    ])
    footer = bytes(8) + _TGA_FOOTER
    return hdr + body + footer


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _decode_qoi_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """QOI (Quite OK Image, round 13) -> (w, h, top-down RGB) or None.
    The full spec-defined op set: RGB, RGBA, INDEX (64-slot running
    hash table), DIFF (2-bit wrapping channel deltas), LUMA (green
    delta + red/blue relative), RUN (1..62). channels=4 images are
    accepted with the alpha byte dropped from the output (the same
    opaque-view convention as 32-bpp BMP/TGA). Truncated streams,
    over-budget dims, and a missing 8-byte end marker quarantine."""
    if (len(b) < 14 + 8 or b[:4] != b"qoif"
            or b[-8:] != b"\x00" * 7 + b"\x01"):
        return None
    w = int.from_bytes(b[4:8], "big")
    h = int.from_bytes(b[8:12], "big")
    channels, colorspace = b[12], b[13]
    if (w <= 0 or h <= 0 or w * h > _MAX_PIXELS
            or channels not in (3, 4) or colorspace > 1):
        return None
    n = w * h
    out = bytearray()
    r, g, bl, a = 0, 0, 0, 255
    index = [(0, 0, 0, 0)] * 64
    i, end = 14, len(b) - 8
    run = 0
    for _ in range(n):
        if run > 0:
            run -= 1
        elif i < end:
            b0 = b[i]
            i += 1
            if b0 == 0xFE:  # QOI_OP_RGB
                if i + 3 > end:
                    return None
                r, g, bl = b[i], b[i + 1], b[i + 2]
                i += 3
            elif b0 == 0xFF:  # QOI_OP_RGBA
                if i + 4 > end:
                    return None
                r, g, bl, a = b[i], b[i + 1], b[i + 2], b[i + 3]
                i += 4
            elif b0 < 0x40:  # QOI_OP_INDEX
                r, g, bl, a = index[b0]
            elif b0 < 0x80:  # QOI_OP_DIFF
                r = (r + ((b0 >> 4) & 3) - 2) % 256
                g = (g + ((b0 >> 2) & 3) - 2) % 256
                bl = (bl + (b0 & 3) - 2) % 256
            elif b0 < 0xC0:  # QOI_OP_LUMA
                if i >= end:
                    return None
                b1 = b[i]
                i += 1
                dg = (b0 & 0x3F) - 32
                r = (r + dg + (b1 >> 4) - 8) % 256
                g = (g + dg) % 256
                bl = (bl + dg + (b1 & 15) - 8) % 256
            else:  # QOI_OP_RUN
                run = b0 & 0x3F
            index[_qoi_hash(r, g, bl, a)] = (r, g, bl, a)
        else:
            return None  # stream exhausted before w*h pixels
        out += bytes((r, g, bl))
    return w, h, bytes(out)


def _qoi_encode(raw_rgb: bytes, w: int, h: int) -> bytes:
    """QOI writer twin of :func:`_decode_qoi_pixels` (channels=3).
    Encode-by-decode: the index table is updated exactly when the
    DECODER updates its own (once per emitted op, including the RUN
    op), so every INDEX emission is provably consistent with the
    decoder's table state."""
    out = bytearray(b"qoif" + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                    + bytes([3, 0]))
    pr, pg, pb, pa = 0, 0, 0, 255
    index = [(0, 0, 0, 0)] * 64
    run = 0
    for k in range(0, len(raw_rgb), 3):
        r, g, b = raw_rgb[k], raw_rgb[k + 1], raw_rgb[k + 2]
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                index[_qoi_hash(pr, pg, pb, pa)] = (pr, pg, pb, pa)
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            index[_qoi_hash(pr, pg, pb, pa)] = (pr, pg, pb, pa)
            run = 0
        idx = _qoi_hash(r, g, b, 255)
        if index[idx] == (r, g, b, 255):
            out.append(idx)
        else:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
            index[idx] = (r, g, b, 255)
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
        index[_qoi_hash(pr, pg, pb, pa)] = (pr, pg, pb, pa)
    return bytes(out) + b"\x00" * 7 + b"\x01"


def _packbits_decode(b: bytes, lo: int, hi: int, cap: int) -> bytes | None:
    """TIFF PackBits (Apple RLE): header n in -127..127 — n >= 0 copies
    n+1 literal bytes, n < 0 repeats the next byte 1-n times, -128 is a
    no-op. Returns None on truncation or when output exceeds ``cap``
    (the strip's declared size — a bomb/corruption guard)."""
    out = bytearray()
    i = lo
    while i < hi:
        n = b[i] - 256 if b[i] >= 128 else b[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > hi:
                return None
            out += b[i : i + n + 1]
            i += n + 1
        else:
            if i >= hi:
                return None
            out += b[i : i + 1] * (1 - n)
            i += 1
        if len(out) > cap:
            return None
    return bytes(out)


def _tiff_lzw_decode(b: bytes, lo: int, hi: int, cap: int) -> bytes | None:
    """TIFF-variant LZW (spec section 13) -> bytes or None. Differs from
    the GIF variant (:func:`_gif_lzw_decode`) in three ways: codes are
    packed MSB-first, the symbol alphabet is always 8-bit (Clear=256,
    EOI=257, first dictionary code 258, width starts at 9), and the
    width bump happens one code EARLY — the width grows when the table
    reaches 2^width - 1 entries, not 2^width (libtiff's
    ``free_ent > nbitsmask-1``; GIF-timed streams desynchronize exactly
    at code 511). A conforming stream starts with Clear; one that does
    not (or that references beyond the table, or runs out of bits
    before ``cap`` output bytes) returns None. Output is truncated at
    ``cap`` (the segment's declared decompressed size — strips/tiles
    each carry an independent LZW stream, so ``cap`` is exact and
    doubles as the bomb guard).

    Above the shared ``_LZW_TWO_PHASE_MIN_PIX`` size gate, code
    extraction is TWO-PHASE like the GIF lane (r11 pattern, ported
    late r13): the code width is a deterministic function of the
    dictionary size — under the early-change rule it bumps exactly
    when the table reaches 2^width - 1 — so each run of same-width
    codes is gathered in one vectorized numpy step (big-endian
    three-byte windows, shift, mask), truncated at the first
    Clear/EOI, and only the dictionary/output bookkeeping stays a
    Python loop. Sub-gate segments (the catalog's small tiles) keep
    the scalar lane; both are pinned equivalent by the round-trip and
    mutation fuzz in tests/test_decoder_fuzz.py."""
    if cap < _LZW_TWO_PHASE_MIN_PIX:
        return _tiff_lzw_decode_small(b, lo, hi, cap)
    import numpy as np

    data = b[lo:hi]
    nbits = len(data) * 8
    buf = np.frombuffer(data + b"\x00\x00", dtype=np.uint8)
    tri = ((buf[:-2].astype(np.uint32) << 16)
           | (buf[1:-1].astype(np.uint32) << 8)
           | buf[2:].astype(np.uint32))
    out = bytearray()
    table: list[bytes] | None = None
    tlen = 258
    width = 9
    prev: bytes | None = None
    bitpos = 0
    arange = np.arange
    while len(out) < cap:
        if width < 12:
            # codes until the early-change bump, +1 right after Clear
            # (the first code appends no entry)
            room = (1 << width) - 1 - tlen + (1 if prev is None else 0)
        else:
            room = 4096  # width pinned; chunk to bound re-extraction
        k = min(max(1, room), (nbits - bitpos) // width)
        if k <= 0:
            return None  # bits exhausted before cap output bytes
        offs = bitpos + width * arange(k, dtype=np.int64)
        sh = (24 - width - (offs & 7)).astype(np.uint32)
        codes = (tri[offs >> 3] >> sh) & ((1 << width) - 1)
        special = np.nonzero((codes == 256) | (codes == 257))[0]
        if special.size:
            codes = codes[: int(special[0]) + 1]
        codes_l = codes.tolist()
        bitpos += width * len(codes_l)
        for code in codes_l:
            if code == 257:
                return None  # EOI before cap bytes: short segment
            if code == 256:
                if table is None:
                    table = [bytes([i]) for i in range(256)] + [b"", b""]
                else:
                    del table[258:]
                tlen = 258
                width = 9
                prev = None
                continue
            if table is None:
                return None  # stream must open with Clear
            if code < tlen:
                entry = table[code]
            elif code == tlen and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None  # code beyond the dictionary: corrupt
            out += entry
            if prev is not None and tlen < 4096:
                table.append(prev + entry[:1])
                tlen += 1
                if tlen == (1 << width) - 1 and width < 12:
                    width += 1
            prev = entry
            if len(out) >= cap:
                return bytes(out[:cap])
    return bytes(out[:cap])


def _tiff_lzw_decode_small(b: bytes, lo: int, hi: int, cap: int) -> bytes | None:
    """Scalar byte-fed-accumulator lane for sub-gate segments — the
    readable reference twin of the two-phase path in
    :func:`_tiff_lzw_decode`, which owns the dispatch."""
    out = bytearray()
    table: list[bytes] | None = None
    tlen = 258
    width = 9
    acc = nbits = 0
    pos = lo
    prev: bytes | None = None
    while len(out) < cap:
        while nbits < width:
            if pos >= hi:
                return None  # bits exhausted before EOI / cap reached
            acc = (acc << 8) | b[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1  # drop consumed bits or acc grows
        # into an ever-larger bigint and each shift turns quadratic
        if code == 257:  # EOI before cap bytes: short segment
            return None
        if code == 256:  # Clear: (re)initialize
            if table is None:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
            else:
                del table[258:]
            tlen = 258
            width = 9
            prev = None
            continue
        if table is None:
            return None  # stream must open with Clear
        if code < tlen:
            entry = table[code]
        elif code == tlen and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # code beyond the dictionary: corrupt stream
        out += entry
        if prev is not None and tlen < 4096:
            table.append(prev + entry[:1])
            tlen += 1
            # early change: widen at 2^width - 1 (one before GIF's rule)
            if tlen == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:cap])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF LZW compressor (test/synthetic twin of
    :func:`_tiff_lzw_decode`): MSB-first packing, opening Clear,
    trailing EOI, and the early-change width rule mirrored one table
    entry ahead of the decoder — the encoder widens when ITS table
    reaches 2^width (the decoder, lagging one entry, hits 2^width - 1
    at the same code position). The table is reset with a Clear once
    it reaches 4094 entries (the spec's encoder contract, leaving
    codes 4094/4095 never assigned)."""
    out = bytearray()
    acc = nbits = 0
    width = 9

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # same bigint-growth guard as decode

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    put(256, width)  # opening Clear
    cur = b""
    for ch in data:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:  # table full: Clear and restart
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([ch])
    if cur:
        put(table[cur], width)
    put(257, width)  # EOI
    if nbits:
        put(0, 8 - nbits)  # zero-pad to a byte boundary
    return bytes(out)


def _tiff_undiff(seg: bytes, nrows: int, npx: int, spp: int) -> bytes:
    """Reverse TIFF predictor 2 (horizontal differencing, tag 317): each
    row of a decompressed strip/tile stores per-sample deltas from the
    pixel to its left; recover with a per-channel cumulative sum mod
    256 along the row."""
    import numpy as np

    a = np.frombuffer(seg, np.uint8).reshape(nrows, npx, spp)
    return (a.astype(np.int64).cumsum(axis=1) % 256).astype(np.uint8).tobytes()


def _tiff_diff(seg: bytes, npx: int, spp: int) -> bytes:
    """Predictor-2 writer twin of :func:`_tiff_undiff`: per-channel
    horizontal differences mod 256 (first pixel of each row kept)."""
    import numpy as np

    a = np.frombuffer(seg, np.uint8).astype(np.int16).reshape(-1, npx, spp)
    d = np.empty_like(a)
    d[:, 0] = a[:, 0]
    d[:, 1:] = a[:, 1:] - a[:, :-1]
    return (d % 256).astype(np.uint8).tobytes()


def _decode_tiff_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """Baseline TIFF (round 13) -> (w, h, top-down RGB) or None.
    Accepted: both byte orders (II/MM), chunky 8-bit RGB (photometric
    2, 3 samples), grayscale (photometric 1, 1 sample — expanded to
    RGB; photometric 0 = WhiteIsZero inverts first, the fax/scan
    convention), palette color (photometric 3 + ColorMap, late r13),
    compression 1 (none), 5 (LZW, early-change per spec
    section 13) or 32773 (PackBits), predictor 1 or 2 (horizontal
    differencing, tag 317), and either strip organization (any
    RowsPerStrip) or tile organization (tags 322-325, edge tiles
    zero-padded per spec). First IFD only. Everything else
    quarantines: planar=2, other depths/compressions, palette
    photometric, files that carry both strip and tile tags, and
    segments that overrun the buffer or decode short.

    Round 13 also accepts compression 7 (new-style JPEG, TIFF
    TechNote 2): every strip/tile is an independent JPEG stream
    decoded through the in-repo codec (``operators/jpeg.py``), with
    the optional JPEGTables tag 347 (an abbreviated SOI+DQT/DHT+EOI
    blob) spliced after each segment's SOI before decode. Photometric
    must be 6 (YCbCr — the JPEG stream itself carries sampling and
    does the color convert) and predictor must be 1; segment streams
    must decode to exactly the segment's geometry (strip = w x rows,
    tile = tilew x tileh)."""
    import numpy as np

    if len(b) < 8:
        return None
    if b[:4] == b"II\x2a\x00":
        bo = "little"
    elif b[:4] == b"MM\x00\x2a":
        bo = "big"
    else:
        return None

    def u(lo: int, size: int) -> int:
        return int.from_bytes(b[lo : lo + size], bo)

    ifd = u(4, 4)
    if ifd + 2 > len(b):
        return None
    nent = u(ifd, 2)
    if ifd + 2 + 12 * nent > len(b):
        return None
    tags: dict[int, tuple[int, int, int]] = {}
    for k in range(nent):
        e = ifd + 2 + 12 * k
        tags[u(e, 2)] = (u(e + 2, 2), u(e + 4, 4), e + 8)

    _SIZES = {1: 1, 3: 2, 4: 4, 7: 1}  # 7 = UNDEFINED (raw bytes)

    def values(tag: int) -> list[int] | None:
        if tag not in tags:
            return None
        typ, cnt, at = tags[tag]
        size = _SIZES.get(typ)
        if size is None or cnt == 0 or cnt > 1 << 20:
            return None
        lo = at if size * cnt <= 4 else u(at, 4)
        if lo + size * cnt > len(b):
            return None
        return [u(lo + size * i, size) for i in range(cnt)]

    def scalar(tag: int, default: int | None = None) -> int | None:
        v = values(tag)
        return v[0] if v else default

    w = scalar(256)
    h = scalar(257)
    comp = scalar(259, 1)
    photo = scalar(262)
    spp = scalar(277, 1)
    planar = scalar(284, 1)
    pred = scalar(317, 1)
    bps = values(258) or [1]
    if (not w or not h or w * h > _MAX_PIXELS or planar != 1
            or comp not in (1, 5, 7, 32773) or pred not in (1, 2)
            or any(v != 8 for v in bps) or len(bps) != spp):
        return None
    if comp == 7:
        # new-style JPEG: the embedded stream does sampling + color
        # conversion itself; predictor differencing never applies.
        # photometric 6 = YCbCr color; photometric 1 = grayscale
        # (1-component streams — the scanned-document case). Either
        # way the in-repo JPEG decoder hands back RGB, so the
        # assembly below runs at 3 bytes/pixel regardless of spp.
        if not ((photo == 6 and spp == 3) or (photo == 1 and spp == 1)) \
                or pred != 1:
            return None
    elif not ((photo == 2 and spp == 3)
              or (photo in (0, 1, 3) and spp == 1)):
        return None  # photo 0 = WhiteIsZero: inverted grayscale
    cmap = None
    if photo == 3:
        # palette-color: ColorMap (tag 320) is 3 x 2^bps 16-bit values,
        # all reds then greens then blues; narrowed to 8 bits by >> 8
        cm = values(320)
        if cm is None or len(cm) != 3 * 256 or any(v > 0xFFFF for v in cm):
            return None
        cmap = np.right_shift(
            np.asarray(cm, np.uint32).reshape(3, 256), 8
        ).astype(np.uint8)

    jtables = b""
    if comp == 7 and 347 in tags:
        tv = values(347)
        if tv is None:
            return None
        tb = bytes(tv)
        # JPEGTables is itself an abbreviated JPEG stream: SOI,
        # DQT/DHT segments, EOI (TechNote 2) — splice its interior
        # after each segment's SOI below
        if len(tb) < 4 or tb[:2] != b"\xff\xd8" or tb[-2:] != b"\xff\xd9":
            return None
        jtables = tb[2:-2]

    osp = 3 if comp == 7 else spp  # comp-7 segments decode to RGB

    def segment(off: int, cnt: int, want: int,
                sw: int = 0, sh: int = 0) -> bytes | None:
        """One strip/tile -> exactly ``want`` decompressed bytes or
        None (each segment carries an independent compressed stream).
        For compression 7 the segment is a JPEG stream that must
        decode to exactly ``sw`` x ``sh`` RGB."""
        if off < 8 or off + cnt > len(b):
            return None
        if comp == 7:
            from .jpeg import decode_jpeg_pixels

            s = b[off : off + cnt]
            if s[:2] != b"\xff\xd8":
                return None
            if jtables:
                s = s[:2] + jtables + s[2:]
            out = decode_jpeg_pixels(bytes(s))
            if out is None or out[0] != sw or out[1] != sh:
                return None
            return out[2]
        if comp == 1:
            return b[off : off + want] if cnt >= want else None
        dec = (_tiff_lzw_decode(b, off, off + cnt, want) if comp == 5
               else _packbits_decode(b, off, off + cnt, want))
        if dec is None or len(dec) < want:
            return None
        return dec[:want]

    if any(t in tags for t in (322, 323, 324, 325)):
        # tile-organized: tiles are always full tilew x tileh (edge
        # tiles zero-padded by the writer), pasted then cropped here
        if 273 in tags or 279 in tags:
            return None  # strip- and tile-organized at once: malformed
        tw = scalar(322)
        th = scalar(323)
        offsets = values(324)
        counts = values(325)
        if (not tw or not th or tw * th > _MAX_PIXELS
                or offsets is None or counts is None
                or len(offsets) != len(counts)):
            return None
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if across * down != len(offsets):
            return None
        img = np.zeros((h, w, osp), np.uint8)
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            seg = segment(off, cnt, tw * th * osp, tw, th)
            if seg is None:
                return None
            if pred == 2:
                seg = _tiff_undiff(seg, th, tw, spp)
            tr, tc = divmod(t, across)
            rows = min(th, h - tr * th)
            cols = min(tw, w - tc * tw)
            tile = np.frombuffer(seg, np.uint8).reshape(th, tw, osp)
            img[tr * th : tr * th + rows, tc * tw : tc * tw + cols] = \
                tile[:rows, :cols]
        out = img.tobytes()
    else:
        offsets = values(273)
        counts = values(279)
        if (offsets is None or counts is None
                or len(offsets) != len(counts)):
            return None
        rps = scalar(278, h) or h
        if rps <= 0 or (h + rps - 1) // rps != len(offsets):
            return None
        buf = bytearray()
        for s, (off, cnt) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - s * rps)
            seg = segment(off, cnt, rows * w * osp, w, rows)
            if seg is None:
                return None
            if pred == 2:
                seg = _tiff_undiff(seg, rows, w, spp)
            buf += seg
        if len(buf) != w * h * osp:
            return None
        out = bytes(buf)
    if spp == 1 and comp != 7:  # comp-7 gray is already RGB
        px = np.frombuffer(out, np.uint8)
        if cmap is not None:
            return w, h, np.stack(
                [cmap[0][px], cmap[1][px], cmap[2][px]], axis=1).tobytes()
        if photo == 0:  # WhiteIsZero: 0 is white, max is black
            px = 255 - px
        return w, h, np.repeat(px, 3).tobytes()
    return w, h, out


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >= 3 identical bytes become repeat
    packets, everything else literal packets (max 128 each)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(256 + 1 - run)  # -(run-1) as unsigned
            out.append(data[i])
            i += run
        else:
            j = i
            lit = 0
            while j < n and lit < 128:
                r = 1
                while j + r < n and r < 3 and data[j + r] == data[j]:
                    r += 1
                if r >= 3:
                    break
                j += 1
                lit += 1
            out.append(lit - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _jpeg_abbreviate(stream: bytes) -> tuple[bytes, bytes]:
    """Split a complete JPEG stream into the TIFF JPEGTables blob (tag
    347: SOI + every DQT/DHT segment + EOI, TechNote 2) and the
    abbreviated image stream (everything else, entropy copied verbatim
    from the first SOS on). Twin of the tag-347 splice in
    :func:`_decode_tiff_pixels`."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    i, n = 2, len(stream)
    while i + 4 <= n:
        marker = stream[i + 1]
        if marker == 0xDA:  # SOS: entropy follows — stop parsing
            rest += stream[i:]
            break
        seglen = int.from_bytes(stream[i + 2 : i + 4], "big")
        seg = stream[i : i + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else rest).extend(seg)
        i += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def _tiff_encode(raw_rgb: bytes, w: int, h: int, packbits: bool = False,
                 big_endian: bool = False, rows_per_strip: int = 0,
                 lzw: bool = False, predictor2: bool = False,
                 tile: int = 0, jpeg_segments: list | None = None,
                 jpeg_tables: bytes = b"", palette: bytes | None = None,
                 jpeg_gray: bool = False) -> bytes:
    """TIFF writer twin of :func:`_decode_tiff_pixels`: chunky 8-bit
    RGB, II or MM byte order, compression 1 / 5 (LZW) / 32773
    (PackBits), optional predictor 2 (horizontal differencing, applied
    per segment before compression), and either strip organization
    (``rows_per_strip``, 0 = one strip) or tile organization (``tile``
    = square tile edge; edge tiles zero-padded to full size per spec).
    ``lzw`` wins over ``packbits`` when both are set.

    ``jpeg_segments`` switches to compression 7 (new-style JPEG,
    photometric 6): the pre-encoded per-segment JPEG streams are
    stored verbatim (``raw_rgb`` is ignored; segment count must match
    the strip/tile geometry), and a non-empty ``jpeg_tables`` blob is
    recorded as tag 347.

    ``palette`` (768 RGB bytes) switches to palette-color (photometric
    3, 1 sample/pixel): ``raw_rgb`` is then the w*h index stream and
    the palette is recorded as the ColorMap tag (320, 3 x 256 16-bit
    values v*257, reds/greens/blues planes)."""
    import numpy as np

    bo = "big" if big_endian else "little"
    spp = 1 if (palette is not None
                or (jpeg_segments is not None and jpeg_gray)) else 3

    def pack(chunk: bytes, npx_row: int) -> bytes:
        if predictor2:
            chunk = _tiff_diff(chunk, npx_row, spp)
        if lzw:
            return _tiff_lzw_encode(chunk)
        if packbits:
            return _packbits_encode(chunk)
        return chunk

    chunks: list[bytes] = []
    if jpeg_segments is not None:
        chunks = [bytes(s) for s in jpeg_segments]
    elif tile:
        across = (w + tile - 1) // tile
        down = (h + tile - 1) // tile
        a = np.frombuffer(raw_rgb, np.uint8).reshape(h, w, spp)
        padded = np.zeros((down * tile, across * tile, spp), np.uint8)
        padded[:h, :w] = a
        for tr in range(down):
            for tc in range(across):
                t = padded[tr * tile : (tr + 1) * tile,
                           tc * tile : (tc + 1) * tile]
                chunks.append(pack(t.tobytes(), tile))
    else:
        rps = rows_per_strip or h
        for s in range((h + rps - 1) // rps):
            rows = min(rps, h - s * rps)
            chunks.append(
                pack(raw_rgb[s * rps * w * spp : (s * rps + rows) * w * spp],
                     w))
    nch = len(chunks)
    if jpeg_segments is not None:
        comp_tag = 7
    else:
        comp_tag = 5 if lzw else (32773 if packbits else 1)

    def u16(v: int) -> bytes:
        return v.to_bytes(2, bo)

    def u32(v: int) -> bytes:
        return v.to_bytes(4, bo)

    def inline16(v: int) -> bytes:
        return u16(v) + b"\x00\x00"

    # (tag, type, count, inline-value-or-marker); aux arrays follow the
    # IFD: [bps array][offsets if nch>1][counts if nch>1][segment data]
    entries: list[tuple[int, int, int, object]] = [
        (256, 3, 1, inline16(w)),
        (257, 3, 1, inline16(h)),
        (258, 3, spp, inline16(8) if spp == 1 else "bps"),
        (259, 3, 1, inline16(comp_tag)),
        (262, 3, 1, inline16(
            (1 if jpeg_gray else 6) if comp_tag == 7
            else (3 if palette is not None else 2))),
        (277, 3, 1, inline16(spp)),
        (284, 3, 1, inline16(1)),
    ]
    if palette is not None:
        entries.append((320, 3, 3 * 256, "cmap"))
    if predictor2:
        entries.append((317, 3, 1, inline16(2)))
    if jpeg_tables:
        entries.append((347, 7, len(jpeg_tables), "jtab"))
    if tile:
        entries.append((322, 3, 1, inline16(tile)))
        entries.append((323, 3, 1, inline16(tile)))
        entries.append((324, 4, nch, "offs"))
        entries.append((325, 4, nch, "cnts"))
    else:
        entries.append((273, 4, nch, "offs"))
        entries.append((278, 3, 1, inline16(rows_per_strip or h)))
        entries.append((279, 4, nch, "cnts"))
    entries.sort(key=lambda e: e[0])  # IFD entries must ascend by tag
    n_ent = len(entries)
    bps_at = 8 + 2 + 12 * n_ent + 4
    off_at = bps_at + 6
    cnt_at = off_at + (4 * nch if nch > 1 else 0)
    jtab_at = cnt_at + (4 * nch if nch > 1 else 0)
    cmap_at = jtab_at + len(jpeg_tables)
    data_at = cmap_at + (3 * 256 * 2 if palette is not None else 0)
    offs = []
    pos = data_at
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + u32(8)
    out += u16(n_ent)
    for tag, typ, cnt, val in entries:
        if val == "bps":
            val = u32(bps_at)
        elif val == "offs":
            val = u32(offs[0]) if nch == 1 else u32(off_at)
        elif val == "cnts":
            val = u32(len(chunks[0])) if nch == 1 else u32(cnt_at)
        elif val == "jtab":
            val = u32(jtab_at)
        elif val == "cmap":
            val = u32(cmap_at)
        out += u16(tag) + u16(typ) + u32(cnt) + val
    out += u32(0)  # no next IFD
    out += u16(8) * 3  # BitsPerSample [8,8,8]
    if nch > 1:
        for o in offs:
            out += u32(o)
        for c in chunks:
            out += u32(len(c))
    out += jpeg_tables
    if palette is not None:
        for plane in range(3):  # reds, then greens, then blues
            for k in range(256):
                out += u16(palette[3 * k + plane] * 257)
    for c in chunks:
        out += c
    return bytes(out)


# Average/Paeth runs shorter/narrower than this stay on the scalar lane
# scan: the wavefront's diagonal length is bounded by min(run height,
# width), and a numpy dispatch per few-element diagonal step costs more
# than the scan saves. Measured crossover (scalar/wavefront wall, all-
# Paeth runs): k=32 is a wash-to-loss at every width (0.75-1.06x), k=64
# wins 1.0-1.7x, k>=128 wins 1.2-2.9x growing with width; narrow images
# (w < 64) never amortize the per-diagonal dispatch.
_WAVEFRONT_MIN_ROWS = 64
_WAVEFRONT_MIN_WIDTH = 64
# The wavefront works in an int16 border-padded grid plus an int16 copy of
# the run's line bytes — ~4-5x the raw pixel bytes transiently. Unblocked,
# a hostile max-size payload (16M px RGBA, all-Paeth) would stage ~320 MB
# per task; with 32 concurrent local tasks that is multi-GB of transient
# executor memory. Runs are therefore processed in blocks of at most
# ~2M pixels (prior row carried between blocks — the recurrence only
# looks one row back), capping the int16 working set at ~32 MB/task
# while every block still clears the 64-row dispatch crossover.
_WAVEFRONT_BLOCK_PX = 1 << 21


def _avg_paeth_row_scalar(
    line: bytes, prior: bytes, f: int, stride: int, bpp: int
) -> bytearray:
    """One Average (f=3) or Paeth (f=4) row as per-lane Python scans.
    These filters are inherently sequential — each output byte feeds the
    next pixel's left neighbor through a floor/median nonlinearity, so
    there is no closed prefix form; the scan carries left/upleft in
    locals instead of per-byte bytearray reads (measured ~1.5x over the
    round-8 per-byte loop; see scripts/decode_bench.py)."""
    row = bytearray(stride)
    ln, pr = list(line), list(prior)
    if f == 3:  # Average: x[i] = line[i] + (x[i-bpp] + up[i]) // 2
        for lane in range(bpp):
            x = 0
            for i2 in range(lane, stride, bpp):
                x = (ln[i2] + ((x + pr[i2]) >> 1)) & 0xFF
                row[i2] = x
        return row
    for lane in range(bpp):  # Paeth: left/upleft carried across the scan
        a = c = 0
        for i2 in range(lane, stride, bpp):
            b_up = pr[i2]
            p = a + b_up - c
            pa = p - a if p >= a else a - p
            pb = p - b_up if p >= b_up else b_up - p
            pc = p - c if p >= c else c - p
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b_up
            else:
                pred = c
            a = (ln[i2] + pred) & 0xFF
            row[i2] = a
            c = b_up
    return row


def _avg_paeth_wavefront(lines, fts, prior_row, w: int, bpp: int):
    """Reconstruct a RUN of k consecutive Average/Paeth rows as an
    anti-diagonal wavefront: cell (r, j) depends only on (r, j-1),
    (r-1, j), (r-1, j-1) — all on earlier diagonals d = r + j — so each
    of the k + w - 1 diagonals is one whole numpy vector step instead of
    k * w scalar steps. A zero border row/column (border row = the
    previously reconstructed ``prior_row``) removes every edge mask, and
    because diagonal cells sit at a fixed flat-index stride (w) in the
    padded layout, every gather/scatter is a strided VIEW, not fancy
    indexing. Measured ~4x over the scalar scan on Paeth-heavy content
    (the adaptive-encoder photo shape); see scripts/decode_bench.py.

    ``lines``: (k, w*bpp) uint8; ``fts``: (k,) uint8 in {3, 4};
    ``prior_row``: (w*bpp,) uint8. Returns (k, w*bpp) uint8."""
    import numpy as np

    k = lines.shape[0]
    w1 = w + 1
    x = np.zeros(((k + 1) * w1, bpp), dtype=np.int16)
    x[1 : w + 1] = prior_row.reshape(w, bpp)
    lin = lines.reshape(k * w, bpp).astype(np.int16)
    m3 = (fts == 3)[:, None]
    for d in range(k + w - 1):
        r0 = max(0, d - w + 1)
        r1 = min(k - 1, d)
        n = r1 - r0 + 1
        start = (r0 + 1) * w1 + (d - r0 + 1)
        end = start + (n - 1) * w + 1
        a = x[start - 1 : end - 1 : w]          # left
        b = x[start - w1 : end - w1 : w]        # up
        c = x[start - w1 - 1 : end - w1 - 1 : w]  # upleft
        ls = r0 * w + (d - r0)
        lf = lin[ls : ls + (n - 1) * (w - 1) + 1 : w - 1] if n > 1 else lin[ls : ls + 1]
        d1 = a - c
        d2 = b - c
        pa = np.abs(d2)  # |p - a| = |b - c|
        pb = np.abs(d1)  # |p - b| = |a - c|
        pc = np.abs(d1 + d2)  # |p - c|
        paeth = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        pred = np.where(m3[r0 : r1 + 1], (a + b) >> 1, paeth)
        x[start:end:w] = (lf + pred) & 0xFF
    return (
        x.reshape(k + 1, w1, bpp)[1:, 1:].astype(np.uint8).reshape(k, w * bpp)
    )


def _png_reconstruct(data: bytes, w: int, h: int, bpp: int) -> bytes | None:
    """Invert the per-row PNG filters over the inflated stream ``data``
    ((1 filter byte + w*bpp line bytes) * h), throughput-tiered (round 9;
    measured in scripts/decode_bench.py / SCALE.md): None is a copy, Up
    is a wrapping uint8 add, Sub is a per-lane prefix sum mod 256
    (np.add.accumulate with dtype=uint8 wraps) — all exact numpy. The
    sequential filters Average/Paeth run as a blocked anti-diagonal
    WAVEFRONT when a run of them is tall and wide enough to amortize the
    per-diagonal numpy dispatch (measured crossover ~64 rows x 64 px),
    else as per-lane scalar scans. A native codec (libpng et al.) slots
    in at the same mapInPandas boundary with no plan change (module
    docstring)."""
    import numpy as np

    stride = w * bpp
    arr = np.frombuffer(data, np.uint8).reshape(h, stride + 1)
    fts = arr[:, 0]
    if int(fts.max()) > 4:
        return None
    lines = arr[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    r = 0
    while r < h:
        f = int(fts[r])
        if f == 0:
            out[r] = lines[r]
        elif f == 2:  # Up: uint8 + uint8 wraps mod 256 natively
            out[r] = lines[r] + prior
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            out[r] = np.add.accumulate(
                lines[r].reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        else:  # maximal run of Average/Paeth rows
            k = 1
            while r + k < h and fts[r + k] >= 3:
                k += 1
            if k >= _WAVEFRONT_MIN_ROWS and w >= _WAVEFRONT_MIN_WIDTH:
                # blocked to bound the int16 working set: the true bound
                # is max(_WAVEFRONT_BLOCK_PX, _WAVEFRONT_MIN_ROWS * w) px
                # (the 64-row floor dominates only for very wide images).
                # A sub-crossover tail (< 64 rows) folds into the final
                # block ONLY while the folded block stays within 2x the
                # px budget — on pathologically wide images (where even
                # one 64-row fold would blow the budget) the tail falls
                # through to the scalar lane scan instead: a wavefront
                # over < 64 rows never amortizes its per-diagonal numpy
                # dispatch (the measured crossover this module's gate
                # constants encode)
                block = max(_WAVEFRONT_MIN_ROWS, _WAVEFRONT_BLOCK_PX // w)
                done = 0
                while done < k:
                    kk = min(k - done, block)
                    if (k - done - kk < _WAVEFRONT_MIN_ROWS
                            and (k - done) * w <= 2 * _WAVEFRONT_BLOCK_PX):
                        kk = k - done
                    if kk < _WAVEFRONT_MIN_ROWS:
                        pr_bytes = prior.tobytes()
                        for rr in range(r + done, r + done + kk):
                            row = _avg_paeth_row_scalar(
                                lines[rr].tobytes(), pr_bytes,
                                int(fts[rr]), stride, bpp,
                            )
                            out[rr] = np.frombuffer(bytes(row), np.uint8)
                            pr_bytes = bytes(row)
                        prior = out[r + done + kk - 1]
                        done += kk
                        continue
                    out[r + done : r + done + kk] = _avg_paeth_wavefront(
                        lines[r + done : r + done + kk],
                        fts[r + done : r + done + kk], prior, w, bpp,
                    )
                    prior = out[r + done + kk - 1]
                    done += kk
            else:
                pr_bytes = prior.tobytes()
                for rr in range(r, r + k):
                    row = _avg_paeth_row_scalar(
                        lines[rr].tobytes(), pr_bytes, int(fts[rr]), stride, bpp
                    )
                    out[rr] = np.frombuffer(bytes(row), np.uint8)
                    pr_bytes = bytes(row)
            prior = out[r + k - 1]
            r += k
            continue
        prior = out[r]
        r += 1
    return out.tobytes()


def _png_unpack_subbyte(unf: bytes, w: int, h: int, depth: int):
    """Unpack reconstructed sub-byte rows (MSB-first packed, byte-padded)
    into an (h, w) uint8 sample array — vectorized shift/mask over the
    packed bytes, then the per-row pad bits are trimmed."""
    import numpy as np

    rb = (w * depth + 7) // 8
    arr = np.frombuffer(unf, dtype=np.uint8).reshape(h, rb)
    per = 8 // depth
    shifts = (np.arange(per)[::-1] * depth).astype(np.uint8)
    mask = np.uint8((1 << depth) - 1)
    samples = (arr[:, :, None] >> shifts[None, None, :]) & mask
    return samples.reshape(h, rb * per)[:, :w]


def _png_pack_subbyte_rows(
    samples: bytes, pw: int, ph: int, depth: int
) -> bytearray:
    """Encoder twin of :func:`_png_unpack_subbyte`: pack one-byte-per-
    sample rows (values < 2^depth) MSB-first with per-row byte padding,
    then filter with the spec's 1-byte left neighbor."""
    import numpy as np

    arr = np.frombuffer(samples, dtype=np.uint8).reshape(ph, pw)
    per = 8 // depth
    padw = -(-pw // per) * per
    padded = np.zeros((ph, padw), dtype=np.uint8)
    padded[:, :pw] = arr
    shifts = (np.arange(per)[::-1] * depth).astype(np.uint8)
    packed = (
        (padded.reshape(ph, -1, per).astype(np.uint16) << shifts)
        .sum(axis=2)
        .astype(np.uint8)
    )
    return _png_filter_rows(packed.tobytes(), packed.shape[1], ph, 1)


def _decode_png_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """PNG color types 0 (grayscale), 2 (RGB), 3 (palette via PLTE), 4
    (gray+alpha) and 6 (RGBA) at bit depth 8, plus bit depth 16 for the
    non-palette types (big-endian samples, downsampled to 8-bit by
    taking the high byte — the standard lossy narrowing), plus the
    sub-byte depths 1/2/4 for grayscale and palette (MSB-first packed
    samples, rows padded to a byte boundary; gray scaled by
    255/(2^d - 1) — the spec's exact sample scaling), interlaced
    (Adam7) or not — canonicalized to RGB (gray expanded, palette looked
    up, alpha dropped). Filter reconstruction operates on bpp-sized
    pixels per the spec — the left neighbor in Sub/Average/Paeth is
    ``bpp`` BYTES back (so RGB16 uses 6, and any sub-byte depth uses 1:
    filters apply to the PACKED row bytes). Each Adam7 pass is an
    independently filtered sub-image (sub-byte passes pack their own
    rows) scattered into the frame at (x0 + i*dx, y0 + j*dy)."""
    import zlib

    if len(b) < 45 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w = h = bpp = ctype = depth = interlace = nch = None
    plte: bytes | None = None
    idat = bytearray()
    i = 8
    while i + 12 <= len(b):
        clen = int.from_bytes(b[i : i + 4], "big")
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + clen]
        if len(body) < clen:
            return None
        if tag == b"IHDR":
            if clen != 13 or body[10:12] != b"\x00\x00":
                return None  # compression/filter-method variants
            depth = body[8]
            ctype = body[9]
            interlace = body[12]
            nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            # spec 11.2.2 table: allowed depths per color type
            ok_depth = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                        4: (8, 16), 6: (8, 16)}
            if nch is None or depth not in ok_depth[ctype] or interlace > 1:
                return None
            bpp = max(1, nch * depth // 8)
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
                return None
        elif tag == b"PLTE":
            # spec: 1-256 RGB triples, before the first IDAT, exactly once
            if clen == 0 or clen % 3 or clen > 768 or idat or plte is not None:
                return None
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + clen
    if w is None or not idat:
        return None
    if ctype == 3 and plte is None:
        return None  # palette image with no palette is unrenderable
    def rowbytes(width: int) -> int:
        # packed bytes per row of `width` pixels (== width * bpp at byte
        # depths; ceil(width * depth / 8) for the sub-byte single-channel
        # cases — rows pad to a byte boundary per spec 7.2)
        return (width * depth * nch + 7) // 8
    if interlace:
        passes = []
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass: no bytes at all, per spec
            passes.append((x0, y0, dx, dy, pw, ph))
            expected += ph * (rowbytes(pw) + 1)
    else:
        expected = (rowbytes(w) + 1) * h
    try:
        # bounded inflate: a bomb claiming small dims can't blow memory
        dec = zlib.decompressobj()
        data = dec.decompress(bytes(idat), expected)
        if len(data) != expected or dec.decompress(b"", 1):
            return None
    except zlib.error:
        return None
    import numpy as np

    if depth < 8:
        # sub-byte: filters ran over the PACKED row bytes (left neighbor
        # = 1 byte), so reconstruct with the packed width as the pixel
        # count and bpp=1, then unpack MSB-first and trim the row pad
        if interlace:
            samples = np.zeros((h, w), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy, pw, ph in passes:
                npass = ph * (rowbytes(pw) + 1)
                sub = _png_reconstruct(
                    data[off : off + npass], rowbytes(pw), ph, 1
                )
                if sub is None:
                    return None
                samples[y0::dy, x0::dx] = _png_unpack_subbyte(
                    sub, pw, ph, depth
                )
                off += npass
        else:
            unf = _png_reconstruct(data, rowbytes(w), h, 1)
            if unf is None:
                return None
            samples = _png_unpack_subbyte(unf, w, h, depth)
        if ctype == 0:
            # exact spec scaling to 8-bit: 255/(2^d - 1) is integral
            # (255, 85, 17) for d = 1, 2, 4
            samples = samples * np.uint8(255 // ((1 << depth) - 1))
        px = samples[..., None]
    else:
        if interlace:
            img = np.zeros((h, w, bpp), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy, pw, ph in passes:
                npass = ph * (pw * bpp + 1)
                sub = _png_reconstruct(data[off : off + npass], pw, ph, bpp)
                if sub is None:
                    return None
                img[y0::dy, x0::dx] = np.frombuffer(
                    sub, dtype=np.uint8
                ).reshape(ph, pw, bpp)
                off += npass
        else:
            unfiltered = _png_reconstruct(data, w, h, bpp)
            if unfiltered is None:
                return None
            if ctype == 2 and depth == 8:
                return w, h, unfiltered  # fast path: already canonical RGB
            img = np.frombuffer(unfiltered, dtype=np.uint8).reshape(h, w, bpp)
        if depth == 16:  # big-endian samples: high byte is the 8-bit value
            px = img.reshape(h, w, nch, 2)[..., 0]
        else:
            px = img.reshape(h, w, nch)
    if ctype == 2:
        # tobytes() emits a C-order copy of the (possibly strided) view
        return w, h, px.tobytes()
    if ctype == 3:  # palette lookup; an index past PLTE is corrupt per spec
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[..., 0]
        if int(idx.max()) >= len(pal):
            return None
        return w, h, pal[idx].tobytes()
    if ctype in (0, 4):  # gray / gray+alpha -> RGB expand (alpha dropped)
        return w, h, np.repeat(px[..., :1], 3, axis=2).tobytes()
    return w, h, px[..., :3].tobytes()  # RGBA -> drop alpha


# Two-phase LZW pays per-batch numpy setup that tiny frames never
# amortize — the scalar accumulator keeps small images/frames (the
# grammar's composited GIF frames are ~6-35 px), mirroring the PNG
# wavefront's measured dispatch gate.
_LZW_TWO_PHASE_MIN_PIX = 512


def _gif_lzw_decode_small(data: bytes, min_size: int, npix: int):
    """Scalar byte-fed-accumulator LZW for sub-gate images — the exact
    pre-r11 loop, kept as the small-input lane (and as the readable
    reference for the two-phase path; equivalence is fuzz-pinned).
    Callers go through :func:`_gif_lzw_decode`, which owns the
    malformed-input guards shared by both lanes."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    out = bytearray()
    width = min_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    acc = nacc = 0
    pos, ndata = 0, len(data)
    while len(out) < npix:
        while nacc < width:
            if pos >= ndata:
                return None  # ran out of bits before npix pixels
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            del table[clear + 2 :]
            width = min_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # code beyond the dictionary: corrupt stream
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:npix]) if len(out) >= npix else None


def _gif_lzw_decode(data: bytes, min_size: int, npix: int) -> bytes | None:
    """GIF-variant LZW (LSB-first variable-width codes, CLEAR/END codes,
    width grows as the dictionary fills, capped at 12 bits until CLEAR).
    Returns exactly ``npix`` palette indices or None on a malformed
    stream. Hostile-input bounds: a legitimate stream never exceeds
    ~12 bits/pixel plus restart overhead, so oversized input (e.g. a
    megabyte of CLEAR spam for a 768-pixel image) is rejected up front
    instead of burning seconds of driver-less task time.

    Code extraction is TWO-PHASE above a measured size gate (round 11,
    ~2x over the byte-fed accumulator on real image sizes, every content
    shape): the code width is a deterministic function of the dictionary
    size — it bumps exactly when the table reaches 2^width and resets
    only at CLEAR — so the number of same-width codes ahead is known in
    advance (= 2^width - len(table), +1 right after a CLEAR because the
    first code adds no entry). Each such run is gathered in one
    vectorized numpy step (three-byte little-endian windows, shift,
    mask), truncated at the first CLEAR/END (those break the
    prediction), and only the sequential dictionary/output bookkeeping
    stays a Python loop. Batches are capped at 4096 codes so a
    CLEAR-heavy stream never re-extracts its whole tail per restart.
    Below the gate (``_LZW_TWO_PHASE_MIN_PIX``, measured: 5x SLOWER at
    ~35 px, a wash at 256, 1.2-2.2x faster from 1024 up) the scalar
    accumulator loop runs instead — per-batch numpy setup never
    amortizes on tiny frames; both paths are pinned equivalent by the
    round-trip fuzz."""
    import numpy as np

    if not 2 <= min_size <= 8:
        return None
    if len(data) > 2 * npix + 4096:
        return None  # > ~16 bits/pixel: no real encoder output looks like this
    if npix < _LZW_TWO_PHASE_MIN_PIX:
        return _gif_lzw_decode_small(data, min_size, npix)
    clear, end = 1 << min_size, (1 << min_size) + 1
    buf = np.frombuffer(data + b"\x00\x00\x00", dtype=np.uint8)
    tri = (buf[:-2].astype(np.uint32)
           | (buf[1:-1].astype(np.uint32) << 8)
           | (buf[2:].astype(np.uint32) << 16))
    nbits = len(data) * 8
    out = bytearray()
    width = min_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    tlen = clear + 2
    prev: bytes | None = None
    bitpos = 0
    out_len = 0
    tappend = table.append
    arange = np.arange
    while out_len < npix:
        if width < 12 and tlen < 4096:
            room = (1 << width) - tlen + (1 if prev is None else 0)
        else:
            room = 4096  # width is pinned; chunk to bound re-extraction
        k = min(max(1, room), (nbits - bitpos) // width)
        if k <= 0:
            return None  # ran out of bits before npix pixels
        offs = bitpos + width * arange(k, dtype=np.int64)
        codes = (tri[offs >> 3] >> (offs & 7).astype(np.uint32)) \
            & ((1 << width) - 1)
        special = np.nonzero((codes == clear) | (codes == end))[0]
        if special.size:
            codes = codes[: int(special[0]) + 1]
        codes_l = codes.tolist()
        bitpos += width * len(codes_l)
        for code in codes_l:
            if code < tlen:
                if code == clear:
                    del table[clear + 2 :]
                    tlen = clear + 2
                    width = min_size + 1
                    prev = None
                    continue
                if code == end:
                    return bytes(out[:npix]) if out_len >= npix else None
                entry = table[code]
            elif code == tlen and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None  # code beyond the dictionary: corrupt stream
            out += entry
            out_len += len(entry)
            if prev is not None and tlen < 4096:
                tappend(prev + entry[:1])
                tlen += 1
            prev = entry
            if out_len >= npix:
                return bytes(out[:npix])
        if width < 12 and tlen == (1 << width):
            width += 1
    return bytes(out[:npix]) if out_len >= npix else None


def _gif_lzw_encode(indices: bytes, min_size: int) -> bytes:
    """GIF LZW compressor (test/synthetic twin of :func:`_gif_lzw_decode`;
    width-growth timing mirrors the decoder: the encoder's table runs one
    entry ahead, so it widens when its table size EXCEEDS 2^width)."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    codes: list[tuple[int, int]] = []  # (code, width at emit)
    width = min_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes.append((clear, width))
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:  # table full: emit CLEAR and restart (the portable choice)
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_size + 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    bits = bytearray()
    acc = n = 0
    for code, cw in codes:
        acc |= code << n
        n += cw
        while n >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _decode_gif_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """GIF87a/89a: logical screen + global/local color table + LZW image
    data -> RGB, interlaced (four-pass row scatter) or not. Single
    full-frame images only (animated / tiled GIFs quarantine — a
    training-data media column treats those as the video-ish class)."""
    if len(b) < 14 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    flags = b[10]
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = b[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            return None
        pos += 3 * n
    decoded: tuple[int, int, bytes] | None = None
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if decoded is not None:
                return None  # SECOND frame: animated GIF, the video class
            if pos + 10 > len(b):
                return None
            left = int.from_bytes(b[pos + 1 : pos + 3], "little")
            top = int.from_bytes(b[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:  # local color table wins
                n = 2 << (iflags & 7)
                ct = b[pos : pos + 3 * n]
                if len(ct) < 3 * n:
                    return None
                pos += 3 * n
            if (left, top, iw, ih) != (0, 0, w, h) or ct is None:
                return None  # partial-frame / no palette
            if pos >= len(b):
                return None
            min_size = b[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(b) and b[pos] != 0:
                n = b[pos]
                lzw += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1  # the data terminator itself
            idx = _gif_lzw_decode(bytes(lzw), min_size, w * h)
            if idx is None or max(idx) * 3 + 3 > len(ct):
                return None
            import numpy as np

            arr = np.frombuffer(idx, dtype=np.uint8)
            if iflags & 0x40:
                # GIF interlace: file rows arrive in the four-pass order
                # — scatter them back to display order
                rows = np.empty((h, w), dtype=np.uint8)
                rows[_gif_interlace_order(h)] = arr.reshape(h, w)
                arr = rows.reshape(-1)
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            decoded = (w, h, pal[arr].tobytes())
            # keep scanning: a second image descriptor means animation
        elif block == 0x3B:
            break
        else:
            return None
    return decoded


def _gif_interlace_order(h: int):
    """Display-row order of the GIF four-pass interlace (GIF89a appendix
    E): file row k belongs at display row order[k]. Shared by both
    decoders and both encoder twins."""
    import numpy as np

    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def _decode_gif_frames(
    b: bytes, max_frames: int | None = None
) -> tuple[int, int, list[tuple[int, bytes]]] | None:
    """Animated (or single-frame) GIF -> (w, h, [(delay_ms, rgb), ...])
    with REAL compositing (round 11 — the full-frame/opaque subset
    restriction is gone): each frame is composited onto the logical
    screen at its (left, top, iw, ih) rectangle, GCE transparency
    passes the underlying screen pixel through, and disposal methods
    0-3 apply per spec AFTER the frame's snapshot is taken (0/1 leave
    the screen, 2 restores the rectangle to the background color, 3
    restores the pre-frame screen). Reserved disposals 4-7 quarantine.
    Each emitted RGB is the full w x h screen AFTER compositing that
    frame — the observable a real player shows. Defined conventions
    (this decoder is the oracle spec): the initial screen and the
    disposal-2 fill are the logical-screen background color — the GCT
    entry named by the header's background index, black when absent or
    out of range (browsers render these as transparent; an opaque RGB
    contract needs a concrete color and this is the spec's own);
    interlaced frames reuse the four-pass scatter over the FRAME's own
    rows; delay is the GCE's centiseconds as milliseconds, 0 when
    absent or encoded 0 — kept raw (the sampler documents that a
    zero-delay animation has no timeline and yields only frame 0).

    Work AND memory are bounded without a frame-count cliff: the
    cumulative LZW output across ALL frames and the cumulative buffered
    snapshot pixels are each capped at ``_MAX_PIXELS`` (16.7M px —
    e.g. >4000 frames at 64x64); a file exceeding either budget yields
    its in-budget PREFIX of frames (documented truncation: later
    frames are not examined), so sampling boundaries deep into long
    animations stay reachable up to the budget instead of a fixed
    16-frame horizon. ``max_frames`` is an OPTIONAL extra cap for
    direct callers; the sampler no longer passes one. Returns None to
    quarantine (not a GIF, malformed, reserved disposal, color-table
    violations)."""
    import numpy as np

    if len(b) < 14 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    flags = b[10]
    bg_index = b[11]
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = b[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            return None
        pos += 3 * n
    bg_rgb = (0, 0, 0)
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        bg_rgb = tuple(gct[3 * bg_index : 3 * bg_index + 3])
    screen = np.empty((h, w, 3), dtype=np.uint8)
    screen[:] = bg_rgb
    frames: list[tuple[int, bytes]] = []
    pending = (0, 0, None)  # (delay_ms, disposal, transparent_idx|None)
    orders: dict[int, object] = {}  # per-frame-height interlace scatter
    work_px = 0
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension
            if pos + 2 > len(b):
                return None
            label = b[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                if pos + 6 > len(b) or b[pos] != 4:
                    return None
                packed = b[pos + 1]
                disposal = (packed >> 2) & 7
                if disposal > 3:
                    return None  # reserved (spec) — quarantine
                delay_ms = int.from_bytes(
                    b[pos + 2 : pos + 4], "little"
                ) * 10
                tidx = b[pos + 4] if packed & 1 else None
                pending = (delay_ms, disposal, tidx)
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                return None
            left = int.from_bytes(b[pos + 1 : pos + 3], "little")
            top = int.from_bytes(b[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = b[pos : pos + 3 * n]
                if len(ct) < 3 * n:
                    return None
                pos += 3 * n
            if (iw < 1 or ih < 1 or left + iw > w or top + ih > h
                    or ct is None):
                return None  # rectangle outside the screen: malformed
            if pos >= len(b):
                return None
            min_size = b[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(b) and b[pos] != 0:
                n = b[pos]
                lzw += b[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            if (work_px + iw * ih > _MAX_PIXELS
                    or (len(frames) + 1) * w * h > _MAX_PIXELS
                    or (max_frames is not None
                        and len(frames) >= max_frames)):
                break  # budget: return the in-budget prefix (docstring)
            work_px += iw * ih
            idx = _gif_lzw_decode(bytes(lzw), min_size, iw * ih)
            if idx is None:
                return None
            arr = np.frombuffer(idx, dtype=np.uint8)
            delay_ms, disposal, tidx = pending
            pending = (0, 0, None)
            ncolors = len(ct) // 3
            if tidx is None:
                if int(arr.max()) >= ncolors:
                    return None
            else:
                opaque = arr != tidx
                # transparent pixels are never looked up, so only the
                # opaque ones must be inside the color table
                if opaque.any() and int(arr[opaque].max()) >= ncolors:
                    return None
            if iflags & 0x40:  # interlace: scatter the FRAME's rows
                order = orders.get(ih)
                if order is None:
                    order = orders[ih] = _gif_interlace_order(ih)
                rows = np.empty((ih, iw), dtype=np.uint8)
                rows[order] = arr.reshape(ih, iw)
                arr2d = rows
            else:
                arr2d = arr.reshape(ih, iw)
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            saved = screen.copy() if disposal == 3 else None
            region = screen[top : top + ih, left : left + iw]
            patch = pal[np.minimum(arr2d, ncolors - 1)]
            if tidx is None:
                region[:] = patch
            else:
                m = arr2d != tidx
                region[m] = patch[m]
            frames.append((delay_ms, screen.tobytes()))
            if disposal == 2:
                region[:] = bg_rgb
            elif disposal == 3:
                screen = saved
        elif block == 0x3B:
            break
        else:
            return None
    if not frames:
        return None
    return w, h, frames


def _gif_screen_header(palette: bytes, w: int, h: int) -> tuple[bytes, int]:
    """GIF89a signature + logical screen + padded global color table;
    returns (header_bytes, lzw_min_size). Shared by both encoder twins."""
    ncolors = len(palette) // 3
    depth = max(1, (ncolors - 1).bit_length())
    table = palette + bytes(3 * ((1 << depth) - ncolors))
    header = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (depth - 1), 0, 0])
        + table
    )
    return header, max(2, depth)


def _gif_frame_block(
    indices: bytes, w: int, h: int, min_size: int, interlace: bool,
    left: int = 0, top: int = 0,
) -> bytes:
    """Image descriptor + LZW sub-blocks for one image, full-frame by
    default or placed at (left, top) for compositing tests. Shared by
    both encoder twins."""
    if interlace:
        import numpy as np

        indices = (
            np.frombuffer(indices, dtype=np.uint8)
            .reshape(h, w)[_gif_interlace_order(h)]
            .tobytes()
        )
    lzw = _gif_lzw_encode(indices, min_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + (b"\x40" if interlace else b"\x00")
        + bytes([min_size]) + bytes(blocks) + b"\x00"
    )


def _gif_encode(
    indices: bytes, palette: bytes, w: int, h: int, interlace: bool = False
) -> bytes:
    """Full single-frame GIF89a file over palette ``indices`` — the
    synthetic/test twin of :func:`_decode_gif_pixels`. ``interlace``
    stores the rows in the spec's four-pass order and sets the flag."""
    header, min_size = _gif_screen_header(palette, w, h)
    return header + _gif_frame_block(indices, w, h, min_size, interlace) + b"\x3b"


def _gif_encode_animated(
    frame_indices: list[bytes],
    palette: bytes,
    w: int,
    h: int,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    transparent: bool = False,
    rects: list[tuple[int, int, int, int] | None] | None = None,
    disposals: list[int] | None = None,
    transparent_idx: int = 0,
) -> bytes:
    """Multi-frame GIF89a twin of :func:`_decode_gif_frames`: one GCE
    (delay in centiseconds; optional transparency flag + index and
    per-frame disposal method) + one image block per entry — full-frame
    by default, or placed at ``rects[fi] = (left, top, iw, ih)`` for
    compositing coverage — via the shared :func:`_gif_screen_header` /
    :func:`_gif_frame_block` emitters."""
    header, min_size = _gif_screen_header(palette, w, h)
    out = bytearray(header)
    for fi, indices in enumerate(frame_indices):
        delay = (delays_cs or [0] * len(frame_indices))[fi]
        disposal = (disposals or [0] * len(frame_indices))[fi]
        rect = rects[fi] if rects is not None else None
        left, top, iw, ih = rect if rect is not None else (0, 0, w, h)
        packed = ((disposal & 7) << 2) | (1 if transparent else 0)
        out += (b"\x21\xf9\x04" + bytes([packed])
                + delay.to_bytes(2, "little")
                + bytes([transparent_idx, 0]))
        out += _gif_frame_block(indices, iw, ih, min_size, interlace,
                                left, top)
    out += b"\x3b"
    return bytes(out)


def decode_pixels_bytes(b: bytes | None) -> tuple[str, int, int, bytes] | None:
    """Sniff + decode one payload to (fmt, w, h, top-down RGB bytes); None
    for anything malformed, truncated, or outside the supported formats
    (BMP / PPM / PNG / GIF / JPEG incl. progressive / QOI / TGA — TGA,
    having no leading magic, is sniffed by its v2 footer signature)."""
    if not b or len(b) < 10:
        return None
    if b[:2] == b"\xff\xd8":  # JPEG (round 10) — OUTSIDE the broad
        # except: decode_jpeg_pixels implements the malformed-input ->
        # None mapping itself, precisely so that an exception past a
        # successful parse means a decoder BUG and stays loud instead of
        # being misfiled as a quarantine row here
        from .jpeg import decode_jpeg_pixels

        out = decode_jpeg_pixels(b)
        return ("jpeg",) + out if out else None
    try:
        if b[:2] == b"BM":
            out = _decode_bmp_pixels(b)
            return ("bmp",) + out if out else None
        if b[:2] in (b"P5", b"P6"):
            out = _decode_ppm_pixels(b)
            return ("ppm",) + out if out else None
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            out = _decode_png_pixels(b)
            return ("png",) + out if out else None
        if b[:6] in (b"GIF87a", b"GIF89a"):
            out = _decode_gif_pixels(b)
            return ("gif",) + out if out else None
        if b[:4] == b"qoif":
            out = _decode_qoi_pixels(b)
            return ("qoi",) + out if out else None
        if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
            out = _decode_tiff_pixels(b)
            return ("tiff",) + out if out else None
        if len(b) >= 44 and b[-26:][8:] == _TGA_FOOTER:
            out = _decode_tga_pixels(b)
            return ("tga",) + out if out else None
    except (ValueError, IndexError, OverflowError, MemoryError):
        # MemoryError included: a legitimate huge payload under executor
        # pressure degrades to a NULL-stats quarantine row, never a dead
        # task (the decoders bound their own transients — PNG inflate cap,
        # wavefront blocking)
        return None
    return None


PIXELS_SCHEMA = StructType([
    StructField("media_id", LongType(), True),
    StructField("fmt", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("n_pixels", LongType(), True),
    StructField("r_sum", LongType(), True),
    StructField("g_sum", LongType(), True),
    StructField("b_sum", LongType(), True),
    StructField("pixel_sha256", StringType(), True),
])


# GIF twin of _raw_fill: the fill's pixel p is ((id+3p)%256, +1, +2), so a
# FIXED 256-color palette palette[r] = (r, r+1, r+2) with pixel index
# (id+3p)%256 reproduces the raw fill exactly through the LZW+palette path
_GIF_FILL_PALETTE = bytes(
    v for r in range(256) for v in (r, (r + 1) % 256, (r + 2) % 256)
)


def synthetic_pixel_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic pixel-bearing media from an id column: id % 4 picks
    the container (0 BMP, 1 PPM, 2 PNG, 3 GIF — the GIF goes through the
    real LZW compressor), dims w = 1 + id % 32 / h = 1 + id % 24, raw RGB
    byte j = (id + j) % 256 — fully id-parameterized so the oracle
    predicts decoded stats arithmetically while the engine parses real
    container bytes. Within the PNG route (round 10), id % 16 picks the
    encoding variant — 2: plain 8-bit, 6: Adam7 interlaced, 10: 16-bit
    (samples v*257, so the high-byte narrowing recovers v), 14: Adam7 +
    16-bit — all decoding to the SAME raw fill, so the unchanged oracle
    hash now also proves deinterlacing and 16-bit handling. Round 13
    sub-routes three more LOSSLESS containers over the same fill:
    id % 8 == 4 is TGA (k = id//8 bits pick RLE-vs-uncompressed,
    bottom-up-vs-top-down, 24-vs-32 bpp), id % 8 == 5 is QOI (the
    reference greedy encoder — the +3/channel fill emits LUMA/RUN/RGB
    ops; on the remaining BMP slice, k%4==1/3 files are 8-bit palette
    BMPs — indices (i+3p)%256 through a (c, c+1, c+2) color table,
    k%4==3 BI_RLE8-compressed — decoding to the same fill), and
    id % 8 == 7 is TIFF (k bits pick LZW-vs-PackBits-vs-none
    compression, predictor-2 differencing under LZW, MM-vs-II byte
    order, tiled-vs-strip organization, multi-vs-single strip, and —
    k bit 5 — palette-color with a ColorMap whose entry c is
    (c, c+1, c+2), reproducing the same fill through the indirection),
    so the oracle's per-channel sums stay formula-derived while fmt
    flips to 'tga'/'qoi'/'tiff' on those slices. NULL ids synthesize as
    id 0 with media_id kept NULL (same convention as
    synthetic_media)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def build(i: int) -> bytes:
            w, h = 1 + i % 32, 1 + i % 24
            if i % 8 == 7:
                # TIFF sub-route of the GIF slice (round 13): k = i//8
                # bits pick the container axes — bit 3 LZW-vs-baseline
                # (under LZW, bit 0 becomes predictor-2; otherwise it is
                # PackBits-vs-none), bit 1 MM-vs-II byte order, bit 4
                # tiled-vs-strips (16x16 tiles, edge-padded), bit 2
                # multi-vs-single strip when striped, bit 5 palette-
                # color (photometric 3: index stream (i+3p)%256 plus
                # ColorMap entry c -> (c, c+1, c+2) — exactly the raw
                # fill through the palette indirection). All lossless
                # over the same fill, so the oracle's sums never move.
                k = i // 8
                lzw = (k // 8) % 2 == 1
                tiled = (k // 16) % 2 == 1
                pal = None
                data = _raw_fill(i, w, h)
                if (k // 32) % 2 == 1:
                    pal = bytes(v for c in range(256)
                                for v in (c, (c + 1) % 256, (c + 2) % 256))
                    data = bytes((i + 3 * p) % 256 for p in range(w * h))
                return _tiff_encode(
                    data, w, h,
                    packbits=not lzw and k % 2 == 1,
                    big_endian=(k // 2) % 2 == 1,
                    rows_per_strip=0 if tiled
                    else ((1 + h // 2) if (k // 4) % 2 else 0),
                    lzw=lzw, predictor2=lzw and k % 2 == 1,
                    tile=16 if tiled else 0, palette=pal)
            if i % 4 == 3:  # GIF encodes palette INDICES, not the raw fill
                indices = bytes((i + 3 * p) % 256 for p in range(w * h))
                return _gif_encode(indices, _GIF_FILL_PALETTE, w, h)
            raw = _raw_fill(i, w, h)
            if i % 4 == 0:
                if i % 8 == 4:
                    # TGA sub-route (round 13): k = i//8 bits pick the
                    # variant axes (i//4 is constant-odd on this slice
                    # — the derived-parity trap — so key on k)
                    k = i // 8
                    return _tga_encode(raw, w, h, rle=k % 2 == 1,
                                       top_down=(k // 2) % 2 == 0,
                                       bpp32=(k // 4) % 2 == 1)
                k = i // 8
                if k % 4 in (1, 3):
                    # palette BMP sub-route (late r13): 8-bit indices
                    # (i+3p)%256 through the (c, c+1, c+2) color table
                    # — the raw fill again, so the oracle's sums never
                    # move; k%4==3 files are BI_RLE8 compressed
                    idx = bytes((i + 3 * p) % 256 for p in range(w * h))
                    pal = bytes(v for c in range(256)
                                for v in (c, (c + 1) % 256, (c + 2) % 256))
                    return _bmp_encode_palette(idx, pal, w, h,
                                               rle=k % 4 == 3)
                return _bmp_encode(raw, w, h)
            if i % 4 == 1:
                if i % 8 == 5:  # QOI sub-route (round 13)
                    return _qoi_encode(raw, w, h)
                return _ppm_encode(raw, w, h)
            variant = i % 16  # PNG route: 2 / 6 / 10 / 14
            interlace = 1 if variant in (6, 14) else 0
            if variant in (10, 14):  # 16-bit: sample v*257 = (v << 8) | v
                raw16 = bytes(v for x in raw for v in (x, x))
                return _png_encode(raw16, w, h, bpp=6, bitdepth=16,
                                   interlace=interlace)
            return _png_encode(raw, w, h, interlace=interlace)

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "image",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-px://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_palette_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PALETTE-PNG media (color type 3) from an id column —
    the round-9 companion to :func:`synthetic_pixel_media` covering the
    format real crawls are full of (8-bit indexed PNGs). Pixel p of media
    ``id`` carries palette index ``(id + p) % 256`` and the 256-entry
    palette itself is id-parameterized: entry k is
    ``((3k + id) % 256, (5k + 2id) % 256, (7k + 3id) % 256)``, so a
    DuckDB oracle predicts every decoded channel sum arithmetically
    THROUGH the palette indirection. The encoder rotates row filters
    (r % 5) over the 1-byte-per-pixel index stream, so a match also
    proves bpp-sized filter reconstruction at index width. Same id
    conventions as synthetic_pixel_media: NULL ids synthesize as id 0
    with media_id kept NULL; the grammar is defined over ids >= 0."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def build(i: int) -> bytes:
            w, h = 1 + i % 32, 1 + i % 24
            idx = bytes((i + p) % 256 for p in range(w * h))
            pal = bytes(
                v for k in range(256)
                for v in ((3 * k + i) % 256, (5 * k + 2 * i) % 256, (7 * k + 3 * i) % 256)
            )
            return _png_encode(idx, w, h, bpp=1, ctype=3, plte=pal)

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "image",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-plte://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_gif_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ANIMATED-GIF media (round 11) — the multi-frame
    companion to :func:`synthetic_pixel_media`, built so a DuckDB oracle
    predicts both the sampled frame TIMELINE and the decoded PIXELS of
    every sampled frame arithmetically through the real LZW +
    color-table + GCE-timestamp decode in :func:`_decode_gif_frames`.

    Grammar (ids >= 0, same NULL conventions as the siblings; the
    feature parities moved to id//8 and id//16 in round 12 — the round-
    12 catalog route is id % 8 == 3, under which the old (id//4)%2
    interlace parity was constant-false, i.e. the route had silently
    lost interlaced coverage):
    w = 3 + id % 5, h = 2 + id % 4, n_frames = 1 + id % 6, frames with
    a 50 cs (500 ms) GCE delay each — so frame f appears at t = 500*f
    ms and ``sample_frames(every_ms=1000)`` emits exactly the even
    frame indices below n_frames. The 16-entry palette is
    p -> (p, 2p, 3p). Even (id // 16) files are FULL-FRAME and opaque:
    pixel j of frame f carries index (id + 3f + j) % 16, so the RGB
    byte sum of sampled frame f is 6 * sum_j((id + 3f + j) % 16). Odd
    (id // 16) files exercise REAL COMPOSITING WITH TRANSPARENCY:
    frame 0 is full-frame, frames f >= 1 are PARTIAL INTERIOR rects —
    left=1, top=1, iw=w-2, ih=max(1, h-2), disposal 1 = keep — whose
    pixel j' carries the same (id + 3f + j') % 16, and every frame's
    GCE declares index 0 transparent: a patch position shows the MOST
    RECENT opaque value (its last frame f' <= f whose index there is
    nonzero, else frame 0's pixel), so the composited sum is only
    reproducible by a decoder that composites offset patches AND
    passes transparency through the retained screen. (Frame 0's
    transparency is RGB-neutral by construction: palette[0] = (0,0,0)
    equals the background fill.) Odd (id // 8) files store every frame
    interlaced — and because the patch (height h-2) and the full
    screen (height h) scatter under DIFFERENT four-pass permutations,
    an interlace-ignoring decoder maps transparency holes to the wrong
    frame-0 rows and the composited sums change: descatter is
    OBSERVABLE in this oracle (verified by a flag-clearing probe in
    tests), closing the r11 review's gap where whole-frame sums of
    opaque frames were row-permutation-invariant. (With a FULL-height
    patch the permutations coincide and the whole composite is one
    global row permutation — sums would stay invariant; the partial
    height is what breaks the symmetry.)"""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        pal = bytes(v for p in range(16) for v in (p, 2 * p, 3 * p))

        def build(i: int) -> bytes:
            w, h = 3 + i % 5, 2 + i % 4
            nf = 1 + i % 6
            if (i // 16) % 2:  # compositing route: partial frames f >= 1
                ih = max(1, h - 2)
                frames = [bytes((i + j) % 16 for j in range(w * h))] + [
                    bytes((i + 3 * f + j) % 16
                          for j in range((w - 2) * ih))
                    for f in range(1, nf)
                ]
                rects = [None] + [(1, 1, w - 2, ih)] * (nf - 1)
                disposals = [1] * nf
                transparent = True
            else:
                frames = [
                    bytes((i + 3 * f + j) % 16 for j in range(w * h))
                    for f in range(nf)
                ]
                rects = disposals = None
                transparent = False
            return _gif_encode_animated(
                frames, pal, w, h, delays_cs=[50] * nf,
                interlace=bool((i // 8) % 2),
                rects=rects, disposals=disposals,
                transparent=transparent, transparent_idx=0,
            )

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "video",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-gif://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_avi_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic MJPEG-in-AVI media (round 12) — the true-video-
    container companion to :func:`synthetic_gif_media`, built so a
    DuckDB oracle predicts both the sampled frame TIMELINE and each
    decoded frame's RGB byte sum arithmetically through the real AVI
    RIFF walk + per-frame JPEG entropy decode
    (:func:`_decode_avi_mjpeg_frames`).

    Grammar (ids >= 0, same NULL conventions as the siblings): each id
    builds an AVI at 2 fps (dwMicroSecPerFrame = 500000, so frame f
    appears at t = 500*f ms — the same cadence as the GIF grammar, and
    ``sample_frames(every_ms=1000)`` emits exactly the even frame
    indices) with n_frames = 1 + id % 6 DC-only 4:4:4 baseline JPEG
    frames of w = 8 * (1 + id % 3), h = 8 — nb = 1 + id % 3 luma
    blocks. Scan-order DCs of frame f, block b: dcY = (id+3f+7b)%64-32,
    dcCb = (2id+5f+11b)%64-32, dcCr = (3id+7f+13b)%64-32, flat q=8 —
    every decoded sample of block b is exactly the fixed-point
    YCbCr->RGB image of (dcY+128, dcCb, dcCr) (the
    ``multimodal_pixels_jpeg`` arithmetic), so the RGB byte sum of
    frame f is 64 * sum_b(r_b + g_b + b_b). A hash match on this route
    therefore proves real container parse + Huffman + IDCT + color
    conversion per FRAME, not AVI header sniffing.

    Late round 13: odd id//8 files are UNCOMPRESSED DIB AVIs instead
    (:func:`_avi_encode_dib` — fccHandler 'DIB ', BI_RGB, bottom-up
    padded BGR rows in '00db' chunks): frame f's top-down RGB byte j
    is (id + 3f + j) %% 256, so the oracle's frame sum is direct
    arithmetic and a hash match proves the second real AVI codec's
    row unpadding and orientation/channel flips."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from .jpeg import jpeg_encode_dc_only

        def build(i: int) -> bytes:
            nb = 1 + i % 3
            w, h = 8 * nb, 8
            nf = 1 + i % 6
            if (i // 8) % 2 == 1:
                # uncompressed DIB route (late r13): frame f's top-down
                # RGB byte j is (i + 3f + j) % 256 — raw arithmetic, so
                # the oracle needs no codec replay and a hash match
                # proves the RIFF walk + per-frame row unpadding +
                # bottom-up/BGR flips of the second real video codec
                frames = [bytes((i + 3 * f + j) % 256
                                for j in range(w * h * 3))
                          for f in range(nf)]
                return _avi_encode_dib(frames, w, h,
                                       usec_per_frame=500000)
            frames = []
            for f in range(nf):
                dcy = [(i + 3 * f + 7 * b) % 64 - 32 for b in range(nb)]
                dcb = [(2 * i + 5 * f + 11 * b) % 64 - 32 for b in range(nb)]
                dcr = [(3 * i + 7 * f + 13 * b) % 64 - 32 for b in range(nb)]
                frames.append(jpeg_encode_dc_only(
                    w, h, [dcy, dcb, dcr],
                    sampling=((1, 1), (1, 1), (1, 1)),
                ))
            return _avi_encode_mjpeg(frames, w, h, usec_per_frame=500000)

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "video",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-avi://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_jpeg_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic baseline-JPEG media (round 10) — the companion to
    :func:`synthetic_pixel_media` / :func:`synthetic_palette_media` for
    the format real crawls are majority-made-of. Each id builds a
    complete JFIF file through the real entropy encoder
    (``operators/jpeg.py``) with flat quant tables (q=8) and DC-only
    blocks, so the decoded sample of every 8x8 block is EXACTLY
    ``dc + 128`` (IDCT of a DC-only block is constant ``dc*q/8``) and a
    DuckDB oracle predicts the per-channel RGB sums arithmetically
    through Huffman decode, dequantization, IDCT, chroma upsampling, and
    the fixed-point YCbCr->RGB conversion.

    Grammar (ids >= 0, same negative/NULL conventions as the siblings):
    ``id % 2`` picks subsampling (0 = 4:4:4 with w = 8*(1 + id%4),
    h = 8*(1 + id%3); 1 = 4:2:0 with w = 16*(1 + id%3),
    h = 16*(1 + id%2)); the scan-order block DCs are
    dcY(b) = (id + 7b)%64 - 32, dcCb(b) = (2id + 11b)%64 - 32,
    dcCr(b) = (3id + 5b)%64 - 32; ``id % 3 == 1`` files carry a
    restart interval of 2 MCUs, so a hash match also proves RSTn
    handling and DC-predictor resets; and ``id % 5 == 2`` files are
    PROGRESSIVE (SOF2, libjpeg's default 10-scan script) over the same
    DC values — the full refinement ends at the identical
    ``clamp(dc + 128)`` pixels, so the unchanged arithmetic oracle now
    also proves the multi-scan machinery (DC first/refine, AC EOB runs
    over the all-zero bands, and — when id also hits the restart rule —
    per-scan RSTn resets).

    Round 13: ``id % 7 == 3`` files wrap the SAME content in a TIFF
    compression-7 container (new-style JPEG, TechNote 2) instead of a
    bare JFIF — with k = id//7, byte order II/MM by k%2 and layout by
    k%3: 0 = one full-image JPEG stream in a single strip; 1 = one
    independent JPEG stream per MCU row with the shared DQT/DHT tables
    abbreviated into the JPEGTables tag (347); 2 = per-MCU-row
    self-contained streams. Strips slice the scan-order DC arrays at
    MCU-row boundaries, so the pasted decode is pixel-identical to the
    bare-JFIF encode and the oracle's channel sums are unchanged —
    only the fmt column flips to 'tiff' on this slice."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from .jpeg import jpeg_encode_dc_only

        def build(i: int) -> bytes:
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
            ri = 2 if i % 3 == 1 else 0
            prog = i % 5 == 2
            if i % 7 != 3:
                return jpeg_encode_dc_only(
                    w, h, [dcy, dcb, dcr], sampling=sampling,
                    restart_interval=ri, progressive=prog,
                )
            # TIFF compression-7 wrap (see docstring): strips are
            # independent JPEG streams over MCU-row slices of the same
            # scan-order DC arrays, so pixels (and the oracle's sums)
            # are identical to the bare-JFIF route
            k = i // 7
            mh = 8 if i % 2 == 0 else 16  # MCU row height
            if k % 3 == 0:
                segs = [jpeg_encode_dc_only(
                    w, h, [dcy, dcb, dcr], sampling=sampling,
                    restart_interval=ri, progressive=prog)]
                rps = h
                jt = b""
            else:
                ypr, cpr = ((w // 8, w // 8) if i % 2 == 0
                            else (4 * (w // 16), w // 16))
                segs = [jpeg_encode_dc_only(
                    w, mh,
                    [dcy[s * ypr : (s + 1) * ypr],
                     dcb[s * cpr : (s + 1) * cpr],
                     dcr[s * cpr : (s + 1) * cpr]],
                    sampling=sampling, restart_interval=ri,
                    progressive=prog) for s in range(h // mh)]
                rps = mh
                jt = b""
                if k % 3 == 1:
                    jt = _jpeg_abbreviate(segs[0])[0]
                    segs = [_jpeg_abbreviate(s)[1] for s in segs]
            return _tiff_encode(
                b"", w, h, big_endian=k % 2 == 1, rows_per_strip=rps,
                jpeg_segments=segs, jpeg_tables=jt)

        for pdf in batches:
            mids = pdf[id_col].astype("Int64")
            filled = mids.fillna(0)
            yield pd.DataFrame({
                "media_id": mids,
                "kind": "image",
                "payload": filled.map(lambda i: build(int(i))),
                "source_uri": "synthetic-jpeg://" + filled.astype(str),
            })

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_pixels(media: DataFrame) -> DataFrame:
    """REAL pixel decode stage: BMP/PPM/PNG payloads to per-channel stats
    (sums, pixel count, canonical-RGB sha256) as an Arrow-batched
    mapInPandas — fat binary rows in, narrow feature rows out, so only
    features shuffle downstream. Undecodable rows keep their id with
    NULL stats (quarantine-friendly, never a dead task)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                out = decode_pixels_bytes(b)
                if out is None:
                    rows.append({"media_id": mid, "fmt": None, "width": None,
                                 "height": None, "n_pixels": None, "r_sum": None,
                                 "g_sum": None, "b_sum": None, "pixel_sha256": None})
                    continue
                fmt, w, h, raw = out
                sums = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).sum(
                    axis=0, dtype=np.int64)
                rows.append({
                    "media_id": mid, "fmt": fmt, "width": w, "height": h,
                    "n_pixels": w * h,
                    "r_sum": int(sums[0]), "g_sum": int(sums[1]), "b_sum": int(sums[2]),
                    "pixel_sha256": hashlib.sha256(raw).hexdigest(),
                })
            out_pdf = pd.DataFrame(rows, columns=[f.name for f in PIXELS_SCHEMA])
            for c in ("width", "height", "n_pixels", "r_sum", "g_sum", "b_sum"):
                out_pdf[c] = out_pdf[c].astype("Int64")
            yield out_pdf

    return media.mapInPandas(run, schema=PIXELS_SCHEMA)
