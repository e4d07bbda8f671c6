"""Baseline JPEG (ITU T.81 sequential DCT, Huffman) pixel codec — stdlib +
numpy only, no third-party image libs.

This closes the last first-class raster-format gap in the multimodal
decode surface (round 10): real crawl corpora are majority-JPEG, and
until now JPEG payloads header-decoded (dims) but quarantined at pixel
access. The decoder handles the baseline process the overwhelming
majority of crawl JPEGs use: SOF0 frames (and 8-bit SOF1 extended
sequential, which is the same process), 8-bit precision, 1 or 3
components, interleaved single-scan entropy data with optional restart
markers (DRI/RSTn), byte stuffing, standard or custom Huffman tables,
and integer-ratio chroma subsampling (4:4:4, 4:2:0, 4:2:2 all fall out
of the generic replication upsampler), and — since the progressive
layer landed — SOF2 progressive frames: multi-scan spectral selection
plus successive approximation per ITU T.81 G.1.2 (DC first/refine, AC
first/refine with EOB-run semantics), with DQT/DHT/DRI updates between
scans. Arithmetic coding, 12-bit precision, hierarchical, and
multi-scan non-interleaved *sequential* files return ``None``
(quarantine, never a dead task) — the same contract as every other
decoder in ``operators/multimodal.py``.

Exactness conventions (the decoder IS the spec for the oracle):

- IDCT: float64 ``spatial = A^T F A`` over the dequantized block, then
  ``pixel = clamp(floor(spatial + 0.5) + 128, 0, 255)`` — half-up
  rounding, not numpy banker's rounding. For a DC-only block the IDCT
  is exactly constant ``dc * q / 8`` (a dyadic rational, float64-exact),
  so with a flat quant table of 8 the pixel value is exactly
  ``clamp(dc + 128)`` — the arithmetic hook the ``multimodal_pixels_jpeg``
  oracle predicts sums through.
- YCbCr -> RGB: libjpeg-style 16-bit fixed point with arithmetic-shift
  floors (reproducible in ANSI SQL as ``floor((a + 32768) / 65536)``):
      R = Y + ((91881 * (Cr-128) + 32768) >> 16)
      G = Y - ((22554 * (Cb-128) + 46802 * (Cr-128) + 32768) >> 16)
      B = Y + ((116130 * (Cb-128) + 32768) >> 16)
  each clamped to [0, 255]. Chroma upsampling is nearest (replication),
  so subsampled chroma is constant over its coverage box.

The encoder half (``jpeg_encode_baseline`` / ``jpeg_encode_dc_only``)
is the synthetic/test twin, mirroring the GIF pattern
(``_gif_lzw_encode``): it emits complete JFIF files over caller-supplied
QUANTIZED coefficient blocks, so tests can round-trip arbitrary AC
coefficient patterns through Huffman/zigzag/RLE/stuffing/restart
exactly (integer-exact, no IDCT in the loop) while the catalog entry
uses DC-only payloads for arithmetic oracle predictability.

Reference context: the reference engine (/root/reference/src/main.py:
977-1020) only ever synthesized fake text content — image decode is a
north-star training-pipeline capability, not a parity item. All tables
and layouts below are public ITU T.81 spec constants (Annex K Huffman
tables, the zigzag scan, the JFIF APP0 layout).
"""

from __future__ import annotations

import numpy as np

_MAX_PIXELS = 1 << 24  # same decompression-bomb guard as multimodal.py

# T.81 Figure A.6 zigzag scan: zigzag index -> natural (row-major) index
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# T.81 Annex K typical Huffman tables (public spec constants)
STD_DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
STD_DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
STD_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
STD_AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)


def _canonical_codes(bits, vals):
    """(value -> (code, length)) canonical Huffman assignment per T.81
    Annex C: codes of each length are consecutive, lengths ascending."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple, list] = {}


def _decode_lut(bits, vals) -> list:
    """65536-entry LUT: 16-bit left-aligned prefix -> packed
    ``(value << 5) | code_length`` (length 0 = invalid prefix). One numpy
    slice-fill per code, then materialized as a plain Python LIST — the
    entropy loop is per-symbol Python, and a list index returns a cached
    small int where a numpy scalar lookup pays extraction + int()
    conversion per symbol (~3x the whole-loop cost, measured). Cached by
    table content: real corpora overwhelmingly ship the Annex K tables,
    so small-payload decodes don't pay a 65536-entry rebuild per file
    (hostile per-file table churn is capped below, ~2 MB per distinct
    table)."""
    key = (tuple(bits), tuple(vals))
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    arr = np.zeros(1 << 16, dtype=np.uint32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise ValueError("oversubscribed Huffman table")
            lo = code << (16 - ln)
            arr[lo : lo + (1 << (16 - ln))] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    lut = arr.tolist()
    # list entries are ~2 MB of boxed ints apiece (vs 256 KiB as numpy),
    # so the churn cap is 8, not 64; a hostile corpus cycling distinct
    # tables pins at most ~18 MB per worker and uncached tables still
    # decode (just slower). The standard tables bypass the cap: without
    # that, a worker whose first few files carry optimized per-file
    # tables (mozjpeg -optimize emits 4 per file) would fill every slot
    # and force an LUT rebuild per Annex-K file forever after — at most
    # 5 bypass keys, so the hard bound is 13 entries (~26 MB)
    if len(_LUT_CACHE) < 8 or key in _STD_TABLE_KEYS:
        _LUT_CACHE[key] = lut
    return lut


# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16), c(0)=1/sqrt(2)
_A = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Vectorized 2-D IDCT over a stack of natural-order (n, 8, 8)
    dequantized coefficient blocks -> (n, 8, 8) uint8 samples with the
    half-up rounding convention from the module docstring. Chunked so
    the float64 staging stays ~32 MB regardless of image size (a 16M-px
    component would otherwise stage ~128 MB of einsum intermediates per
    task — the same transient-memory discipline as the PNG wavefront's
    _WAVEFRONT_BLOCK_PX)."""
    n = blocks.shape[0]
    out = np.empty((n, 8, 8), dtype=np.uint8)
    step = 1 << 16  # 64k blocks * 64 cells * 8 B = 32 MB of float64
    for lo in range(0, n, step):
        f = blocks[lo : lo + step].astype(np.float64)
        m = f.shape[0]
        # A^T F A as two large flat GEMMs instead of c_einsum (which runs
        # the contraction unoptimized and dominated DC-only decode wall):
        # G = F A as one (m*8, 8) @ (8, 8); then spatial^T = G^T A lane-
        # flattened the same way, transposed back.
        g = (f.reshape(m * 8, 8) @ _A).reshape(m, 8, 8)
        spatial = (
            np.ascontiguousarray(g.transpose(0, 2, 1)).reshape(m * 8, 8) @ _A
        ).reshape(m, 8, 8).transpose(0, 2, 1)
        out[lo : lo + step] = np.clip(
            np.floor(spatial + 0.5) + 128, 0, 255
        ).astype(np.uint8)
    return out


def _split_entropy(b: bytes, start: int) -> tuple[list[bytes], int] | None:
    """Split the entropy-coded data beginning at ``start`` into restart
    segments with byte stuffing removed. Returns (segments, pos_after),
    where pos_after sits on the 0xFF of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        if i + 1 >= n:
            return None
        m = b[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
            i += 1
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker terminates the scan
            segs.append(bytes(cur))
            return segs, i
    segs.append(bytes(cur))
    return segs, n


class _BitReader:
    """MSB-first bit reader over one entropy segment, for the progressive
    path. Round 12: the same batch-refill discipline as the baseline
    batched lane — the accumulator is masked only at refill (extracts
    mask explicitly via ``_MASK``) and refills pull 48-bit pre-gathered
    words (:func:`_chunks48`, large segments only — the numpy gather is
    skipped below 1 KiB so the catalog's tiny payloads pay nothing) or
    <=5-byte slices near the tail. One refill always reaches >=16 bits
    or exhausts the segment, and every read here is <=15 bits, so a
    single refill check per call suffices. Semantics are unchanged:
    zero-padded peeks past segment end, None on invalid prefixes or
    short reads (equivalence pinned by the progressive-vs-baseline fuzz
    and the hand-authored T.81 spec streams)."""

    __slots__ = ("data", "n", "words", "nwords", "wi", "tpos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        if self.n >= 1024:
            self.words, self.tpos = _chunks48(data)
        else:
            self.words, self.tpos = [], 0
        self.nwords = len(self.words)
        self.wi = 0
        self.acc = 0
        self.nbits = 0

    def _refill(self) -> None:
        if self.wi < self.nwords:
            self.acc = ((self.acc & _MASK[self.nbits]) << 48) | self.words[self.wi]
            self.wi += 1
            self.nbits += 48
        elif self.tpos < self.n:
            chunk = self.data[self.tpos : self.tpos + 5]
            got = len(chunk)
            self.acc = ((self.acc & _MASK[self.nbits]) << (got << 3)) | int.from_bytes(chunk, "big")
            self.nbits += got << 3
            self.tpos += got

    def bits(self, k: int):
        """k raw bits MSB-first (k <= 15 in every caller), or None past
        end of segment."""
        nbits = self.nbits
        if nbits < k:
            self._refill()
            nbits = self.nbits
            if nbits < k:
                return None
        nbits -= k
        self.nbits = nbits
        return (self.acc >> nbits) & _MASK[k]

    def huff(self, lut) -> int | None:
        """One Huffman symbol via the 16-bit left-aligned LUT (zero-padded
        peek past segment end, same as the baseline loop); None on an
        invalid prefix or exhausted segment."""
        nbits = self.nbits
        if nbits < 16:
            self._refill()
            nbits = self.nbits
        acc = self.acc
        e = (
            lut[(acc >> (nbits - 16)) & 0xFFFF]
            if nbits >= 16
            else lut[((acc & _MASK[nbits]) << (16 - nbits)) & 0xFFFF]
        )
        ln = e & 31
        if ln == 0 or ln > nbits:
            return None
        self.nbits = nbits - ln
        return e >> 5


# hostile-input scan cap for progressive streams: real encoders emit
# <= ~14 scans (libjpeg's default script is 10 for 3 components, and a
# fully-split spectral script stays well under this); a crafted file
# cycling hundreds of 2-byte scans would otherwise buy per-scan setup
# work for free
_MAX_PROG_SCANS = 64


def _decode_frame(b: bytes):
    """Parse + entropy-decode one JFIF stream (baseline SOF0 single-scan
    or progressive SOF2 multi-scan). Returns ``(w, h, comps)`` where
    ``comps`` is a list of dicts with natural-order int32 coefficient
    stacks (DEQUANTIZED), per-component sampling and block-grid geometry
    — or None for unsupported/malformed input. Split from the IDCT/color
    stage so tests can check the integer entropy-decode path exactly."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    # progressive streams may legally redefine a DQT slot between scans
    # (T.81 B.2.4.1); libjpeg latches each component's table at the
    # component's FIRST scan and we match that de-facto reference —
    # qlatch maps component index -> the table snapshot taken then
    qlatch: dict[int, np.ndarray] = {}
    huff_dc: dict[int, np.ndarray] = {}
    huff_ac: dict[int, np.ndarray] = {}
    frame = None  # (w, h, [(cid, hi, vi, tq), ...])
    progressive = False
    prog = None  # per-component coefficient grids, allocated at first SOS
    nscans = 0
    restart = 0
    i = 2
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            return None
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them or a conforming file quarantines on a
        # garbage "length" read from the marker byte itself
        while b[i + 1] == 0xFF:
            i += 1
            if i + 2 > n:
                return None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:  # EOI: end of a progressive stream, or
            if prog is not None and nscans:  # premature before any scan
                w, h, comps = frame
                return _finalize_progressive(prog, comps, qtables, qlatch,
                                             w, h)
            return None
        if i + 4 > n:
            return None
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            return None
        body = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT: one or more tables
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if tq > 3 or pq > 1:
                    return None
                step = 2 if pq else 1
                if j + 64 * step > len(body):
                    return None
                if pq:
                    vals = [
                        int.from_bytes(body[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                else:
                    vals = list(body[j : j + 64])
                q = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    q[ZIGZAG[k]] = vals[k]
                qtables[tq] = q
                j += 64 * step
        elif marker == 0xC4:  # DHT: one or more tables
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                j += 17
                if tc > 1 or th > 3 or j + nv > len(body) or nv > 256:
                    return None
                vals = list(body[j : j + nv])
                j += nv
                try:
                    lut = _decode_lut(bits, vals)
                except ValueError:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = lut
            if j != len(body):
                return None
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive.
            # 8-bit extended sequential IS the baseline process plus the
            # (already supported) 4-slot table ids — T.81 annex B note:
            # every baseline stream is a valid extended-sequential one.
            # 12-bit precision quarantines via the body[0] != 8 check.
            if frame is not None or len(body) < 6 or body[0] != 8:
                return None
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            if w <= 0 or h <= 0 or w * h > _MAX_PIXELS or nf not in (1, 3):
                return None
            if len(body) != 6 + 3 * nf:
                return None
            comps = []
            for c in range(nf):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, body[8 + 3 * c]))
            if nf == 1:
                # single-component scans ignore sampling factors (T.81:
                # MCU = one block); normalize so the grids come out right
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless/arithmetic/hierarchical/differential
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                return None
            restart = int.from_bytes(body, "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None or len(body) < 1:
                return None
            ns = body[0]
            w, h, comps = frame
            if len(body) != 4 + 2 * ns:
                return None
            if not progressive:
                if ns != len(comps):
                    return None
                scan = []  # (comp_idx, dc_lut, ac_lut)
                used = set()
                for s in range(ns):
                    cs = body[1 + 2 * s]
                    td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
                    idx = next(
                        (k for k, c in enumerate(comps) if c[0] == cs), None
                    )
                    if idx is None or idx in used:
                        return None
                    used.add(idx)
                    if td not in huff_dc or ta not in huff_ac:
                        return None
                    scan.append((idx, huff_dc[td], huff_ac[ta]))
                for _, hi, vi, tq in comps:
                    if tq not in qtables:
                        return None
                return _decode_scan(
                    b, i + 2 + seglen, w, h, comps, scan, qtables, restart
                )
            # ---- progressive scan (T.81 G.1.2) ----
            nscans += 1
            if nscans > _MAX_PROG_SCANS or not 1 <= ns <= len(comps):
                return None
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            # spectral-selection / successive-approximation validity:
            # DC scans are the band [0,0] (any component subset,
            # interleaved allowed); AC scans are a band inside [1,63]
            # over exactly one component; Al caps at 13 and a
            # refinement pass must refine exactly one bit position
            if ss == 0:
                if se != 0:
                    return None
            elif ns != 1 or not ss <= se <= 63:
                return None
            if al > 13 or (ah and ah != al + 1):
                return None
            scan = []  # (comp_idx, dc_lut_or_None, ac_lut_or_None)
            used = set()
            for s in range(ns):
                cs = body[1 + 2 * s]
                td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
                idx = next(
                    (k for k, c in enumerate(comps) if c[0] == cs), None
                )
                if idx is None or idx in used:
                    return None
                used.add(idx)
                dc_lut = ac_lut = None
                if ss == 0 and ah == 0:  # DC first needs a DC table;
                    dc_lut = huff_dc.get(td)  # DC refine is raw bits
                    if dc_lut is None:
                        return None
                if ss > 0:  # AC first AND refine read run/EOB symbols
                    ac_lut = huff_ac.get(ta)
                    if ac_lut is None:
                        return None
                scan.append((idx, dc_lut, ac_lut))
            for idx, _, _ in scan:
                if idx not in qlatch:
                    q = qtables.get(comps[idx][3])
                    if q is None:
                        return None  # table must precede first use
                    qlatch[idx] = q
            if prog is None:
                prog = _prog_init(b, i, w, h, comps)
                if prog is None:
                    return None
            pos = _decode_scan_progressive(
                b, i + 2 + seglen, w, h, comps, prog, scan,
                ss, se, ah, al, restart,
            )
            if pos is None:
                return None
            i = pos
            continue
        i += 2 + seglen
    return None


def _prog_init(b: bytes, i: int, w: int, h: int, comps):
    """Allocate per-component zigzag-order coefficient grids for a
    progressive stream, padded to the interleaved MCU grid (non-
    interleaved scans cover the unpadded prefix). The decompression-bomb
    guard is the progressive twin of the baseline entropy-bits check: a
    conforming stream must carry a DC-first scan covering every block of
    every component (T.81 G.1.1.1.1 — AC scans may not precede it), and
    every DC code costs at least one bit, so remaining-bytes * 8 below
    total_blocks proves the header's dims are a bomb, BEFORE the grids
    are staged."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    if sum(hi * vi for _, hi, vi, _ in comps) > 10:  # T.81 A.1.1 cap
        return None
    for _, hi, vi, _ in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids = []
    ni = []  # non-interleaved (block_rows, block_cols) per component
    total_blocks = 0
    for _, hi, vi, _ in comps:
        brows, bcols = mcuy * vi, mcux * hi
        total_blocks += brows * bcols
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        ni.append((-(-ch // 8), -(-cw // 8)))
    if (len(b) - i) * 8 < total_blocks:
        return None
    for _, hi, vi, _ in comps:
        grids.append(np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32))
    return {"grids": grids, "ni": ni, "mcux": mcux, "mcuy": mcuy}


def _decode_scan_progressive(
    b, start, w, h, comps, prog, scan, ss, se, ah, al, restart
):
    """Decode one progressive scan into the persistent coefficient grids.
    Returns the stream position of the 0xFF opening the next marker, or
    None for malformed input. Implements the four scan kinds of T.81
    G.1.2: DC first (Huffman diffs, shifted left Al), DC refine (one raw
    bit per block ORed at Al), AC first (run/size with EOB runs), AC
    refine (correction bits over already-nonzero coefficients, newly-
    significant values at +-1<<Al, EOB-run correction sweeps)."""
    split = _split_entropy(b, start)
    if split is None:
        return None
    segs, pos_after = split
    grids = prog["grids"]
    mcux = prog["mcux"]
    if len(scan) > 1:
        interleaved = True
        nmcu = mcux * prog["mcuy"]
    else:
        interleaved = False
        nbr, nbc = prog["ni"][scan[0][0]]
        nmcu = nbr * nbc
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = [0] * len(comps)
    eobrun = 0
    mcus_in_seg = 0
    p1 = 1 << al
    m1 = -p1
    for m in range(nmcu):
        if restart and mcus_in_seg == restart:
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
            mcus_in_seg = 0
        mcus_in_seg += 1
        if ss == 0:  # DC scan (interleaved or single-component)
            for ci, dc_lut, _ in scan:
                _, hi, vi, _ = comps[ci]
                if interleaved:
                    my, mx = divmod(m, mcux)
                    positions = [
                        (my * vi + bv, mx * hi + bh)
                        for bv in range(vi)
                        for bh in range(hi)
                    ]
                else:
                    positions = [divmod(m, prog["ni"][ci][1])]
                g = grids[ci]
                for by, bx in positions:
                    if ah == 0:
                        t = reader.huff(dc_lut)
                        if t is None or t > 15:
                            return None
                        if t:
                            v = reader.bits(t)
                            if v is None:
                                return None
                            preds[ci] += (
                                v - (1 << t) + 1
                                if v < (1 << (t - 1))
                                else v
                            )
                        g[by, bx, 0] = preds[ci] << al
                    else:
                        bit = reader.bits(1)
                        if bit is None:
                            return None
                        if bit:
                            g[by, bx, 0] |= p1
            continue
        # AC scan: exactly one component, band [ss, se]
        ci, _, ac_lut = scan[0]
        by, bx = divmod(m, prog["ni"][ci][1])
        blk = grids[ci][by, bx]
        if ah == 0:  # AC first (G.1.2.2)
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = reader.huff(ac_lut)
                if sym is None:
                    return None
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        v = reader.bits(r)
                        if v is None:
                            return None
                        eobrun += v
                    break
                k += r
                if k > se:
                    return None
                v = reader.bits(s)
                if v is None:
                    return None
                val = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                blk[k] = val << al
                k += 1
            continue
        # AC refine (G.1.2.3): per-coefficient correction bits; work on a
        # plain list — the loop reads/writes single cells, where numpy
        # scalar extraction costs ~3x (same measurement as _decode_lut)
        if eobrun > 0 and not blk[ss : se + 1].any():
            # block wholly inside an EOB run with an all-zero band: the
            # correction sweep below only consumes bits at nonzero band
            # cells, so it is a provable no-op — skip the list round-
            # trip (the dominant cost on sparse files, and the hostile
            # amplification where one 2-byte EOBn buys a full-grid sweep)
            eobrun -= 1
            continue
        lst = blk.tolist()
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = reader.huff(ac_lut)
                if sym is None:
                    return None
                r, s = sym >> 4, sym & 15
                sval = 0
                if s == 0:
                    if r < 15:
                        # unlike AC-first, the run count INCLUDES the
                        # current block — its correction sweep below
                        # still consumes bits before the decrement
                        eobrun = 1 << r
                        if r:
                            v = reader.bits(r)
                            if v is None:
                                return None
                            eobrun += v
                        break
                    # r == 15: ZRL — advance over 16 zero-history cells
                else:
                    if s != 1:
                        return None
                    bit = reader.bits(1)
                    if bit is None:
                        return None
                    sval = p1 if bit else m1
                while k <= se:
                    c = lst[k]
                    if c != 0:
                        bit = reader.bits(1)
                        if bit is None:
                            return None
                        if bit and not (c & p1):
                            lst[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if sval:
                    if k > se:
                        return None
                    lst[k] = sval
                k += 1
        if eobrun > 0:
            # correction sweep over the rest of the band — runs both for
            # the block that decoded the EOB symbol and for every block
            # wholly inside the run
            while k <= se:
                c = lst[k]
                if c != 0:
                    bit = reader.bits(1)
                    if bit is None:
                        return None
                    if bit and not (c & p1):
                        lst[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        blk[:] = lst
    return pos_after


def _finalize_progressive(prog, comps, qtables, qlatch, w: int, h: int):
    """Dequantize the accumulated grids and reshape to the MCU-scan-order
    natural-order coefficient stacks `_frame_to_rgb` expects — the exact
    layout `_decode_scan` produces, so the IDCT/upsample/color stage is
    shared verbatim between the baseline and progressive paths.

    Dequantization uses ``qlatch`` — the table snapshot taken at each
    component's FIRST scan (matching libjpeg's latch; a between-scan DQT
    redefinition must not apply retroactively). A component that never
    appeared in any scan has an all-zero grid; it falls back to the
    current table, and any table dequantizes zeros to zeros."""
    nat_idx = list(ZIGZAG)
    result = []
    for ci, ((cid, hi, vi, tq), grid) in enumerate(
            zip(comps, prog["grids"])):
        q = qlatch.get(ci, qtables.get(tq))
        if q is None:
            return None
        brows, bcols = grid.shape[0], grid.shape[1]
        mcuy, mcux = brows // vi, bcols // hi
        nat = np.zeros_like(grid)
        nat[..., nat_idx] = grid
        nat *= q[None, None, :]
        coeffs = (
            nat.reshape(mcuy, vi, mcux, hi, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1, 8, 8)
        )
        result.append({
            "id": cid, "h": hi, "v": vi,
            "coeffs": coeffs,
            "grid": (brows, bcols),
            "mcu_grid": (mcuy, mcux),
        })
    return w, h, result


# consumed-bit masks for the batched entropy lane (acc is masked only at
# refill time there, so every extract masks explicitly): index = bit count
_MASK = tuple((1 << i) - 1 for i in range(97))

# Dispatch gates for the batched+fast-LUT entropy lane, in ENTROPY
# BYTES (sum of restart-segment lengths) — the direct proxy for symbol
# count. Two thresholds because the 65536-entry fast-AC table costs
# ~8 ms to build per distinct Huffman table: tables whose base LUT is
# content-cached (_LUT_CACHE — Annex K standard tables always are) get
# the fast table built ONCE per process and cached by identity, so the
# low gate applies; a file carrying its own optimized tables (mozjpeg
# -optimize) pays the build per file, so it must bring enough entropy
# data to amortize it. DC-only files (~2 bytes/block) and the catalog's
# tiny frames sit below both gates and keep the UNTOUCHED scalar lane —
# the r11 LZW lesson (micro-bench the catalog's payload sizes, gate at
# a measured threshold) applied to JPEG. Values measured on this box
# (scripts/decode_bench.py, see SCALE.md decode-throughput table).
_AC_FAST_MIN_ENTROPY_BYTES = 8192
_AC_FAST_MIN_ENTROPY_BYTES_UNCACHED = 131072

# fast-AC tables for IMMORTAL base LUTs only (members of _LUT_CACHE,
# which never evicts), keyed by identity — id() is stable and never
# reused for objects that stay alive, and the bound is _LUT_CACHE's own
# (~13 entries), so this adds at most ~26 MB per worker
_FAST_AC_CACHE: dict[int, list] = {}


def _fast_ac_lut(ac_lut) -> list:
    """libjpeg-turbo-style combined AC lookup: for every 16-bit window
    whose Huffman code AND magnitude bits fit inside it (ln + s <= 16,
    s > 0), precompute one int encoding (total_bits << 20) |
    (zero_run << 16) | (extended_value + 32768), so the hot loop decodes
    a complete nonzero AC coefficient with ONE table index instead of
    symbol-decode + bit-extract + sign-extend. Entries that need the
    general path (EOB, ZRL, invalid prefixes, codes longer than the
    window) are -1. Built vectorized from the base LUT (~1-2 ms), only
    above the ``_AC_FAST_MIN_ENTROPY_BYTES`` gate."""
    E = np.asarray(ac_lut, dtype=np.int64)
    ln = E & 31
    rs = E >> 5
    s = rs & 15
    run = rs >> 4
    tb = ln + s
    valid = (ln > 0) & (s > 0) & (tb <= 16)
    idx = np.arange(65536, dtype=np.int64)
    sh = np.where(valid, 16 - tb, 0)
    v = (idx >> sh) & ((np.int64(1) << s) - 1)
    ext = np.where(
        v < (np.int64(1) << np.maximum(s - 1, 0)),
        v - (np.int64(1) << s) + 1,
        v,
    )
    fe = (tb << 20) | (run << 16) | (ext + 32768)
    return np.where(valid, fe, np.int64(-1)).tolist()


_CHUNK48_W = None  # lazy (n, 6) byte -> 48-bit word weights


def _chunks48(data: bytes) -> tuple[list, int]:
    """Pre-split one entropy segment into 48-bit big-endian refill words
    (numpy gather, one pass) so the hot loop's refill is a single list
    index instead of a byte slice + ``int.from_bytes``. Returns
    (words, n_covered_bytes); the < 6-byte tail stays byte-fed."""
    global _CHUNK48_W
    n6 = len(data) // 6
    if n6 == 0:
        return [], 0
    if _CHUNK48_W is None:
        _CHUNK48_W = (np.uint64(1) << (np.arange(5, -1, -1,
                                                 dtype=np.uint64) * np.uint64(8)))
    a = np.frombuffer(data, dtype=np.uint8, count=n6 * 6)
    words = (a.reshape(n6, 6).astype(np.uint64) @ _CHUNK48_W).tolist()
    return words, n6 * 6


def _entropy_baseline_batched(segs, nmcu, restart, ncomp, scan_blocks, out):
    """Batched twin of the inlined scalar entropy loop in
    ``_decode_scan`` (round 12, the r10/r11 AC-dense ask). Three levers
    over the scalar lane, all semantics-preserving: the bit accumulator
    refills 48 bits per Python op from pre-gathered words
    (:func:`_chunks48`) and is masked only at refill (extracts mask
    explicitly via ``_MASK``); nonzero AC coefficients resolve through
    the combined ``_fast_ac_lut`` in ONE table index (symbol + magnitude
    + sign-extension together); and AC stores go through a writable
    memoryview of the coefficient array (~40% cheaper than ndarray
    ``__setitem__``; AC values are bounded to +-32767 by construction so
    the int32 format can't reject them — DC predictors, which CAN
    overflow int32 on hostile streams, keep the ndarray store and its
    scalar-lane wrap semantics). Bit-exact with the scalar lane on
    every stream — accept, reject, and zero-padded tail peeks included
    (equivalence fuzz-pinned in tests/test_jpeg_fastpath.py).
    ``scan_blocks`` rows are (ci, dc_lut, ac_lut, nblk, fast_ac).
    Returns False to reject (the scalar lane's ``return None`` cases)."""
    counts = [0] * ncomp
    preds = [0] * ncomp
    flats = [c.reshape(-1) for c in out]
    views = [f.data for f in flats]
    mask = _MASK
    seg_idx = 0
    data = segs[0]
    ndata = len(data)
    words, tpos = _chunks48(data)
    nwords = len(words)
    wi = 0
    acc = nbits = 0
    mcus_in_seg = 0
    for _m in range(nmcu):
        if restart and mcus_in_seg == restart:
            seg_idx += 1
            if seg_idx >= len(segs):
                return False
            data = segs[seg_idx]
            ndata = len(data)
            words, tpos = _chunks48(data)
            nwords = len(words)
            wi = 0
            acc = nbits = 0
            preds = [0] * ncomp
            mcus_in_seg = 0
        for ci, dc_lut, ac_lut, nblk, fast_ac in scan_blocks:
            flat = flats[ci]
            mv = views[ci]
            for _blk in range(nblk):
                base = counts[ci] << 6
                counts[ci] += 1
                if nbits < 32:
                    if wi < nwords:
                        acc = ((acc & mask[nbits]) << 48) | words[wi]
                        wi += 1
                        nbits += 48
                    elif tpos < ndata:
                        chunk = data[tpos : tpos + 5]
                        got = len(chunk)
                        acc = ((acc & mask[nbits]) << (got << 3)) | int.from_bytes(chunk, "big")
                        nbits += got << 3
                        tpos += got
                # DC: peek 16 (zero-padded past end), consume ln REAL bits
                e = dc_lut[
                    (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16
                    else ((acc & mask[nbits]) << (16 - nbits)) & 0xFFFF
                ]
                ln = e & 31
                if ln == 0 or ln > nbits:
                    return False
                nbits -= ln
                t = e >> 5
                if t:
                    if t > 15 or t > nbits:
                        return False
                    nbits -= t
                    v = (acc >> nbits) & mask[t]
                    preds[ci] += v - (1 << t) + 1 if v < (1 << (t - 1)) else v
                flat[base] = preds[ci]
                k = 1
                while k < 64:
                    if nbits < 32:
                        if wi < nwords:
                            acc = ((acc & mask[nbits]) << 48) | words[wi]
                            wi += 1
                            nbits += 48
                        elif tpos < ndata:
                            chunk = data[tpos : tpos + 5]
                            got = len(chunk)
                            acc = ((acc & mask[nbits]) << (got << 3)) | int.from_bytes(chunk, "big")
                            nbits += got << 3
                            tpos += got
                    idx16 = (
                        (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16
                        else ((acc & mask[nbits]) << (16 - nbits)) & 0xFFFF
                    )
                    fe = fast_ac[idx16]
                    if fe >= 0:  # complete nonzero coefficient, one index
                        tb = fe >> 20
                        if tb > nbits:
                            return False
                        nbits -= tb
                        k += (fe >> 16) & 15
                        if k > 63:
                            return False
                        mv[base + k] = (fe & 0xFFFF) - 32768
                        k += 1
                        continue
                    # general lane: EOB / ZRL / long codes / invalid
                    e = ac_lut[idx16]
                    ln = e & 31
                    if ln == 0 or ln > nbits:
                        return False
                    nbits -= ln
                    rs = e >> 5
                    s = rs & 15
                    if s == 0:
                        if rs == 0xF0:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63 or s > nbits:
                        return False
                    nbits -= s
                    v = (acc >> nbits) & mask[s]
                    mv[base + k] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                    k += 1
        mcus_in_seg += 1
    return True


def _decode_scan(b, start, w, h, comps, scan, qtables, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        return None
    # T.81 A.1.1: the sum of Hi*Vi over the frame's components is capped
    # at 10 — enforcing it bounds the per-MCU block count before any
    # allocation (a hostile header can't multiply dims by 3x16 blocks)
    if sum(hi * vi for _, hi, vi, _ in comps) > 10:
        return None
    for _, hi, vi, _ in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            return None  # non-integer upsampling ratio
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    split = _split_entropy(b, start)
    if split is None:
        return None
    segs, _ = split
    # allocation-proportionality guard: every block costs at least a DC
    # code + an EOB (>= 2 bits even with pathological 1-bit custom
    # tables), so a sub-sized entropy stream cannot legitimately cover
    # the claimed block grid — reject BEFORE staging the coefficient
    # arrays, so a tiny crafted header can't allocate hundreds of MB
    # (the JPEG twin of the PNG bounded-inflate check)
    total_blocks = nmcu * sum(hi * vi for _, hi, vi, _ in comps)
    if sum(len(s) for s in segs) * 8 < total_blocks * 2:
        return None
    # coefficient stacks per component, scan (MCU-major) order
    out = [
        np.zeros((nmcu * hi * vi, 64), dtype=np.int32)
        for _, hi, vi, _ in comps
    ]
    entropy_bytes = sum(len(s) for s in segs)
    ext_blocks = None
    if entropy_bytes >= _AC_FAST_MIN_ENTROPY_BYTES:
        # batched lane (r12): 48-bit refills + combined AC LUT — the
        # AC-dense (photo-like) shape; bit-exact with the scalar lane
        local_fast: dict[int, list] = {}
        ext_blocks = []
        for ci, dc_lut, ac_lut in scan:
            key = id(ac_lut)
            fast = _FAST_AC_CACHE.get(key) or local_fast.get(key)
            if fast is None:
                immortal = any(v is ac_lut for v in _LUT_CACHE.values())
                if (not immortal and entropy_bytes
                        < _AC_FAST_MIN_ENTROPY_BYTES_UNCACHED):
                    ext_blocks = None  # per-file table build won't amortize
                    break
                fast = _fast_ac_lut(ac_lut)
                (_FAST_AC_CACHE if immortal else local_fast)[key] = fast
            ext_blocks.append((ci, dc_lut, ac_lut,
                               comps[ci][1] * comps[ci][2], fast))
    if ext_blocks is not None:
        if not _entropy_baseline_batched(
                segs, nmcu, restart, len(comps), ext_blocks, out):
            return None
        result = []
        for (cid, hi, vi, tq), coefs in zip(comps, out):
            nat = np.zeros_like(coefs)
            nat[:, list(ZIGZAG)] = coefs
            nat *= qtables[tq][None, :]
            result.append({
                "id": cid, "h": hi, "v": vi,
                "coeffs": nat.reshape(-1, 8, 8),
                "grid": (mcuy * vi, mcux * hi),
                "mcu_grid": (mcuy, mcux),
            })
        return w, h, result
    counts = [0] * len(comps)
    preds = [0] * len(comps)
    scan_blocks = [(ci, dc_lut, ac_lut, comps[ci][1] * comps[ci][2])
                   for ci, dc_lut, ac_lut in scan]
    # the entropy loop is the per-symbol hot path: the bit reader runs
    # inlined on local ints (acc holds `nbits` real bits, LSB-aligned)
    # instead of through method calls, and the LUTs are plain Python
    # lists — together ~4x over the method-call/numpy-scalar version
    # (scripts/decode_bench.py --per-format). segs is never empty:
    # _split_entropy appends the current segment on every return path.
    seg_idx = 0
    data = segs[0]
    ndata = len(data)
    pos = acc = nbits = 0
    mcus_in_seg = 0
    for _m in range(nmcu):
        if restart and mcus_in_seg == restart:
            # next restart segment; predictors reset per spec
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            data = segs[seg_idx]
            ndata = len(data)
            pos = acc = nbits = 0
            preds = [0] * len(comps)
            mcus_in_seg = 0
        for ci, dc_lut, ac_lut, nblk in scan_blocks:
            for _blk in range(nblk):
                coef = out[ci][counts[ci]]
                counts[ci] += 1
                # DC: peek 16 (zero-padded past end), consume ln REAL bits
                while nbits < 16 and pos < ndata:
                    acc = (acc << 8) | data[pos]
                    pos += 1
                    nbits += 8
                e = dc_lut[
                    (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16
                    else (acc << (16 - nbits)) & 0xFFFF
                ]
                ln = e & 31
                if ln == 0 or ln > nbits:
                    return None
                nbits -= ln
                acc &= (1 << nbits) - 1
                t = e >> 5
                if t:
                    if t > 15:
                        return None
                    while nbits < t and pos < ndata:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    if t > nbits:
                        return None
                    nbits -= t
                    v = acc >> nbits
                    acc &= (1 << nbits) - 1
                    preds[ci] += v - (1 << t) + 1 if v < (1 << (t - 1)) else v
                coef[0] = preds[ci]
                # AC
                k = 1
                while k < 64:
                    while nbits < 16 and pos < ndata:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    e = ac_lut[
                        (acc >> (nbits - 16)) & 0xFFFF if nbits >= 16
                        else (acc << (16 - nbits)) & 0xFFFF
                    ]
                    ln = e & 31
                    if ln == 0 or ln > nbits:
                        return None
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    rs = e >> 5
                    s = rs & 15
                    if s == 0:
                        if rs == 0xF0:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        return None
                    while nbits < s and pos < ndata:
                        acc = (acc << 8) | data[pos]
                        pos += 1
                        nbits += 8
                    if s > nbits:
                        return None
                    nbits -= s
                    v = acc >> nbits
                    acc &= (1 << nbits) - 1
                    coef[k] = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                    k += 1
        mcus_in_seg += 1
    result = []
    for (cid, hi, vi, tq), coefs in zip(comps, out):
        # zigzag -> natural order, then dequantize
        nat = np.zeros_like(coefs)
        nat[:, list(ZIGZAG)] = coefs
        nat *= qtables[tq][None, :]
        result.append({
            "id": cid, "h": hi, "v": vi,
            "coeffs": nat.reshape(-1, 8, 8),
            "grid": (mcuy * vi, mcux * hi),  # block rows/cols incl. MCU pad
            "mcu_grid": (mcuy, mcux),
        })
    return w, h, result


def decode_jpeg_pixels(b: bytes) -> tuple[int, int, bytes] | None:
    """JPEG (baseline SOF0 or progressive SOF2) -> (w, h, top-down RGB
    bytes); None to quarantine.
    IDCT + upsample + color conversion per the module's exactness
    conventions; grayscale expands to RGB like the PNG ctype-0 path.
    MemoryError is quarantined too: the entropy-bits guard makes
    allocation proportional to input size, but under executor pressure
    a legitimate huge payload must degrade to a NULL-stats row, never a
    dead task."""
    try:
        frame = _decode_frame(b)
    except (ValueError, IndexError, OverflowError, MemoryError):
        return None  # malformed-input classes the parser maps to quarantine
    if frame is None:
        return None
    try:
        return _frame_to_rgb(frame)
    except MemoryError:
        # executor pressure on a legitimate huge payload — quarantine.
        # Any OTHER exception past a successful parse is a decoder bug
        # and must stay loud, not be misfiled as a quarantine row.
        return None


def _frame_to_rgb(frame) -> tuple[int, int, bytes]:
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        brows, bcols = c["grid"]
        mcuy, mcux = c["mcu_grid"]
        px = _idct_blocks(c["coeffs"])
        # scan order is (my, mx, bv, bh): reshape+transpose to the plane
        plane = (
            px.reshape(mcuy, mcux, c["v"], c["h"], 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(brows * 8, bcols * 8)
        )
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w].astype(np.int32))
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2).tobytes()
    y, cb, cr = planes
    cb1 = cb - 128
    cr1 = cr - 128
    r = y + ((91881 * cr1 + 32768) >> 16)
    g = y - ((22554 * cb1 + 46802 * cr1 + 32768) >> 16)
    bl = y + ((116130 * cb1 + 32768) >> 16)
    rgb = np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (r, g, bl)], axis=2
    )
    return w, h, rgb.tobytes()


# ---------------------------------------------------------------------------
# Encoder twin (synthetic payloads + exact Huffman round-trip tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(bw, coef, pred, dc_codes, ac_codes) -> int:
    """One zigzag-order quantized block; returns the new DC predictor."""
    dc = int(coef[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _encode_headers(
    sof_marker: int, nf: int, w: int, h: int, sampling, qy: int, qc: int,
    luma_ac, chroma_ac, restart_interval: int,
) -> bytearray:
    """SOI through DRI, shared by the baseline and progressive encoder
    twins — they differ only in the SOF marker and the AC Huffman
    tables."""
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes([qy] * 64))
    if nf == 3:
        out += _seg(0xDB, b"\x01" + bytes([qc] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for ci in range(nf):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _seg(sof_marker, sof)

    def dht(tc, th, table):
        bits, vals = table
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, luma_ac)
    if nf == 3:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, chroma_ac)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    return out


def jpeg_encode_baseline(
    comp_coeffs,
    w: int,
    h: int,
    sampling=((2, 2), (1, 1), (1, 1)),
    qy: int = 8,
    qc: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """Complete baseline JFIF file over QUANTIZED zigzag-order coefficient
    blocks (``comp_coeffs``: one (nblocks, 64) int array per component in
    MCU scan order) with flat quant tables ``qy``/``qc`` and the Annex K
    Huffman tables. 1 component = grayscale; 3 = YCbCr with ``sampling``.
    Integer-exact twin of the decoder's entropy layer, so round-trip
    tests prove Huffman/zigzag/RLE/stuffing/restart bit-for-bit."""
    nf = len(comp_coeffs)
    if nf == 1:
        sampling = ((1, 1),)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    for ci, coefs in enumerate(comp_coeffs):
        hi, vi = sampling[ci]
        assert len(coefs) == nmcu * hi * vi, "blocks must cover the MCU grid"

    out = _encode_headers(
        0xC0, nf, w, h, sampling, qy, qc,
        STD_AC_LUMA, STD_AC_CHROMA, restart_interval,
    )
    sos = bytes([nf])
    for ci in range(nf):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    dc_y = _canonical_codes(*STD_DC_LUMA)
    ac_y = _canonical_codes(*STD_AC_LUMA)
    dc_c = _canonical_codes(*STD_DC_CHROMA)
    ac_c = _canonical_codes(*STD_AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * nf
    counts = [0] * nf
    rst = 0
    for m in range(nmcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * nf
        for ci in range(nf):
            hi, vi = sampling[ci]
            dc_t, ac_t = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
            for _ in range(hi * vi):
                preds[ci] = _encode_block(
                    bw, comp_coeffs[ci][counts[ci]], preds[ci], dc_t, ac_t
                )
                counts[ci] += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# AC Huffman table for the progressive encoder: the Annex K tables lack
# the EOBn run-length symbols (0x10..0xE0) progressive scans need, so the
# twin ships a universal table carrying every RS value — 255 codes at
# length 8 plus one at length 9 (a single DHT `bits` byte caps at 255).
# Deliberately suboptimal; the twin optimizes for exercising the decoder,
# not for compression.
PROG_AC_TABLE = (
    (0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(256)),
)

# cache keys of the tables real corpora overwhelmingly ship (plus the
# progressive twin's universal table) — these bypass the _LUT_CACHE
# churn cap so per-file optimized tables can't evict them (see
# _decode_lut)
_STD_TABLE_KEYS = frozenset(
    (tuple(bits), tuple(vals))
    for bits, vals in (STD_DC_LUMA, STD_DC_CHROMA,
                       STD_AC_LUMA, STD_AC_CHROMA, PROG_AC_TABLE)
)


def _flush_eobrun(bw, state, ac_codes) -> None:
    """Emit the pending EOB run (EOBn symbol + extension bits) followed by
    the correction bits buffered while the run accumulated (T.81 G.1.2.3
    ordering: the decoder reads them during its run correction sweeps)."""
    e = state["eobrun"]
    if e == 0 and not state["be"]:
        return
    if e > 0:
        nb = e.bit_length() - 1
        code, ln = ac_codes[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(e & ((1 << nb) - 1), nb)
        state["eobrun"] = 0
    for bit in state["be"]:
        bw.write(bit, 1)
    state["be"] = []


def _enc_ac_first(bw, blk, ss, se, al, ac_codes, state) -> None:
    """AC-first pass over one block's band: run/size over the magnitudes
    shifted right Al, with zero bands folded into the cross-block EOB
    run."""
    r = 0
    for k in range(ss, se + 1):
        t = int(blk[k])
        t2 = (-t if t < 0 else t) >> al
        if t2 == 0:
            r += 1
            continue
        _flush_eobrun(bw, state, ac_codes)
        while r > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
        s = t2.bit_length()
        code, ln = ac_codes[(r << 4) | s]
        bw.write(code, ln)
        bw.write(t2 if t >= 0 else (1 << s) - 1 - t2, s)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:  # EOBn caps at r=14
            _flush_eobrun(bw, state, ac_codes)


def _enc_ac_refine(bw, blk, ss, se, al, ac_codes, state) -> None:
    """AC-refinement pass: newly-significant coefficients (magnitude 1 at
    this bit position) as run/1 symbols with a sign bit; already-nonzero
    coefficients contribute buffered correction bits emitted after the
    next symbol (or carried into the EOB-run buffer at block end)."""
    absv = [0] * (se + 1 - ss)
    eobpos = ss - 1  # index of the last newly-significant coefficient
    for k in range(ss, se + 1):
        t = int(blk[k])
        t2 = (-t if t < 0 else t) >> al
        absv[k - ss] = t2
        if t2 == 1:
            eobpos = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t2 = absv[k - ss]
        if t2 == 0:
            r += 1
            continue
        # emit pending ZRLs unless they fold into the EOB run (everything
        # at or past the last newly-significant coefficient does)
        while r > 15 and k <= eobpos:
            _flush_eobrun(bw, state, ac_codes)
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if t2 > 1:  # history coefficient: buffer its correction bit
            br.append(t2 & 1)
            continue
        _flush_eobrun(bw, state, ac_codes)
        code, ln = ac_codes[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(blk[k]) >= 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["be"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, state, ac_codes)


def jpeg_encode_progressive(
    comp_coeffs,
    w: int,
    h: int,
    sampling=((2, 2), (1, 1), (1, 1)),
    qy: int = 8,
    qc: int = 8,
    scans=None,
    restart_interval: int = 0,
) -> bytes:
    """Complete progressive (SOF2) JFIF file over the same QUANTIZED
    MCU-scan-order coefficient blocks ``jpeg_encode_baseline`` takes, so
    equivalence tests can feed identical coefficients through both paths
    and require identical pixels. ``scans`` is a list of
    ``(comp_indices, Ss, Se, Ah, Al)`` — default is libjpeg's standard
    10-scan script (DC first Al=1, split-band AC firsts, DC refine, AC
    refines down to Al=0), which fully refines, so the decoded image is
    bit-identical to the baseline encoding of the same coefficients."""
    nf = len(comp_coeffs)
    assert nf in (1, 3), "twin encodes grayscale or YCbCr only"
    if nf == 1:
        sampling = ((1, 1),)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    grids = []
    ni = []
    for ci, coefs in enumerate(comp_coeffs):
        hi, vi = sampling[ci]
        arr = np.asarray(coefs, dtype=np.int64)
        assert arr.shape == (nmcu * hi * vi, 64), \
            "blocks must cover the MCU grid"
        grids.append(
            arr.reshape(mcuy, mcux, vi, hi, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcuy * vi, mcux * hi, 64)
        )
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        ni.append((-(-ch // 8), -(-cw // 8)))
    if scans is None:
        if nf == 1:
            scans = [
                ((0,), 0, 0, 0, 1),
                ((0,), 1, 63, 0, 1),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 1, 0),
            ]
        else:
            allc = tuple(range(nf))
            scans = [
                (allc, 0, 0, 0, 1),
                ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
                ((1,), 1, 63, 0, 1), ((2,), 1, 63, 0, 1),
                (allc, 0, 0, 1, 0),
                ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
                ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
            ]

    out = _encode_headers(
        0xC2, nf, w, h, sampling, qy, qc,
        PROG_AC_TABLE, PROG_AC_TABLE, restart_interval,
    )

    dc_codes = [
        _canonical_codes(*(STD_DC_LUMA if ci == 0 else STD_DC_CHROMA))
        for ci in range(nf)
    ]
    ac_codes = _canonical_codes(*PROG_AC_TABLE)

    for cis, ss, se, ah, al in scans:
        sos = bytes([len(cis)])
        for ci in cis:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, ((t if ss == 0 else 0) << 4)
                          | (t if ss > 0 else 0)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)

        interleaved = len(cis) > 1
        if interleaved:
            n_units = nmcu
        else:
            nbr, nbc = ni[cis[0]]
            n_units = nbr * nbc
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        preds = {ci: 0 for ci in cis}
        rst = 0
        for m in range(n_units):
            if restart_interval and m and m % restart_interval == 0:
                _flush_eobrun(bw, state, ac_codes)
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = {ci: 0 for ci in cis}
            if ss == 0:
                for ci in cis:
                    hi, vi = sampling[ci]
                    if interleaved:
                        my, mx = divmod(m, mcux)
                        poss = [
                            (my * vi + bv, mx * hi + bh)
                            for bv in range(vi)
                            for bh in range(hi)
                        ]
                    else:
                        poss = [divmod(m, ni[ci][1])]
                    for by, bx in poss:
                        dc = int(grids[ci][by, bx, 0])
                        if ah == 0:
                            t = dc >> al  # arithmetic shift, per G.1.2.1
                            diff = t - preds[ci]
                            preds[ci] = t
                            cat = _category(diff)
                            code, ln = dc_codes[ci][cat]
                            bw.write(code, ln)
                            if cat:
                                bw.write(
                                    diff if diff >= 0
                                    else diff + (1 << cat) - 1,
                                    cat,
                                )
                        else:
                            bw.write((dc >> al) & 1, 1)
            else:
                ci = cis[0]
                by, bx = divmod(m, ni[ci][1])
                blk = grids[ci][by, bx]
                if ah == 0:
                    _enc_ac_first(bw, blk, ss, se, al, ac_codes, state)
                else:
                    _enc_ac_refine(bw, blk, ss, se, al, ac_codes, state)
        _flush_eobrun(bw, state, ac_codes)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_dc_only(
    w: int,
    h: int,
    dcs,
    sampling=((2, 2), (1, 1), (1, 1)),
    q: int = 8,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """DC-only JPEG (baseline, or progressive with ``progressive=True``):
    ``dcs`` is one iterable of per-block DC values (quantized, scan
    order) per component. With the flat quant table ``q=8`` the decoded
    sample for a block is exactly ``clamp(dc + 128)`` (module
    docstring), which is what makes the ``multimodal_pixels_jpeg``
    oracle's channel sums pure arithmetic — for BOTH encodings, since
    the progressive script fully refines, so a hash match on a
    progressive-route file proves the multi-scan machinery (DC
    first/refine, AC EOB runs over the all-zero bands) ends at the same
    pixels."""
    coeffs = []
    for vals in dcs:
        arr = np.zeros((len(vals), 64), dtype=np.int32)
        arr[:, 0] = list(vals)
        coeffs.append(arr)
    if progressive:
        return jpeg_encode_progressive(
            coeffs, w, h, sampling=sampling, qy=q, qc=q,
            restart_interval=restart_interval,
        )
    return jpeg_encode_baseline(
        coeffs, w, h, sampling=sampling, qy=q, qc=q,
        restart_interval=restart_interval,
    )
