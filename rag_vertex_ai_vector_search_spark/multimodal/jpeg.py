"""JPEG (ITU-T T.81 / ISO 10918-1) codec in pure numpy + stdlib -- no
PIL/opencv/ffmpeg in this container, so the decode seam is closed with
the actual algorithm: marker parse, canonical Huffman entropy coding,
dequantize, inverse zigzag, IDCT, chroma upsample, BT.601 YCbCr -> RGB.

Scope (the overwhelming majority of real-world JPEGs):
- baseline sequential DCT (SOF0/1), 8-bit samples
- 12-bit EXTENDED SEQUENTIAL (SOF1): 16-bit DQT entries (Pq=1),
  2048 level shift, uint16 output -- the medical/scientific DCT mode
- LOSSLESS (SOF3, T.81 Annex H): all 7 predictors, 2..16-bit
  precision, point transform -- exact encode->decode round-trips
- PROGRESSIVE DCT (SOF2): spectral selection + successive
  approximation per T.81 G.1.2 (multi-scan coefficient accumulation,
  EOB runs, refinement correction bits) -- the dominant encode mode of
  web-scraped corpora
- grayscale (1 component) and YCbCr 3-component
- chroma subsampling 4:4:4, 4:2:2 and 4:2:0 (any h/v factors 1-2)
- restart intervals (DRI / RSTn)
Arithmetic coding and hierarchical modes raise NotImplementedError
(12-bit extended sequential and lossless SOF3 are implemented above).

The encoders exist for round-trip tests and thumbnail sinks: standard
Annex K quantization + Huffman tables, libjpeg-style quality scaling,
4:4:4 only. encode_jpeg_progressive emits a standard 4-phase scan
script (DC Al=1, AC per component Al=1, DC refine, AC refine) carrying
exactly the baseline encoder's quantized coefficients, so progressive
and baseline encodes of the same image decode to IDENTICAL arrays --
the roundtrip equivalence gate. Constants below are the public tables
printed in the spec (Annex K.1 / K.3).

All loops that matter run vectorized over blocks (einsum DCT, gather
dequantize); the per-symbol Huffman walk is Python but operates on a
numpy bit array -- fine for the featurization path where decode cost is
paid only by rows that survive the cheap metadata filters.
"""

from __future__ import annotations

import struct

import numpy as np

# -- 8x8 DCT operator ------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> spatial."""
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C)


# -- zigzag ----------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

# -- Annex K quantization tables ------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# -- Annex K Huffman tables: (bits[1..16], values) -------------------------

_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _canonical_codes(bits, values):
    """(length, code) per symbol in canonical order (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, values):
    """(length, code) -> symbol lookup for the decoder."""
    return {
        (ln, cd): sym for sym, (ln, cd) in _canonical_codes(bits, values).items()
    }


# -- bit IO ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, length: int, code: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(8 - self._n, 0xFF)  # pad with 1-bits


class _BitReader:
    """MSB-first reader over the entropy-coded segment; unstuffs
    0xFF00 and stops at (reporting) RSTn/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker = None

    def _fill(self) -> None:
        # A truncated entropy segment must surface as the codec's
        # documented contract (NotImplementedError), not an executor
        # IndexError -- callers' garbage-rejection paths rely on it.
        if self.pos >= len(self.data):
            raise NotImplementedError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise NotImplementedError("truncated JPEG stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                self.marker = nxt
                self._acc = (self._acc << 8) | 0
                self._n += 8
                return
            else:
                self.marker = nxt
                self._acc = (self._acc << 8) | 0
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_restart(self) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self._acc = 0
        self._n = 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise NotImplementedError("truncated JPEG stream")
            if self.data[self.pos] == 0xFF and (
                0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                break
            self.pos += 1
        self.pos += 2
        self.marker = None


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# -- encoder ---------------------------------------------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_component(
    writer: _BitWriter, blocks_q: np.ndarray, dc_codes, ac_codes
) -> None:
    pred = 0
    for blk in blocks_q:
        zz = blk[_ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _size_cat(diff)
        ln, cd = dc_codes[s]
        writer.write(ln, cd)
        if s:
            writer.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, cd = ac_codes[0xF0]  # ZRL
                writer.write(ln, cd)
                run -= 16
            s = _size_cat(v)
            ln, cd = ac_codes[(run << 4) | s]
            writer.write(ln, cd)
            writer.write(s, v if v >= 0 else v + (1 << s) - 1)
            run = 0
        if last < 63:
            ln, cd = ac_codes[0x00]  # EOB
            writer.write(ln, cd)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) with edge replication padding."""
    h, w = plane.shape
    hp, wp = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")
    return (
        padded.reshape(hp // 8, 8, wp // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg_baseline(img: np.ndarray, *, quality: int = 85) -> bytes:
    """Baseline sequential JPEG encoder: (H, W) uint8 grayscale or
    (H, W, 3) uint8 RGB (written as YCbCr 4:4:4). Standard Annex K
    tables with libjpeg-style quality scaling."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt[_ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x11, 0 if cid == 1 else 1])
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"

    writer = _BitWriter()
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    # interleaved 4:4:4 MCU = one block per component
    comp_blocks = []
    for ci, plane in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        blocks = _blockify(plane) - 128.0
        coef = _dct2(blocks)
        qblocks = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
        comp_blocks.append(qblocks.reshape(len(qblocks), 64))
    if gray:
        _encode_component(writer, comp_blocks[0], dc_l, ac_l)
    else:
        n_blocks = len(comp_blocks[0])
        preds = [0, 0, 0]
        for bi in range(n_blocks):
            for ci in range(3):
                zz = comp_blocks[ci][bi][_ZIGZAG]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s = _size_cat(diff)
                ln, cd = dc_codes[s]
                writer.write(ln, cd)
                if s:
                    writer.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if nz.size else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = ac_codes[0xF0]
                        writer.write(ln, cd)
                        run -= 16
                    s = _size_cat(v)
                    ln, cd = ac_codes[(run << 4) | s]
                    writer.write(ln, cd)
                    writer.write(s, v if v >= 0 else v + (1 << s) - 1)
                    run = 0
                if last < 63:
                    ln, cd = ac_codes[0x00]
                    writer.write(ln, cd)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_entropy_block(writer, zz, pred: int, dc_codes, ac_codes) -> int:
    """Huffman-write one quantized block (zigzag order); returns the
    new DC predictor. Identical coding to the baseline encoder's
    inline loop, factored for the subsampled-MCU encoder."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _size_cat(diff)
    ln, cd = dc_codes[s]
    writer.write(ln, cd)
    if s:
        writer.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, cd = ac_codes[0xF0]
            writer.write(ln, cd)
            run -= 16
        s = _size_cat(v)
        ln, cd = ac_codes[(run << 4) | s]
        writer.write(ln, cd)
        writer.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if last < 63:
        ln, cd = ac_codes[0x00]
        writer.write(ln, cd)
    return pred


def encode_jpeg_420(img: np.ndarray, *, quality: int = 85) -> bytes:
    """Baseline sequential JPEG with 4:2:0 CHROMA SUBSAMPLING -- the
    wild web's dominant color layout (2x2 luma blocks + one Cb + one
    Cr per MCU, chroma box-averaged 2x2). (H, W, 3) uint8 RGB with H
    and W multiples of 16 (no partial-MCU padding -- the synthesized
    gate rasters are whole-MCU by construction; pad externally for
    arbitrary sizes). The decoder (`decode_jpeg_baseline`) already
    handles arbitrary sampling factors; this provides the encode half
    so the subsampled path is round-trippable hermetically.

    The chroma mean is computed as ((tl + tr) + bl) + br) * 0.25 --
    a fixed association, exact for the flat super-blocks the DCT gate
    synthesizes (multimodal_features_dct420's oracle leans on it)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_420 takes (H, W, 3) RGB")
    h, w = img.shape[0], img.shape[1]
    if h % 16 or w % 16:
        raise ValueError("H and W must be multiples of 16 (whole MCUs)")
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)

    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # 2x2 box mean, fixed association (see docstring)
    def _sub(p):
        return (
            ((p[0::2, 0::2] + p[0::2, 1::2]) + p[1::2, 0::2])
            + p[1::2, 1::2]
        ) * 0.25

    cb_s, cr_s = _sub(cb), _sub(cr)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt[_ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0])  # Y: h=v=2
    out += bytes([2, 0x11, 1])
    out += bytes([3, 0x11, 1])
    for tc_th, (bits, values) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA),
        (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += b"\x00\x3f\x00"

    def _qblocks(plane, qt):
        blocks = _blockify(plane) - 128.0
        coef = _dct2(blocks)
        return np.round(coef / qt.reshape(8, 8)).astype(np.int32)

    qy = _qblocks(y, qt_l).reshape(-1, 64)
    qcb = _qblocks(cb_s, qt_c).reshape(-1, 64)
    qcr = _qblocks(cr_s, qt_c).reshape(-1, 64)
    # _blockify is row-major over (h//8, w//8): index = by * bw + bx
    bw_y, bw_c = w // 8, w // 16

    writer = _BitWriter()
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    preds = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for v in range(2):
                for hh in range(2):
                    blk = qy[(my * 2 + v) * bw_y + (mx * 2 + hh)]
                    preds[0] = _write_entropy_block(
                        writer, blk[_ZIGZAG], preds[0], dc_l, ac_l
                    )
            preds[1] = _write_entropy_block(
                writer, qcb[my * bw_c + mx][_ZIGZAG], preds[1], dc_c, ac_c
            )
            preds[2] = _write_entropy_block(
                writer, qcr[my * bw_c + mx][_ZIGZAG], preds[2], dc_c, ac_c
            )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _emit_sos(out: bytearray, comps, ss: int, se: int, ah: int, al: int):
    """comps: list of (component_id, dc_table_id, ac_table_id)."""
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, td, ta in comps:
        out += bytes([cid, (td << 4) | ta])
    out += bytes([ss, se, (ah << 4) | al])


def _encode_ac_first(writer, zz, ss, se, al, ac_codes) -> None:
    """AC first scan for one block: run-length + size over the
    point-transformed magnitudes sign*(|v| >> Al); EOB per block."""
    run = 0
    emitted = False
    last = ss - 1
    vals = {}
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)
        if t:
            vals[k] = t
            last = k
    for k in range(ss, last + 1):
        t = vals.get(k)
        if t is None:
            run += 1
            continue
        while run > 15:
            ln, cd = ac_codes[0xF0]
            writer.write(ln, cd)
            run -= 16
        s = _size_cat(t)
        ln, cd = ac_codes[(run << 4) | s]
        writer.write(ln, cd)
        writer.write(s, t if t >= 0 else t + (1 << s) - 1)
        run = 0
        emitted = True
    if last < se or not emitted:
        ln, cd = ac_codes[0x00]  # EOB (EOBRUN = 1)
        writer.write(ln, cd)


def _encode_ac_refine(writer, zz, ss, se, ah, al, ac_codes) -> None:
    """AC refinement scan for one block, mirroring the decoder's walk
    (T.81 G.1.2.3): per emitted symbol, correction bits for the
    history-nonzero coefficients inside THAT symbol's span follow the
    symbol (and its sign bit) immediately."""

    def hist(k):
        return (abs(int(zz[k])) >> ah) != 0

    def now(k):
        return (abs(int(zz[k])) >> al) != 0

    def corr_bit(k):
        return (abs(int(zz[k])) >> al) & 1

    newly = [
        t for t in range(ss, se + 1) if not hist(t) and now(t)
    ]
    p = ss
    for t in newly:
        zeros = [u for u in range(p, t) if not hist(u) and not now(u)]
        run = len(zeros)
        while run > 15:
            z16 = zeros[15]
            ln, cd = ac_codes[0xF0]  # ZRL spans 16 zero-history coefs
            writer.write(ln, cd)
            for u in range(p, z16 + 1):
                if hist(u):
                    writer.write(1, corr_bit(u))
            p = z16 + 1
            zeros = zeros[16:]
            run -= 16
        ln, cd = ac_codes[(run << 4) | 1]
        writer.write(ln, cd)
        writer.write(1, 1 if int(zz[t]) > 0 else 0)
        for u in range(p, t):
            if hist(u):
                writer.write(1, corr_bit(u))
        p = t + 1
    if p <= se:
        ln, cd = ac_codes[0x00]  # EOB; decoder's eobrun tail reads the rest
        writer.write(ln, cd)
        for u in range(p, se + 1):
            if hist(u):
                writer.write(1, corr_bit(u))


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 85) -> bytes:
    """Progressive (SOF2) JPEG encoder: same quantized coefficients as
    the baseline encoder, emitted as a standard progressive scan script
    with BOTH spectral selection and successive approximation --

        1. DC, all components, Al=1
        2. AC 1..63 per component, Al=1
        3. DC refinement (Ah=1, Al=0)
        4. AC refinement 1..63 per component (Ah=1, Al=0)

    Because the scans transmit exactly the quantized coefficients, a
    decode of this stream is IDENTICAL (array-equal) to a decode of
    encode_jpeg_baseline at the same quality -- the roundtrip test's
    equivalence gate."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    qt_l = _quality_scale(_QT_LUMA, quality)
    qt_c = _quality_scale(_QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt[_ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x11, 0 if cid == 1 else 1])
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc_th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)

    dc_l, ac_l = _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)
    dc_c, ac_c = _canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)
    # 4:4:4: every component shares one block grid; zigzag-order coefs
    comp_zz = []
    for ci, plane in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        blocks = _blockify(plane) - 128.0
        q = np.round(_dct2(blocks) / qt.reshape(8, 8)).astype(np.int32)
        comp_zz.append(q.reshape(len(q), 64)[:, _ZIGZAG])
    n_blocks = len(comp_zz[0])
    scomps = [
        (cid, 0 if cid == 1 else 1, 0 if cid == 1 else 1)
        for cid in range(1, ncomp + 1)
    ]

    # scan 1: DC all components, Al=1
    _emit_sos(out, scomps, 0, 0, 0, 1)
    writer = _BitWriter()
    preds = [0] * ncomp
    for bi in range(n_blocks):
        for ci in range(ncomp):
            dc_codes = dc_l if ci == 0 else dc_c
            v = int(comp_zz[ci][bi][0]) >> 1  # arithmetic shift = T.81 DC P.T.
            diff = v - preds[ci]
            preds[ci] = v
            s = _size_cat(diff)
            ln, cd = dc_codes[s]
            writer.write(ln, cd)
            if s:
                writer.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
    writer.flush()
    out += writer.out

    # scans 2..: AC 1..63 per component, Al=1
    for ci in range(ncomp):
        _emit_sos(out, [scomps[ci]], 1, 63, 0, 1)
        writer = _BitWriter()
        ac_codes = ac_l if ci == 0 else ac_c
        for bi in range(n_blocks):
            _encode_ac_first(writer, comp_zz[ci][bi], 1, 63, 1, ac_codes)
        writer.flush()
        out += writer.out

    # DC refinement: one raw bit per block per component
    _emit_sos(out, scomps, 0, 0, 1, 0)
    writer = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(ncomp):
            writer.write(1, int(comp_zz[ci][bi][0]) & 1)
    writer.flush()
    out += writer.out

    # AC refinement per component
    for ci in range(ncomp):
        _emit_sos(out, [scomps[ci]], 1, 63, 1, 0)
        writer = _BitWriter()
        ac_codes = ac_l if ci == 0 else ac_c
        for bi in range(n_blocks):
            _encode_ac_refine(writer, comp_zz[ci][bi], 1, 63, 1, 0, ac_codes)
        writer.flush()
        out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


# -- decoder ---------------------------------------------------------------

def decode_jpeg_baseline(content: bytes) -> np.ndarray:
    """JPEG decoder: baseline sequential (SOF0/1) and PROGRESSIVE
    (SOF2 -- spectral selection + successive approximation per T.81
    G.1.2, the wild web's dominant encode mode). Returns (H, W) uint8
    for grayscale streams, (H, W, 3) uint8 RGB for YCbCr streams.
    (The name keeps the original public API; progressive support was
    added once the shared Huffman/IDCT machinery existed.)"""
    data = bytes(content or b"")
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    progressive = False
    lossless = False
    lossless_precision = 8
    coefs: dict[int, np.ndarray] | None = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq == 0:
                    tab = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=off + 1
                    ).astype(np.int32)
                    off += 65
                else:  # pq=1: 16-bit entries (the 12-bit-sample form)
                    tab = np.frombuffer(
                        body, dtype=">u2", count=64, offset=off + 1
                    ).astype(np.int32)
                    off += 129
                qtables[tq] = tab[_UNZIGZAG]  # natural order
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                nval = sum(bits)
                values = list(body[off + 17:off + 17 + nval])
                htables[(tc, th)] = _decode_table(bits, values)
                off += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1, SOF2, SOF3
            precision = body[0]
            if marker != 0xC3 and precision not in (8, 12):
                raise NotImplementedError(f"{precision}-bit JPEG")
            if marker == 0xC3 and not 2 <= precision <= 16:
                raise NotImplementedError(
                    f"{precision}-bit lossless JPEG"
                )
            hgt, wid = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            sof = (hgt, wid, comps)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            lossless_precision = precision
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (arithmetic/"
                "hierarchical) not supported; SOF0/1/2/3 only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise NotImplementedError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            if lossless:
                pred_sel = body[1 + 2 * ns]
                pt_bits = body[3 + 2 * ns] & 0x0F
                return _decode_lossless_scan(
                    data, pos + seglen, sof, scan, htables,
                    pred_sel, pt_bits, lossless_precision,
                )
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, sof, scan, qtables, htables,
                    restart_interval, precision=lossless_precision,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if coefs is None:
                coefs = _alloc_prog_coefs(sof)
            pos = _decode_prog_scan(
                data, pos + seglen, sof, coefs, scan, ss, se, ah, al,
                htables, restart_interval,
            )
            continue
        pos += seglen
    if progressive and coefs is not None:
        return _reconstruct_progressive(
            sof, coefs, qtables, precision=lossless_precision
        )
    raise NotImplementedError("JPEG stream had no SOS scan")


def _mcu_grid(sof):
    hgt, wid, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (wid + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hgt + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_block_dims(sof, c):
    """Non-interleaved scan block grid: ceil of the COMPONENT's sample
    dims over 8 (T.81 A.2.2), which can be smaller than the MCU-padded
    grid."""
    hgt, wid, comps = sof
    hmax, vmax, _, _ = _mcu_grid(sof)
    cw = (wid * c["h"] + hmax - 1) // hmax
    ch = (hgt * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _alloc_prog_coefs(sof):
    """Per-component coefficient store in ZIGZAG index order, sized to
    the MCU-padded block grid (interleaved DC scans cover the padding)."""
    _, _, mcux, mcuy = _mcu_grid(sof)
    _, _, comps = sof
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _read_symbol(reader, table) -> int:
    length, code = 0, 0
    while True:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise NotImplementedError("corrupt Huffman stream")


def _decode_prog_scan(
    data, pos, sof, coefs, scan, ss, se, ah, al, htables, restart_interval
):
    """One progressive scan (T.81 G.1.2): DC first/refinement
    (interleaved or single-component), AC first/refinement with EOB
    runs and successive-approximation correction bits. Returns the
    stream position after the scan's entropy segment."""
    hgt, wid, comps = sof
    by_id = {c["id"]: c for c in comps}
    hmax, vmax, mcux, mcuy = _mcu_grid(sof)
    reader = _BitReader(data, pos)

    if ss == 0:
        if se != 0:
            raise NotImplementedError(
                "invalid progressive DC scan (Ss=0 requires Se=0)"
            )
        scomps = [by_id[cs] for cs, _, _ in scan]
        dc_tabs = {
            cs: htables.get((0, td)) for cs, td, _ in scan
        }
        preds = {c["id"]: 0 for c in scomps}
        # walk order: interleaved MCU for multi-component scans, raster
        # over the component grid otherwise
        if len(scan) > 1:
            units = (
                (c, my * c["v"] + v, mx * c["h"] + h)
                for my in range(mcuy) for mx in range(mcux)
                for c in scomps
                for v in range(c["v"]) for h in range(c["h"])
            )
            ri_units = restart_interval * sum(
                c["v"] * c["h"] for c in scomps
            )
        else:
            c0 = scomps[0]
            cbh, cbw = _comp_block_dims(sof, c0)
            units = ((c0, by, bx) for by in range(cbh) for bx in range(cbw))
            ri_units = restart_interval
        count = 0
        for c, by, bx in units:
            if ri_units and count and count % ri_units == 0:
                reader.align_and_restart()
                for cid in preds:
                    preds[cid] = 0
            count += 1
            blk = coefs[c["id"]][by, bx]
            if ah == 0:
                s = _read_symbol(reader, dc_tabs[c["id"]])
                diff = _extend(reader.receive(s), s)
                preds[c["id"]] += diff
                blk[0] = preds[c["id"]] << al
            else:
                if reader.read_bit():
                    blk[0] |= 1 << al
        return reader.pos

    # AC scan: always single-component (T.81 G.1.1.1)
    if len(scan) != 1:
        raise NotImplementedError("interleaved progressive AC scan")
    cs, _, ta = scan[0]
    c = by_id[cs]
    ac_tab = htables[(1, ta)]
    cbh, cbw = _comp_block_dims(sof, c)
    arr = coefs[c["id"]]
    eobrun = 0
    count = 0
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and count and count % restart_interval == 0:
                reader.align_and_restart()
                eobrun = 0
            count += 1
            blk = arr[by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _read_symbol(reader, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += r
                    if k > se:
                        raise NotImplementedError(
                            "AC index overflow (corrupt progressive stream)"
                        )
                    blk[k] = _extend(reader.receive(s), s) << al
                    k += 1
            else:
                eobrun = _ac_refine_block(
                    reader, blk, ss, se, al, eobrun, ac_tab
                )
    return reader.pos


def _ac_refine_block(reader, blk, ss, se, al, eobrun, ac_tab) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / the libjpeg decode_mcu_AC_refine walk): correction bits
    for history-nonzero coefficients interleave positionally with
    newly-significant +-1 insertions. An EOB symbol ends the CURRENT
    block by consuming its remaining correction bits and then skips
    the next (run - 1) whole blocks (their correction bits are read
    by the eobrun>0 entry branch). Returns the residual EOB run."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k):
        if reader.read_bit() and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    def tail(k):
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1

    k = ss
    if eobrun > 0:
        # this whole block sits inside a previous EOB run: correction
        # bits only
        tail(k)
        return eobrun - 1
    while k <= se:
        rs = _read_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                new_run = (1 << r) - 1
                if r:
                    new_run += reader.receive(r)
                tail(k)  # current block's remaining correction bits
                return new_run
            val = 0  # ZRL: span 16 zero-history coefficients
        else:
            if s != 1:
                raise NotImplementedError(
                    "invalid refinement magnitude (corrupt stream)"
                )
            val = p1 if reader.read_bit() else m1
        while k <= se:
            if blk[k] != 0:
                correct(k)
            else:
                if r == 0:
                    if s:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return 0


def _reconstruct_progressive(sof, coefs, qtables, precision: int = 8):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks per component), then the same assemble/upsample/
    color path as the baseline decoder."""
    hgt, wid, comps = sof
    planes = {}
    for c in comps:
        arr = coefs[c["id"]]  # (bh, bw, 64) zigzag order
        bh, bw = arr.shape[0], arr.shape[1]
        qt = qtables[c["tq"]]
        flat = arr.reshape(-1, 64).astype(np.float64) * qt
        nat = flat[:, _UNZIGZAG].reshape(-1, 8, 8)
        blocks = _idct2(nat) + float(1 << (precision - 1))
        planes[c["id"]] = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
    return _assemble_planes(sof, planes, precision=precision)


def _assemble_planes(sof, planes, precision: int = 8):
    hgt, wid, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    center = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    dtype = np.uint8 if precision <= 8 else np.uint16
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:hgt, :wid])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, maxval).astype(dtype)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    b = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, maxval).astype(dtype)


def _decode_scan(data, pos, sof, scan, qtables, htables, restart_interval,
                 precision: int = 8):
    hgt, wid, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (wid + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hgt + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        order.append((c, htables[(0, td)], htables[(1, ta)]))

    planes = {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0

    def read_symbol(table) -> int:
        length, code = 0, 0
        while True:
            code = (code << 1) | reader.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 16:
                raise NotImplementedError("corrupt Huffman stream")

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_and_restart()
                for cid in preds:
                    preds[cid] = 0
            mcu_count += 1
            for c, dc_tab, ac_tab in order:
                qt = qtables[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = read_symbol(dc_tab)
                        diff = _extend(reader.receive(s), s)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = read_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError(
                                    "AC index overflow (corrupt stream)"
                                )
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef = (zz * qt)[_UNZIGZAG].reshape(8, 8)
                        blk = _idct2(coef[None])[0] + float(
                            1 << (precision - 1)
                        )
                        py = (my * c["v"] + v) * 8
                        px = (mx * c["h"] + hh) * 8
                        planes[c["id"]][py:py + 8, px:px + 8] = blk

    return _assemble_planes(sof, planes, precision=precision)


# -- lossless (SOF3) -------------------------------------------------------
#
# T.81 Annex H: Huffman-coded prediction residuals, no DCT, no
# quantization -- the archival/medical JPEG mode (and DNG's raw
# container). Reuses the shared canonical-Huffman + stuffed-bit IO
# machinery; residual coding is the DC difference scheme with the one
# lossless extension (SSSS = 16 carries NO extra bits and means
# +32768). All sample arithmetic is modulo 2^16 per H.1.2.1, so
# encode->decode round-trips EXACTLY at any precision 2..16.

# Diff-category table covering SSSS 0..16 (the baseline DC tables stop
# at 11): three 2-bit codes then one code per length 3..16. Kraft sum
# 1 - 2^-16, so the all-ones code stays unused as T.81 requires.
_DC_LOSSLESS = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    list(range(17)),
)

_LOSSLESS_PREDICTORS = frozenset(range(1, 8))


def _predict(ra: int, rb: int, rc: int, predictor: int) -> int:
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # predictor 7


def encode_jpeg_lossless(
    img: np.ndarray, *, predictor: int = 4, point_transform: int = 0
) -> bytes:
    """Lossless JPEG (SOF3) encoder: (H, W) uint8/uint16 grayscale or
    (H, W, 3) uint8 RGB (components coded independently, interleaved
    one sample per MCU). ``predictor`` selects T.81 H.1 predictors
    1-7 (4 = Ra+Rb-Rc, the common default); ``point_transform``
    drops Pt low bits before coding (0 = fully lossless)."""
    img = np.asarray(img)
    if img.dtype == np.uint16:
        precision = 16
    elif img.dtype == np.uint8:
        precision = 8
    else:
        raise ValueError(f"lossless JPEG needs uint8/uint16, got {img.dtype}")
    if predictor not in _LOSSLESS_PREDICTORS:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    pt = int(point_transform)
    if not 0 <= pt < precision:
        raise ValueError(f"point_transform must be in [0, {precision})")
    h, w = img.shape[0], img.shape[1]
    planes = (
        [img.astype(np.int64)] if img.ndim == 2
        else [img[:, :, c].astype(np.int64) for c in range(img.shape[2])]
    )
    planes = [p >> pt for p in planes]
    ncomp = len(planes)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp
    )
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x11, 0])  # h=v=1; Tq unused in lossless
    bits, values = _DC_LOSSLESS
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), 0x00)
    out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00])
    out += bytes([predictor, 0, pt])  # Ss = predictor, Se = 0, Ah:Al

    codes = _canonical_codes(bits, values)
    writer = _BitWriter()
    default_pred = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for p in planes:
                if y == 0 and x == 0:
                    px = default_pred
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    px = _predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor,
                    )
                diff = (int(p[y, x]) - px) & 0xFFFF
                sdiff = diff - 0x10000 if diff >= 0x8000 else diff
                if diff == 0x8000:
                    ln, cd = codes[16]
                    writer.write(ln, cd)  # SSSS=16: no extra bits
                    continue
                s = _size_cat(sdiff)
                ln, cd = codes[s]
                writer.write(ln, cd)
                if s:
                    writer.write(
                        s, sdiff if sdiff >= 0 else sdiff + (1 << s) - 1
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless_scan(
    data: bytes, pos: int, sof, scan, htables, predictor: int, pt: int,
    precision: int,
) -> np.ndarray:
    hgt, wid, comps = sof
    if predictor not in _LOSSLESS_PREDICTORS:
        raise NotImplementedError(
            f"lossless predictor {predictor} out of range"
        )
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "subsampled lossless JPEG components not supported"
        )
    order = []
    for cs, td, _ in scan:
        idx = next(i for i, c in enumerate(comps) if c["id"] == cs)
        table = htables.get((0, td))
        if table is None:
            raise NotImplementedError(f"missing DC huffman table {td}")
        order.append((idx, table))
    planes = [np.zeros((hgt, wid), dtype=np.int64) for _ in comps]
    reader = _BitReader(data, pos)
    default_pred = 1 << (precision - pt - 1)
    for y in range(hgt):
        for x in range(wid):
            for idx, table in order:
                p = planes[idx]
                if y == 0 and x == 0:
                    px = default_pred
                elif y == 0:
                    px = int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    px = _predict(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor,
                    )
                s = _read_symbol(reader, table)
                if s == 16:
                    sdiff = 32768
                elif s:
                    sdiff = _extend(reader.receive(s), s)
                else:
                    sdiff = 0
                p[y, x] = (px + sdiff) & 0xFFFF
    shifted = [(p << pt) & ((1 << 16) - 1) for p in planes]
    dtype = np.uint8 if precision <= 8 else np.uint16
    if len(shifted) == 1:
        return shifted[0].astype(dtype)
    return np.stack([p.astype(dtype) for p in shifted], axis=2)


# -- 12-bit extended sequential (SOF1) -------------------------------------

def encode_jpeg_extended12(
    img: np.ndarray, *, quality: int = 85
) -> bytes:
    """Extended-sequential JPEG (SOF1) at 12-bit precision: (H, W)
    uint16 grayscale with samples < 4096 -- the medical/scientific
    DCT mode. Same pipeline as baseline with three precision changes:
    level shift 2048, quantization tables scaled x16 and emitted as
    16-bit DQT entries (Pq=1), and a >=32 floor on the scaled entries
    so every quantized coefficient stays within the standard Huffman
    tables' size categories (max |DCT coef| ~ 8*2048 -> <= 512 after
    division, category <= 10) at ANY quality."""
    img = np.asarray(img)
    if img.dtype != np.uint16 or img.ndim != 2:
        raise ValueError("12-bit JPEG needs (H, W) uint16 samples")
    if int(img.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be < 4096")
    h, w = img.shape
    qt = np.clip(_quality_scale(_QT_LUMA, quality) * 16, 32, 65535).astype(
        np.int64
    )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 131, 0x10)  # Pq=1, Tq=0
    for x in qt[_ZIGZAG]:
        out += struct.pack(">H", int(x))
    out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, h, w, 1)
    out += bytes([1, 0x11, 0])
    for tc_th, (bits, values) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += bytes([1, 0x00]) + b"\x00\x3f\x00"

    blocks = _blockify(img.astype(np.float64)) - 2048.0
    coef = _dct2(blocks)
    qblocks = np.round(coef / qt.reshape(8, 8)).astype(np.int32)
    writer = _BitWriter()
    _encode_component(
        writer, qblocks.reshape(len(qblocks), 64),
        _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA),
    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
