"""FLAC codec in pure stdlib + numpy: the lossless audio format web
and podcast corpora carry alongside WAV/MP3.

Implements the public xiph.org FLAC format specification (RFC 9639):
stream = 'fLaC' magic + metadata blocks (STREAMINFO parsed, others
skipped) + frames. Each frame: a sync-coded header (CRC-8 protected,
UTF-8-style coded frame number), one subframe per channel -- CONSTANT,
VERBATIM, FIXED (orders 0-4, the spec's hardwired polynomial
predictors) or LPC (quantized coefficients + shift) -- with Rice-coded
residual partitions (4- or 5-bit parameters, escape to raw), optional
wasted-bits shift, stereo decorrelation (left/side, right/side,
mid/side), byte alignment and a CRC-16 frame footer. Both CRCs are
verified on decode and produced on encode; polynomials are checked
against published check values in the tests.

``encode_flac`` is the hermetic round-trip companion: fixed-order-2
prediction with a size-searched Rice parameter per frame (VERBATIM
fallback when prediction loses), independent channels, frame-indexed
blocking -- a small but spec-shaped encoder whose output any FLAC
decoder reads.

Scale shape: identical to the other codecs -- decode is a per-row
Pandas-UDF work unit behind cheap metadata filters; nothing about the
distributed plan changes if a native decoder is slotted in instead.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def crc8(data: bytes) -> int:
    """CRC-8, polynomial 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 (FLAC frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos  # byte position of the NEXT unread byte
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated FLAC stream")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self._acc = 0
        self._n = 0


class _BitWriter:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.out)


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's extended-UTF-8 coded number (frame/sample index)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise NotImplementedError("invalid UTF-8 coded frame number")
    v = b0 & (mask - 1)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # count payload bits -> continuation bytes
    for n in range(2, 8):
        if v < (1 << (5 * n + 1)):
            break
    bw.write((0xFF00 >> n) & 0xFF | (v >> (6 * (n - 1))), 8)
    for i in range(n - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


_BLOCKSIZE_CODES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved residual coding method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    po = br.read(3)
    nparts = 1 << po
    if blocksize % nparts:
        raise NotImplementedError("invalid rice partition order")
    out: list[int] = []
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        param = br.read(param_bits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise NotImplementedError("invalid subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise NotImplementedError("invalid LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise NotImplementedError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(content: bytes):
    """FLAC bytes -> (samples int32 (n, channels), sample_rate, bps).
    Verifies the magic, both frame CRCs, and STREAMINFO consistency."""
    data = bytes(content or b"")
    if data[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC stream")
    pos = 4
    sr = channels = bps = total = None
    while True:
        if pos + 4 > len(data):
            raise NotImplementedError("truncated FLAC metadata")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = (
                (body[13] & 0x0F) << 32
            ) | int.from_bytes(body[14:18], "big")
        pos += 4 + length
        if hdr & 0x80:
            break
    if sr is None:
        raise NotImplementedError("FLAC stream missing STREAMINFO")

    out = []
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0x3FFE:
            raise NotImplementedError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code == 0:
            raise NotImplementedError("reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif 2 <= bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        header_len = br.pos - frame_start
        expect_crc8 = br.read(8)
        if crc8(data[frame_start:frame_start + header_len]) != expect_crc8:
            raise NotImplementedError("FLAC frame header CRC mismatch")
        frame_bps = bps if ss_code == 0 else {
            1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32
        }.get(ss_code)
        if frame_bps is None:
            raise NotImplementedError("reserved sample size code")

        if chan_code <= 7:
            chans = [
                _decode_subframe(br, blocksize, frame_bps)
                for _ in range(chan_code + 1)
            ]
        elif chan_code == 8:  # left/side
            left = _decode_subframe(br, blocksize, frame_bps)
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif chan_code == 9:  # right/side
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            right = _decode_subframe(br, blocksize, frame_bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        elif chan_code == 10:  # mid/side
            mid = _decode_subframe(br, blocksize, frame_bps)
            side = _decode_subframe(br, blocksize, frame_bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            chans = [left, right]
        else:
            raise NotImplementedError("reserved channel assignment")
        br.align()
        body_end = br.pos
        expect_crc16 = _BitReader(data, body_end).read(16)
        if crc16(data[frame_start:body_end]) != expect_crc16:
            raise NotImplementedError("FLAC frame CRC mismatch")
        pos = body_end + 2
        out.append(np.array(chans, dtype=np.int64).T)

    samples = np.concatenate(out, axis=0) if out else np.zeros((0, channels))
    if total and samples.shape[0] > total:
        samples = samples[:total]
    return samples.astype(np.int32), sr, bps


def _best_rice(resid: list[int]) -> tuple[int, int]:
    """(param, total bits) minimizing the Rice-coded size."""
    best_param, best_bits = 0, None
    for param in range(15):
        bits = 0
        for r in resid:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bits += (u >> param) + 1 + param
            if best_bits is not None and bits > best_bits:
                break
        if best_bits is None or bits < best_bits:
            best_param, best_bits = param, bits
    return best_param, best_bits


def _write_residual(bw: _BitWriter, resid: list[int]) -> None:
    best_param, _ = _best_rice(resid)
    bw.write(0, 2)   # 4-bit rice method
    bw.write(0, 3)   # partition order 0
    bw.write(best_param, 4)
    for r in resid:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = u >> best_param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(u & ((1 << best_param) - 1), best_param)


def encode_flac(
    samples: np.ndarray, *, sample_rate: int = 8000, bps: int = 16,
    blocksize: int = 4096,
) -> bytes:
    """(n,) or (n, channels) int samples -> FLAC bytes. Per channel
    per frame the encoder picks fixed-order-2 prediction with a
    size-searched Rice parameter, falling back to VERBATIM when
    prediction does not win -- small, spec-shaped, losslessly
    round-trippable."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    s = s.astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if s.min(initial=0) < lo or s.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    # MD5 of the raw interleaved little-endian signal (STREAMINFO field)
    width = (bps + 7) // 8
    inter = s.astype(f"<i{width}" if width in (1, 2, 4) else "<i4")
    md5 = hashlib.md5(inter.tobytes()).digest()

    frames = bytearray()
    max_frame = 0
    min_frame = None
    for fi, start in enumerate(range(0, n, blocksize)):
        block = s[start:start + blocksize]
        bsz = block.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)          # block size: 16-bit field follows
        bw.write(0, 4)          # sample rate: from STREAMINFO
        bw.write(channels - 1, 4)
        bw.write(_SAMPLE_SIZE_CODES[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, fi)
        bw.write(bsz - 1, 16)
        bw.align()
        hdr = bw.bytes()
        frame = bytearray(hdr)
        frame.append(crc8(hdr))
        body = _BitWriter()
        for c in range(channels):
            ch = block[:, c].tolist()
            body.write(0, 1)
            if bsz > 2:
                resid = [
                    ch[i] - 2 * ch[i - 1] + ch[i - 2] for i in range(2, bsz)
                ]
                verb_bits = bsz * bps
                pred_bits = 2 * bps + 9 + _best_rice(resid)[1]
                use_fixed = pred_bits < verb_bits
            else:
                use_fixed = False
            if use_fixed:
                body.write(10, 6)  # FIXED order 2
                body.write(0, 1)   # no wasted bits
                body.write_signed(ch[0], bps)
                body.write_signed(ch[1], bps)
                _write_residual(body, resid)
            else:
                body.write(1, 6)   # VERBATIM
                body.write(0, 1)
                for v in ch:
                    body.write_signed(v, bps)
        body.align()
        frame += body.bytes()
        frame += struct.pack(">H", crc16(bytes(frame)))
        frames += frame
        max_frame = max(max_frame, len(frame))
        min_frame = len(frame) if min_frame is None else min(min_frame, len(frame))

    info = bytearray()
    info += struct.pack(">HH", blocksize, blocksize)
    info += (min_frame or 0).to_bytes(3, "big")
    info += max_frame.to_bytes(3, "big")
    # 20-bit sr | 3-bit channels-1 | 5-bit bps-1 | 36-bit total
    packed = (sample_rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    info += packed.to_bytes(8, "big")
    info += md5
    assert len(info) == 34
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info) + bytes(frames)
