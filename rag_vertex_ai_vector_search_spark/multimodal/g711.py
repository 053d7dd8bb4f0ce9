"""G.711 companded audio: µ-law / A-law WAV decode + encode.

The reference pipeline ingests text only (`embeddings.py:132-155` in the
public reference); the multimodal surface extends it with opaque binary
columns (SURVEY §2.3).  Telephony corpora arrive overwhelmingly as G.711
WAVs (RIFF ``wFormatTag`` 7 = µ-law, 6 = A-law, one byte per sample), a
format the stdlib ``wave`` module rejects ("unknown format"), so without
this module every such asset lands in the DECODE_UNSUPPORTED bucket.

Both laws expand through a CLOSED-FORM integer formula (ITU-T G.711 /
the public-domain Sun ``g711.c`` tables), which makes the decode
SQL-mirrorable: a planted-bytes query can predict every output sample in
DuckDB integer arithmetic while the Spark side earns the same numbers
through the real RIFF parser + expander (the
``synthesize_media_with_defects`` pattern, synthesis.py).

Spec anchors (catalog values, used by tests — self-round-trip alone can
mask symmetric bugs):

- µ-law byte 0x00 -> -32124, 0x80 -> +32124, 0xFF -> 0, 0x7F -> 0
- A-law byte 0x55 -> -8,     0xD5 -> +8,     0x2A -> -32256 (full scale)

Scale shape: decode is a per-asset LUT gather inside the existing
``extract_audio_features`` mapInPandas stage — no shuffle, no new plan
nodes; 100 TB of G.711 decodes exactly like 100 TB of PCM.
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # 132, µ-law bias
_ULAW_CLIP = 32635

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def _build_ulaw_table() -> np.ndarray:
    """256-entry µ-law -> linear int16 expansion table.

    ulaw2linear(b): u = ~b; mag = (((u & 0x0F) << 3) + 132) << ((u &
    0x70) >> 4); sign bit of u picks 132 - mag vs mag - 132.
    """
    table = np.zeros(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        mag = (((u & 0x0F) << 3) + _BIAS) << ((u & 0x70) >> 4)
        table[b] = (_BIAS - mag) if (u & 0x80) else (mag - _BIAS)
    return table


def _build_alaw_table() -> np.ndarray:
    """256-entry A-law -> linear int16 expansion table.

    alaw2linear(b): a = b ^ 0x55; quant = a & 0x0F, seg = (a & 0x70)
    >> 4; seg 0 -> (q<<4)+8, seg 1 -> (q<<4)+0x108, seg>=2 ->
    ((q<<4)+0x108) << (seg-1); sign bit SET means positive.
    """
    table = np.zeros(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        q = a & 0x0F
        seg = (a & 0x70) >> 4
        if seg == 0:
            mag = (q << 4) + 8
        elif seg == 1:
            mag = (q << 4) + 0x108
        else:
            mag = ((q << 4) + 0x108) << (seg - 1)
        table[b] = mag if (a & 0x80) else -mag
    return table


ULAW_DECODE_TABLE = _build_ulaw_table()
ALAW_DECODE_TABLE = _build_alaw_table()

# Encoders as nearest-codeword quantizers over the decode tables: exact
# inverses on codeword values (the only property the round-trip tests
# and synthesis need) and the MSE-optimal compander everywhere else.
# Ties break toward the lower linear value; among bytes decoding to the
# same value (µ-law 0x7F/0xFF both -> 0) the smaller byte wins.
def _build_encoder(decode_table: np.ndarray):
    order = np.lexsort((np.arange(256), decode_table.astype(np.int32)))
    sorted_vals = decode_table.astype(np.int32)[order]
    # first byte per distinct value
    first = np.ones(256, dtype=bool)
    first[1:] = sorted_vals[1:] != sorted_vals[:-1]
    vals = sorted_vals[first]
    bytes_for_val = order[first].astype(np.uint8)
    mids = (vals[:-1] + vals[1:]) / 2.0

    def encode(pcm: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, np.asarray(pcm, dtype=np.float64))
        return bytes_for_val[idx]

    return encode


linear2ulaw = _build_encoder(ULAW_DECODE_TABLE)
linear2alaw = _build_encoder(ALAW_DECODE_TABLE)


def parse_wav_chunks(data: bytes) -> dict:
    """Minimal RIFF/WAVE chunk walk: returns fmt fields + raw data
    bytes.  Raises ValueError on a malformed container (the counted-
    skip contract classifies that as DECODE_CORRUPT)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            tag, ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            fmt = {
                "format_tag": tag, "channels": ch,
                "sample_rate": sr, "bits_per_sample": bits,
            }
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated data chunk")
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    fmt["data"] = payload
    return fmt


def decode_wav_g711(data: bytes) -> tuple[np.ndarray, int]:
    """G.711 WAV -> (int16 samples shaped (n_frames, channels), rate)."""
    info = parse_wav_chunks(data)
    tag, ch = info["format_tag"], info["channels"]
    if tag not in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        raise NotImplementedError(f"not a G.711 WAV (format tag {tag})")
    if info["bits_per_sample"] != 8:
        raise ValueError(
            f"G.711 is 8 bits/sample, fmt says {info['bits_per_sample']}"
        )
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    raw = np.frombuffer(info["data"], dtype=np.uint8)
    if raw.size % ch:
        raise ValueError("data chunk does not frame-align")
    table = (
        ULAW_DECODE_TABLE if tag == WAVE_FORMAT_MULAW else ALAW_DECODE_TABLE
    )
    return table[raw].reshape(-1, ch), info["sample_rate"]


def encode_wav_g711_bytes(
    codewords: bytes | np.ndarray,
    *,
    law: str = "ulaw",
    sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """Wrap pre-companded G.711 codeword bytes in a RIFF/WAVE container
    (``wave`` cannot write non-PCM fmt tags, so the header is
    hand-rolled — 18-byte fmt with cbSize=0 plus the ``fact`` chunk
    non-PCM WAVs are required to carry)."""
    payload = bytes(bytearray(np.asarray(codewords, dtype=np.uint8)))
    tag = WAVE_FORMAT_MULAW if law == "ulaw" else WAVE_FORMAT_ALAW
    n_frames = len(payload) // channels
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, sample_rate,
        sample_rate * channels, channels, 8, 0,
    )
    fact = struct.pack("<I", n_frames)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(
    sig: np.ndarray,
    *,
    law: str = "ulaw",
    sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """float [-1, 1] signal -> companded G.711 WAV bytes."""
    pcm = (np.clip(np.asarray(sig, dtype=np.float64), -1, 1) * 32767.0)
    enc = linear2ulaw if law == "ulaw" else linear2alaw
    codes = enc(np.rint(pcm).astype(np.int64))
    frames = np.repeat(codes[:, None], channels, axis=1).ravel()
    return encode_wav_g711_bytes(
        frames, law=law, sample_rate=sample_rate, channels=channels
    )
