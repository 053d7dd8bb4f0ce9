"""GIF codec (multimodal/gif.py): LZW round-trips, spec-grounded byte
fixture, interlace, animation composition, transparency, disposal."""

import struct

import numpy as np
import pytest

from rag_vertex_ai_vector_search_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    iter_gif_frames,
    probe_gif,
)

# The canonical 1x1 white GIF89a (a widely published spec-minimal
# stream): global table [white, black], LZW payload 0x44 0x01 at
# min code size 2 -> codes CLEAR(4), 0, END(5).
WHITE_1PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_decode_known_spec_bytes():
    img = decode_gif(WHITE_1PX)
    assert img.shape == (1, 1, 3)
    assert img.tolist() == [[[255, 255, 255]]]
    meta = probe_gif(WHITE_1PX)
    assert (meta["width"], meta["height"]) == (1, 1)
    assert meta["version"] == "89a" and meta["n_frames"] == 1
    assert not meta["animated"]


def test_lzw_roundtrip_grows_past_table_reset():
    """Random 256-symbol data long enough to grow the code width to 12
    bits and force at least one table-full CLEAR reset."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    enc = _lzw_encode(8, data)
    assert bytes(_lzw_decode(8, enc)) == data
    # small-alphabet variant exercises narrow initial code sizes
    data2 = rng.integers(0, 4, size=5000, dtype=np.uint8).tobytes()
    assert bytes(_lzw_decode(2, _lzw_encode(2, data2))) == data2


def test_gif_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    out = decode_gif(encode_gif(gray))
    assert out.shape == (17, 23, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)

    # RGB with a bounded palette (<= 256 distinct colors)
    base = rng.integers(0, 6, size=(20, 30), dtype=np.uint8)
    rgb = np.stack([base * 40, 255 - base * 30, base * 11], axis=2)
    out = decode_gif(encode_gif(rgb))
    assert np.array_equal(out, rgb)


def test_gif_interlaced_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 200, size=(13, 9), dtype=np.uint8)
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out[:, :, 0], img)


def test_gif_animation_composition_and_transparency():
    """3-frame animation: frame 2 uses a transparent color, so the
    composited canvas keeps frame 1's pixels underneath."""
    f1 = np.zeros((8, 8, 3), np.uint8)
    f1[:, :] = (10, 20, 30)
    f2 = np.full((8, 8, 3), 200, np.uint8)
    f2[2:6, 2:6] = (1, 2, 3)  # the designated transparent color
    f3 = np.full((8, 8, 3), 90, np.uint8)
    blob = encode_gif(
        [f1, f2, f3], delay_cs=5, transparent_color=(1, 2, 3), disposal=1
    )
    meta = probe_gif(blob)
    assert meta["n_frames"] == 3 and meta["animated"]
    frames = list(iter_gif_frames(blob))
    assert len(frames) == 3
    assert np.array_equal(frames[0], f1)
    # frame 2: opaque border painted, transparent window shows frame 1
    assert frames[1][0, 0].tolist() == [200, 200, 200]
    assert frames[1][3, 3].tolist() == [10, 20, 30]
    # frame 3 fully opaque (90 everywhere) over the leave-disposal canvas
    assert frames[2][3, 3].tolist() == [90, 90, 90]


def test_gif_palette_overflow_and_garbage_rejected():
    rng = np.random.default_rng(3)
    too_many = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        encode_gif(too_many)  # ~4096 distinct colors, no quantizer
    with pytest.raises(NotImplementedError):
        decode_gif(b"NOTAGIF" + b"\x00" * 40)
    with pytest.raises(NotImplementedError):
        decode_gif(WHITE_1PX[:-5])  # truncated stream


def test_gif_out_of_screen_descriptor_rejected():
    """A frame whose image descriptor extends past the logical screen
    must raise the codec's NotImplementedError contract, not a raw
    numpy shape error from the compositor (the canvas slice silently
    clips while the patch/mask keep their declared (h, w))."""
    img = np.full((6, 6), 50, np.uint8)
    blob = bytearray(encode_gif(img))
    # Shrink the logical screen to 4x4 while the image descriptor still
    # declares a 6x6 patch at (0, 0) -> patch exceeds the screen.
    struct.pack_into("<HH", blob, 6, 4, 4)
    with pytest.raises(NotImplementedError, match="logical screen"):
        decode_gif(bytes(blob))
    # probe hits the same structural validation on its cheap path
    with pytest.raises(NotImplementedError, match="logical screen"):
        probe_gif(bytes(blob))


def test_probe_gif_skips_pixel_decode(monkeypatch):
    """probe_gif must not pay LZW decode cost: metadata comes from the
    block walk alone (sub-block lengths delimit the image data)."""
    import rag_vertex_ai_vector_search_spark.multimodal.gif as gifmod

    frames = [np.full((16, 16), v, np.uint8) for v in (10, 20, 30)]
    blob = encode_gif(frames, delay_cs=4)

    def _boom(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("probe_gif invoked _lzw_decode")

    monkeypatch.setattr(gifmod, "_lzw_decode", _boom)
    meta = gifmod.probe_gif(blob)
    assert meta["n_frames"] == 3 and meta["animated"]
    assert (meta["width"], meta["height"]) == (16, 16)


def test_decode_image_routes_gif():
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        decode_image,
    )

    img = np.full((5, 4), 77, np.uint8)
    out = decode_image(encode_gif(img))
    assert out.shape == (5, 4, 3) and out[0, 0, 0] == 77


def test_extract_gif_frame_features_spark(spark):
    """Animated GIFs explode into per-frame feature rows on Spark; the
    values equal a driver-side composited-frame featurization."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
        extract_gif_frame_features,
    )

    def anim(seed, n):
        rng = np.random.default_rng(seed)
        return [
            rng.integers(0, 200, size=(10, 12), dtype=np.uint8)
            for _ in range(n)
        ]

    blobs = {1: encode_gif(anim(1, 3)), 2: encode_gif(anim(2, 5))}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()],
        "gif_id long, content binary",
    )
    out = extract_gif_frame_features(df, every_k=2, feature_dim=6)
    rows = {(r.gif_id, r.frame_index): list(r.features)
            for r in out.collect()}
    # every_k=2 keeps frames 0,2[,4]
    assert set(rows) == {(1, 0), (1, 2), (2, 0), (2, 2), (2, 4)}
    for (gid, idx), feats in rows.items():
        frame = list(iter_gif_frames(blobs[gid]))[idx]
        ref = [float(np.float32(x)) for x in _pooled_features(frame, 6)]
        assert feats == ref
