"""Multimodal plumbing: binary columns, metadata, feature extraction,
frame sampling -- real distributed plan, stubbed codecs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.multimodal import (
    attach_media_metadata,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake bytes 1"), 8, 8, 1),
        ("m2", "image", bytearray(b"\x89PNG other bytes"), 8, 8, 1),
        ("v1", "video", bytearray(b"\x00\x00ftyp fake mp4"), 64, 48, 95),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )


def test_metadata_pass(media):
    out = attach_media_metadata(media).collect()
    assert all(r.media_bytes == len(r.content) for r in out)
    assert all(len(r.media_sha256) == 64 for r in out)


def test_image_features_deterministic(media):
    imgs = media.filter(F.col("media_type") == "image")
    a = {r.media_id: list(r.features) for r in extract_image_features(imgs).collect()}
    b = {r.media_id: list(r.features) for r in extract_image_features(imgs).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert a["m1"] != a["m2"]  # different bytes -> different features


def test_video_frame_sampling_fanout(media):
    vids = media.filter(F.col("media_type") == "video")
    frames = sample_video_frames(vids, every_k=10).collect()
    # 95 frames sampled every 10 -> indices 0,10,...,90 = 10 rows
    assert len(frames) == 10
    assert sorted(r.frame_index for r in frames) == list(range(0, 100, 10))
    assert all(":" in r.frame_ref for r in frames)


def _ppm_bytes(w, h):
    """Deterministic P6 gradient image with a header comment."""
    header = f"P6\n# test gradient\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 37) % 256, (y * 53) % 256, (x * y) % 256])
    return header + bytes(px), [
        [[(x * 37) % 256, (y * 53) % 256, (x * y) % 256] for x in range(w)]
        for y in range(h)
    ]


def _bmp24_bytes(w, h):
    """Deterministic bottom-up 24-bit BMP with row padding."""
    import struct

    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    px = bytearray()
    rgb = [[[(x * 11) % 256, (y * 7) % 256, (x + y) % 256] for x in range(w)]
           for y in range(h)]
    for y in reversed(range(h)):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y][x]
            row += bytes([b, g, r])  # BGR on disk
        row += b"\0" * (row_size - len(row))
        px += row
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 0, 0, 0, 0)
    return header + info + bytes(px), rgb


def test_real_codec_ppm_and_bmp_roundtrip():
    """decode_image is a REAL codec: parsed pixels must equal the pixels
    the encoder wrote, for both netpbm P6 and 24-bit BMP."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.multimodal import decode_image

    ppm, rgb = _ppm_bytes(5, 4)
    assert np.array_equal(decode_image(ppm), np.asarray(rgb, dtype=np.uint8))

    bmp, rgb2 = _bmp24_bytes(6, 3)
    assert np.array_equal(decode_image(bmp), np.asarray(rgb2, dtype=np.uint8))

    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")  # honest gap: PNG needs PIL


def test_image_features_on_real_decoded_image(spark):
    """Feature extraction end to end through the REAL codec: Spark-side
    features equal the numpy-side pooled computation on decoded pixels."""
    import numpy as np

    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_image,
        extract_image_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
    )

    ppm, _ = _ppm_bytes(8, 8)
    bmp, _ = _bmp24_bytes(10, 6)
    df = spark.createDataFrame(
        [("img1", "image/ppm", bytearray(ppm)),
         ("img2", "image/bmp", bytearray(bmp))],
        "media_id string, media_type string, content binary",
    )
    out = extract_image_features(df, feature_dim=8, decoder=decode_image)
    got = {r.media_id: np.asarray(r.features, dtype=np.float32)
           for r in out.collect()}
    for name, raw in (("img1", ppm), ("img2", bmp)):
        expected = _pooled_features(decode_image(raw), 8)
        assert np.array_equal(got[name], expected), name


# ---------------------------------------------------------------------------
# Audio: real stdlib WAV codec
# ---------------------------------------------------------------------------

def _wav_bytes(freq=440.0, sr=8000, seconds=0.25, channels=1, sampwidth=2):
    """Synthesize a PCM WAV entirely with stdlib wave + numpy."""
    import io
    import wave

    t = np.arange(int(sr * seconds)) / sr
    sig = np.sin(2 * np.pi * freq * t)
    if sampwidth == 2:
        pcm = (sig * 32767).astype("<i2")
    elif sampwidth == 1:
        pcm = ((sig * 127) + 128).astype(np.uint8)
    else:
        pcm = (sig * (2**31 - 1)).astype("<i4")
    frames = np.repeat(pcm[:, None], channels, axis=1).ravel().tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_roundtrip_widths_and_channels():
    from rag_vertex_ai_vector_search_spark.multimodal import decode_audio

    for sampwidth in (1, 2, 4):
        samples, sr = decode_audio(_wav_bytes(sampwidth=sampwidth))
        assert sr == 8000
        assert samples.shape == (2000, 1)
        assert np.abs(samples).max() <= 1.0
        # a full-scale sine keeps most of its amplitude at any width
        assert np.abs(samples).max() > 0.9

    stereo, _ = decode_audio(_wav_bytes(channels=2))
    assert stereo.shape == (2000, 2)
    # both channels carry the same signal in the fixture
    assert np.allclose(stereo[:, 0], stereo[:, 1])


def test_decode_audio_rejects_garbage():
    import pytest

    from rag_vertex_ai_vector_search_spark.multimodal import decode_audio

    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01\x02not-a-wav")


def test_extract_audio_features_values(spark):
    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_audio,
        extract_audio_features,
    )

    wav_sine = _wav_bytes(freq=440.0, seconds=0.5)
    wav_quiet = _wav_bytes(freq=10.0, seconds=0.125)
    df = spark.createDataFrame(
        [("a1", "audio/wav", bytearray(wav_sine)),
         ("a2", "audio/wav", bytearray(wav_quiet))],
        "media_id string, media_type string, content binary",
    )
    out = {r.media_id: r for r in
           extract_audio_features(df, feature_dim=8).collect()}

    a1 = out["a1"]
    assert a1.sample_rate == 8000
    assert abs(a1.duration_s - 0.5) < 1e-9
    # full-scale sine: RMS ~ 1/sqrt(2), peak ~ 1
    assert abs(a1.rms - 1 / np.sqrt(2)) < 0.01
    assert a1.peak > 0.99
    # 440 Hz -> 880 zero crossings/sec -> rate ~ 880/8000
    assert abs(a1.zero_crossing_rate - 880 / 8000) < 0.01
    assert len(a1.features) == 8
    assert abs(np.linalg.norm(a1.features) - 1.0) < 1e-5

    # driver-side reference equals the distributed result bit-for-bit
    samples, sr = decode_audio(wav_sine)
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _audio_feature_row,
    )
    d, r, p, z, fv = _audio_feature_row(samples, sr, 8)
    assert (a1.duration_s, a1.rms, a1.peak, a1.zero_crossing_rate) == (d, r, p, z)
    assert np.array_equal(np.asarray(a1.features, dtype=np.float32), fv)

    a2 = out["a2"]
    assert abs(a2.duration_s - 0.125) < 1e-9
    assert a2.zero_crossing_rate < a1.zero_crossing_rate


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------

def test_resize_image_shapes_and_identity():
    from rag_vertex_ai_vector_search_spark.multimodal import resize_image

    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    up = resize_image(gray, 16, 16)
    down = resize_image(gray, 4, 4)
    assert up.shape == (16, 16) and down.shape == (4, 4)
    # identity resize is exact
    assert np.array_equal(resize_image(gray, 8, 8), gray)
    # 2x nearest-neighbor upsample repeats each pixel
    assert np.array_equal(up[::2, ::2], gray)
    # downsample picks exact source pixels (a subset of the original)
    assert set(down.ravel()) <= set(gray.ravel())

    rgb = np.random.RandomState(0).randint(0, 255, (6, 10, 3), dtype=np.uint8)
    out = resize_image(rgb, 3, 5)
    assert out.shape == (3, 5, 3)


def test_extract_resized_features_fixed_resolution(spark):
    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_image,
        extract_resized_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
        resize_image,
    )

    ppm, _ = _ppm_bytes(8, 8)
    bmp, _ = _bmp24_bytes(10, 6)  # different aspect: resize normalizes
    df = spark.createDataFrame(
        [("i1", "image/ppm", bytearray(ppm)),
         ("i2", "image/bmp", bytearray(bmp))],
        "media_id string, media_type string, content binary",
    )
    out = {r.media_id: r for r in extract_resized_features(
        df, height=4, width=4, feature_dim=8, decoder=decode_image
    ).collect()}
    for name, raw in (("i1", ppm), ("i2", bmp)):
        r = out[name]
        assert (r.resized_height, r.resized_width) == (4, 4)
        expected = _pooled_features(
            resize_image(np.asarray(decode_image(raw)), 4, 4), 8
        )
        assert np.array_equal(
            np.asarray(r.features, dtype=np.float32), expected
        ), name


def test_png_roundtrip_all_filters():
    """_decode_png must invert every PNG row filter (None/Sub/Up/
    Average/Paeth) for gray and RGB images -- the encoder applies one
    filter to all rows, the decoder must reconstruct the exact pixels."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _decode_png,
        encode_png,
    )

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    for img in (gray, rgb):
        for ftype in range(5):
            data = encode_png(img, filter_type=ftype)
            out = _decode_png(data)
            assert np.array_equal(out, img), f"filter {ftype} failed"


def test_png_palette_and_alpha_forms():
    """Palette (color type 3) expands through PLTE; alpha channels
    (types 4 and 6) are dropped to gray/RGB."""
    import struct as _struct
    import zlib

    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _decode_png,
    )

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 2x2 palette image: indices 0..3 into a 4-color palette
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    raster = bytes([0, 0, 1, 0, 2, 3])  # two rows, filter 0 + 2 indices
    png = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    out = _decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[1, 1].tolist() == [7, 7, 7]

    # 2x1 RGBA (type 6): alpha dropped
    raster = bytes([0, 10, 20, 30, 255, 40, 50, 60, 0])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    out = _decode_png(png)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [10, 20, 30]

    # 1x2 gray+alpha (type 4): alpha dropped
    raster = bytes([0, 100, 255, 200, 0])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    out = _decode_png(png)
    assert out.shape == (1, 2)
    assert out[0].tolist() == [100, 200]


def test_png_unsupported_forms_raise():
    import struct as _struct
    import zlib

    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _decode_png,
    )

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 16-bit and Adam7 are SUPPORTED since r5 (see test_png_16bit_and_
    # subbyte_depths / test_png_adam7_interlaced); the remaining raises
    # are genuinely invalid forms.
    # invalid bit depth
    png3 = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        _decode_png(png3)
    # sub-byte depth on a truecolor type (spec-invalid combination)
    png_bad_combo = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color type"):
        _decode_png(png_bad_combo)
    # unknown interlace method
    pngi2 = (
        _PNG_SIG
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlace"):
        _decode_png(pngi2)


def test_image_features_on_png_column(spark):
    """End-to-end: binary PNG column -> decode_image -> pooled feature
    vector via mapInPandas, same plan shape as every other codec."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        extract_image_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
        decode_image,
        encode_png,
    )

    rng = np.random.RandomState(9)
    imgs = [rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8) for _ in range(3)]
    rows = [
        (f"png{i}", "image/png", bytearray(encode_png(img, filter_type=4)),
         7, 6, 1)
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )
    out = {
        r.media_id: r.features
        for r in extract_image_features(
            df, decoder=decode_image, feature_dim=8
        ).collect()
    }
    for i, img in enumerate(imgs):
        expected = _pooled_features(img, 8)
        assert np.allclose(out[f"png{i}"], expected)


def test_jpeg_roundtrip_quality100_near_exact():
    """At quality=100 every quant divisor is 1, so the only loss is
    DCT float rounding: round-trip error must be within +/-2 even for
    random noise (the hardest content). This pins the whole pipeline --
    markers, canonical Huffman, zigzag, DCT -- as correct."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(24, 17), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(gray, quality=100))
    assert out.shape == gray.shape
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2

    rgb = rng.randint(0, 256, size=(19, 21, 3), dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quality=100))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


def test_jpeg_flat_and_smooth_content():
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    flat = np.full((16, 24), 130, dtype=np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(flat, quality=90))
    assert np.abs(out.astype(int) - 130).max() <= 1  # DC-only blocks

    xx, yy = np.meshgrid(np.arange(40), np.arange(30))
    smooth = np.stack(
        [xx * 3 % 256, yy * 5 % 256, (xx + yy) * 2 % 256], axis=2
    ).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(smooth, quality=90))
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert err.mean() < 3 and err.max() <= 12  # lossy but faithful


def test_jpeg_unsupported_modes_raise():
    import struct as _struct

    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    with pytest.raises(NotImplementedError, match="SOI"):
        decode_jpeg_baseline(b"not a jpeg")
    # flip SOF0 -> SOF2 (progressive) in a real stream
    data = bytearray(encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8)))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_baseline(bytes(data))
    # truncated entropy segment: the codec contract (NotImplementedError),
    # never an executor IndexError
    rng = np.random.RandomState(3)
    full = encode_jpeg_baseline(
        rng.randint(0, 256, (32, 48)).astype(np.uint8), quality=90
    )
    sos = full.find(b"\xff\xda")
    assert sos > 0
    # cut mid-entropy-segment: decode must hit the codec's documented
    # contract, never an executor IndexError
    for cut in (sos + 20, (sos + len(full)) // 2):
        with pytest.raises(NotImplementedError, match="truncated|JPEG"):
            decode_jpeg_baseline(full[:cut])


def test_jpeg_through_image_feature_pipeline(spark):
    """Binary JPEG column -> decode_image -> pooled features via
    mapInPandas: the full multimodal path with a real lossy codec."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        extract_image_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
        decode_image,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        encode_jpeg_baseline,
    )

    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    imgs = [
        ((xx * (i + 2) + yy * 3) % 256).astype(np.uint8) for i in range(3)
    ]
    rows = [
        (f"jpg{i}", "image/jpeg",
         bytearray(encode_jpeg_baseline(img, quality=92)), 32, 24, 1)
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )
    out = {
        r.media_id: np.asarray(r.features)
        for r in extract_image_features(
            df, decoder=decode_image, feature_dim=8
        ).collect()
    }
    for i, img in enumerate(imgs):
        ref = _pooled_features(img, 8)
        # lossy codec: feature vector close to the clean-pixel reference
        assert float(np.dot(out[f"jpg{i}"], ref)) > 0.999


def test_jpeg_420_subsampled_stream():
    """Hand-built 4:2:0 stream (Y 2x2, Cb/Cr 1x1; one MCU = 4 Y blocks
    + Cb + Cr, DC-only): exercises the interleaved multi-block MCU
    order and chroma pixel-replication upsampling the 4:4:4 encoder
    never emits. A flat YCbCr color must decode to the exact flat RGB."""
    import struct as _struct

    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        _AC_CHROMA,
        _AC_LUMA,
        _DC_CHROMA,
        _DC_LUMA,
        _BitWriter,
        _canonical_codes,
        _size_cat,
        decode_jpeg_baseline,
    )

    h = w = 16  # one 4:2:0 MCU
    y_val, cb_val, cr_val = 120, 140, 110

    out = bytearray(b"\xff\xd8")
    # DQT: identity tables (all ones) for exactness
    for tid in (0, 1):
        out += b"\xff\xdb" + _struct.pack(">HB", 67, tid) + bytes([1] * 64)
    out += b"\xff\xc0" + _struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, 0x22, 0])  # Y: h=2, v=2
    out += bytes([2, 0x11, 1])  # Cb
    out += bytes([3, 0x11, 1])  # Cr
    for tc_th, (bits, values) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA),
        (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
    ):
        out += b"\xff\xc4" + _struct.pack(">HB", 19 + len(values), tc_th)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + _struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"

    wtr = _BitWriter()
    dc_l, ac_l = _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)
    dc_c, ac_c = _canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)

    def dc_only(dc_codes, ac_codes, diff):
        s = _size_cat(diff)
        ln, cd = dc_codes[s]
        wtr.write(ln, cd)
        if s:
            wtr.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
        ln, cd = ac_codes[0x00]  # EOB
        wtr.write(ln, cd)

    # flat plane value V: DCT DC coefficient = 8 * (V - 128)
    y_dc, cb_dc, cr_dc = (8 * (v - 128) for v in (y_val, cb_val, cr_val))
    # MCU: 4 Y blocks (differential DC: first carries full value), Cb, Cr
    dc_only(dc_l, ac_l, y_dc)
    for _ in range(3):
        dc_only(dc_l, ac_l, 0)
    dc_only(dc_c, ac_c, cb_dc)
    dc_only(dc_c, ac_c, cr_dc)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    img = decode_jpeg_baseline(bytes(out))
    assert img.shape == (16, 16, 3)
    r = y_val + 1.402 * (cr_val - 128.0)
    g = y_val - 0.344136 * (cb_val - 128.0) - 0.714136 * (cr_val - 128.0)
    b = y_val + 1.772 * (cb_val - 128.0)
    expected = np.clip(np.round([r, g, b]), 0, 255).astype(np.uint8)
    assert np.all(img.reshape(-1, 3) == expected), (img[0, 0], expected)


def test_mjpeg_avi_roundtrip_and_probe():
    """MJPEG AVI: encode N frames, probe the container metadata, decode
    every frame back within JPEG tolerance."""
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        decode_video_frames,
        encode_mjpeg_avi,
        probe_mjpeg_avi,
    )

    xx, yy = np.meshgrid(np.arange(32), np.arange(16))
    frames = [
        ((xx * 2 + yy * 3 + 20 * i) % 256).astype(np.uint8) for i in range(4)
    ]
    avi = encode_mjpeg_avi(frames, fps=5, quality=95)
    meta = probe_mjpeg_avi(avi)
    assert meta["n_frames"] == 4 and meta["fps"] == 5.0
    assert meta["width"] == 32 and meta["height"] == 16
    out = decode_video_frames(avi)
    assert len(out) == 4
    for got, want in zip(out, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 6


def test_mjpeg_rejects_non_avi():
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        iter_mjpeg_frames,
    )

    with pytest.raises(NotImplementedError, match="AVI"):
        list(iter_mjpeg_frames(b"\x00\x01\x02"))


def test_video_frame_features_end_to_end(spark):
    """The full video path on Spark: binary AVI column -> sampled
    (video, frame_index) explode -> per-frame MJPEG decode -> pooled
    features, all inside one mapInPandas pass."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        extract_video_frame_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        encode_mjpeg_avi,
    )

    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    vids = []
    for v in range(2):
        frames = [
            ((xx * (v + 2) + yy + 30 * i) % 256).astype(np.uint8)
            for i in range(6)
        ]
        vids.append((f"vid{v}", "video/avi",
                     bytearray(encode_mjpeg_avi(frames, quality=95)),
                     24, 16, 6, frames))
    df = spark.createDataFrame(
        [(a, b, c, d, e, f) for a, b, c, d, e, f, _ in vids],
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )
    out = extract_video_frame_features(df, every_k=2, feature_dim=8).collect()
    # 6 frames sampled every 2 -> indices 0, 2, 4 per video
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.media_id, {})[r.frame_index] = np.asarray(r.features)
    for media_id, _, _, _, _, _, frames in vids:
        assert sorted(by_vid[media_id]) == [0, 2, 4]
        for idx in (0, 2, 4):
            ref = _pooled_features(frames[idx], 8)
            assert float(np.dot(by_vid[media_id][idx], ref)) > 0.999


def test_audio_spectral_features_sine_centroid(spark):
    """A pure sine's spectral centroid and rolloff must land at its
    frequency; a higher-pitch sine must rank higher on both -- real
    FFT behavior, not a stub."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        extract_audio_spectral_features,
    )

    rows = [
        ("low", "audio/wav", bytearray(_wav_bytes(freq=300.0, sr=8000)), 0, 0, 0),
        ("high", "audio/wav", bytearray(_wav_bytes(freq=1500.0, sr=8000)), 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "width int, height int, n_frames int",
    )
    out = {r.media_id: r for r in extract_audio_spectral_features(df).collect()}
    assert abs(out["low"].spectral_centroid_hz - 300.0) < 30.0
    assert abs(out["high"].spectral_centroid_hz - 1500.0) < 60.0
    assert out["high"].spectral_rolloff_hz > out["low"].spectral_rolloff_hz
    # band profile: energy concentrated in different bands
    lo = np.asarray(out["low"].features)
    hi = np.asarray(out["high"].features)
    assert lo.argmax() < hi.argmax()


@pytest.mark.full
def test_multimodal_features_query_matches_local_reference(spark, sf_smoke):
    """The declared driver query (rows-only gate) cross-checked at
    value level: recompute each row's quantized features locally with
    the same synthesis + codec functions, no Spark involved, and
    require exact integer equality."""
    import math

    import __spark_entry__ as entrymod
    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_image,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
        _spectral_feature_row,
    )
    from rag_vertex_ai_vector_search_spark.multimodal import decode_audio
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        encode_png,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        encode_mjpeg_avi, iter_mjpeg_frames,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _synth_audio, _synth_image, _synth_video_frames, encode_wav_pcm,
    )

    got: dict = {}
    for r in entrymod.q_multimodal_features(spark, sf_smoke).collect():
        got.setdefault((r.doc_id, r.media_type, r.item_index), {})[
            r.feature_index
        ] = r.qvalue
    got = {
        k: [v[i] for i in range(len(v))] for k, v in got.items()
    }
    assert len(got) == 84  # 12 docs x (png+jpeg+gif+wav+flac+2 video frames)

    def q(feats):
        return [math.floor(float(x) * 1e6) for x in feats]

    for did in range(12):
        png = encode_png(_synth_image(did, rgb=did % 2 == 0))
        assert got[(did, "image/png", 0)] == q(
            _pooled_features(decode_image(png), 8)
        )
        jpg = encode_jpeg_baseline(_synth_image(did, rgb=did % 2 == 1), quality=90)
        assert got[(did, "image/jpeg", 0)] == q(
            _pooled_features(decode_jpeg_baseline(jpg), 8)
        )
        from rag_vertex_ai_vector_search_spark.multimodal.gif import (
            encode_gif,
        )

        gif = encode_gif(_synth_image(did, rgb=False), interlace=did % 2 == 1)
        assert got[(did, "image/gif", 0)] == q(
            _pooled_features(decode_image(gif), 8)
        )
        wav = encode_wav_pcm(_synth_audio(did), channels=1 + did % 2, sampwidth=2)
        samples, sr = decode_audio(wav)
        _, _, prof = _spectral_feature_row(samples, sr, 8)
        assert got[(did, "audio/wav", 0)] == q(prof)
        import numpy as np

        from rag_vertex_ai_vector_search_spark.multimodal.flac import (
            encode_flac,
        )

        pcm = (np.clip(_synth_audio(did), -1, 1) * 32767).astype(np.int32)
        fsamples, fsr = decode_audio(encode_flac(pcm, sample_rate=8000))
        _, _, fprof = _spectral_feature_row(fsamples, fsr, 8)
        assert got[(did, "audio/flac", 0)] == q(fprof)
        avi = encode_mjpeg_avi(_synth_video_frames(did), quality=95)
        for idx, payload in enumerate(iter_mjpeg_frames(avi)):
            if idx % 2:
                continue
            assert got[(did, "video/avi", idx)] == q(
                _pooled_features(decode_jpeg_baseline(payload), 8)
            )


def test_jpeg_progressive_decode_equals_baseline():
    """Progressive (SOF2) streams carry exactly the same quantized
    coefficients as baseline streams from the same image, so decoding
    either must produce IDENTICAL arrays -- this gates every
    progressive decode path at once: multi-scan accumulation, EOB
    runs, DC/AC successive-approximation refinement, correction-bit
    interleaving."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 256, (32, 48)).astype(np.uint8),       # gray
        rng.randint(0, 256, (17, 23)).astype(np.uint8),       # gray, odd
        rng.randint(0, 256, (24, 40, 3)).astype(np.uint8),    # rgb
        rng.randint(0, 256, (19, 21, 3)).astype(np.uint8),    # rgb, odd
        np.full((16, 16), 128, np.uint8),                     # flat
        (np.add.outer(np.arange(40) * 3, np.arange(56) * 2) % 256
         ).astype(np.uint8),                                  # smooth
    ]
    for q in (50, 85, 95):
        for img in cases:
            prog = encode_jpeg_progressive(img, quality=q)
            assert b"\xff\xc2" in prog[:200]  # really SOF2
            assert np.array_equal(
                decode_jpeg_baseline(prog),
                decode_jpeg_baseline(encode_jpeg_baseline(img, quality=q)),
            )


def test_jpeg_progressive_through_image_pipeline(spark):
    """Progressive JPEG bytes flow through decode_image and the Spark
    featurize path like any other supported format."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_image,
        encode_jpeg_progressive,
        extract_image_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _pooled_features,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(img, quality=90)
    df = spark.createDataFrame(
        [("p1", "image/jpeg", bytearray(blob))],
        "media_id string, media_type string, content binary",
    )
    out = extract_image_features(df, feature_dim=8, decoder=decode_image)
    got = np.asarray(out.collect()[0].features, dtype=np.float32)
    assert np.array_equal(got, _pooled_features(decode_image(blob), 8))


def _png_chunks(ihdr_body, idat_raw, palette=None):
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")
    return out


def test_png_16bit_and_subbyte_depths():
    """16-bit narrows to the high byte; 1/2/4-bit gray scales to full
    range; 4-bit palette indexes correctly -- all hand-constructed
    streams with known pixels."""
    import struct

    from rag_vertex_ai_vector_search_spark.multimodal import decode_image

    # 16-bit grayscale 3x2: value = high<<8 | low; expect the high byte
    rng = np.random.RandomState(5)
    hi = rng.randint(0, 256, (2, 3)).astype(np.uint8)
    lo = rng.randint(0, 256, (2, 3)).astype(np.uint8)
    raw = bytearray()
    for r in range(2):
        raw.append(0)
        for c in range(3):
            raw += bytes([hi[r, c], lo[r, c]])
    png = _png_chunks(struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0), bytes(raw))
    assert np.array_equal(decode_image(png), hi)

    # 16-bit RGB 2x2
    hi3 = rng.randint(0, 256, (2, 2, 3)).astype(np.uint8)
    raw = bytearray()
    for r in range(2):
        raw.append(0)
        for c in range(2):
            for ch in range(3):
                raw += bytes([hi3[r, c, ch], 0x7F])
    png = _png_chunks(struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0), bytes(raw))
    assert np.array_equal(decode_image(png), hi3)

    # 1-bit gray 10x2 (stride rounds up to 2 bytes/row); 0/1 -> 0/255
    bits = rng.randint(0, 2, (2, 10)).astype(np.uint8)
    raw = bytearray()
    for r in range(2):
        raw.append(0)
        packed = np.packbits(bits[r], bitorder="big")
        raw += packed.tobytes()
    png = _png_chunks(struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0), bytes(raw))
    assert np.array_equal(decode_image(png), bits * 255)

    # 4-bit palette 3x2 (odd width: low nibble of last byte is padding)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = np.array([[1, 15, 7], [0, 3, 12]], dtype=np.uint8)
    raw = bytearray()
    for r in range(2):
        raw.append(0)
        raw += bytes([(idx[r, 0] << 4) | idx[r, 1], idx[r, 2] << 4])
    png = _png_chunks(
        struct.pack(">IIBBBBB", 3, 2, 4, 3, 0, 0, 0), bytes(raw),
        palette=pal.tobytes(),
    )
    assert np.array_equal(decode_image(png), pal[idx])


def test_png_adam7_interlaced():
    """Adam7: seven per-pass sub-images scatter back onto the pixel
    grid; decode of a hand-interlaced stream equals the reference
    image, for 8-bit RGB and 16-bit gray, at sizes exercising empty
    and partial passes."""
    import struct

    from rag_vertex_ai_vector_search_spark.multimodal import decode_image

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    rng = np.random.RandomState(9)
    for h, w in ((13, 11), (8, 8), (3, 5), (1, 9)):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in passes:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                raw.append(0)
                raw += row.astype(np.uint8).tobytes()
        png = _png_chunks(
            struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1), bytes(raw)
        )
        assert np.array_equal(decode_image(png), img), (h, w)

    # 16-bit gray interlaced: expect the high bytes back
    h, w = 9, 6
    hi = rng.randint(0, 256, (h, w)).astype(np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = hi[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            for v in row:
                raw += bytes([int(v), 0x55])
    png = _png_chunks(struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1), bytes(raw))
    assert np.array_equal(decode_image(png), hi)


# ---------------------------------------------------------------------------
# decode_status counted-skip contract (VERDICT r5 #7)
# ---------------------------------------------------------------------------

def _mixed_media_df(spark):
    """4 images (1 MP3-planted 'image', 1 corrupt PNG), 3 audio items
    (1 real MP3 header = unsupported, 1 truncated WAV = corrupt)."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        encode_png,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _synth_audio, _synth_image, encode_wav_pcm,
    )

    png_ok = encode_png(_synth_image(1, rgb=True))
    # Corrupt INSIDE the zlib IDAT stream (valid signature + IHDR, so
    # the failure is a raw zlib.error = "corrupt", not the codec's
    # NotImplementedError format contract = "unsupported").
    idat = png_ok.index(b"IDAT") + 8
    png_corrupt = (
        png_ok[:idat]
        + bytes(b ^ 0xFF for b in png_ok[idat:idat + 12])
        + png_ok[idat + 12:]
    )
    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb\x90\x00" * 40
    wav_ok = encode_wav_pcm(_synth_audio(1), channels=1, sampwidth=2)
    wav_trunc = wav_ok[: len(wav_ok) // 3]

    img_rows = [
        ("img_ok1", "image/png", bytearray(png_ok)),
        ("img_ok2", "image/png", bytearray(encode_png(_synth_image(2, rgb=False)))),
        ("img_mp3", "image/mp3?", bytearray(mp3)),       # unsupported format
        ("img_bad", "image/png", bytearray(png_corrupt)),  # corrupt stream
    ]
    aud_rows = [
        ("aud_ok", "audio/wav", bytearray(wav_ok)),
        ("aud_mp3", "audio/mpeg", bytearray(mp3)),       # unsupported codec
        ("aud_bad", "audio/wav", bytearray(wav_trunc)),  # corrupt container
    ]
    schema = "media_id string, media_type string, content binary"
    return (
        spark.createDataFrame(img_rows, schema),
        spark.createDataFrame(aud_rows, schema),
    )


def test_decode_skip_contract_exact_counts(spark):
    """Mixed media with planted unsupported + corrupt bytes completes
    (no task error) and the skip accounting is exact."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        DECODE_CORRUPT,
        DECODE_OK,
        DECODE_UNSUPPORTED,
        decode_image,
        extract_audio_spectral_features,
        extract_image_features,
        media_decode_report,
    )

    imgs, auds = _mixed_media_df(spark)
    img_out = extract_image_features(
        imgs, decoder=decode_image, feature_dim=4, on_error="skip"
    )
    aud_out = extract_audio_spectral_features(
        auds, n_bands=4, on_error="skip"
    )
    combined = img_out.select(
        "media_id", "media_type", "decode_status", "features"
    ).unionByName(
        aud_out.select("media_id", "media_type", "decode_status", "features")
    )
    rows = {r.media_id: r for r in combined.collect()}
    assert rows["img_ok1"].decode_status == DECODE_OK
    assert rows["img_ok2"].decode_status == DECODE_OK
    assert rows["img_mp3"].decode_status == DECODE_UNSUPPORTED
    assert rows["img_bad"].decode_status == DECODE_CORRUPT
    assert rows["aud_ok"].decode_status == DECODE_OK
    assert rows["aud_mp3"].decode_status == DECODE_UNSUPPORTED
    assert rows["aud_bad"].decode_status == DECODE_CORRUPT
    # skipped rows carry null features; ok rows carry real vectors
    for mid, r in rows.items():
        if r.decode_status == DECODE_OK:
            assert r.features is not None and len(r.features) == 4, mid
        else:
            assert r.features is None, mid

    # media_decode_report: exact per-modality rates
    rep = {
        r.media_type: r
        for r in media_decode_report(combined).collect()
    }
    assert (rep["image/png"].n_items, rep["image/png"].n_ok,
            rep["image/png"].n_corrupt) == (3, 2, 1)
    assert rep["image/mp3?"].n_unsupported == 1
    assert (rep["audio/wav"].n_items, rep["audio/wav"].n_ok,
            rep["audio/wav"].n_corrupt) == (2, 1, 1)
    assert rep["audio/mpeg"].n_unsupported == 1
    assert rep["audio/wav"].skip_rate == 0.5


def test_decode_skip_contract_video_and_gif(spark):
    """Container-level skips: a non-AVI blob among MJPEG videos and a
    broken GIF among animations each produce exactly ONE frame_index=-1
    counted-skip row; good assets featurize normally."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        DECODE_OK,
        encode_gif,
        extract_gif_frame_features,
        extract_video_frame_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        encode_mjpeg_avi,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _synth_video_frames,
    )

    avi = encode_mjpeg_avi(_synth_video_frames(3), quality=90)
    vids = spark.createDataFrame(
        [("v_ok", bytearray(avi), 4), ("v_bad", bytearray(b"\x00" * 64), 0)],
        "media_id string, content binary, n_frames int",
    )
    vout = extract_video_frame_features(
        vids, every_k=2, feature_dim=4, on_error="skip"
    ).collect()
    by_id = {}
    for r in vout:
        by_id.setdefault(r.media_id, []).append(r)
    assert all(r.decode_status == DECODE_OK for r in by_id["v_ok"])
    assert all(r.features is not None for r in by_id["v_ok"])
    assert len(by_id["v_bad"]) == 1
    assert by_id["v_bad"][0].frame_index == -1
    assert by_id["v_bad"][0].decode_status != DECODE_OK
    assert by_id["v_bad"][0].features is None

    img = np.full((6, 6), 33, np.uint8)
    gifs = spark.createDataFrame(
        [
            ("g_ok", bytearray(encode_gif([img, img + 1]))),
            ("g_bad", bytearray(encode_gif(img)[:-8])),  # truncated
        ],
        "media_id string, content binary",
    )
    gout = extract_gif_frame_features(
        gifs, feature_dim=4, on_error="skip"
    ).collect()
    g = {}
    for r in gout:
        g.setdefault(r.media_id, []).append(r)
    assert len(g["g_ok"]) == 2
    assert all(r.decode_status == DECODE_OK for r in g["g_ok"])
    assert len(g["g_bad"]) == 1 and g["g_bad"][0].frame_index == -1


def test_decode_raise_mode_unchanged(spark):
    """Default on_error='raise' keeps the strict contract: planted
    garbage still fails the job, and the output schema carries NO
    decode_status column."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        decode_image,
        extract_image_features,
    )

    imgs, _ = _mixed_media_df(spark)
    strict = extract_image_features(imgs, decoder=decode_image, feature_dim=4)
    assert "decode_status" not in strict.columns
    with pytest.raises(Exception):
        strict.collect()


def test_synthesize_media_with_defects_statuses_closed_form(spark):
    """The planted-defect rules must map to decode statuses as a pure
    function of the seed -- this equivalence is what lets
    corpus_quality_report's oracle predict decode rates without
    decoding (r7)."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        DECODE_CORRUPT,
        DECODE_OK,
        DECODE_UNSUPPORTED,
        decode_image,
        extract_audio_spectral_features,
        extract_image_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        synthesize_media_with_defects,
    )

    ids = spark.range(0, 13).select(F.col("id").alias("doc_id"))
    media = synthesize_media_with_defects(ids)
    imgs = extract_image_features(
        media.filter(F.col("media_type").startswith("image/")),
        feature_dim=4, decoder=decode_image, on_error="skip",
    ).select("doc_id", "media_type", "decode_status")
    auds = extract_audio_spectral_features(
        media.filter(F.col("media_type").startswith("audio/")),
        n_bands=4, on_error="skip",
    ).select("doc_id", "media_type", "decode_status")
    rows = {
        (r.doc_id, r.media_type): r.decode_status
        for r in imgs.unionByName(auds).collect()
    }
    for seed in range(13):
        exp_png = DECODE_CORRUPT if seed % 4 == 0 else DECODE_OK
        exp_wav = DECODE_CORRUPT if seed % 4 == 1 else DECODE_OK
        assert rows[(seed, "image/png")] == exp_png, seed
        assert rows[(seed, "audio/wav")] == exp_wav, seed
        if seed % 3 == 0:
            assert rows[(seed, "audio/mpeg")] == DECODE_UNSUPPORTED, seed
        else:
            assert (seed, "audio/mpeg") not in rows, seed
    # item count: 2 per seed + one mpeg per seed%3==0
    assert len(rows) == 2 * 13 + 5


def test_jpeg_lossless_roundtrips_all_predictors():
    """SOF3 lossless: encode->decode must be ARRAY-EQUAL (that's the
    format's whole contract) for every T.81 predictor, at 8 and
    16 bits, grayscale and RGB."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_lossless,
    )

    rng = np.random.RandomState(7)
    g8 = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    g16 = rng.randint(0, 65536, (16, 20)).astype(np.uint16)
    rgb = rng.randint(0, 256, (12, 17, 3)).astype(np.uint8)
    for pred in range(1, 8):
        for img in (g8, g16, rgb):
            out = decode_jpeg_baseline(
                encode_jpeg_lossless(img, predictor=pred)
            )
            assert out.dtype == img.dtype and np.array_equal(out, img), pred


def test_jpeg_lossless_spec_anchors():
    """Spec-grounded corners, not just self-roundtrip: (1) the very
    first sample is predicted by 2^(P-Pt-1) (H.1.2.2) -- a 16-bit
    zero image's first diff is exactly -32768, the SSSS=16
    no-extra-bits escape (H.1.2.1); (2) point transform codes x>>Pt
    and restores x<<Pt; (3) a truncated entropy segment surfaces the
    codec's NotImplementedError contract."""
    import pytest as _pytest

    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_lossless,
    )

    z16 = np.zeros((3, 3), dtype=np.uint16)
    blob = encode_jpeg_lossless(z16, predictor=1)
    assert np.array_equal(decode_jpeg_baseline(blob), z16)

    g8 = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    out = decode_jpeg_baseline(
        encode_jpeg_lossless(g8.astype(np.uint8), point_transform=3)
    )
    assert np.array_equal(out, (g8 & 0xF8).astype(np.uint8))

    # truncate inside the (larger) entropy segment: random 8-bit data
    # codes to well over 8 bytes, so the cut hits entropy bits, and
    # the reader surfaces the documented contract
    big = encode_jpeg_lossless(
        np.random.RandomState(3).randint(0, 256, (16, 16)).astype(np.uint8)
    )
    with _pytest.raises(NotImplementedError):
        decode_jpeg_baseline(big[: len(big) - 10])


def test_jpeg_12bit_extended_sequential():
    """12-bit SOF1: smooth 12-bit rasters survive the DCT round-trip
    at small relative error; the x16-scaled 16-bit quant tables (Pq=1)
    parse; the >=32 entry floor keeps an adversarial full-range
    checkerboard inside the standard Huffman size categories at
    quality 100; 8-bit decode is unchanged."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_extended12,
    )

    rng = np.random.RandomState(5)
    yy, xx = np.meshgrid(np.arange(40), np.arange(48), indexing="ij")
    smooth = (
        (xx * 20 + yy * 12) + rng.randint(0, 16, (40, 48))
    ).clip(0, 4095).astype(np.uint16)
    out = decode_jpeg_baseline(encode_jpeg_extended12(smooth, quality=95))
    assert out.dtype == np.uint16 and out.shape == smooth.shape
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert err.mean() < 8 and err.max() < 64  # < 0.2% mean of range

    cb = (((xx + yy) % 2) * 4095).astype(np.uint16)
    out2 = decode_jpeg_baseline(encode_jpeg_extended12(cb, quality=100))
    assert np.abs(out2.astype(int) - cb.astype(int)).mean() < 16

    with pytest.raises(ValueError, match="uint16"):
        encode_jpeg_extended12(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="4096"):
        encode_jpeg_extended12(
            np.full((8, 8), 5000, dtype=np.uint16)
        )


def test_decode_skip_malformed_g711_and_short_riff(spark):
    """Two corrupt-container cases the generic contract tests don't
    plant: a G.711 WAV whose data chunk does not frame-align (stereo
    container, odd codeword count) and a blob truncated INSIDE the
    12-byte RIFF header. Both claim to be RIFF containers, so both
    must count as DECODE_CORRUPT -- not be demoted to UNSUPPORTED --
    while a >=12-byte RIFF of a different form (AVI) stays
    UNSUPPORTED (genuinely another container, not damage)."""
    from rag_vertex_ai_vector_search_spark.multimodal import (
        DECODE_CORRUPT,
        DECODE_OK,
        DECODE_UNSUPPORTED,
        extract_audio_spectral_features,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.g711 import (
        encode_wav_g711, encode_wav_g711_bytes,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _synth_audio,
    )

    g711_ok = encode_wav_g711(_synth_audio(3), law="ulaw")
    # 5 codeword bytes across 2 channels: 2.5 frames -> frame-align error
    g711_bad = encode_wav_g711_bytes(
        np.frombuffer(b"\x12\x34\x56\x78\x9a", dtype=np.uint8), channels=2
    )
    riff_short = b"RIFF\x04\x00\x00"           # dies inside the header
    riff_avi = b"RIFF" + b"\x10\x00\x00\x00" + b"AVI " + b"\x00" * 16
    rows = [
        ("g_ok", "audio/wav", bytearray(g711_ok)),
        ("g_bad", "audio/wav", bytearray(g711_bad)),
        ("r_short", "audio/wav", bytearray(riff_short)),
        ("r_avi", "audio/wav", bytearray(riff_avi)),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, media_type string, content binary"
    )
    got = {
        r.media_id: r.decode_status
        for r in extract_audio_spectral_features(
            df, n_bands=4, on_error="skip"
        ).collect()
    }
    assert got["g_ok"] == DECODE_OK
    assert got["g_bad"] == DECODE_CORRUPT
    assert got["r_short"] == DECODE_CORRUPT
    assert got["r_avi"] == DECODE_UNSUPPORTED


def test_lossless_jpeg_member_matches_generator_formula():
    """The r12 SOF3 member of synthesize_media_lossless: each seed
    class (RGB even / 8-bit gray s%4==1 / 16-bit+Pt=1 s%4==3) must
    decode to EXACTLY the closed-form raster the DuckDB oracle
    predicts -- including the Pt shift (decoded = v - v%2). Pure
    numpy; the Spark-side e2e gate is the declared
    multimodal_features_lossless parity row."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_lossless,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _lossless_gray_jpeg,
    )

    for seed in range(12):
        gj = _lossless_gray_jpeg(seed).astype(np.int64)
        pred = 1 + seed % 7
        if seed % 2 == 0:
            img = np.stack(
                [gj, np.roll(gj, seed % 7, axis=1), 255 - gj], axis=2
            ).astype(np.uint8)
            expect = img.astype(np.int64)
            blob = encode_jpeg_lossless(img, predictor=pred)
        elif seed % 4 == 1:
            blob = encode_jpeg_lossless(
                gj.astype(np.uint8), predictor=pred
            )
            expect = gj
        else:
            v = gj * 257
            blob = encode_jpeg_lossless(
                v.astype(np.uint16), predictor=pred, point_transform=1
            )
            expect = v - v % 2
        out = decode_jpeg_baseline(blob).astype(np.int64)
        assert np.array_equal(out, expect), seed


def test_dct_flat_block_closed_form_all_safe_values():
    """The r13 lossy-DCT gate's foundation: for EVERY safe block value
    (216 of 256), a flat 8x8 block at quality 60 must decode to a FLAT
    block equal to the closed-form prediction dct_decoded_value(v) --
    gray SOF0 and equal-channel RGB both. The safe-set exclusion
    (quant % 8 == 4 decoder ties) and genuine lossiness (78 values
    decode to a DIFFERENT pixel) are asserted so the gate can't go
    vacuous. Pure numpy; the Spark e2e gate is the declared
    multimodal_features_dct parity row."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_baseline,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        DCT_QUALITY, dct_decoded_value, dct_safe_values,
    )

    safe = dct_safe_values()
    assert len(safe) == 216
    assert sum(1 for v in safe if dct_decoded_value(v) != v) == 78

    for rgb in (False, True):
        for start in range(0, len(safe), 12):
            chunk = (safe[start:start + 12] + safe)[:12]
            g = np.zeros((24, 32), np.uint8)
            for bi, v in enumerate(chunk):
                by, bx = divmod(bi, 4)
                g[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
            raster = np.stack([g, g, g], axis=2) if rgb else g
            dec = decode_jpeg_baseline(
                encode_jpeg_baseline(raster, quality=DCT_QUALITY)
            )
            for bi, v in enumerate(chunk):
                by, bx = divmod(bi, 4)
                blk = dec[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                assert blk.min() == blk.max() == dct_decoded_value(v), (
                    rgb, v,
                )


def test_synthesize_media_dct_spark_stats(spark):
    """End-to-end Spark plumbing for the DCT gate: synthesize -> real
    decode -> per-block min/max; every block flat, values matching the
    closed form, channel count by seed parity, and at least one block
    per run lossy (decoded != source value). Seeds 2,3,6,7 take the
    PROGRESSIVE encode branch, so this also drives the SOF2 decode to
    the same closed form."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        extract_dct_block_stats,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _dct_flat_raster, dct_decoded_value, synthesize_media_dct,
    )

    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    out = extract_dct_block_stats(synthesize_media_dct(docs)).collect()
    # 4 even seeds x 3 channels x 12 blocks + 4 odd x 1 x 12
    assert len(out) == 4 * 36 + 4 * 12
    lossy = 0
    for r in out:
        src = int(_dct_flat_raster(int(r.doc_id))[r.block_y * 8, r.block_x * 8])
        want = dct_decoded_value(src)
        assert r.px_min == r.px_max == want
        lossy += int(want != src)
    assert lossy > 0


def test_dct420_flat_superblock_closed_form():
    """The r13 4:2:0 gate's foundation: every safe palette color's
    flat 16x16 super-block must decode (through the real subsampled
    MCU pipeline) to a FLAT block equal to the fixed-association
    double chain's prediction -- and the palette must be genuinely
    lossy. Pure numpy; the Spark e2e gate is the declared
    multimodal_features_dct420 parity row."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_420,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        dct420_palette,
    )

    palette = dct420_palette()
    assert len(palette) == 3936
    assert sum(1 for src, dec in palette if src != dec) == 3776

    # sample the palette at a coprime stride (fast tier: 128 colors;
    # the declared parity row sweeps the indexable set every run)
    sample = [palette[(i * 31) % len(palette)] for i in range(128)]
    for start in range(0, len(sample), 4):
        chunk = (sample[start:start + 4] + sample)[:4]
        img = np.zeros((32, 32, 3), np.uint8)
        for bi, (src, _) in enumerate(chunk):
            sy, sx = divmod(bi, 2)
            img[sy * 16:(sy + 1) * 16, sx * 16:(sx + 1) * 16] = src
        dec = decode_jpeg_baseline(encode_jpeg_420(img, quality=60))
        for bi, (_, want) in enumerate(chunk):
            sy, sx = divmod(bi, 2)
            blk = dec[sy * 16:(sy + 1) * 16, sx * 16:(sx + 1) * 16]
            for ch in range(3):
                pl = blk[:, :, ch]
                assert pl.min() == pl.max() == want[ch], (
                    chunk[bi][0], ch,
                )


def test_jpeg_420_roundtrip_smooth_content():
    """encode_jpeg_420 general-content sanity: a smooth gray gradient
    survives the subsampled roundtrip within sub-pixel mean error
    (chroma planes flat at 128 -> no subsampling loss), and the
    decoder sees the 2x2+1+1 sampling factors (not a 4:4:4 stream)."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_420,
    )

    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    g = (xx * 2 + yy).astype(np.uint8)
    img = np.stack([g, g, g], axis=2)
    blob = encode_jpeg_420(img, quality=90)
    # SOF0 component 1 must carry sampling 0x22
    sof = blob.index(b"\xff\xc0")
    assert blob[sof + 11] == 0x22
    dec = decode_jpeg_baseline(blob).astype(int)
    assert dec.shape == (32, 32, 3)
    assert np.abs(dec - img.astype(int)).mean() < 1.5


def test_dct_progressive_members_match_closed_form():
    """The progressive members of the dct gate (seeds % 4 >= 2):
    flat-block SOF2 streams must decode through the REAL progressive
    pipeline (spectral selection, successive approximation, DC
    refinement, AC EOB runs) to the SAME closed-form values as the
    baseline encode -- identical quantized coefficients by
    construction. Pure numpy."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline, encode_jpeg_progressive,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        DCT_QUALITY, _dct_flat_raster, dct_decoded_value,
    )

    for seed in range(8):
        g = _dct_flat_raster(seed)
        raster = np.stack([g, g, g], axis=2) if seed % 2 == 0 else g
        blob = encode_jpeg_progressive(raster, quality=DCT_QUALITY)
        assert b"\xff\xc2" in blob  # really SOF2
        dec = decode_jpeg_baseline(blob)
        for by in range(3):
            for bx in range(4):
                want = dct_decoded_value(int(g[by * 8, bx * 8]))
                blk = dec[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                assert blk.min() == blk.max() == want, (seed, by, bx)


def test_video_dct_frames_closed_form():
    """video_frames_dct's premise (r14): every frame of the synthesized
    MJPEG AVI decodes through the real RIFF walk + baseline JPEG path
    to the flat blocks the floor-arithmetic closed form predicts --
    frame-seed 3*s+f, even seeds RGB with all three channels equal."""
    from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
        iter_mjpeg_frames,
        encode_mjpeg_avi,
        probe_mjpeg_avi,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        DCT_QUALITY,
        _dct_flat_raster,
        dct_decoded_value,
        dct_safe_values,
    )

    safe = dct_safe_values()
    for s in (0, 1, 5):
        frames = []
        for f in range(3):
            fseed = 3 * s + f
            g = _dct_flat_raster(fseed)
            frames.append(
                np.stack([g, g, g], axis=2) if fseed % 2 == 0 else g
            )
        avi = encode_mjpeg_avi(frames, fps=10, quality=DCT_QUALITY)
        meta = probe_mjpeg_avi(avi)
        assert meta["n_frames"] == 3 and meta["width"] == 32
        for f, payload in enumerate(iter_mjpeg_frames(avi)):
            fseed = 3 * s + f
            dec = decode_jpeg_baseline(payload)
            arr = dec if dec.ndim == 3 else dec[:, :, None]
            assert arr.shape[2] == (3 if fseed % 2 == 0 else 1)
            for by in range(3):
                for bx in range(4):
                    want = dct_decoded_value(
                        safe[(31 * fseed + 17 * (by * 4 + bx)) % len(safe)]
                    )
                    blk = arr[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, :]
                    assert blk.min() == blk.max() == want, (s, f, by, bx)


def test_audio_spectral_exhaustive_class_domain():
    """audio_spectral_closed_form's safety argument, checked over the
    ENTIRE class domain (features are functions of s % 16; 0..31
    covers each class twice): the real decode + numpy FFT pipeline
    must agree with the oracle's fixed-association closed form on
    every quantized value, the rolloff double must be bit-equal, and
    the ideal centroid must sit >= 0.01 quanta from its floor boundary
    (measured FFT leakage perturbs it by ~1e-7 quanta)."""
    import io as _io
    import math
    import wave as _wave

    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        _spectral_feature_row,
        decode_audio,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        AUDIO_SPECTRAL_N,
        AUDIO_SPECTRAL_SR,
        _audio_spectral_signal,
        audio_spectral_amps,
        audio_spectral_amps_right,
    )

    assert AUDIO_SPECTRAL_N == 800 and AUDIO_SPECTRAL_SR == 8000

    def wav_bytes(s):
        chans = [_audio_spectral_signal(audio_spectral_amps(s))]
        if s % 2 == 0:
            chans.append(
                _audio_spectral_signal(audio_spectral_amps_right(s))
            )
        frames = np.stack(chans, axis=1).astype("<i2").ravel().tobytes()
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(len(chans))
            w.setsampwidth(2)
            w.setframerate(AUDIO_SPECTRAL_SR)
            w.writeframes(frames)
        return buf.getvalue()

    for s in range(32):
        left = audio_spectral_amps(s)
        if s % 2 == 0:
            right = audio_spectral_amps_right(s)
            eff = tuple((x + y) / 2.0 for x, y in zip(left, right))
        else:
            eff = tuple(float(x) for x in left)
        adc, aq, a_ny = eff
        p0 = (800.0 * adc) ** 2
        p1 = (400.0 * aq) ** 2
        p2 = (800.0 * a_ny) ** 2
        total = p0 + (p1 + p2)
        centroid = (2000.0 * p1 + 4000.0 * p2) / total
        thr = 0.85 * total
        idx = 0 if p0 >= thr else (200 if p0 + p1 >= thr else 400)
        rolloff = idx * (1.0 / (800.0 * (1.0 / 8000.0)))
        l0 = math.log1p(p0 / 2.0 ** 30)
        l8 = math.log1p(p1 / 2.0 ** 30)
        l15 = math.log1p(p2 / 2.0 ** 30)
        nrm = math.sqrt(l0 * l0 + (l8 * l8 + l15 * l15))
        want_micro = {
            b: math.floor(
                1e6 * np.float64(np.float32(lv / nrm)) + 0.5
            )
            for b, lv in ((0, l0), (8, l8), (15, l15))
        }

        # boundary margin of the ideal centroid (quanta)
        frac = abs((centroid * 1000.0) % 1.0 - 0.5)
        assert frac >= 0.01, (s, centroid)

        samples, sr = decode_audio(wav_bytes(s))
        c, r, fv = _spectral_feature_row(samples, sr, 16)
        assert r == rolloff, (s, repr(r), repr(rolloff))
        assert math.floor(c * 1000.0 + 0.5) == math.floor(
            centroid * 1000.0 + 0.5
        ), (s, c, centroid)
        for b in range(16):
            got = math.floor(1e6 * np.float64(fv[b]) + 0.5)
            assert got == want_micro.get(b, 0), (s, b, got)
