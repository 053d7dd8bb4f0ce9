"""Header-only media probes (multimodal/probe.py): probe metadata must
match full-decode ground truth on synthesized fixtures; classification
(ok / unsupported / corrupt) must match the decode path for
header-level defects, and the documented header-vs-payload asymmetry
is pinned explicitly."""

import numpy as np
import pytest

from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
    decode_audio,
    decode_image,
    encode_png,
)
from rag_vertex_ai_vector_search_spark.multimodal.flac import (
    decode_flac,
    encode_flac,
)
from rag_vertex_ai_vector_search_spark.multimodal.g711 import (
    encode_wav_g711,
)
from rag_vertex_ai_vector_search_spark.multimodal.gif import encode_gif
from rag_vertex_ai_vector_search_spark.multimodal.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    encode_jpeg_extended12,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)
from rag_vertex_ai_vector_search_spark.multimodal.mjpeg import (
    encode_mjpeg_avi,
)
from rag_vertex_ai_vector_search_spark.multimodal.probe import (
    extract_media_probe,
    probe_flac,
    probe_jpeg,
    probe_media,
    probe_png,
    probe_wav,
)
from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
    encode_wav_pcm,
)


def _img(h=24, w=32, rgb=True, seed=5):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if rgb else (h, w)
    return rng.randint(0, 255, size=shape, dtype=np.uint8)


def test_probe_png_matches_decode():
    for rgb in (True, False):
        img = _img(rgb=rgb)
        data = encode_png(img)
        meta = probe_png(data)
        decoded = decode_image(data)
        assert (meta["height"], meta["width"]) == decoded.shape[:2]
        assert meta["channels"] == (3 if rgb else 1)
        assert meta["bit_depth"] == 8
        assert meta["interlaced"] is False


def test_probe_jpeg_modes_match_encoders():
    img = _img()
    cases = [
        (encode_jpeg_baseline(img), "baseline", 8, 3),
        (encode_jpeg_progressive(img), "progressive", 8, 3),
        (encode_jpeg_lossless(img[:, :, 0]), "lossless", 8, 1),
        (
            encode_jpeg_extended12(
                (_img(rgb=False).astype(np.uint16) << 4)
            ),
            "extended", 12, 1,
        ),
    ]
    for data, mode, precision, n_comp in cases:
        meta = probe_jpeg(data)
        assert meta["mode"] == mode
        assert meta["precision"] == precision
        assert meta["n_components"] == n_comp
        assert (meta["height"], meta["width"]) == (24, 32)
    # dimensions agree with the real decoder on the decodable mode
    decoded = decode_jpeg_baseline(cases[0][0])
    m0 = probe_jpeg(cases[0][0])
    assert (m0["height"], m0["width"]) == decoded.shape[:2]


def test_probe_jpeg_malformed_headers_raise_valueerror():
    # EOI before any SOF: 0xD9 is a standalone marker (no length word);
    # the walk must fall off the end as "no SOF", not struct.error.
    eoi_first = b"\xff\xd8\xff\xd9" + b"\x00" * 8
    with pytest.raises(ValueError):
        probe_jpeg(eoi_first)
    # Stream truncated inside the SOF segment itself: the declared
    # length promises bytes the buffer does not have.
    good = encode_jpeg_baseline(_img())
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    truncated = good[: sof + 5]  # marker + length word + 1 byte
    with pytest.raises(ValueError):
        probe_jpeg(truncated)


def test_probe_wav_matches_decode():
    sig = np.sin(np.linspace(0, 20, 480))
    for sw, ch in ((1, 1), (2, 2), (4, 1)):
        data = encode_wav_pcm(sig, sr=8000, channels=ch, sampwidth=sw)
        meta = probe_wav(data)
        samples, sr = decode_audio(data)
        assert meta["sample_rate"] == sr == 8000
        assert meta["channels"] == ch == samples.shape[1]
        assert meta["n_frames"] == samples.shape[0]
        assert meta["bits_per_sample"] == sw * 8
        assert meta["duration_s"] == samples.shape[0] / sr


def test_probe_wav_g711_and_unsupported_tags():
    pcm = (np.sin(np.linspace(0, 20, 320)) * 20000).astype(np.int16)
    for law, tag in (("ulaw", 7), ("alaw", 6)):
        data = encode_wav_g711(pcm, law=law, sample_rate=8000)
        meta = probe_wav(data)
        samples, sr = decode_audio(data)
        assert meta["format_tag"] == tag
        assert meta["n_frames"] == samples.shape[0]
        assert meta["sample_rate"] == sr
    # IEEE float tag (3): outside the decode matrix -> unsupported,
    # matching decode_audio's NotImplementedError
    import struct

    body = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(body)) + body
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        probe_wav(data)
    with pytest.raises(NotImplementedError):
        decode_audio(data)


def test_probe_flac_matches_decode():
    sig = (np.sin(np.linspace(0, 30, 600)) * 12000).astype(np.int32)
    data = encode_flac(sig.reshape(-1, 1), sample_rate=16000, bps=16)
    meta = probe_flac(data)
    samples, sr, bps = decode_flac(data)
    assert meta["sample_rate"] == sr == 16000
    assert meta["channels"] == samples.shape[1] == 1
    assert meta["bits_per_sample"] == bps == 16
    assert meta["n_frames"] == samples.shape[0]


def test_probe_media_dispatch_and_foreign_bytes():
    img = _img()
    frames = [_img(seed=s) for s in (1, 2, 3)]
    gif = encode_gif([np.zeros((4, 4), np.uint8)])
    containers = {
        "png": encode_png(img),
        "jpeg": encode_jpeg_baseline(img),
        "gif": gif,
        "avi": encode_mjpeg_avi(frames, fps=10),
        "wav": encode_wav_pcm(np.zeros(100), sr=8000),
        "flac": encode_flac(
            np.zeros((64, 1), np.int32), sample_rate=8000, bps=16
        ),
    }
    for name, data in containers.items():
        meta = probe_media(data)
        assert meta["container"] == name, name
    avi = probe_media(containers["avi"])
    assert avi["n_frames"] == 3 and avi["width"] == 32
    # ID3-tagged bytes are a RECOGNIZED container since r15: tag with
    # no complete frame behind it classifies corrupt, not foreign
    with pytest.raises(ValueError):
        probe_media(b"ID3\x04\x00\x00\x00\x00\x00\x00mp3-ish bytes")
    with pytest.raises(NotImplementedError):
        probe_media(b"totally foreign bytes")
    with pytest.raises(NotImplementedError):
        probe_media(b"")


def test_probe_header_vs_payload_asymmetry():
    """Header-level defects classify exactly like the decoder; payload
    defects are the documented blind spot (probe ok, decode corrupt)."""
    # header-level: WAV truncated inside the data chunk -> corrupt BOTH
    wav = encode_wav_pcm(np.zeros(400), sr=8000)
    trunc = wav[: len(wav) // 3]
    with pytest.raises(ValueError):
        probe_wav(trunc)
    with pytest.raises(Exception) as e:
        decode_audio(trunc)
    assert not isinstance(e.value, NotImplementedError)
    # payload-level: bit-flipped IDAT -> probe OK (header untouched),
    # full decode corrupt
    png = bytearray(encode_png(_img()))
    idat = bytes(png).find(b"IDAT")
    png[idat + 10] ^= 0xFF
    assert probe_png(bytes(png))["width"] == 32  # header still parses
    with pytest.raises(Exception) as e2:
        decode_image(bytes(png))
    assert not isinstance(e2.value, NotImplementedError)


def test_extract_media_probe_skip_contract(spark):
    """The Spark cheap mode: mixed clean + defective media through
    extract_media_probe(on_error='skip') feeds media_decode_report
    with exact counted statuses."""
    from rag_vertex_ai_vector_search_spark.multimodal.binary_ops import (
        media_decode_report,
    )

    img = _img()
    rows = [
        (1, "image", bytearray(encode_png(img))),
        (2, "image", bytearray(encode_jpeg_baseline(img))),
        (3, "audio", bytearray(encode_wav_pcm(np.zeros(64), sr=8000))),
        (4, "audio", bytearray(b"\x00no-container-we-know")),  # unsupported
        (5, "audio",
         bytearray(encode_wav_pcm(np.zeros(400), sr=8000)[:30])),  # corrupt
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    probed = extract_media_probe(df, on_error="skip")
    got = {r.doc_id: r for r in probed.collect()}
    assert got[1].container == "png" and got[1].decode_status == "ok"
    assert got[2].container == "jpeg" and got[2].width == 32
    assert got[3].sample_rate == 8000 and got[3].n_frames == 64
    assert got[4].decode_status == "unsupported"
    assert got[4].container is None
    assert got[5].decode_status == "corrupt"

    report = {
        r.media_type: r
        for r in media_decode_report(probed).collect()
    }
    assert report["image"].n_ok == 2 and report["image"].n_items == 2
    assert report["audio"].n_ok == 1
    assert report["audio"].n_unsupported == 1
    assert report["audio"].n_corrupt == 1

    # strict mode raises on the first bad asset
    with pytest.raises(Exception):
        extract_media_probe(df, on_error="raise").collect()


def test_probe_mp3_matrix():
    """MP3 frame-header walk (r15, VERDICT r14 #3): valid container ->
    exact frame count / duration / codec params; truncated and
    header-damaged -> ValueError (corrupt); foreign -> Not
    ImplementedError. The synthesized stub is MPEG1 Layer III 64 kbps
    mono @ 32 kHz: 288-byte frames, 36 ms each -- closed-form."""
    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_mp3,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        encode_mp3_stub,
    )

    for seed in range(7):
        mp3 = encode_mp3_stub(seed)
        m = probe_mp3(mp3)
        n = 10 + seed % 5
        assert m["n_frames"] == n
        assert m["duration_s"] == pytest.approx(0.036 * n)
        assert (m["mpeg_version"], m["layer"]) == ("1", 3)
        assert m["bitrate"] == 64000 and m["sample_rate"] == 32000
        assert m["channels"] == 1
        # a truncated final frame is tolerated; the count drops by one
        assert probe_mp3(mp3[:-10])["n_frames"] == n - 1
        # normalized dispatch
        meta = probe_media(mp3)
        assert meta["container"] == "mp3"
        assert meta["duration_s"] == pytest.approx(0.036 * n)

    frame = encode_mp3_stub(0)[10:10 + 288]
    # bare frames with no ID3 tag probe fine (sync sniff)
    assert probe_mp3(frame * 3)["n_frames"] == 3
    # reserved layer bits / invalid bitrate index -> corrupt
    with pytest.raises(ValueError):
        probe_mp3(b"\xff\xf9" + frame[2:])  # layer bits 00
    with pytest.raises(ValueError):
        probe_mp3(b"\xff\xfb\xf0\xc0" + frame[4:])  # bitrate idx 15
    # sync present but no complete frame -> corrupt
    with pytest.raises(ValueError):
        probe_mp3(frame[:100])
    # non-syncsafe ID3 size -> corrupt
    with pytest.raises(ValueError):
        probe_mp3(b"ID3\x04\x00\x00\xff\xff\xff\xff" + frame)
    with pytest.raises(NotImplementedError):
        probe_mp3(b"RIFF not mpeg audio")


def test_probe_mp4_matrix():
    """ISO-BMFF box walk (r15, VERDICT r14 #3): valid movie header ->
    brand / timescale / duration / track codec + rate; box-size
    overruns and missing moov -> ValueError; foreign bytes ->
    NotImplementedError."""
    import struct

    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_mp4,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        encode_mp4_stub,
    )

    for seed in range(9):
        mp4 = encode_mp4_stub(seed)
        m = probe_mp4(mp4)
        assert m["major_brand"] == "isom"
        assert m["timescale"] == 1000
        dur_ms = 250 * (5 + seed % 7)
        assert m["duration_s"] == pytest.approx(dur_ms / 1000.0)
        (track,) = m["tracks"]
        assert track["handler"] == "soun" and track["codec"] == "mp4a"
        assert track["channels"] == 1 and track["sample_rate"] == 8000
        assert track["n_samples"] == 20 + seed % 3
        meta = probe_media(mp4)
        assert meta["container"] == "mp4"
        assert meta["sample_rate"] == 8000
        assert meta["n_frames"] == 20 + seed % 3
        assert meta["duration_s"] == pytest.approx(dur_ms / 1000.0)

    mp4 = encode_mp4_stub(1)
    # truncated inside moov: declared box size overruns -> corrupt
    with pytest.raises(ValueError):
        probe_mp4(mp4[: len(mp4) - 40])
    # ftyp alone (no moov) -> corrupt
    ftyp_len = struct.unpack_from(">I", mp4, 0)[0]
    with pytest.raises(ValueError):
        probe_mp4(mp4[:ftyp_len])
    with pytest.raises(NotImplementedError):
        probe_mp4(b"\x00\x00\x00\x08free not bmff")


def test_extract_media_probe_covers_mp3_mp4(spark):
    """The Spark cheap mode over the crawl-dominant formats: the
    defect-synthesis corpus now carries probeable audio/mpeg and
    video/mp4 items whose FULL decode stays unsupported -- the probe
    report prices them (duration, rates) instead of a bare skip."""
    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        extract_media_probe,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        synthesize_media_with_defects,
    )
    from pyspark.sql import functions as F

    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = synthesize_media_with_defects(ids)
    probed = extract_media_probe(media, on_error="skip")
    rows = {
        (r.doc_id, r.media_type): r for r in probed.collect()
    }
    for seed in range(12):
        # PNG header survives the payload bit-flip: probe always ok
        assert rows[(seed, "image/png")].decode_status == "ok"
        wav = rows[(seed, "audio/wav")]
        assert wav.decode_status == (
            "corrupt" if seed % 4 == 1 else "ok"
        )
        if seed % 3 == 0:
            mp3 = rows[(seed, "audio/mpeg")]
            assert mp3.decode_status == "ok" and mp3.container == "mp3"
            assert round(mp3.duration_s * 1000) == 36 * (10 + seed % 5)
            mp4 = rows[(seed, "video/mp4")]
            assert mp4.decode_status == "ok" and mp4.container == "mp4"
            assert round(mp4.duration_s * 1000) == 250 * (5 + seed % 7)


def _ogg_page(body: bytes, *, granule: int, htype: int, seq: int) -> bytes:
    import struct as _s

    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS\x00" + bytes([htype]) + _s.pack("<q", granule)
        + _s.pack("<III", 1234, seq, 0) + bytes([len(segs)])
        + bytes(segs) + body
    )


def test_probe_webp_matrix():
    """WebP chunk walk (r15): lossy / lossless / extended dims,
    truncation and bad start codes classify corrupt, foreign bytes
    classify unsupported."""
    import struct as _s

    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_webp,
    )

    def riff(payload):
        return b"RIFF" + _s.pack("<I", 4 + len(payload)) + b"WEBP" + payload

    lossy = riff(
        b"VP8 " + _s.pack("<I", 10)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a" + _s.pack("<HH", 320, 240)
    )
    m = probe_webp(lossy)
    assert (m["format"], m["width"], m["height"]) == ("lossy", 320, 240)
    assert probe_media(lossy)["container"] == "webp"
    assert probe_media(lossy)["width"] == 320

    bits = ((240 - 1) << 14) | (320 - 1)
    lossless = riff(b"VP8L" + _s.pack("<I", 5) + b"\x2f" + _s.pack("<I", bits))
    m = probe_webp(lossless)
    assert (m["format"], m["width"], m["height"]) == ("lossless", 320, 240)

    vp8x = riff(
        b"VP8X" + _s.pack("<I", 10) + bytes([0x10, 0, 0, 0])
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    )
    m = probe_webp(vp8x)
    assert (m["width"], m["height"]) == (640, 480)
    assert m["has_alpha"] and m["has_animation"] is False

    with pytest.raises(ValueError):
        probe_webp(lossy[:-6])  # chunk overruns the buffer
    with pytest.raises(ValueError):
        bad = bytearray(lossy)
        bad[23] ^= 0xFF  # corrupt the 0x9d012a start code
        probe_webp(bytes(bad))
    with pytest.raises(NotImplementedError):
        probe_webp(b"RIFF\x04\x00\x00\x00WAVE")  # wrong RIFF form


def test_probe_ogg_matrix():
    """Ogg page walk (r15): Vorbis and Opus identification headers,
    exact duration from the final granule, corrupt/foreign
    classification."""
    import struct as _s

    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_ogg,
    )

    vorbis_id = (
        b"\x01vorbis" + _s.pack("<I", 0) + bytes([2])
        + _s.pack("<I", 44100) + b"\x00" * 12 + b"\xb8\x01"
    )
    ogg = (
        _ogg_page(vorbis_id, granule=0, htype=0x02, seq=0)
        + _ogg_page(b"\x00" * 10, granule=22050, htype=0x00, seq=1)
        + _ogg_page(b"\x00" * 10, granule=88200, htype=0x04, seq=2)
    )
    m = probe_ogg(ogg)
    assert m["codec"] == "vorbis" and m["channels"] == 2
    assert m["sample_rate"] == 44100 and m["n_frames"] == 88200
    assert m["duration_s"] == pytest.approx(2.0)
    meta = probe_media(ogg)
    assert meta["container"] == "ogg-vorbis"
    assert meta["duration_s"] == pytest.approx(2.0)

    opus_id = (
        b"OpusHead" + bytes([1, 1]) + _s.pack("<H", 312)
        + _s.pack("<I", 16000) + _s.pack("<h", 0) + bytes([0])
    )
    opus = (
        _ogg_page(opus_id, granule=0, htype=0x02, seq=0)
        + _ogg_page(b"\x00" * 8, granule=48000 + 312, htype=0x04, seq=1)
    )
    m = probe_ogg(opus)
    assert m["codec"] == "opus" and m["sample_rate"] == 16000
    assert m["n_frames"] == 48000  # pre-skip subtracted
    assert m["duration_s"] == pytest.approx(1.0)  # 48 kHz ticks

    # truncated page body -> corrupt
    with pytest.raises(ValueError):
        probe_ogg(ogg[:-5])
    # recognized Ogg, unknown first packet -> unsupported
    with pytest.raises(NotImplementedError):
        probe_ogg(_ogg_page(b"\x80theora-ish", granule=0, htype=2, seq=0))
    with pytest.raises(NotImplementedError):
        probe_ogg(b"not ogg at all")


def test_probe_tiff_matrix():
    """TIFF first-IFD walk (r15): both byte orders, SHORT and LONG
    dims, truncation/missing-dims corrupt, foreign unsupported."""
    import struct as _s

    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_tiff,
    )

    def tiff(endian, entries):
        e = "<" if endian == "II" else ">"
        magic = b"II*\x00" if endian == "II" else b"MM\x00*"
        body = _s.pack(e + "H", len(entries))
        for tag, vtype, count, val in entries:
            word = (
                _s.pack(e + "H", val) + b"\x00\x00"
                if vtype == 3 else _s.pack(e + "I", val)
            )
            body += _s.pack(e + "HHI", tag, vtype, count) + word
        body += _s.pack(e + "I", 0)  # next-IFD pointer
        return magic + _s.pack(e + "I", 8) + body

    little = tiff("II", [
        (256, 3, 1, 640), (257, 4, 1, 480), (277, 3, 1, 3),
        (259, 3, 1, 1),
    ])
    m = probe_tiff(little)
    assert (m["width"], m["height"], m["samples_per_pixel"]) == (
        640, 480, 3,
    )
    assert m["byte_order"] == "little" and m["compression"] == 1
    big = tiff("MM", [(256, 4, 1, 12), (257, 3, 1, 34)])
    m = probe_tiff(big)
    assert (m["width"], m["height"]) == (12, 34)
    assert m["byte_order"] == "big"
    meta = probe_media(little)
    assert meta["container"] == "tiff" and meta["width"] == 640
    assert meta["channels"] == 3

    with pytest.raises(ValueError):
        probe_tiff(little[:14])  # truncated IFD
    with pytest.raises(ValueError):
        probe_tiff(tiff("II", [(259, 3, 1, 1)]))  # no dims
    with pytest.raises(NotImplementedError):
        probe_tiff(b"not a tiff")


def test_probe_mkv_matrix():
    """Matroska/WebM EBML walk (r16, VERDICT r15 #4): valid WebM ->
    doc type / closed-form duration / track codec + dims; truncated
    and overrunning elements -> ValueError; EBML with a foreign
    DocType and non-EBML bytes -> NotImplementedError."""
    from rag_vertex_ai_vector_search_spark.multimodal.probe import (
        probe_mkv,
    )
    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        _ebml_el,
        encode_webm_stub,
    )

    for seed in range(11):
        webm = encode_webm_stub(seed)
        m = probe_mkv(webm)
        assert m["doc_type"] == "webm"
        assert m["timestamp_scale_ns"] == 1_000_000
        dur_ms = 40 * (8 + seed % 6)
        assert m["duration_s"] == pytest.approx(dur_ms / 1000.0)
        (track,) = m["tracks"]
        assert track["type"] == "video" and track["codec"] == "V_VP9"
        assert (track["width"], track["height"]) == (320, 180)
        meta = probe_media(webm)
        assert meta["container"] == "webm"
        assert (meta["width"], meta["height"]) == (320, 180)
        assert meta["duration_s"] == pytest.approx(dur_ms / 1000.0)
        assert meta["channels"] is None  # no audio track in the stub

    webm = encode_webm_stub(3)
    # truncated mid-Segment: a child element overruns -> corrupt
    with pytest.raises(ValueError):
        probe_mkv(webm[: len(webm) - 10])
    # EBML header alone (no Segment) -> corrupt
    hdr_end = len(encode_webm_stub(3)) - len(
        webm[webm.index(b"\x18\x53\x80\x67"):]
    )
    with pytest.raises(ValueError):
        probe_mkv(webm[:hdr_end])
    # recognized EBML, foreign schema -> unsupported
    foreign = _ebml_el(
        0x1A45DFA3, _ebml_el(0x4282, b"notmatroska")
    ) + _ebml_el(0x18538067, b"")
    with pytest.raises(NotImplementedError):
        probe_mkv(foreign)
    # garbage -> foreign container
    with pytest.raises(NotImplementedError):
        probe_mkv(b"\x00\x01\x02\x03 junk")
    with pytest.raises(NotImplementedError):
        probe_media(b"\x00\x01\x02\x03 junk")


def test_extract_media_probe_covers_webm(spark):
    """The defect-synthesis corpus plants video/webm for seed%5==0;
    the Spark probe path earns its closed-form duration through the
    real EBML walk (the declared corpus_quality_report columns count
    it)."""
    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.multimodal.synthesis import (
        synthesize_media_with_defects,
    )

    ids = spark.range(0, 15).select(F.col("id").alias("doc_id"))
    media = synthesize_media_with_defects(ids)
    probed = extract_media_probe(
        media.filter(F.col("media_type") == "video/webm"),
        on_error="skip",
    ).collect()
    assert {r.doc_id for r in probed} == {0, 5, 10}
    for r in probed:
        assert r.decode_status == "ok" and r.container == "webm"
        assert round(r.duration_s * 1000) == 40 * (8 + r.doc_id % 6)
