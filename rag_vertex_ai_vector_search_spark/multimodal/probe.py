"""Header-only media probes: container metadata WITHOUT entropy decode.

Crawl-scale media statistics (dimension histograms, sample-rate mixes,
codec distributions over billions of assets) should not pay full
pixel/PCM decode cost: a probe reads the container header and stops.
``probe_gif`` (gif.py) established the pattern; this module completes
the family for the other in-repo codecs (VERDICT r9 #7):

- ``probe_png``   -- PNG signature + IHDR (width/height/depth/color/
  interlace), validated against the SAME support matrix the full
  decoder enforces, so probe and decode agree on what is
  DECODE_UNSUPPORTED.
- ``probe_jpeg``  -- marker walk to the first SOF segment
  (width/height/components/precision + coding mode); SOF5+ raise the
  same arithmetic/hierarchical NotImplementedError as the decoder.
- ``probe_wav``   -- RIFF/WAVE fmt+data chunk walk (format tag,
  channels, rate, bits, frame count, duration); format tags and PCM
  widths outside the decode support matrix ({PCM 8/16/32-bit, G.711
  A-law/mu-law}) raise NotImplementedError, malformed containers
  (incl. the r9 short-RIFF rule) raise ValueError -> DECODE_CORRUPT.
- ``probe_flac``  -- 'fLaC' magic + STREAMINFO (rate/channels/bits/
  total samples).
- ``probe_media`` -- magic-sniffing dispatcher (PNG/JPEG/GIF/WAV/
  FLAC/AVI) returning a normalized scalar dict; foreign bytes raise
  NotImplementedError.
- ``extract_media_probe`` -- the Spark operator: Arrow-batched
  mapInPandas adding the normalized probe columns, with the same
  ``on_error="skip"`` counted-skip contract as the full extractors,
  so ``media_decode_report`` aggregates probe results unchanged --
  the CHEAP MODE of decode-rate accounting.

Contract caveat (by design): a probe's verdict is HEADER-LEVEL. A
stream whose header parses but whose payload is damaged (bit-flipped
IDAT, truncated tail past the declared chunk sizes) probes "ok" --
payload corruption is only observable by decoding. probe_wav's data
chunk size check still catches truncation the RIFF framing exposes.
tests/test_probe.py pins probe metadata to full-decode ground truth
on synthesized fixtures and documents the asymmetry on planted tail
defects.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame

from .binary_ops import _PNG_SIG, _check_on_error, _decode_status_of
from .g711 import WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW, parse_wav_chunks
from .gif import probe_gif
from .mjpeg import probe_mjpeg_avi

WAVE_FORMAT_PCM = 1

_JPEG_MODES = {
    0xC0: "baseline",
    0xC1: "extended",
    0xC2: "progressive",
    0xC3: "lossless",
}


def probe_png(content: bytes) -> dict:
    """PNG header metadata from the IHDR chunk -- no inflate, no
    unfilter. Validates the same support matrix as the full decoder
    (binary_ops.py::_decode_png) so probe and decode classify
    unsupported forms identically."""
    data = bytes(content or b"")
    if data[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG stream")
    if len(data) < 8 + 8 + 13:
        raise ValueError("truncated PNG header")
    (length,) = struct.unpack_from(">I", data, 8)
    if data[12:16] != b"IHDR" or length != 13:
        raise ValueError("PNG first chunk is not a 13-byte IHDR")
    width, height, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color}")
    if depth < 8 and color not in (0, 3):
        raise NotImplementedError(
            f"PNG bit depth {depth} invalid for color type {color}"
        )
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace}")
    return {
        "width": int(width), "height": int(height),
        "bit_depth": int(depth), "color_type": int(color),
        "channels": int(channels), "interlaced": interlace == 1,
    }


def probe_jpeg(content: bytes) -> dict:
    """JPEG frame metadata from the first SOF marker -- the marker walk
    skips every segment by its declared length and never touches
    entropy-coded data. Modes follow the decoder's support matrix
    (jpeg.py::decode_jpeg_baseline): SOF0/1/2/3 report their mode,
    arithmetic/hierarchical SOFs raise NotImplementedError."""
    data = bytes(content or b"")
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers (EOI included: no length word)
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if marker in _JPEG_MODES:
            if pos + 8 > len(data):
                raise ValueError("truncated JPEG header (short SOF)")
            precision, height, width, n_comp = struct.unpack_from(
                ">BHHB", data, pos + 2
            )
            return {
                "width": int(width), "height": int(height),
                "n_components": int(n_comp), "precision": int(precision),
                "mode": _JPEG_MODES[marker],
            }
        if 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (arithmetic/"
                "hierarchical) not supported; SOF0/1/2/3 only"
            )
        if marker == 0xDA:
            raise NotImplementedError("SOS before SOF")
        pos += seg_len
    raise ValueError("truncated JPEG header (no SOF marker)")


def probe_wav(content: bytes) -> dict:
    """RIFF/WAVE metadata from the fmt/data chunks -- no sample
    expansion. Foreign bytes raise NotImplementedError; malformed
    RIFF/WAVE containers (incl. blobs truncated inside the 12-byte
    RIFF header -- the r9 short-RIFF rule) raise ValueError so the
    skip contract counts them DECODE_CORRUPT, exactly like
    decode_audio. Format tags / sample widths outside the decode
    support matrix raise NotImplementedError."""
    data = bytes(content or b"")
    is_riff_wave = data[:4] == b"RIFF" and (
        len(data) < 12 or data[8:12] == b"WAVE"
    )
    if not is_riff_wave:
        raise NotImplementedError("not a RIFF/WAVE stream")
    info = parse_wav_chunks(data)  # ValueError on malformed container
    tag = info["format_tag"]
    ch = info["channels"]
    bits = info["bits_per_sample"]
    if tag == WAVE_FORMAT_PCM:
        if bits not in (8, 16, 32):
            raise NotImplementedError(
                f"unsupported PCM sample width {bits // 8}"
            )
    elif tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        if bits != 8:
            raise ValueError(
                f"G.711 is 8 bits/sample, fmt says {bits}"
            )
    else:
        raise NotImplementedError(f"unsupported WAV format tag {tag}")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    frame_bytes = ch * (bits // 8)
    if frame_bytes and len(info["data"]) % frame_bytes:
        raise ValueError("data chunk does not frame-align")
    n_frames = len(info["data"]) // frame_bytes if frame_bytes else 0
    return {
        "format_tag": int(tag), "channels": int(ch),
        "sample_rate": int(info["sample_rate"]),
        "bits_per_sample": int(bits), "n_frames": int(n_frames),
        "duration_s": (
            n_frames / info["sample_rate"] if info["sample_rate"] else 0.0
        ),
    }


def probe_flac(content: bytes) -> dict:
    """FLAC STREAMINFO metadata -- magic + metadata-block walk, no
    frame parsing (flac.py::decode_flac's header stage)."""
    data = bytes(content or b"")
    if data[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise NotImplementedError("truncated FLAC metadata")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            if len(body) < 18:
                raise ValueError("short STREAMINFO block")
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            channels = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | int.from_bytes(
                body[14:18], "big"
            )
            return {
                "channels": int(channels), "sample_rate": int(sr),
                "bits_per_sample": int(bps), "n_frames": int(total),
                "duration_s": total / sr if sr else 0.0,
            }
        pos += 4 + length
        if hdr & 0x80:
            raise NotImplementedError("FLAC stream missing STREAMINFO")


# MPEG audio frame tables (ISO/IEC 11172-3 / 13818-3): indexed by
# [version][layer]; kbps, 0 = free-format (unsupported here), None
# slot = the reserved index 15 (invalid -> corrupt).
_MP3_BITRATES = {
    # MPEG1: layer 1, 2, 3
    (3, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (3, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    # MPEG2 / 2.5 share tables: layer 1 vs layer 2+3
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def _mp3_skip_id3v2(data: bytes) -> int:
    """Offset past a leading ID3v2 tag (syncsafe 28-bit size), 0 when
    absent."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise ValueError("ID3v2 size bytes must be syncsafe")
        size = (size << 7) | b
    return 10 + size


def probe_mp3(content: bytes) -> dict:
    """MPEG-audio metadata from a frame-header walk -- version, layer,
    bitrate/samplerate per the public ISO 11172-3 header tables, frame
    count and an exact duration from samples-per-frame x frames (no
    Xing/VBRI shortcut needed: the walk IS the exact count; per frame
    it is a handful of integer ops on ~26-36 ms of audio, so even a
    podcast-hour probes in microseconds). A leading ID3v2 tag is
    skipped by its syncsafe size. Classification follows the repo
    contract: no sync/ID3 magic -> NotImplementedError (foreign
    bytes); sync present but reserved version/layer, invalid
    bitrate/samplerate index, free-format bitrate, or zero complete
    frames -> ValueError (corrupt). Trailing garbage after the last
    complete frame (an ID3v1 tag, a truncated final frame) stops the
    walk without invalidating the counted frames -- the tolerant
    behavior every real-world MP3 consumer implements."""
    data = bytes(content or b"")
    start = _mp3_skip_id3v2(data)
    if start == 0 and not (
        len(data) >= 2
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
    ):
        raise NotImplementedError("not an MPEG audio stream")
    pos = start
    n_frames = 0
    first = None
    total_samples = 0
    while pos + 4 <= len(data):
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
            break  # trailing non-frame bytes end the walk
        b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
        version_bits = (b1 >> 3) & 0x03  # 0=2.5, 2=MPEG2, 3=MPEG1
        layer_bits = (b1 >> 1) & 0x03    # 1=III, 2=II, 3=I
        if version_bits == 1 or layer_bits == 0:
            raise ValueError("reserved MPEG version/layer bits")
        layer = 4 - layer_bits            # 1, 2, 3
        vkey = 3 if version_bits == 3 else 2
        br_idx = (b2 >> 4) & 0x0F
        sr_idx = (b2 >> 2) & 0x03
        if br_idx == 15 or sr_idx == 3:
            raise ValueError("invalid MPEG bitrate/samplerate index")
        bitrate = _MP3_BITRATES[(vkey, layer)][br_idx] * 1000
        if bitrate == 0:
            raise ValueError("free-format MPEG bitrate not supported")
        sample_rate = _MP3_RATES[version_bits][sr_idx]
        padding = (b2 >> 1) & 0x01
        if layer == 1:
            frame_bytes = (12 * bitrate // sample_rate + padding) * 4
            samples = 384
        else:
            samples = (
                1152 if (layer == 2 or version_bits == 3) else 576
            )
            frame_bytes = samples * bitrate // (8 * sample_rate) + padding
        if pos + frame_bytes > len(data):
            break  # truncated final frame: count only complete frames
        if first is None:
            first = {
                "mpeg_version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
                "layer": layer,
                "bitrate": bitrate,
                "sample_rate": sample_rate,
                "channels": 1 if ((b3 >> 6) & 0x03) == 3 else 2,
            }
        n_frames += 1
        total_samples += samples
        pos += frame_bytes
    if n_frames == 0:
        raise ValueError("no complete MPEG audio frame")
    return {
        **first,
        "n_frames": int(n_frames),
        "duration_s": total_samples / first["sample_rate"],
    }


def probe_mp4(content: bytes) -> dict:
    """ISO-BMFF (MP4/MOV/M4A) metadata from a box walk: ftyp major
    brand, mvhd timescale/duration, per-trak handler + first stsd
    sample-entry fourcc, tkhd presentation dims (16.16 fixed point),
    stsz/stz2 sample counts, and mp4a channel/rate from the audio
    sample entry -- headers only, no mdat byte is touched. A box whose
    declared size overruns the buffer (or undershoots its own header)
    raises ValueError -> DECODE_CORRUPT; absent moov/mvhd likewise
    (streaming-fragmented files without a movie box are not
    statistics-probeable). Non-ftyp leading bytes raise
    NotImplementedError (foreign container)."""
    data = bytes(content or b"")
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF stream")

    def walk(lo: int, hi: int):
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("truncated ISO-BMFF box header")
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > hi:
                    raise ValueError("truncated largesize box header")
                (size,) = struct.unpack_from(">Q", data, pos + 8)
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError(
                    f"ISO-BMFF box {btype!r} size {size} overruns"
                )
            yield btype, body, pos + size
            pos += size

    major_brand = data[8:12].decode("latin-1")
    out = {
        "major_brand": major_brand, "timescale": None,
        "duration_s": None, "tracks": [],
    }
    moov = None
    for btype, body, end in walk(0, len(data)):
        if btype == b"moov":
            moov = (body, end)
    if moov is None:
        raise ValueError("ISO-BMFF stream has no moov box")

    def full_box(body):
        version = data[body]
        return version, body + 4

    def find(lo, hi, *names):
        for btype, body, end in walk(lo, hi):
            if btype in names:
                yield btype, body, end

    for btype, body, end in walk(*moov):
        if btype == b"mvhd":
            version, p = full_box(body)
            if version == 1:
                ts, dur = struct.unpack_from(">IQ", data, p + 16)
            else:
                ts, dur = struct.unpack_from(">II", data, p + 8)
            out["timescale"] = int(ts)
            out["duration_s"] = dur / ts if ts else None
        elif btype == b"trak":
            track = {
                "handler": None, "codec": None, "width": None,
                "height": None, "n_samples": None, "channels": None,
                "sample_rate": None,
            }
            for t2, b2, e2 in walk(body, end):
                if t2 == b"tkhd":
                    version, p = full_box(b2)
                    # width/height are the LAST 8 bytes (16.16 fixed)
                    w, h = struct.unpack_from(">II", data, e2 - 8)
                    track["width"] = w >> 16 or None
                    track["height"] = h >> 16 or None
                elif t2 == b"mdia":
                    for t3, b3, e3 in walk(b2, e2):
                        if t3 == b"hdlr":
                            track["handler"] = data[b3 + 8:b3 + 12].decode(
                                "latin-1"
                            )
                        elif t3 == b"minf":
                            for _, b4, e4 in find(b3, e3, b"stbl"):
                                for t5, b5, e5 in walk(b4, e4):
                                    if t5 == b"stsd":
                                        # entry_count @ +4, first entry
                                        # header: size(4) + fourcc(4)
                                        p = b5 + 8
                                        track["codec"] = data[
                                            p + 4:p + 8
                                        ].decode("latin-1")
                                        if track["codec"] == "mp4a":
                                            ch, _ss = struct.unpack_from(
                                                ">HH", data, p + 24
                                            )
                                            (srf,) = struct.unpack_from(
                                                ">I", data, p + 32
                                            )
                                            track["channels"] = int(ch)
                                            track["sample_rate"] = (
                                                srf >> 16
                                            )
                                    elif t5 in (b"stsz", b"stz2"):
                                        (cnt,) = struct.unpack_from(
                                            ">I", data, b5 + 8
                                        )
                                        track["n_samples"] = int(cnt)
            out["tracks"].append(track)
    return out


def probe_tiff(content: bytes) -> dict:
    """TIFF dimensions/sample layout from the first IFD (public TIFF 6
    spec): endianness from the II/MM magic, 12-byte directory entries,
    tags 256/257 (dims), 277 (samples/pixel), 259 (compression code).
    Inline SHORT/LONG values only -- offset-stored arrays (multi-sample
    BitsPerSample) are skipped, dims/samples are always inline in
    practice. Truncated headers/IFDs raise ValueError."""
    data = bytes(content or b"")
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise NotImplementedError("not a TIFF stream")
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset overruns the buffer")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise ValueError("truncated TIFF IFD")
    out = {
        "width": None, "height": None, "samples_per_pixel": 1,
        "compression": 1, "byte_order": "little" if endian == "<"
        else "big",
    }
    tag_map = {256: "width", 257: "height", 277: "samples_per_pixel",
               259: "compression"}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, vtype, count = struct.unpack_from(endian + "HHI", data, base)
        if tag not in tag_map or count != 1:
            continue
        if vtype == 3:  # SHORT, left-justified in the value word
            (val,) = struct.unpack_from(endian + "H", data, base + 8)
        elif vtype == 4:  # LONG
            (val,) = struct.unpack_from(endian + "I", data, base + 8)
        else:
            continue
        out[tag_map[tag]] = int(val)
    if out["width"] is None or out["height"] is None:
        raise ValueError("TIFF IFD lacks ImageWidth/ImageLength")
    return out


def probe_webp(content: bytes) -> dict:
    """WebP dimensions/format from the RIFF chunk walk (public
    container spec): ``VP8 `` lossy (frame tag + 0x9D012A start code,
    14-bit LE dims), ``VP8L`` lossless (0x2F signature, 14+14-bit
    packed dims-minus-one), ``VP8X`` extended (24-bit LE
    dims-minus-one, feature flags). Headers only -- no entropy
    decode. Truncated/missing bitstream chunks raise ValueError."""
    data = bytes(content or b"")
    if not (
        data[:4] == b"RIFF" and len(data) >= 12 and data[8:12] == b"WEBP"
    ):
        raise NotImplementedError("not a WebP stream")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise ValueError("WebP chunk overruns the buffer")
        if fourcc == b"VP8 ":
            if size < 10 or data[body + 3:body + 6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 key-frame start code")
            w, h = struct.unpack_from("<HH", data, body + 6)
            return {
                "format": "lossy", "width": w & 0x3FFF,
                "height": h & 0x3FFF,
            }
        if fourcc == b"VP8L":
            if size < 5 or data[body] != 0x2F:
                raise ValueError("bad VP8L signature byte")
            (bits,) = struct.unpack_from("<I", data, body + 1)
            return {
                "format": "lossless",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
            }
        if fourcc == b"VP8X":
            if size < 10:
                raise ValueError("short VP8X chunk")
            w = int.from_bytes(data[body + 4:body + 7], "little") + 1
            h = int.from_bytes(data[body + 7:body + 10], "little") + 1
            return {
                "format": "extended", "width": w, "height": h,
                "has_animation": bool(data[body] & 0x02),
                "has_alpha": bool(data[body] & 0x10),
            }
        pos = body + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("WebP stream has no VP8/VP8L/VP8X chunk")


def _ogg_pages(data: bytes):
    """Yield (granule_position, header_type, first_packet_head, page
    body slice bounds) per Ogg page; raises ValueError on a malformed
    page header (short header, bad version)."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise ValueError("Ogg page sync lost")
        if data[pos + 4] != 0:
            raise ValueError(f"Ogg stream version {data[pos + 4]}")
        header_type = data[pos + 5]
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        n_segs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + n_segs]
        if len(seg_table) < n_segs:
            raise ValueError("truncated Ogg segment table")
        body = pos + 27 + n_segs
        body_len = sum(seg_table)
        if body + body_len > len(data):
            raise ValueError("truncated Ogg page body")
        yield granule, header_type, body, body + body_len
        pos = body + body_len


def probe_ogg(content: bytes) -> dict:
    """Ogg audio metadata from the page walk: codec identification
    from the first packet (Vorbis identification header per the
    public Xiph spec: channels + rate at fixed offsets; ``OpusHead``
    per RFC 7845), EXACT duration from the LAST page's granule
    position (PCM sample count for Vorbis; 48 kHz ticks minus
    pre-skip for Opus). Page headers only -- no codec setup parse, no
    audio decode. Foreign bytes -> NotImplementedError; recognized
    Ogg with a non-audio or unknown first packet -> NotImplementedError
    (the counted-skip 'unsupported' classification); malformed pages
    -> ValueError."""
    data = bytes(content or b"")
    if data[:4] != b"OggS":
        raise NotImplementedError("not an Ogg stream")
    pages = _ogg_pages(data)
    try:
        _, _, b0, e0 = next(pages)
    except StopIteration:
        raise ValueError("empty Ogg stream") from None
    first = data[b0:e0]
    if first[:7] == b"\x01vorbis":
        if len(first) < 16:
            raise ValueError("short Vorbis identification header")
        channels = first[11]
        (rate,) = struct.unpack_from("<I", first, 12)
        codec = "vorbis"
        tick_rate = rate
        pre_skip = 0
    elif first[:8] == b"OpusHead":
        if len(first) < 19:
            raise ValueError("short OpusHead")
        channels = first[9]
        (pre_skip,) = struct.unpack_from("<H", first, 10)
        (rate,) = struct.unpack_from("<I", first, 12)
        codec = "opus"
        tick_rate = 48000  # granule ticks are always 48 kHz for Opus
    else:
        raise NotImplementedError(
            "Ogg stream with unrecognized first packet"
        )
    if not channels or not rate:
        raise ValueError("zero channels/rate in Ogg id header")
    last_granule = 0
    for granule, _, _, _ in pages:
        if granule >= 0:
            last_granule = granule
    samples = max(0, last_granule - pre_skip)
    return {
        "codec": codec, "channels": int(channels),
        "sample_rate": int(rate), "n_frames": int(samples),
        "duration_s": samples / tick_rate,
    }


# Matroska/WebM element IDs (public EBML + Matroska specs, RFC 8794):
_EBML_HEADER = 0x1A45DFA3
_EBML_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESTAMP_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_TRACK_TYPE = 0x83
_MKV_CODEC_ID = 0x86
_MKV_VIDEO = 0xE0
_MKV_PIXEL_WIDTH = 0xB0
_MKV_PIXEL_HEIGHT = 0xBA
_MKV_AUDIO = 0xE1
_MKV_SAMPLING_FREQ = 0xB5
_MKV_CHANNELS = 0x9F


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """One EBML variable-length integer at ``pos``: returns
    (value, next_pos, octet_length). Element IDs keep the length
    marker bit (the spec's ID space); sizes strip it."""
    if pos >= len(data):
        raise ValueError("truncated EBML varint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 octets)")
    mask = 0x80
    length = 1
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("truncated EBML varint")
    if keep_marker:
        value = int.from_bytes(data[pos:pos + length], "big")
    else:
        value = first & (mask - 1)
        for b in data[pos + 1:pos + length]:
            value = (value << 8) | b
    return value, pos + length, length


def _ebml_walk(data: bytes, lo: int, hi: int):
    """Yield (element_id, body_lo, body_hi) over [lo, hi). An
    unknown-size element (all size bits set -- legal for Segment in
    live-muxed files) extends to ``hi``. Overruns raise ValueError."""
    pos = lo
    while pos < hi:
        eid, p, _ = _ebml_vint(data, pos, keep_marker=True)
        size, body, slen = _ebml_vint(data, p, keep_marker=False)
        if size == (1 << (7 * slen)) - 1:  # unknown-size element
            end = hi
        else:
            end = body + size
        if end > hi:
            raise ValueError(
                f"EBML element 0x{eid:X} overruns its parent"
            )
        yield eid, body, end
        pos = end


def _ebml_uint(data: bytes, lo: int, hi: int) -> int:
    return int.from_bytes(data[lo:hi], "big")


def _ebml_float(data: bytes, lo: int, hi: int) -> float:
    n = hi - lo
    if n == 0:
        return 0.0
    if n == 4:
        return struct.unpack_from(">f", data, lo)[0]
    if n == 8:
        return struct.unpack_from(">d", data, lo)[0]
    raise ValueError(f"EBML float of width {n}")


def probe_mkv(content: bytes) -> dict:
    """Matroska/WebM metadata from an EBML walk (public EBML spec,
    RFC 8794, + the Matroska element registry): DocType from the EBML
    header, duration from Info (Duration x TimestampScale, exact
    seconds), and per-track type/codec/dims/audio params from the
    Tracks element -- headers only, no Cluster byte is touched (the
    walk stops descending at the first level below Segment, so a
    100 GB file costs the same as a 1 KB one given the leading bytes).
    Foreign bytes raise NotImplementedError; an EBML stream whose
    DocType is not matroska/webm likewise (recognized EBML, foreign
    schema -> counted-skip 'unsupported'); truncated/overrunning
    elements and a Segment without Info raise ValueError ->
    DECODE_CORRUPT."""
    data = bytes(content or b"")
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise NotImplementedError("not an EBML stream")
    doc_type = None
    segment = None
    for eid, lo, hi in _ebml_walk(data, 0, len(data)):
        if eid == _EBML_HEADER:
            for e2, l2, h2 in _ebml_walk(data, lo, hi):
                if e2 == _EBML_DOCTYPE:
                    doc_type = data[l2:h2].rstrip(b"\x00").decode(
                        "latin-1"
                    )
        elif eid == _MKV_SEGMENT and segment is None:
            segment = (lo, hi)
    if doc_type not in ("matroska", "webm"):
        raise NotImplementedError(
            f"EBML stream with foreign DocType {doc_type!r}"
        )
    if segment is None:
        raise ValueError("Matroska stream has no Segment element")
    out = {
        "doc_type": doc_type, "timestamp_scale_ns": 1_000_000,
        "duration_s": None, "tracks": [],
    }
    saw_info = False
    for eid, lo, hi in _ebml_walk(data, *segment):
        if eid == _MKV_INFO:
            saw_info = True
            raw_duration = None
            for e2, l2, h2 in _ebml_walk(data, lo, hi):
                if e2 == _MKV_TIMESTAMP_SCALE:
                    out["timestamp_scale_ns"] = _ebml_uint(data, l2, h2)
                elif e2 == _MKV_DURATION:
                    raw_duration = _ebml_float(data, l2, h2)
            if raw_duration is not None:
                out["duration_s"] = (
                    raw_duration * out["timestamp_scale_ns"] / 1e9
                )
        elif eid == _MKV_TRACKS:
            for e2, l2, h2 in _ebml_walk(data, lo, hi):
                if e2 != _MKV_TRACK_ENTRY:
                    continue
                track = {
                    "type": None, "codec": None, "width": None,
                    "height": None, "channels": None,
                    "sample_rate": None,
                }
                for e3, l3, h3 in _ebml_walk(data, l2, h2):
                    if e3 == _MKV_TRACK_TYPE:
                        t = _ebml_uint(data, l3, h3)
                        track["type"] = {1: "video", 2: "audio"}.get(
                            t, f"type{t}"
                        )
                    elif e3 == _MKV_CODEC_ID:
                        track["codec"] = data[l3:h3].rstrip(
                            b"\x00"
                        ).decode("latin-1")
                    elif e3 == _MKV_VIDEO:
                        for e4, l4, h4 in _ebml_walk(data, l3, h3):
                            if e4 == _MKV_PIXEL_WIDTH:
                                track["width"] = _ebml_uint(data, l4, h4)
                            elif e4 == _MKV_PIXEL_HEIGHT:
                                track["height"] = _ebml_uint(
                                    data, l4, h4
                                )
                    elif e3 == _MKV_AUDIO:
                        for e4, l4, h4 in _ebml_walk(data, l3, h3):
                            if e4 == _MKV_SAMPLING_FREQ:
                                track["sample_rate"] = int(
                                    _ebml_float(data, l4, h4)
                                )
                            elif e4 == _MKV_CHANNELS:
                                track["channels"] = _ebml_uint(
                                    data, l4, h4
                                )
                out["tracks"].append(track)
    if not saw_info:
        raise ValueError("Matroska Segment has no Info element")
    return out


def probe_media(content: bytes) -> dict:
    """Magic-sniffing dispatcher over every in-repo container. Returns
    a NORMALIZED scalar dict: container, width, height, channels,
    bits, sample_rate, n_frames, duration_s (absent dimensions are
    None). Foreign bytes raise NotImplementedError."""
    data = bytes(content or b"")
    out = {
        "container": None, "width": None, "height": None,
        "channels": None, "bits": None, "sample_rate": None,
        "n_frames": None, "duration_s": None,
    }
    if data[:8] == _PNG_SIG:
        m = probe_png(data)
        out.update(
            container="png", width=m["width"], height=m["height"],
            channels=m["channels"], bits=m["bit_depth"], n_frames=1,
        )
    elif data[:2] == b"\xff\xd8":
        m = probe_jpeg(data)
        out.update(
            container="jpeg", width=m["width"], height=m["height"],
            channels=m["n_components"], bits=m["precision"], n_frames=1,
        )
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        m = probe_gif(data)
        out.update(
            container="gif", width=m["width"], height=m["height"],
            n_frames=m["n_frames"],
        )
    elif data[:4] == b"RIFF" and len(data) >= 12 and data[8:12] == b"AVI ":
        m = probe_mjpeg_avi(data)
        out.update(
            container="avi", width=m["width"], height=m["height"],
            n_frames=m["n_frames"],
            duration_s=(
                m["n_frames"] / m["fps"] if m.get("fps") else None
            ),
        )
    elif data[:4] == b"RIFF" and len(data) >= 12 and data[8:12] == b"WEBP":
        m = probe_webp(data)
        out.update(
            container="webp", width=m["width"], height=m["height"],
            n_frames=1,
        )
    elif data[:4] in (b"II*\x00", b"MM\x00*"):
        m = probe_tiff(data)
        out.update(
            container="tiff", width=m["width"], height=m["height"],
            channels=m["samples_per_pixel"], n_frames=1,
        )
    elif data[:4] == b"OggS":
        m = probe_ogg(data)
        out.update(
            container=f"ogg-{m['codec']}", channels=m["channels"],
            sample_rate=m["sample_rate"], n_frames=m["n_frames"],
            duration_s=m["duration_s"],
        )
    elif data[:4] == b"RIFF" and (len(data) < 12 or data[8:12] == b"WAVE"):
        m = probe_wav(data)
        out.update(
            container="wav", channels=m["channels"],
            bits=m["bits_per_sample"], sample_rate=m["sample_rate"],
            n_frames=m["n_frames"], duration_s=m["duration_s"],
        )
    elif data[:4] == b"fLaC":
        m = probe_flac(data)
        out.update(
            container="flac", channels=m["channels"],
            bits=m["bits_per_sample"], sample_rate=m["sample_rate"],
            n_frames=m["n_frames"], duration_s=m["duration_s"],
        )
    elif len(data) >= 12 and data[4:8] == b"ftyp":
        m = probe_mp4(data)
        video = next(
            (t for t in m["tracks"] if t["handler"] == "vide"), None
        )
        audio = next(
            (t for t in m["tracks"] if t["handler"] == "soun"), None
        )
        out.update(
            container="mp4", duration_s=m["duration_s"],
            width=video["width"] if video else None,
            height=video["height"] if video else None,
            n_frames=video["n_samples"] if video else (
                audio["n_samples"] if audio else None
            ),
            channels=audio["channels"] if audio else None,
            sample_rate=audio["sample_rate"] if audio else None,
        )
    elif data[:4] == b"\x1a\x45\xdf\xa3":
        m = probe_mkv(data)
        video = next(
            (t for t in m["tracks"] if t["type"] == "video"), None
        )
        audio = next(
            (t for t in m["tracks"] if t["type"] == "audio"), None
        )
        out.update(
            container=m["doc_type"],  # "webm" or "matroska"
            duration_s=m["duration_s"],
            width=video["width"] if video else None,
            height=video["height"] if video else None,
            channels=audio["channels"] if audio else None,
            sample_rate=audio["sample_rate"] if audio else None,
        )
    elif data[:3] == b"ID3" or (
        len(data) >= 2
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
    ):
        m = probe_mp3(data)
        out.update(
            container="mp3", channels=m["channels"],
            sample_rate=m["sample_rate"], n_frames=m["n_frames"],
            duration_s=m["duration_s"],
        )
    else:
        raise NotImplementedError("unrecognized media container")
    return out


_PROBE_COLS = (
    "container", "width", "height", "channels", "bits",
    "sample_rate", "n_frames", "duration_s",
)
_PROBE_SCHEMA = (
    "container string, width int, height int, channels int, bits int, "
    "sample_rate int, n_frames bigint, duration_s double"
)


def extract_media_probe(
    df: DataFrame,
    content_col: str = "content",
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched header probing over a binary media column: adds
    the normalized ``probe_media`` columns. ``on_error="skip"`` adds
    ``decode_status`` (ok / unsupported / corrupt, the same
    classification contract as the full extractors) so
    ``media_decode_report`` consumes probe output unchanged -- the
    header-cost mode for crawl-scale media stats."""
    skip = _check_on_error(on_error)

    def _probe(batches):
        for pdf in batches:
            metas = []
            statuses = []
            for content in pdf[content_col]:
                try:
                    meta = probe_media(content)
                    status = "ok"
                except Exception as exc:  # noqa: BLE001 -- counted skip
                    if not skip:
                        raise
                    meta = {c: None for c in _PROBE_COLS}
                    status = _decode_status_of(exc)
                metas.append(meta)
                statuses.append(status)
            out = pdf.copy()
            for c in _PROBE_COLS:
                out[c] = pd.Series(
                    [m[c] for m in metas], index=pdf.index, dtype="object"
                )
            if skip:
                out["decode_status"] = statuses
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + _PROBE_SCHEMA
    if skip:
        out_schema += ", decode_status string"
    return df.mapInPandas(_probe, out_schema)
