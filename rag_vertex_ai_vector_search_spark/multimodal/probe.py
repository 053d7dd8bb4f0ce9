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
