"""Motion-JPEG in AVI (RIFF) -- the video codec family decodable with
the repo's own baseline-JPEG implementation, no ffmpeg required.

AVI is a RIFF container (same chunk grammar as WAV): LIST 'hdrl' holds
the main header (avih) and one stream header list per stream (strh /
strf); LIST 'movi' holds the frame payloads as '##dc' (compressed
video) chunks. For MJPEG every '##dc' payload is a complete baseline
JPEG image, so frame decode = chunk walk + decode_jpeg_baseline.

H.264/H.265/VP9 need a real codec library and raise
NotImplementedError -- the Spark-side plumbing (sample_video_frames'
explode fan-out, per-frame featurization) is codec-agnostic either way.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from .jpeg import decode_jpeg_baseline, encode_jpeg_baseline


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def iter_mjpeg_frames(content: bytes) -> Iterator[bytes]:
    """Yield each video frame's JPEG bytes from an MJPEG AVI stream."""
    data = bytes(content or b"")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI (RIFF) stream")
    for fourcc, start, size in _riff_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start:start + 4] == b"movi":
            for cc, s, sz in _riff_chunks(data, start + 4, start + size):
                # '##dc' = compressed video chunk of stream ##
                if cc[2:4] == b"dc" and sz > 0:
                    yield data[s:s + sz]
            return
    raise NotImplementedError("AVI stream has no movi LIST")


def probe_mjpeg_avi(content: bytes) -> dict:
    """Container metadata without decoding frames: (width, height,
    n_frames, fps) from the avih/strh headers."""
    data = bytes(content or b"")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI (RIFF) stream")
    meta = {}
    for fourcc, start, size in _riff_chunks(data, 12, len(data)):
        if fourcc == b"LIST" and data[start:start + 4] == b"hdrl":
            for cc, s, sz in _riff_chunks(data, start + 4, start + size):
                if cc == b"avih":
                    us_per_frame, _, _, _, n_frames = struct.unpack_from(
                        "<IIIII", data, s
                    )
                    meta["n_frames"] = n_frames
                    meta["fps"] = 1e6 / us_per_frame if us_per_frame else 0.0
                    meta["width"], meta["height"] = struct.unpack_from(
                        "<II", data, s + 32
                    )
    if not meta:
        raise NotImplementedError("AVI stream has no hdrl header")
    return meta


def decode_video_frame(content: bytes, frame_index: int) -> np.ndarray:
    """Decode ONE frame by index -- the per-row work unit of
    sample_video_frames' exploded plan (each (video, frame_index) row
    decodes independently; no state is shared between rows, so the
    fan-out parallelizes across the cluster)."""
    for i, jpeg in enumerate(iter_mjpeg_frames(content)):
        if i == frame_index:
            return decode_jpeg_baseline(jpeg)
    raise IndexError(f"frame {frame_index} out of range")


def decode_video_frames(content: bytes) -> list[np.ndarray]:
    """Decode every frame (test/driver-side helper; the distributed
    path goes through decode_video_frame per exploded row)."""
    return [decode_jpeg_baseline(j) for j in iter_mjpeg_frames(content)]


def encode_mjpeg_avi(
    frames: list[np.ndarray], *, fps: int = 10, quality: int = 85
) -> bytes:
    """Minimal MJPEG AVI writer (one video stream) -- the round-trip
    companion of the reader and a real sink for derived frame samples."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[0], frames[0].shape[1]
    payloads = [encode_jpeg_baseline(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,          # microseconds per frame
        max_bytes * fps,           # max bytes per sec
        0, 0x10,                   # padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, max_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                    # scale / rate -> fps
        0, len(frames), max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
