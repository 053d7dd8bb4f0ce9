"""GIF (87a/89a) codec in pure stdlib + numpy: LZW decompression,
interlacing, animation composition (frame patches, disposal methods,
transparency) and a round-trip LZW encoder.

Implements the public CompuServe GIF89a specification (1990; the
format every web-scraped corpus is full of): a GIF stream is a
header + logical screen descriptor (+ global color table), then a
sequence of blocks -- extensions (0x21; the graphic control extension
carries per-frame delay/disposal/transparency) and image descriptors
(0x2C; each a palette-indexed patch at (left, top), optionally
interlaced, LZW-compressed with a per-image minimum code size) --
terminated by 0x3B. LZW here is the GIF variant: LSB-first variable
width codes (min+1 .. 12 bits), CLEAR resets the table, codes are
packed into 255-byte sub-blocks.

Animated GIFs compose: each frame renders its patch onto the logical
screen canvas honoring the PREVIOUS frame's disposal method (1 =
leave, 2 = restore background, 3 = restore previous) and skipping
transparent pixels. ``iter_gif_frames`` yields the fully composited
RGB canvas per frame -- the per-frame work unit the video featurize
path consumes (same seam as MJPEG frames).

No quantizer: ``encode_gif`` requires <= 256 distinct colors (exact
palette) and exists as the hermetic round-trip companion, like
encode_png / encode_jpeg_baseline.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# --------------------------------------------------------------------------
# LZW (GIF variant)
# --------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF-LZW decompress one image's concatenated sub-block payload."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                raise NotImplementedError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise NotImplementedError("corrupt GIF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        # Once the table reaches the current width's capacity the NEXT
        # code arrives one bit wider (12-bit ceiling per spec).
        if len(table) >= (1 << code_size) and code_size < _MAX_CODE_WIDTH:
            code_size += 1


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-LZW compress palette indices (emits CLEAR on table full --
    the simplest spec-compliant reset strategy)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], code_size)
        # Mirror of the decoder's growth rule: the decoder appends its
        # table entry for THIS emitted code, reaching size next_code,
        # then widens when that size hits the width capacity.
        table[w + c] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < _MAX_CODE_WIDTH:
            code_size += 1
        if next_code >= _DICT_LIMIT:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w], code_size)
        # the decoder appends after this code too; match its width
        next_code += 1
        if next_code > (1 << code_size) and code_size < _MAX_CODE_WIDTH:
            code_size += 1
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Stream parsing
# --------------------------------------------------------------------------

def _read_color_table(data: bytes, pos: int, size: int):
    table = np.frombuffer(
        data, dtype=np.uint8, count=3 * size, offset=pos
    ).reshape(size, 3).copy()
    return table, pos + 3 * size


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise NotImplementedError("truncated GIF sub-block run")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + n])
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return out


def _parse_gif(data: bytes, decode_pixels: bool = True):
    """Yield stream-level events: ('screen', dict) once, then
    ('frame', dict) per image descriptor (indices already LZW-decoded
    and deinterlaced). ``decode_pixels=False`` walks the same block
    structure but skips the LZW decode + deinterlace (sub-block length
    bytes alone delimit the image data), yielding ``indices=None`` --
    the cheap path ``probe_gif`` uses so metadata probing an animated
    GIF does not pay full pixel decode cost."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF stream")
    width, height, flags, bg_index, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))
    yield "screen", {
        "version": data[3:6].decode("ascii"),
        "width": width, "height": height,
        "gct": gct, "bg_index": bg_index,
    }
    gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
    while True:
        if pos >= len(data):
            raise NotImplementedError("truncated GIF (missing trailer)")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gflags, delay = struct.unpack_from("<BH", body, 0)
                gce = {
                    "disposal": (gflags >> 2) & 0x07,
                    "delay_cs": delay,
                    "transparent": body[3] if gflags & 0x01 else None,
                }
            continue
        if block == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if left + w > width or top + h > height:
                # Out-of-screen patches would silently clip under numpy
                # slice assignment while the (h, w) patch/mask do not,
                # crashing the compositor with a shape mismatch -- keep
                # it a codec-contract error instead.
                raise NotImplementedError(
                    f"GIF image descriptor ({left},{top})+{w}x{h} extends "
                    f"past the {width}x{height} logical screen"
                )
            lct = None
            if iflags & 0x80:
                lct, pos = _read_color_table(data, pos, 2 << (iflags & 0x07))
            min_code_size = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if decode_pixels:
                idx = np.frombuffer(
                    bytes(_lzw_decode(min_code_size, payload)),
                    dtype=np.uint8, count=w * h,
                ).reshape(h, w)
                if iflags & 0x40:
                    idx = _deinterlace(idx)
            else:
                idx = None
            yield "frame", {
                "left": left, "top": top, "width": w, "height": h,
                "lct": lct, "indices": idx, **gce,
            }
            gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
            continue
        raise NotImplementedError(f"unknown GIF block 0x{block:02x}")


# --------------------------------------------------------------------------
# Public decode surface
# --------------------------------------------------------------------------

def probe_gif(content: bytes) -> dict:
    """Container metadata without pixel decode cost beyond the block
    walk: (version, width, height, n_frames, animated)."""
    data = bytes(content or b"")
    meta: dict = {"n_frames": 0}
    for kind, info in _parse_gif(data, decode_pixels=False):
        if kind == "screen":
            meta.update(
                version=info["version"], width=info["width"],
                height=info["height"],
            )
        else:
            meta["n_frames"] += 1
    meta["animated"] = meta["n_frames"] > 1
    return meta


def iter_gif_frames(content: bytes) -> Iterator[np.ndarray]:
    """Yield each frame as the fully COMPOSITED (H, W, 3) uint8 RGB
    logical screen: patches land at (left, top), transparent pixels
    leave the canvas unchanged, and the previous frame's disposal
    method (1 leave / 2 restore-background / 3 restore-previous) is
    honored before the next patch renders."""
    data = bytes(content or b"")
    screen = None
    canvas = None
    bg_rgb = None
    pending = None  # (disposal, patch_box, snapshot)
    for kind, info in _parse_gif(data):
        if kind == "screen":
            screen = info
            canvas = np.zeros((info["height"], info["width"], 3), np.uint8)
            if info["gct"] is not None:
                bg_rgb = info["gct"][
                    min(info["bg_index"], len(info["gct"]) - 1)
                ]
                canvas[:, :] = bg_rgb
            continue
        palette = info["lct"] if info["lct"] is not None else screen["gct"]
        if palette is None:
            raise NotImplementedError("GIF frame with no color table")
        if pending is not None:
            disposal, (t, l, b, r), snapshot = pending
            if disposal == 2:
                canvas[t:b, l:r] = bg_rgb if bg_rgb is not None else 0
            elif disposal == 3:
                canvas[t:b, l:r] = snapshot
        t, l = info["top"], info["left"]
        b, r = t + info["height"], l + info["width"]
        snapshot = canvas[t:b, l:r].copy()
        idx = info["indices"]
        patch = palette[np.minimum(idx, len(palette) - 1)]
        region = canvas[t:b, l:r]
        if info["transparent"] is not None:
            opaque = idx != info["transparent"]
            region[opaque] = patch[opaque]
        else:
            region[:, :] = patch
        pending = (info["disposal"], (t, l, b, r), snapshot)
        yield canvas.copy()


def decode_gif(content: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) uint8 RGB -- the still-image
    entry point `decode_image` routes to."""
    for frame in iter_gif_frames(content):
        return frame
    raise NotImplementedError("GIF stream contains no image")


# --------------------------------------------------------------------------
# Encoder (round-trip companion; exact palette, no quantizer)
# --------------------------------------------------------------------------

def _build_palette(frames: list[np.ndarray]):
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise NotImplementedError(
            f"encode_gif needs <= 256 distinct colors, got {len(colors)} "
            "(quantize first)"
        )
    lut = {tuple(c): i for i, c in enumerate(colors)}
    return colors, lut


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    *,
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    disposal: int = 1,
) -> bytes:
    """(H, W, 3) or (H, W) uint8 frame(s) -> GIF89a bytes. Multi-frame
    input writes an animation (NETSCAPE loop + per-frame graphic
    control with ``delay_cs``); ``transparent_color`` maps that exact
    RGB to a transparent index in every frame."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [
        np.stack([f] * 3, axis=2) if f.ndim == 2 else np.asarray(f)
        for f in frames
    ]
    h, w = frames[0].shape[:2]
    palette, lut = _build_palette(frames)
    if transparent_color is not None and tuple(transparent_color) not in lut:
        raise ValueError("transparent_color must appear in the frames")
    pal_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_size = 1 << pal_bits
    pal_bytes = np.zeros((pal_size, 3), np.uint8)
    pal_bytes[: len(palette)] = palette
    min_code_size = max(2, pal_bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        tflag = 0
        tidx = 0
        if transparent_color is not None:
            tflag = 1
            tidx = lut[tuple(transparent_color)]
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", (disposal << 2) | tflag, delay_cs, tidx
        ) + b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = np.empty((h, w), np.uint8)
        flat = f.reshape(-1, 3)
        # vectorized palette lookup via a packed-int mapping
        packed = (
            flat[:, 0].astype(np.int64) << 16
        ) | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
        pal_packed = (
            palette[:, 0].astype(np.int64) << 16
        ) | (palette[:, 1].astype(np.int64) << 8) | palette[:, 2]
        order = np.argsort(pal_packed)
        idx = order[
            np.searchsorted(pal_packed[order], packed)
        ].astype(np.uint8).reshape(h, w)
        if interlace:
            rows = [
                idx[start::step] for start, step in _INTERLACE_PASSES
            ]
            idx = np.concatenate(rows, axis=0)
        out.append(min_code_size)
        payload = _lzw_encode(min_code_size, idx.tobytes())
        for i in range(0, len(payload), 255):
            chunk = payload[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
