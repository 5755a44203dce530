"""Minimal deterministic grayscale PNG codec (stdlib zlib only).

The container environment has no image libraries (no PIL/cv2), so the synthetic
grid-page payloads (SURVEY.md D2) are encoded with this ~80-line codec:
8-bit grayscale, filter type 0 on every row, one IDAT chunk.  The decoder
additionally understands filters 1 (Sub) and 2 (Up) for robustness.

This replaces the reference's poppler rasterize + cv2 JPEG spill
(pdor/pdor_unit.py:129-136, :190-208) with an in-memory, deterministic path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Hostile-payload guard (see tests/test_png_hostile.py): a crawled payload
# controls both the declared IHDR dimensions and the IDAT stream, so an
# unguarded decode can be made to allocate height*(width+1) bytes from a
# few-KB input (dimension bomb) or to inflate a tiny IDAT without bound
# (zlib bomb).  Real pages in this pipeline are far below 64 MP; anything
# larger raises ValueError, which the page decoder's retry/error taxonomy
# absorbs as a failed leaf (kernel/page.py) — never an executor OOM.
MAX_PIXELS = 64_000_000


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(gray: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a PNG byte string."""
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W) uint8")
    h, w = gray.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, level=6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """Decode an 8-bit grayscale PNG back to an (H, W) uint8 array.

    Defensive contract for untrusted bytes: declared dimensions are capped
    at ``max_pixels`` BEFORE any allocation, and IDAT inflation is bounded
    to exactly the raster size (a stream that would inflate further is
    rejected), so memory use is O(min(raster, cap)) no matter what the
    payload claims."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension image")
    if width * height > max_pixels:
        raise ValueError(
            f"declared {width}x{height} exceeds the {max_pixels}-pixel cap"
        )
    stride = width + 1
    expected = stride * height
    # bounded inflation: ask for at most expected+1 bytes — a zlib bomb
    # (tiny IDAT, huge plaintext) stops at the cap and fails the exact-size
    # check instead of exhausting executor memory
    d = zlib.decompressobj()
    raw = d.decompress(idat, expected + 1)
    if len(raw) != expected or d.unconsumed_tail:
        raise ValueError("IDAT does not inflate to the declared raster size")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    # fast path: every row filter 0 (what our encoder always writes)
    if not buf[:, 0].any():
        return buf[:, 1:].copy()
    img = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        filt, scan = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if filt == 0:
            line = scan
        elif filt == 1:  # Sub
            line = scan
            for x in range(1, width):
                line[x] = (int(line[x]) + int(line[x - 1])) & 0xFF
        elif filt == 2:  # Up
            line = (scan.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        img[y] = line
        prev = img[y]
    return img
