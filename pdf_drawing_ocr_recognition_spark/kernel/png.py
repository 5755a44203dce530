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


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG back to an (H, W) uint8 array."""
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
    raw = zlib.decompress(idat)
    stride = width + 1
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
