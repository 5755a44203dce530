"""Hostile binary payloads against the PNG decode path (kernel/png.py) and
the grid-container pipeline (kernel/page.py) — the binary twin of the
adversarial-HTML contract (tests/test_html_hostile.py): untrusted bytes
must fail CLEANLY (taxonomy error rows), never throw out of
extract_document, and never cost unbounded memory or time.
"""

import struct
import time
import zlib

import numpy as np
import pytest

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
    PATTERNS,
    build_griddoc,
    build_page_image,
)
from pdf_drawing_ocr_recognition_spark.kernel.page import (
    GRID_MAGIC,
    extract_document,
)
from pdf_drawing_ocr_recognition_spark.kernel.png import (
    MAX_PIXELS,
    _chunk,
    _PNG_SIG,
    decode_png,
    encode_png,
)


def _png_of(width: int, height: int, raw: bytes) -> bytes:
    """Hand-rolled PNG with arbitrary declared dims over arbitrary IDAT."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_still_exact():
    img = (np.arange(40 * 30, dtype=np.int64) % 251).astype(np.uint8)
    img = img.reshape(40, 30)
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"\x89PNG\r\n",  # truncated signature
        b"GIF89a not a png at all",
        _PNG_SIG,  # signature only, no chunks
        _PNG_SIG + b"\x00\x00\x00\x0dIHDR\x00\x01",  # truncated IHDR
    ],
)
def test_garbage_raises_cleanly(blob):
    with pytest.raises(Exception):
        decode_png(blob)


def test_dimension_bomb_rejected_before_allocation():
    """Declared 65535x65535 (4.3 G pixels) from a <1 KB payload: must
    reject on the cap, fast, without touching the IDAT."""
    bomb = _png_of(65535, 65535, b"\x00" * 16)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="pixel cap"):
        decode_png(bomb)
    assert time.monotonic() - t0 < 1.0


def test_zlib_bomb_bounded():
    """Small declared dims but an IDAT inflating to ~64 MB: inflation must
    stop at the declared raster size and reject — never inflate it all."""
    bomb = _png_of(10, 10, b"\x00" * 64_000_000)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="declared raster size"):
        decode_png(bomb)
    assert time.monotonic() - t0 < 2.0


def test_short_idat_rejected():
    with pytest.raises(ValueError, match="declared raster size"):
        decode_png(_png_of(10, 10, b"\x00" * 11))  # one row, ten declared


def test_zero_dims_rejected():
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_png(_png_of(0, 5, b""))


def test_trailing_compressed_data_rejected():
    raw = b"\x00" * (11 * 10)  # exact raster for 10x10
    with pytest.raises(ValueError):
        decode_png(_png_of(10, 10, raw + b"extra trailing plaintext"))


def test_unsupported_color_and_filter():
    rgb = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    blob = _PNG_SIG + _chunk(b"IHDR", rgb)
    with pytest.raises(ValueError, match="grayscale"):
        decode_png(blob)
    bad_filter = _png_of(3, 1, b"\x07abc")
    with pytest.raises(ValueError, match="filter"):
        decode_png(bad_filter)


def test_max_pixels_cap_is_sane():
    assert 1_000_000 < MAX_PIXELS < 10**9


class TestContainerPipelineNeverThrows:
    """Corrupt PNGs inside an otherwise-valid GRIDDOC container must come
    back as taxonomy error ROWS from extract_document, never exceptions."""

    def _valid_payload(self):
        page = build_page_image(PATTERNS["fullpage"], [{"text": "t_ok"}])
        return build_griddoc("fullpage", [page])

    def _corrupt_inner_png(self, payload: bytes, mode: str) -> bytes:
        """Locate the single inner PNG and replace/damage it."""
        pos = len(GRID_MAGIC)
        (name_len,) = struct.unpack_from(">H", payload, pos)
        pos += 2 + name_len + 4  # name + n_pages
        (png_len,) = struct.unpack_from(">I", payload, pos)
        pos += 4
        png = payload[pos : pos + png_len]
        if mode == "truncate":
            new = png[: len(png) // 2]
        elif mode == "flip":
            new = png[:50] + bytes([png[50] ^ 0xFF]) + png[51:]
        elif mode == "bomb":
            new = _png_of(65535, 65535, b"\x00" * 16)
        else:
            raise AssertionError(mode)
        return (
            payload[: pos - 4]
            + struct.pack(">I", len(new))
            + new
            + payload[pos + png_len :]
        )

    @pytest.mark.parametrize("mode", ["truncate", "flip", "bomb"])
    def test_corrupt_png_becomes_error_row(self, mode):
        hostile = self._corrupt_inner_png(self._valid_payload(), mode)
        row = extract_document("u://x", hostile, "en", PATTERNS)
        assert row["status"] != "ok"
        assert row["error_kind"] in ("PageDecodeError", "LLMError")

    def test_truncated_container_is_bad_container(self):
        hostile = self._valid_payload()[:20]
        row = extract_document("u://x", hostile, "en", PATTERNS)
        assert row["status"] != "ok"
        assert row["error_kind"] == "ImagifyError"

    def test_valid_payload_still_extracts(self):
        row = extract_document("u://x", self._valid_payload(), "en", PATTERNS)
        assert row["status"] == "ok" and row["error_kind"] == ""
