"""Deskew kernel: angle estimation, rotation round-trip, skewed-page decode
(north-star stage: page render → deskew/binarize → line-grid detection)."""

import numpy as np
import pytest

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
    PATTERNS,
    build_griddoc,
    build_page_image,
)
from pdf_drawing_ocr_recognition_spark.kernel import extract_document
from pdf_drawing_ocr_recognition_spark.kernel.deskew import (
    deskew,
    estimate_skew,
    rotate_nn,
)
from pdf_drawing_ocr_recognition_spark.kernel.grid import decode_grid_image
from pdf_drawing_ocr_recognition_spark.kernel.parse import parse_literal_result


def _skewed_page(d: dict, angle: float) -> np.ndarray:
    page = build_page_image(PATTERNS["fullpage"], [d])
    pad = int(0.05 * max(page.shape)) + 3
    return rotate_nn(np.pad(page, pad, constant_values=255), angle)


class TestEstimate:
    @pytest.mark.parametrize("angle", [-2.0, -1.25, -0.25, 0.5, 1.75])
    def test_recovers_generation_angle(self, angle):
        # within one grid step: at ±0.25° the 0.0 candidate can tie-win, and
        # the decode is verified to succeed regardless (sweep test below)
        skewed = _skewed_page({"text": "angle_test"}, angle)
        assert abs(estimate_skew(skewed) - angle) <= 0.25

    def test_straight_image_estimates_zero(self):
        page = build_page_image(PATTERNS["fullpage"], [{"text": "straight"}])
        assert estimate_skew(page) == 0.0

    def test_blank_image(self):
        assert estimate_skew(np.full((50, 50), 255, np.uint8)) == 0.0

    def test_deterministic(self):
        skewed = _skewed_page({"text": "det"}, 1.25)
        assert deskew(skewed)[1] == deskew(skewed)[1]


class TestSkewedDecode:
    @pytest.mark.parametrize("angle", [a * 0.25 for a in range(-8, 9) if a])
    def test_full_sweep_decodes_exactly(self, angle):
        d = {"k0": "v_0a1b", "k1": 42, "text": "mix"}
        fixed, est = deskew(_skewed_page(d, angle))
        ok, parsed = parse_literal_result(decode_grid_image(fixed, jittered=True))
        assert ok and parsed == d, (angle, est)

    def test_extract_document_handles_skewed_payload(self):
        d = {"text": "skewed_doc"}
        doc = build_griddoc("fullpage", [_skewed_page(d, 1.5)])
        r = extract_document("u", doc, "en", PATTERNS)
        assert r["status"] == "ok"
        assert "sub_0: skewed_doc\n" in r["extracted_text"]

    def test_corpus_contains_skewed_rows_and_all_extract(self):
        from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import gen_rows
        from pdf_drawing_ocr_recognition_spark.kernel.page import (
            is_grid_payload,
            parse_grid_container,
        )
        from pdf_drawing_ocr_recognition_spark.kernel.png import decode_png

        n_skewed = 0
        for url, _ts, html, _t, lang in gen_rows(400):
            if html is None or not is_grid_payload(html):
                continue
            try:
                name, pngs = parse_grid_container(html)
            except Exception:  # truncated-container fault-injection rows
                continue
            if name != "fullpage" or not pngs:
                continue
            gray = decode_png(pngs[0])
            if estimate_skew(gray) != 0.0:
                n_skewed += 1
                r = extract_document(url, html, lang, PATTERNS)
                assert r["status"] == "ok", url
        assert n_skewed >= 5, f"only {n_skewed} skewed fixtures in 400 rows"
