"""The reference's shipped preset workload shapes, end-to-end.

The three presets (11/2/2 boxes at dpi 1390/450/1200 — geometry cited at
ref pdor/pdor_pattern.py:229-245,280-285,311-317) are the heaviest real
configurations: O(pages x 11) sub-image crops per document, with irregular,
partially OVERLAPPING boxes (preset11 box idx 7 is strictly contained in box
idx 8).  These tests drive that exact geometry through the kernel and the
Spark pipeline and assert byte identity between the two.
"""

from datetime import datetime

import pytest

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
    PATTERNS,
    build_griddoc,
    build_page_image_preset,
)
from pdf_drawing_ocr_recognition_spark.kernel import extract_document

PRESET_NAMES = ("preset11_lcp", "preset2_tag", "preset2_term")
PAGE_DIMS = {
    "preset11_lcp": (1200, 4000),
    "preset2_tag": (1600, 1600),
    "preset2_term": (1800, 2400),
}


def _subs(name: str, tag: str):
    n = len(PATTERNS[name]["sub_imgs"])
    subs = [{"text": f"{tag}_s{i}"} for i in range(n)]
    if name == "preset11_lcp":
        subs[8] = None  # outer member of the contained pair 7 ⊂ 8
    return subs


def _preset_doc(name: str, tag: str, n_pages: int = 1) -> bytes:
    h, w = PAGE_DIMS[name]
    pages = [
        build_page_image_preset(PATTERNS[name], _subs(name, f"{tag}p{p}"), h, w)
        for p in range(n_pages)
    ]
    return build_griddoc(name, pages)


class TestPresetGeometry:
    def test_presets_validate_in_registry(self):
        from pdf_drawing_ocr_recognition_spark.sources.pattern_registry import (
            validate_pattern,
        )

        for name in PRESET_NAMES:
            clean = {
                k: v for k, v in PATTERNS[name].items() if k not in ("layout",)
            }
            validate_pattern(clean)

    def test_preset11_contained_pair_is_part_of_the_geometry(self):
        from pdf_drawing_ocr_recognition_spark.kernel.crop import crop_box

        boxes = PATTERNS["preset11_lcp"]["sub_imgs"]
        inner = crop_box(1200, 4000, tuple(boxes[7]))
        outer = crop_box(1200, 4000, tuple(boxes[8]))
        assert outer[0] <= inner[0] and inner[1] <= outer[1]
        assert outer[2] <= inner[2] and inner[3] <= outer[3]

    def test_preset11_kernel_extracts_ten_of_eleven(self):
        doc = _preset_doc("preset11_lcp", "k")
        r = extract_document("u11", doc, "en", PATTERNS)
        assert r["status"] == "ok"
        assert len(r["spans"]) == 10  # box 8's window is unpainted → fails
        assert r["n_subs_failed"] == 1
        # merge keys follow sub order; the failed sub_8 is simply absent
        for i in (0, 1, 2, 3, 4, 5, 6, 7, 9, 10):
            assert f"sub_{i}: kp0_s{i}" in r["extracted_text"]
        assert "sub_8:" not in r["extracted_text"]

    def test_two_box_presets_fully_extract(self):
        for name in ("preset2_tag", "preset2_term"):
            r = extract_document(name, _preset_doc(name, "k"), "en", PATTERNS)
            assert r["status"] == "ok", name
            assert r["n_subs_failed"] == 0, name
            assert len(r["spans"]) == 2, name


class TestPresetSparkByteIdentity:
    @pytest.fixture(scope="class")
    def preset_rows(self):
        rows = []
        ts = datetime(2025, 3, 1)
        for i, name in enumerate(PRESET_NAMES):
            rows.append((f"https://p/{name}/single", ts, _preset_doc(name, f"q{i}"), "", "en"))
        # multi-page preset11: the O(pages x 11) heaviest shape + last-wins merge
        rows.append(
            ("https://p/preset11_lcp/multi", ts, _preset_doc("preset11_lcp", "m", n_pages=2), "", "en")
        )
        return rows

    def test_pipeline_matches_kernel_bytes(self, spark, tmp_path, preset_rows):
        from pdf_drawing_ocr_recognition_spark.plans.pipeline import (
            extraction_pipeline,
        )

        path = str(tmp_path / "preset_pages")
        spark.createDataFrame(
            preset_rows,
            "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING",
        ).write.parquet(path)
        got = {
            r["url"]: r.asDict(recursive=True)
            for r in extraction_pipeline(spark, path, PATTERNS).collect()
        }
        assert len(got) == len(preset_rows)
        for url, _ts, html, _text, lang in preset_rows:
            oracle = extract_document(url, html, lang, PATTERNS)
            assert got[url]["extracted_text"] == oracle["extracted_text"], url
            assert got[url]["status"] == oracle["status"] == "ok", url
            assert got[url]["n_subs_failed"] == oracle["n_subs_failed"], url
            assert got[url]["spans"] == oracle["spans"], url

    def test_multi_page_preset11_merges_last_wins(self, preset_rows):
        url, _ts, html, _text, lang = preset_rows[-1]
        r = extract_document(url, html, lang, PATTERNS)
        # two pages, same sub indices → page 1 (later) wins every key
        assert r["status"] == "ok"
        assert "mp1_s0" in r["extracted_text"]
        assert "mp0_s0" not in r["extracted_text"]
        assert r["n_subs_failed"] == 2  # one unpainted box per page
