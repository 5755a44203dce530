"""Pattern registry: validation (A24 documented intent) + save/load roundtrip."""

import pytest

from pdf_drawing_ocr_recognition_spark.sources.pattern_registry import (
    InvalidPatternError,
    load_patterns,
    save_patterns,
    validate_pattern,
)


def good(**over):
    p = {
        "name": "g",
        "prompt": "grid-ocr",
        "dpi": 450,
        "sub_imgs": [[0.0, 50.0, 0.0, 100.0], [50.0, 100.0, 0.0, 100.0]],
    }
    p.update(over)
    return p


class TestValidate:
    def test_valid_passes(self):
        assert validate_pattern(good()) == good()

    def test_empty_name(self):
        # ref pdor/pdor_pattern.py:27-30
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(name=""))

    def test_dpi_documented_intent_not_reference_bug(self):
        # the reference's check (ref :39-43) accepts out-of-range ints; we
        # implement the documented intent: int AND 72..1400 (SURVEY.md A24)
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(dpi=9999))
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(dpi=450.0))

    def test_box_rules(self):
        # len-4, floats, 0-100, top<bottom & left<right (ref :45-71)
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(sub_imgs=[[0.0, 50.0, 0.0]]))
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(sub_imgs=[[0, 50, 0, 100]]))  # ints
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(sub_imgs=[[0.0, 150.0, 0.0, 100.0]]))
        with pytest.raises(InvalidPatternError):
            validate_pattern(good(sub_imgs=[[50.0, 50.0, 0.0, 100.0]]))  # empty range

    def test_empty_sub_imgs_legal_means_full_page(self):
        # ref :73 — [] defaults to full page (applied by the kernel)
        assert validate_pattern(good(sub_imgs=[]))["sub_imgs"] == []


class TestRoundTrip:
    def test_save_load(self, tmp_path):
        path = str(tmp_path / "patterns.json")
        patterns = {"g": good(), "f": good(name="f", sub_imgs=[])}
        save_patterns(patterns, path)
        assert load_patterns(path) == patterns

    def test_save_rejects_invalid(self, tmp_path):
        with pytest.raises(InvalidPatternError):
            save_patterns({"bad": good(dpi=1)}, str(tmp_path / "x.json"))

    def test_fixture_registry_loads(self, tmp_path):
        from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import write_patterns

        path = write_patterns(str(tmp_path / "p.json"))
        loaded = load_patterns(path)
        assert set(loaded) == {
            "grid11", "grid2", "grid4", "fullpage", "quad",
            "preset11_lcp", "preset2_tag", "preset2_term",
        }
        assert len(loaded["grid11"]["sub_imgs"]) == 11  # preset shape
        # exact shipped-preset geometries (ref pdor/pdor_pattern.py:229-317)
        assert len(loaded["preset11_lcp"]["sub_imgs"]) == 11
        assert loaded["preset11_lcp"]["dpi"] == 1390
        assert loaded["preset2_tag"]["dpi"] == 450
        assert loaded["preset2_term"]["dpi"] == 1200
