"""T166: mojibake repair — peel rounds, fixed points, false-positive guard."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.kernel.mojibake import repair_mojibake


def _mangle(s: str, codec: str = "latin-1") -> str:
    return s.encode("utf-8").decode(codec)


def test_single_layer_latin1_repairs():
    clean = "café — déjà vu"
    assert repair_mojibake(_mangle(clean)) == (clean, 1)


def test_single_layer_cp1252_repairs():
    clean = "it’s “quoted – fine"  # no U+201D: its 0x9D byte is
    # undefined in strict cp1252, so the MANGLE (not the repair) fails —
    # that byte's real-world path is the latin-1 layer tested above
    assert repair_mojibake(_mangle(clean, "cp1252")) == (clean, 1)


def test_double_layer_peels_twice():
    clean = "naïve résumé"
    assert repair_mojibake(_mangle(_mangle(clean))) == (clean, 2)


def test_clean_text_is_fixed_point():
    for s in ["plain ascii", "café — d", "", "中文 mixed"]:
        assert repair_mojibake(s) == (s, 0)


def test_genuine_legacy_text_untouched():
    # 'Øx' encodes to 0xD8 0x78 — not valid UTF-8, so no round-trip
    assert repair_mojibake("Øx data") == ("Øx data", 0)


def test_round_cap_bounds_peeling():
    clean = "é"
    quad = _mangle(_mangle(_mangle(_mangle(clean))))
    fixed, n = repair_mojibake(quad, max_rounds=3)
    assert n == 3 and fixed == _mangle(clean)  # one layer remains by cap
    assert repair_mojibake(quad, max_rounds=4) == (clean, 4)
