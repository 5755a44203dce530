"""T169: heading extraction — ordering, soup auto-close, drops, totality."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.kernel.headings import extract_headings


def test_ordered_levels_and_collapse():
    got = extract_headings(
        "<h1>  Main&amp;Title </h1><p>x</p><h2>A\n\tSub</h2><h3>deep</h3>"
    )
    assert [(h["idx"], h["level"], h["text"]) for h in got] == [
        (0, 1, "Main&Title"),
        (1, 2, "A Sub"),
        (2, 3, "deep"),
    ]


def test_soup_autoclose_on_next_heading_and_eof():
    got = extract_headings("<h2>Unclosed A<h3>B</h3><p>p</p><h4>tail at eof")
    assert [(h["level"], h["text"]) for h in got] == [
        (2, "Unclosed A"),
        (3, "B"),
        (4, "tail at eof"),
    ]


def test_mismatched_close_and_script_drop():
    got = extract_headings("<h2>keep<script>var e;</script>ing</h3>done")
    assert got == [{"idx": 0, "level": 2, "text": "keeping"}]


def test_hostility_never_throws():
    for html in ["", "</h1></h2>", "<h1/>", "<h1" + " " * 5000, "<h6>" * 1000]:
        assert isinstance(extract_headings(html), list)
    assert extract_headings("<h1/>") == [{"idx": 0, "level": 1, "text": ""}]


def test_profile_rollup(spark):
    from pdf_drawing_ocr_recognition_spark.operators.headings import (
        extract_page_headings,
        heading_profile,
    )

    pages = spark.createDataFrame(
        [
            ("u1", b"<h1>T1</h1><h2>s</h2><h2>s2</h2><h3>d</h3>"),
            ("u2", b"<h2>no h1 here</h2>"),
            ("u3", b"<h1>first</h1><h1>second</h1>"),
        ],
        "url string, html binary",
    )
    prof = {
        r["url"]: (
            r["n_headings"],
            r["n_h1"],
            r["max_level"],
            r["title_candidate"],
        )
        for r in heading_profile(extract_page_headings(pages)).collect()
    }
    assert prof["u1"] == (4, 1, 3, "T1")
    assert prof["u2"] == (1, 0, 2, "")
    assert prof["u3"] == (2, 2, 1, "first")


def test_sections_flat_outline_with_preamble():
    from pdf_drawing_ocr_recognition_spark.kernel.headings import (
        extract_sections,
    )

    got = extract_sections(
        "<p>intro</p><h1>T&amp;C</h1><p>a</p><p>b</p>"
        "<h2>Unclosed<h3>D</h3>tail"
    )
    assert [(s["level"], s["title"], s["text"]) for s in got] == [
        (0, "", "intro"),
        (1, "T&C", "a b"),  # block tags separate paragraphs
        (2, "Unclosed", ""),  # soup heading auto-closed by h3
        (3, "D", "tail"),
    ]


def test_sections_empty_preamble_suppressed_and_script_dropped():
    from pdf_drawing_ocr_recognition_spark.kernel.headings import (
        extract_sections,
    )

    got = extract_sections("<script>x</script><h1>T</h1>body only")
    assert [(s["idx"], s["level"], s["title"], s["text"]) for s in got] == [
        (0, 1, "T", "body only")
    ]
    assert extract_sections("") == []


def test_section_operator_rows(spark):
    from pdf_drawing_ocr_recognition_spark.operators.headings import (
        extract_page_sections,
    )

    pages = spark.createDataFrame(
        [("u", b"<h1>A</h1>one<h2>B</h2>two")], "url string, html binary"
    )
    rows = sorted(
        map(tuple, extract_page_sections(pages).collect())
    )
    assert rows == [("u", 0, 1, "A", "one"), ("u", 1, 2, "B", "two")]
