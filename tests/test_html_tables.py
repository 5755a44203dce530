"""T157: HTML <table> extraction — WHATWG grid placement, hostile input.

The kernel is the web-native twin of the reference's cell-grid assembly
(pdor/pdor_unit.py grid detection + ordered cell sort, SURVEY.md A11/M2-M3);
these tests pin the placement algorithm (rowspan hangovers, colspan
reservations, auto-closing, nesting) and the hostility contract (never
throws, spec caps, linear behavior) plus Spark<->kernel identity.
"""

from __future__ import annotations

import time

import pytest

from pdf_drawing_ocr_recognition_spark.kernel.html_tables import extract_tables


def _grid(html):
    return [
        (c["table_idx"], c["row_idx"], c["col_idx"], c["text"])
        for c in extract_tables(html)
    ]


def test_rowspan_colspan_placement():
    html = (
        "<table>"
        "<tr><th>A</th><th>B</th><th>C</th></tr>"
        '<tr><td rowspan="2">tall</td><td colspan="2">wide</td></tr>'
        "<tr><td>x</td><td>y</td></tr>"
        "</table>"
    )
    cells = extract_tables(html)
    at = {(c["row_idx"], c["col_idx"]): c for c in cells}
    assert at[(1, 0)]["text"] == "tall" and at[(1, 0)]["rowspan"] == 2
    assert at[(1, 1)]["text"] == "wide" and at[(1, 1)]["colspan"] == 2
    # row 2: col 0 is occupied by the hangover -> x lands at col 1
    assert at[(2, 1)]["text"] == "x" and at[(2, 2)]["text"] == "y"
    assert [c["is_header"] for c in cells[:3]] == [True, True, True]


def test_colspan_needs_consecutive_free_slots():
    # row 2: col 1 is reserved by a rowspan; a colspan-2 cell cannot
    # straddle it, so it must start at col 2
    html = (
        "<table>"
        '<tr><td>a</td><td rowspan="2">b</td><td>c</td><td>d</td></tr>'
        '<tr><td>e</td><td colspan="2">f</td></tr>'
        "</table>"
    )
    at = {(c["row_idx"], c["col_idx"]): c["text"] for c in extract_tables(html)}
    assert at[(1, 0)] == "e"
    assert at[(1, 2)] == "f"


def test_tag_soup_auto_closing_equals_wellformed():
    soup = "<table><tr><td>a<td>b<tr><td>c<td>d"
    well = (
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table>"
    )
    assert _grid(soup) == _grid(well)


def test_nested_table_isolated_own_index():
    html = (
        "<table><tr><td>outer before"
        "<table><tr><td>inner</td></tr></table>"
        " outer after</td><td>peer</td></tr></table>"
    )
    cells = extract_tables(html)
    outer = [c for c in cells if c["table_idx"] == 0]
    inner = [c for c in cells if c["table_idx"] == 1]
    assert [c["text"] for c in inner] == ["inner"]
    # inner text never leaks; text around the inner table is kept
    assert outer[0]["text"] == "outer before outer after"
    assert outer[1]["text"] == "peer" and outer[1]["col_idx"] == 1


def test_entities_whitespace_and_drop_tags():
    html = (
        "<table><tr><td> A &amp;\n\t B <script>junk()</script>done</td></tr>"
        "</table>"
    )
    (cell,) = extract_tables(html)
    assert cell["text"] == "A & B done"


def test_spec_caps_and_garbage_spans():
    html = (
        '<table><tr><td colspan="999999" rowspan="-2">z</td>'
        "<td colspan=abc>w</td></tr></table>"
    )
    a, b = extract_tables(html)
    assert a["colspan"] == 1000 and a["rowspan"] == 1
    assert b["col_idx"] == 1000 and b["colspan"] == 1


def test_td_without_tr_and_orphan_cells_outside_table():
    assert _grid("<table><td>lone</td></table>") == [(0, 0, 0, "lone")]
    # td/tr outside any table: no context, silently dropped
    assert extract_tables("<td>x</td><tr><td>y</td></tr>") == []


def test_unclosed_table_flushes_at_eof():
    assert _grid("<p>t</p><table><tr><td>tail") == [(0, 0, 0, "tail")]


@pytest.mark.parametrize(
    "hostile",
    [
        "<table>" + "<tr><td>" * 5000,  # 5k soup rows, no closers
        "<table><tr>" + '<td rowspan="65534">x' * 200,  # max hangovers
        "<table><tr><td>" + "&amp;" * 20000,  # entity flood in one cell
        "<table" + " " * 100000 + "><tr><td>pad</td></tr></table>",
        "<!--" + "<table><tr><td>never" * 1000,  # all inside a comment
    ],
)
def test_hostile_never_throws(hostile):
    cells = extract_tables(hostile)
    assert isinstance(cells, list)


def test_linear_time_on_soup_floods():
    base = "<table>" + "<tr><td>a<td>b" * 2000
    t0 = time.perf_counter()
    extract_tables(base)
    t1 = time.perf_counter()
    extract_tables(base * 4)
    t2 = time.perf_counter()
    # 4x input must stay well under quadratic growth (16x); allow sched noise
    assert (t2 - t1) < 8 * max(t1 - t0, 1e-3)


def test_spark_matches_kernel(spark):
    from pdf_drawing_ocr_recognition_spark.operators.tables import (
        extract_html_tables,
        table_shape_stats,
    )

    pages = [
        (
            f"http://h{i}.example.com/p/{i}",
            (
                f"<body><table><tr><th>H{i}</th></tr>"
                f'<tr><td rowspan="2">t{i}</td><td>u&amp;{i}</td></tr>'
                f"<tr><td>v{i}</td></tr></table></body>"
            ).encode(),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    got = sorted(
        tuple(r)
        for r in extract_html_tables(df).collect()
    )
    want = []
    for url, html in pages:
        for c in extract_tables(html.decode()):
            want.append(
                (
                    url,
                    c["table_idx"],
                    c["row_idx"],
                    c["col_idx"],
                    c["rowspan"],
                    c["colspan"],
                    c["is_header"],
                    c["text"],
                )
            )
    assert got == sorted(want)
    stats = {
        r["url"]: (r["n_rows"], r["n_cells"], r["n_header_cells"], r["n_col_slots"])
        for r in table_shape_stats(extract_html_tables(df)).collect()
    }
    assert stats[pages[0][0]] == (3, 4, 1, 2)
