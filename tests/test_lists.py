"""T194: list extraction — nesting isolation, soup, routing, totality."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.kernel.lists import extract_list_items


def _rows(html):
    return [
        (r["list_idx"], r["depth"], r["ordered"], r["item_idx"], r["text"])
        for r in extract_list_items(html)
    ]


def test_flat_list_and_entities():
    got = _rows("<ul><li>a &amp; b</li><li> two </li></ul>")
    assert got == [(0, 1, False, 0, "a & b"), (0, 1, False, 1, "two")]


def test_nested_list_isolated_and_outer_continues():
    got = _rows(
        "<ul><li>outer<ol><li>s0</li><li>s1</li></ol>tail</li><li>next</li></ul>"
    )
    assert (1, 2, True, 0, "s0") in got and (1, 2, True, 1, "s1") in got
    outer = [r for r in got if r[0] == 0]
    assert outer == [(0, 1, False, 0, "outer tail"), (0, 1, False, 1, "next")]


def test_soup_closer_free_parses_identically():
    soup = _rows("<ul><li>a<li>b<li>c</ul>")
    closed = _rows("<ul><li>a</li><li>b</li><li>c</li></ul>")
    assert soup == closed


def test_text_between_list_and_first_li_routes_to_outer_item():
    # 'stray' sits inside the nested ul before its first li -> routes to
    # the OUTER open item
    got = _rows("<ul><li>x<ul>stray<li>in</li></ul></li></ul>")
    assert got == [(1, 2, False, 0, "in"), (0, 1, False, 0, "x stray")]


def test_hostility_never_throws():
    for html in ["", "</ul></li>", "<li>orphan</li>", "<ul>" * 2000,
                 "<ul><li>unclosed at eof", "<ol><script>x</script><li>k"]:
        assert isinstance(extract_list_items(html), list)
    assert _rows("<ul><li>unclosed at eof") == [(0, 1, False, 0, "unclosed at eof")]
    assert _rows("<li>orphan</li>") == []  # li outside any list: dropped
    assert _rows("<ol><script>evil</script><li>k</li></ol>") == [
        (0, 1, True, 0, "k")
    ]
