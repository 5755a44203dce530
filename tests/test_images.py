"""T183: image/alt harvesting — resolution, captions, skips, totality."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.kernel.images import extract_images

BASE = "http://h.example.com/p/1"


def _rows(html):
    return [
        (r["idx"], r["src"], r["alt"], r["title"], r["caption"])
        for r in extract_images(html, BASE)
    ]


def test_relative_src_resolves_and_alt_unescapes():
    got = _rows('<img src="/img/a.png" alt=" pic &amp; co " title="t">')
    assert got == [
        (0, "http://h.example.com/img/a.png", "pic & co", "t", "")
    ]


def test_figcaption_pairs_even_when_caption_follows():
    got = _rows(
        '<figure><img src="x.jpg" alt="a"><figcaption>The &amp; cap</figcaption></figure>'
        '<img src="y.jpg" alt="b">'
    )
    assert got[0][1:] == ("http://h.example.com/p/x.jpg", "a", "", "The & cap")
    assert got[1][1:] == ("http://h.example.com/p/y.jpg", "b", "", "")


def test_data_and_js_uris_skipped():
    got = _rows(
        '<img src="data:image/png;base64,AAAA"><img src="javascript:x">'
        '<img src="ok.png">'
    )
    assert len(got) == 1 and got[0][1].endswith("/ok.png")


def test_nested_figures_and_eof_flush():
    got = _rows(
        '<figure><figcaption>outer</figcaption><figure><img src="i.png">'
        "<figcaption>inner</figcaption>"
    )
    assert got == [(0, "http://h.example.com/p/i.png", "", "", "inner")]


def test_hostility_never_throws():
    for html in ["", "<img", "<img src=>", "</figure>" * 50,
                 "<figure>" * 1000 + '<img src="a.png">',
                 "<figcaption>orphan</figcaption>"]:
        assert isinstance(extract_images(html, BASE), list)
