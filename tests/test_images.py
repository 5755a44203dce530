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


def test_srcset_width_beats_density_and_largest_wins():
    from pdf_drawing_ocr_recognition_spark.kernel.images import pick_srcset

    assert pick_srcset("/a.png 480w, /b.png 960w") == "/b.png"
    assert pick_srcset("/a.png 2x, /b.png 100w") == "/b.png"  # w beats x
    assert pick_srcset("/a.png, /b.png 2x") == "/b.png"  # bare = 1x
    assert pick_srcset("/a.png 2x, /b.png 2x") == "/a.png"  # tie: first
    assert pick_srcset("/a.png 1.5x, /b.png") == "/a.png"  # fractional -> 1x tie
    assert pick_srcset("") is None


def test_srcset_fallback_to_src_when_unfollowable():
    got = _rows(
        '<img src="/thumb.png" alt="a" srcset="data:image/png;base64,AA 2x">'
    )
    assert got[0][1].endswith("/thumb.png")
    got2 = extract_images(
        '<img src="/thumb.png" srcset="/big.png 900w">', BASE
    )
    assert got2[0]["src"].endswith("/big.png") and got2[0]["from_srcset"] == 1
