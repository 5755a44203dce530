"""kernel/meta.py — HTML head-metadata extraction (T124/T125)."""

import pytest

from pdf_drawing_ocr_recognition_spark.kernel.meta import extract_meta

BASE = "http://h0.example.com/p/7"


class TestTitle:
    def test_unescaped_and_whitespace_collapsed(self):
        m = extract_meta("<title> A &amp;\n\t B </title>")
        assert m["title"] == "A & B"

    def test_first_title_wins(self):
        m = extract_meta("<title>one</title><title>two</title>")
        assert m["title"] == "one"

    def test_unterminated_title_flushes_at_eof(self):
        m = extract_meta("<head><title>cut off")
        assert m["title"] == "cut off"

    def test_markup_inside_title_is_not_text(self):
        m = extract_meta("<title>a<b>c</b>d</title>")
        assert m["title"] == "acd"

    def test_no_title(self):
        assert extract_meta("<p>hi</p>")["title"] is None


class TestMetas:
    def test_name_and_property_forms_key_casefolded(self):
        m = extract_meta(
            '<meta name="Description" content="d1">'
            '<meta property="og:type" content="article">'
        )
        assert m["metas"] == {"description": "d1", "og:type": "article"}

    def test_first_occurrence_wins(self):
        m = extract_meta(
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="index">'
        )
        assert m["metas"]["robots"] == "noindex"

    def test_data_name_attribute_not_mistaken_for_name(self):
        m = extract_meta('<meta data-name="x" content="y">')
        assert m["metas"] == {}

    def test_unquoted_and_entity_values(self):
        m = extract_meta("<meta name=author content=Bob&amp;Ann>")
        assert m["metas"]["author"] == "Bob&Ann"

    def test_content_missing_is_skipped(self):
        assert extract_meta('<meta name="x">')["metas"] == {}


class TestCanonical:
    def test_root_relative_resolved_against_base(self):
        m = extract_meta('<link rel="canonical" href="/p/6">', base_url=BASE)
        assert m["canonical"] == "http://h0.example.com/p/6"

    def test_multi_valued_rel_matches_token(self):
        m = extract_meta(
            '<link rel="canonical nofollow" href="http://a.com/x">',
            base_url=BASE,
        )
        assert m["canonical"] == "http://a.com/x"
        m2 = extract_meta(
            '<link rel="canonicalish" href="http://a.com/x">', base_url=BASE
        )
        assert m2["canonical"] is None

    def test_first_canonical_wins_and_no_base_passthrough(self):
        m = extract_meta(
            '<link rel="canonical" href="http://a.com/1">'
            '<link rel="canonical" href="http://a.com/2">'
        )
        assert m["canonical"] == "http://a.com/1"


class TestHostileTotality:
    @pytest.mark.parametrize(
        "html",
        [
            "",
            "<",
            "<title>" + "<" * 1000,
            "<!-- unterminated " * 50,
            "<meta name='a' content='b",  # unterminated tag
            "<title>\x00\x01</title><meta name=\x02 content=ok>",
            "<link rel=canonical href='::not a url::'>",
        ],
    )
    def test_never_raises(self, html):
        m = extract_meta(html, base_url=BASE)
        assert set(m) == {"title", "canonical", "metas", "alternates", "html_lang"}


class TestAlternates:
    def test_hreflang_collected_in_order_and_resolved(self):
        m = extract_meta(
            '<link rel="alternate" hreflang="FR" href="/fr/p">'
            '<link rel="alternate" hreflang="de" href="http://b.com/de">'
            '<link rel="alternate" type="application/rss+xml" href="/feed">'
            '<link rel="stylesheet" href="/css">',
            base_url=BASE,
        )
        assert m["alternates"] == [
            ("fr", "http://h0.example.com/fr/p"),
            ("de", "http://b.com/de"),
        ]

    def test_canonical_and_alternate_on_one_tag(self):
        m = extract_meta(
            '<link rel="canonical alternate" hreflang="en" href="/x">',
            base_url=BASE,
        )
        assert m["canonical"] == "http://h0.example.com/x"
        assert m["alternates"] == [("en", "http://h0.example.com/x")]


class TestHreflangClusters:
    def test_reciprocal_set_clusters_one_way_splits(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.metadata import (
            hreflang_clusters,
        )

        edges = spark.createDataFrame(
            # reciprocal pair a<->b (self-refs included, protocol style)
            [("http://s/en", "en", "http://s/en"),
             ("http://s/en", "de", "http://s/de"),
             ("http://s/de", "en", "http://s/en"),
             ("http://s/de", "de", "http://s/de"),
             # one-way: c declares d, d declares nothing → separate cluster
             ("http://s/c", "fr", "http://s/zz")],
            ["url", "hreflang", "alt_url"],
        )
        got = {
            r["cluster_key"]: (r["n_pages"], r["n_langs"], r["langs"])
            for r in hreflang_clusters(edges).collect()
        }
        assert got == {
            "http://s/de": (2, 2, "de,en"),
            "http://s/c": (1, 1, "fr"),
        }


class TestCharsetSniff:
    def _s(self, raw):
        from pdf_drawing_ocr_recognition_spark.kernel.charset import (
            sniff_charset,
        )

        return sniff_charset(raw)

    def test_bom_beats_meta(self):
        raw = b"\xef\xbb\xbf<meta charset='latin-1'>"
        assert self._s(raw) == {"charset": "utf-8", "source": "bom"}
        assert self._s(b"\xff\xfex")["charset"] == "utf-16-le"
        assert self._s(b"\xfe\xffx")["charset"] == "utf-16-be"

    def test_meta_charset_and_http_equiv(self):
        assert self._s(b"<head><meta charset=UTF-8></head>") == {
            "charset": "utf-8", "source": "meta-charset"
        }
        raw = (b'<meta http-equiv="Content-Type" '
               b'content="text/html; Charset=Windows-1252">')
        assert self._s(raw) == {
            "charset": "windows-1252", "source": "meta-http-equiv"
        }

    def test_charset_inside_other_content_never_matches(self):
        # refresh URL carrying 'charset=' must not be mistaken for a decl
        raw = (b'<meta http-equiv="refresh" '
               b'content="0; url=/x?charset=evil">'
               b"<meta charset='KOI8-R'>")
        assert self._s(raw) == {"charset": "koi8-r", "source": "meta-charset"}

    def test_declaration_beyond_1024_bytes_ignored(self):
        raw = b"<p>" + b"x" * 1100 + b"</p><meta charset='latin-1'>"
        assert self._s(raw) == {"charset": "utf-8", "source": "default"}

    def test_hostile_bytes_never_raise(self):
        for raw in (b"", b"\xff", b"\x80" * 2000, b"<meta charset="):
            s = self._s(raw)
            assert set(s) == {"charset", "source"}


def test_html_lang_first_wins_and_normalizes():
    assert extract_meta('<html LANG=" EN-us "><body>x</body></html>')[
        "html_lang"
    ] == "en-us"
    # first DECLARED lang wins (a bare root does not mask a later
    # soup declaration — documented contract)
    assert extract_meta("<html><html lang=de>")["html_lang"] == "de"
    assert extract_meta("<html lang=fr><html lang=de>")["html_lang"] == "fr"
    assert extract_meta("no root at all")["html_lang"] == ""
