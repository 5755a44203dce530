"""kernel/sitemap.py — sitemap parsing (T127)."""

import pytest

from pdf_drawing_ocr_recognition_spark.kernel.sitemap import parse_sitemap


class TestUrlset:
    def test_fields_and_entity_unescape(self):
        p = parse_sitemap(
            '<?xml version="1.0"?><urlset>'
            "<url><loc> http://a.com/p?x=1&amp;y=2 </loc>"
            "<lastmod>2024-01-02</lastmod><changefreq>daily</changefreq>"
            "<priority>0.8</priority></url>"
            "<url><loc>http://a.com/q</loc></url>"
            "</urlset>"
        )
        assert p["kind"] == "urlset"
        assert p["entries"] == [
            {"loc": "http://a.com/p?x=1&y=2", "lastmod": "2024-01-02",
             "changefreq": "daily", "priority": "0.8"},
            {"loc": "http://a.com/q", "lastmod": None,
             "changefreq": None, "priority": None},
        ]

    def test_entry_without_loc_dropped(self):
        p = parse_sitemap("<urlset><url><lastmod>2024</lastmod></url></urlset>")
        assert p["entries"] == []

    def test_sitemapindex(self):
        p = parse_sitemap(
            "<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc>"
            "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
        )
        assert p["kind"] == "sitemapindex"
        assert p["entries"][0]["loc"] == "http://a.com/s1.xml"

    def test_fields_outside_entries_ignored(self):
        p = parse_sitemap("<urlset><loc>stray</loc><url>"
                          "<loc>http://a.com</loc></url></urlset>")
        assert [e["loc"] for e in p["entries"]] == ["http://a.com"]


class TestHostileTotality:
    @pytest.mark.parametrize(
        "xml",
        [
            "",
            "not xml at all",
            "<urlset><url><loc>http://a.com",  # unterminated everything
            "<urlset>" + "<url>" * 500,
            "<urlset><url><loc></loc></url></urlset>",  # empty loc
            "<!-- <urlset> --><p>html, not a sitemap</p>",
        ],
    )
    def test_never_raises(self, xml):
        p = parse_sitemap(xml)
        assert set(p) == {"kind", "entries"}
        for e in p["entries"]:
            assert e["loc"]
