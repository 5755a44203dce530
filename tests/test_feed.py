"""kernel/feed.py — RSS/Atom parsing (T129)."""

import pytest

from pdf_drawing_ocr_recognition_spark.kernel.feed import parse_feed


class TestRss:
    def test_items_with_entities_and_channel_fields_ignored(self):
        p = parse_feed(
            '<rss version="2.0"><channel><title>chan</title>'
            "<link>http://chan</link>"
            "<item><title>A &amp; B</title><link>http://a.com/1</link>"
            "<pubDate>2024-01-02</pubDate><guid>g1</guid></item>"
            "<item><title>no link</title></item>"
            "</channel></rss>"
        )
        assert p["kind"] == "rss"
        assert p["entries"] == [
            {"title": "A & B", "link": "http://a.com/1",
             "published": "2024-01-02", "entry_id": "g1"}
        ]


class TestAtom:
    def test_attribute_links_rel_filtering_and_dates(self):
        p = parse_feed(
            "<feed><entry><title>t</title>"
            '<link rel="self" href="http://self"/>'
            '<link rel="enclosure" href="http://media"/>'
            '<link href="http://a.com/page"/>'
            "<updated>2024-02-03</updated><id>urn:1</id></entry></feed>"
        )
        assert p["kind"] == "atom"
        e = p["entries"][0]
        assert e["link"] == "http://a.com/page"
        assert e["published"] == "2024-02-03"
        assert e["entry_id"] == "urn:1"

    def test_published_beats_updated_when_first(self):
        p = parse_feed(
            "<feed><entry><link href='http://x'/>"
            "<published>P</published><updated>U</updated></entry></feed>"
        )
        assert p["entries"][0]["published"] == "P"


class TestHostileTotality:
    @pytest.mark.parametrize(
        "xml",
        ["", "<rss>", "<feed><entry><link href=", "plain text",
         "<rss><channel>" + "<item>" * 300,
         "<feed><entry><title>t</title></entry></feed>"],  # no link
    )
    def test_never_raises(self, xml):
        p = parse_feed(xml)
        assert set(p) == {"kind", "entries"}
        for e in p["entries"]:
            assert e["link"]
