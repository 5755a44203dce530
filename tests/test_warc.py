"""WARC source (kernel + Spark layer): round trip, record filtering,
truncation handling, and the pages-schema contract."""

from datetime import datetime

from pdf_drawing_ocr_recognition_spark.kernel.warc import (
    build_warc,
    split_warc_records,
)

RECORDS = [
    {"rec_type": "warcinfo", "body": b"software: test\r\n"},
    {
        "rec_type": "request",
        "url": "https://a.example/x",
        "body": b"GET /x HTTP/1.1\r\n\r\n",
    },
    {
        "rec_type": "response",
        "url": "https://a.example/x",
        "date": "2024-03-05T12:00:01Z",
        "body": b"<html><body>alpha</body></html>",
    },
    {
        "rec_type": "response",
        "url": "https://b.example/y",
        "date": "2024-03-05T12:00:02Z",
        "body": b"",  # empty payload stays a valid row
    },
    {
        "rec_type": "metadata",
        "url": "https://a.example/x",
        "body": b"fetchTimeMs: 12\r\n",
    },
]


class TestWarcKernel:
    def test_round_trip_keeps_responses_only(self):
        rows, stats = split_warc_records(build_warc(RECORDS))
        assert stats == {
            "n_records": 5,
            "n_responses": 2,
            "n_skipped": 3,
            "n_bad": 0,
        }
        assert [(r["url"], r["html"]) for r in rows] == [
            ("https://a.example/x", b"<html><body>alpha</body></html>"),
            ("https://b.example/y", b""),
        ]
        assert rows[0]["date"] == "2024-03-05T12:00:01Z"

    def test_clipped_tail_is_dropped_and_counted(self):
        data = build_warc(RECORDS)
        rows, stats = split_warc_records(data[:-40])  # clip into last record
        assert stats["n_bad"] == 1
        assert stats["n_responses"] == 2  # intact records unaffected

    def test_garbage_prefix_rejected(self):
        rows, stats = split_warc_records(b"not a warc file")
        assert rows == [] and stats["n_bad"] == 1

    def test_body_with_crlf_crlf_not_confused_for_boundary(self):
        # Content-Length framing must win over separator scanning: a body
        # containing \r\n\r\n must stay inside ONE record.
        tricky = [
            {
                "rec_type": "response",
                "url": "https://c.example/z",
                "body": b"part1\r\n\r\npart2",
            },
            {
                "rec_type": "response",
                "url": "https://d.example/w",
                "body": b"tail",
            },
        ]
        rows, stats = split_warc_records(build_warc(tricky))
        assert stats["n_responses"] == 2 and stats["n_bad"] == 0
        assert rows[0]["html"] == b"part1\r\n\r\npart2"


class TestWarcSparkSource:
    def test_read_warc_lands_pages_schema(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.warc import (
            read_warc,
            warc_scan_stats,
        )

        seg = tmp_path / "segs"
        seg.mkdir()
        (seg / "part-000.warc").write_bytes(build_warc(RECORDS))
        (seg / "part-001.warc").write_bytes(
            build_warc(
                [
                    {
                        "rec_type": "response",
                        "url": "https://e.example/q",
                        "date": "2024-03-06T00:00:00Z",
                        "body": b"<html>beta</html>",
                    }
                ]
            )
        )
        pages = read_warc(spark, str(seg), default_lang="en")
        assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
        got = {
            r["url"]: (r["warc_ts"], bytes(r["html"]), r["lang"])
            for r in pages.collect()
        }
        assert set(got) == {
            "https://a.example/x",
            "https://b.example/y",
            "https://e.example/q",
        }
        assert got["https://e.example/q"] == (
            datetime(2024, 3, 6, 0, 0),
            b"<html>beta</html>",
            "en",
        )
        stats = {
            r["path"].rsplit("/", 1)[-1]: (r["n_responses"], r["n_bad"])
            for r in warc_scan_stats(spark, str(seg)).collect()
        }
        assert stats == {"part-000.warc": (2, 0), "part-001.warc": (1, 0)}

    def test_warc_pages_feed_the_extraction_pipeline(self, spark, tmp_path):
        """The WARC source output must be consumable by the same downstream
        extraction the parquet corpus uses (schema contract, not a stub)."""
        from pdf_drawing_ocr_recognition_spark.kernel.html_extract import (
            extract_main_text,
        )
        from pdf_drawing_ocr_recognition_spark.sources.warc import read_warc

        seg = tmp_path / "seg2"
        seg.mkdir()
        body = b"<html><body><p>real main content here to keep</p></body></html>"
        (seg / "a.warc").write_bytes(
            build_warc(
                [
                    {
                        "rec_type": "response",
                        "url": "https://f.example/r",
                        "body": body,
                    }
                ]
            )
        )
        pages = read_warc(spark, str(seg), default_lang="en")
        row = pages.collect()[0]
        # kernel-level consumption parity: bytes survive the Arrow hop intact
        assert extract_main_text(bytes(row["html"]).decode("utf-8")) == (
            extract_main_text(body.decode("utf-8"))
        )


def test_negative_content_length_terminates():
    """Regression: a crafted 'Content-Length: -N' used to hold the cursor
    still — an infinite parse loop on one hostile record.  Must terminate
    immediately and count the record as garbled."""
    import time

    from pdf_drawing_ocr_recognition_spark.kernel.warc import (
        split_warc_records,
    )

    hdr = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -12\r\n\r\n"
    t0 = time.monotonic()
    rows, stats = split_warc_records(hdr + b"payload" + hdr)
    assert time.monotonic() - t0 < 1.0
    assert rows == [] and stats["n_bad"] == 1


def test_warc_fuzz_total():
    """Arbitrary bytes (incl. version-prefixed) always terminate with a
    (rows, stats) answer — the T85/T91 totality contract for WARC."""
    import hashlib

    from pdf_drawing_ocr_recognition_spark.kernel.warc import (
        split_warc_records,
    )

    for i in range(300):
        blob = hashlib.md5(f"warcfuzz{i}".encode()).digest() * (i % 7 + 1)
        for prefix in (b"", b"WARC/1.0\r\n", b"WARC/1.0\r\n\r\n"):
            rows, stats = split_warc_records(prefix + blob)
            assert isinstance(rows, list) and stats["n_records"] >= 0
