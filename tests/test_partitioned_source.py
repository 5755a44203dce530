"""day=-partitioned corpus layout (Iceberg days(warc_ts) analogue) + pruning."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_pair(tmp_path_factory):
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
        write_corpus,
        write_corpus_partitioned,
    )

    base = tmp_path_factory.mktemp("partitioned")
    flat, part = str(base / "flat"), str(base / "bydays")
    write_corpus(flat, 300, files=2)
    write_corpus_partitioned(part, 300, files=2)
    return flat, part


def test_partitioned_layout_is_lossless(spark, corpus_pair):
    """Same 300 rows, same urls, and day always equals the warc_ts UTC day."""
    from pdf_drawing_ocr_recognition_spark.sources.pages import (
        read_pages,
        read_pages_partitioned,
    )

    flat, part = corpus_pair
    p = read_pages_partitioned(spark, part)
    f = read_pages(spark, flat)
    assert p.count() == f.count() == 300
    assert {r.url for r in p.select("url").collect()} == {
        r.url for r in f.select("url").collect()
    }
    assert p.filter(F.date_format("warc_ts", "yyyy-MM-dd") != F.col("day")).count() == 0


def test_day_filter_prunes_partitions(spark, corpus_pair):
    """A day predicate must become a PartitionFilter (directory pruning at
    planning time), not a post-scan filter — at 10^12 docs this is the
    difference between scanning one day and the whole table."""
    from pdf_drawing_ocr_recognition_spark.sources.pages import (
        read_pages,
        read_pages_partitioned,
    )

    flat, part = corpus_pair
    day = "2025-01-03"
    pruned = read_pages_partitioned(spark, part, days=(day,))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.split("\n") if "PartitionFilters" in l)
    assert f"day#" in scan.split("PartitionFilters")[-1].split("PushedFilters")[0]
    assert day in scan
    expected = (
        read_pages(spark, flat)
        .filter(F.date_format("warc_ts", "yyyy-MM-dd") == day)
        .count()
    )
    assert pruned.count() == expected > 0


def test_raw_binaryfile_source_feeds_extraction(spark, tmp_path):
    """Loose files on disk (binaryFile datasource) run through the SAME
    extraction pipeline as the parquet corpus — the reference's file-path
    ingestion (pdor/pdor_unit.py:97-109) as a Spark scan."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
        PATTERNS,
        build_griddoc,
        build_page_image,
    )
    from pdf_drawing_ocr_recognition_spark.operators.extract import extract_pages
    from pdf_drawing_ocr_recognition_spark.sources.pages import read_raw_files

    d = tmp_path / "rawfiles"
    d.mkdir()
    (d / "a.html").write_bytes(
        b"<html><body><p>"
        + b"alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        * 3
        + b"</p></body></html>"
    )
    (d / "b.grid").write_bytes(
        build_griddoc(
            "fullpage",
            [build_page_image(PATTERNS["fullpage"], [{"text": "rawfile"}])],
        )
    )
    pages = read_raw_files(spark, str(d))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    out = {r["url"].rsplit("/", 1)[-1]: r for r in
           extract_pages(pages, PATTERNS).collect()}
    assert out["a.html"]["status"] == "ok"
    assert "alpha beta gamma" in out["a.html"]["extracted_text"]
    assert out["b.grid"]["status"] == "ok"
    assert "sub_0: rawfile" in out["b.grid"]["extracted_text"]


def test_partitioned_corpus_extracts_identically(spark, corpus_pair):
    """Extraction over the day=-partitioned layout is byte-identical to the
    flat layout (partitioning is a storage detail, never a semantic one)."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from pdf_drawing_ocr_recognition_spark.operators.extract import extract_pages
    from pdf_drawing_ocr_recognition_spark.sources.pages import (
        read_pages,
        read_pages_partitioned,
    )

    flat, part = corpus_pair
    a = {
        r["url"]: (r["status"], r["extracted_text"])
        for r in extract_pages(read_pages(spark, flat), PATTERNS).collect()
    }
    b = {
        r["url"]: (r["status"], r["extracted_text"])
        for r in extract_pages(
            read_pages_partitioned(spark, part).drop("day"), PATTERNS
        ).collect()
    }
    assert a == b and len(a) == 300


class TestSchemaEvolution:
    def test_missing_column_reads_as_nulls(self, spark, tmp_path):
        """The ICEBERG.md schema-evolution claim, proven on the analogue:
        an explicit read schema over parquet files WITHOUT some columns
        resolves by name — missing columns come back null, no positional
        coupling, no rewrite."""
        from pdf_drawing_ocr_recognition_spark.sources.pages import (
            PAGES_SCHEMA,
            read_pages,
        )

        old = str(tmp_path / "old_layout")
        spark.createDataFrame(
            [("u/1", bytearray(b"<p>x</p>"), "en")],
            "url STRING, html BINARY, lang STRING",  # no warc_ts, no text
        ).write.parquet(old)
        df = read_pages(spark, old)
        assert df.columns == [c.split()[0] for c in PAGES_SCHEMA.split(", ")]
        row = df.collect()[0]
        assert row["url"] == "u/1" and row["warc_ts"] is None and row["text"] is None
        # time-range predicates on the missing column stay valid (no rows)
        from datetime import datetime

        assert read_pages(spark, old, since=datetime(2020, 1, 1)).count() == 0
