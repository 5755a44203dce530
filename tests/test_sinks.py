"""Sink renders: the rendered plaintext column must byte-match extracted_text
(same serializer, reconstructed from spans), and json/markdown renders must be
well-formed per the reference's formatting rules."""

import json

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS


@pytest.fixture(scope="module")
def extracted(spark, pages_small):
    from pdf_drawing_ocr_recognition_spark.plans.pipeline import extraction_pipeline

    return extraction_pipeline(spark, pages_small, PATTERNS).cache()


def test_plaintext_render_matches_extracted_text(spark, extracted):
    from pdf_drawing_ocr_recognition_spark.operators.sinks import render_results

    ok = extracted.filter(F.col("status") == "ok")
    rendered = render_results(ok, ("plaintext",))
    joined = ok.select("url", "extracted_text").join(rendered, "url")
    rows = joined.collect()
    assert rows
    bad = [r["url"] for r in rows if r["render_plaintext"] != r["extracted_text"]]
    assert not bad, bad[:3]


def test_json_render_parses_with_reference_args(spark, extracted):
    from pdf_drawing_ocr_recognition_spark.operators.sinks import render_results

    ok = extracted.filter(F.col("status") == "ok").limit(50)
    for r in render_results(ok, ("json", "markdown", "xml")).collect():
        parsed = json.loads(r["render_json"])
        assert isinstance(parsed, dict)
        assert r["render_markdown"].startswith("# PDOR识别结果\n\n")
        assert r["render_xml"].startswith('<?xml version="1.0" ?>')


def test_unknown_format_raises(spark, extracted):
    from pdf_drawing_ocr_recognition_spark.operators.sinks import render_results

    with pytest.raises(ValueError, match="unsupported output type"):
        render_results(extracted, ("ini",))


def test_write_results_layout(spark, extracted, tmp_path):
    from pdf_drawing_ocr_recognition_spark.operators.sinks import write_results

    out = str(tmp_path / "sinkout")
    write_results(extracted.limit(40), out, formats=("json",))
    assert spark.read.parquet(f"{out}/result").count() == 40
    renders = spark.read.parquet(f"{out}/renders")
    assert renders.columns == ["url", "render_json"]
    assert renders.count() == 40
