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


def test_yaml_render_reference_args_roundtrip(spark, extracted):
    """A29: yaml.dump(allow_unicode=True, default_flow_style=False) — ref
    pdor/pdor_out.py:83-92 — and safe_load round-trips the merged dict."""
    import yaml

    from pdf_drawing_ocr_recognition_spark.operators.sinks import render_results

    ok = extracted.filter(F.col("status") == "ok").limit(30)
    rows = render_results(ok, ("yaml", "json")).collect()
    assert rows
    for r in rows:
        data = json.loads(r["render_json"])
        assert yaml.safe_load(r["render_yaml"]) == data
        # allow_unicode=True: non-ASCII must appear raw, never \x-escaped
        assert "\\x" not in r["render_yaml"]
        # default_flow_style=False: block style, no top-level inline mapping
        assert not r["render_yaml"].startswith("{")


def test_toml_render_tomllib_roundtrip(spark, extracted):
    """A31: the TOML sink produces valid TOML carrying the same data
    (tomllib is the stdlib parser; the toml writer package may be absent)."""
    import tomllib

    from pdf_drawing_ocr_recognition_spark.operators.sinks import render_results

    ok = extracted.filter(F.col("status") == "ok").limit(30)
    rows = render_results(ok, ("toml", "json")).collect()
    assert rows
    for r in rows:
        assert tomllib.loads(r["render_toml"]) == json.loads(r["render_json"])


def test_toml_emitter_shapes():
    """Built-in emitter: nested tables, inline arrays, escapes, quoted keys."""
    import tomllib

    from pdf_drawing_ocr_recognition_spark.kernel.render import _toml_dumps

    data = {
        "a": 1,
        "s": 'he said "hi"\nline2',
        "识别": "结果",
        "arr": [1, "two", 3.5, True],
        "tbl": {"x": "y", "inner": {"z": 9}},
    }
    text = _toml_dumps(data)
    assert tomllib.loads(text) == data
    assert "[tbl]" in text and "[tbl.inner]" in text


def test_jsonl_roundtrip_and_corpus_lines(spark, extracted, tmp_path):
    """JSONL source/sink round-trip preserves bytes (base64 html) and the
    corpus sink emits one parseable JSON object per line."""
    from pdf_drawing_ocr_recognition_spark.operators.sinks import write_jsonl_corpus
    from pdf_drawing_ocr_recognition_spark.sources.pages import (
        read_pages_jsonl,
        write_pages_jsonl,
    )

    pages = spark.createDataFrame(
        [
            ("u/1", None, bytearray(b"\x89PNG\r\n\x1a\nraw\x00bytes"), "", "en"),
            ("u/2", None, bytearray(b"<html>x</html>"), "", "zh"),
        ],
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING",
    )
    p = str(tmp_path / "pages_jsonl")
    write_pages_jsonl(pages, p)
    back = {r["url"]: bytes(r["html"]) for r in read_pages_jsonl(spark, p).collect()}
    assert back == {
        "u/1": b"\x89PNG\r\n\x1a\nraw\x00bytes",
        "u/2": b"<html>x</html>",
    }
    assert read_pages_jsonl(spark, p, langs=("en",)).count() == 1

    out = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(extracted.filter(F.col("status") == "ok").limit(20), out)
    import glob

    lines = []
    for f in glob.glob(f"{out}/part-*"):
        with open(f, "r", encoding="utf-8") as fh:
            lines += [l for l in fh.read().splitlines() if l]
    assert len(lines) == 20
    for l in lines:
        obj = json.loads(l)
        assert set(obj) <= {"url", "extracted_text"} and "url" in obj


def test_simpsave_render_roundtrip_kernel():
    """Round-5 A35: the reference's default sink (ss.write('Pdor Result',
    result, file=<base>.ini)) — clean-room INI emitter; the value must be
    recoverable BY KEY from the rendered text, including nested dicts,
    lists, Chinese text, and % (no interpolation)."""
    from pdf_drawing_ocr_recognition_spark.kernel.render import (
        read_simpsave,
        render_simpsave,
    )

    result = {
        "图纸": "E-101 配电图",
        "cells": [{"row": 1, "text": "A 相"}, {"row": 2, "text": "50% 负载"}],
        "meta": {"dpi": 1390, "ok": True, "note": "line1\nline2"},
    }
    text = render_simpsave(result)
    assert text.startswith("[Pdor Result]\n")
    assert "\ntype = dict\n" in text
    assert read_simpsave(text) == result
    # missing key behaves like simpsave's read of an absent key
    import pytest as _pytest

    with _pytest.raises(KeyError):
        read_simpsave(text, key="nope")


def test_simpsave_render_dispatches_as_column(spark, extracted):
    from pdf_drawing_ocr_recognition_spark.kernel.render import read_simpsave
    from pdf_drawing_ocr_recognition_spark.operators.sinks import (
        render_results,
    )

    ok = extracted.filter("status = 'ok'")
    rows = render_results(ok, ("simpsave", "json")).collect()
    assert rows
    for r in rows:
        recovered = read_simpsave(r["render_simpsave"])
        assert recovered == json.loads(r["render_json"])
