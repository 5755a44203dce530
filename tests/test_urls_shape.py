"""T177: URL-shape features — host/path/query counters, degenerate URLs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.functions.urls import url_shape_features


def _feat(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    r = df.select(url_shape_features(F.col("url")).alias("f")).select(
        "f.*"
    ).collect()[0]
    return tuple(r)


def test_promo_host_and_params(spark):
    got = _feat(spark, "http://d7-promo-99.example.com/p/7?q=1&r=2&s=3")
    # dots 2, digits 3 (7,9,9), hyphens 2, path '/p/7' depth 2, 3 params, 0 pct
    assert got == (2, 3, 2, 2, 3, 0)


def test_root_and_escapes(spark):
    got = _feat(spark, "http://a.b.h3.example.com/a/b/c%20d")
    assert got == (4, 1, 0, 3, 0, 1)


def test_host_only_url(spark):
    got = _feat(spark, "http://example.com")
    assert got == (1, 0, 0, 1, 0, 0)  # path defaults to '/'


def test_non_url_degrades_to_zeros(spark):
    got = _feat(spark, "not a url at all")
    assert got == (0, 0, 0, 1, 0, 0)
