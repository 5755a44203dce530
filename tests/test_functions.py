"""Column-expression function sanity (full cross-engine checks live in
tools/check_oracle.py; these pin a few exact values in-process)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "junk {'a': 1} tail"),
            (2, "{{'open': 1}"),
            (3, "Error: backend down"),
            (4, "no braces at all"),
        ],
        "id INT, raw STRING",
    )


def test_brace_ops(tiny):
    from pdf_drawing_ocr_recognition_spark.functions import (
        brace_balanced,
        brace_span,
        is_error_prefixed,
    )
    from pdf_drawing_ocr_recognition_spark.kernel import (
        extract_brace_span,
        has_balanced_braces,
    )

    rows = tiny.select(
        "raw",
        brace_balanced(F.col("raw")).alias("bal"),
        brace_span(F.col("raw")).alias("span"),
        is_error_prefixed(F.col("raw")).alias("err"),
    ).collect()
    for r in rows:
        assert r["bal"] == has_balanced_braces(r["raw"])
        assert r["span"] == extract_brace_span(r["raw"])
        assert r["err"] == r["raw"].startswith("Error:")


def test_crop_bounds_matches_kernel(spark):
    from pdf_drawing_ocr_recognition_spark.functions import crop_bounds
    from pdf_drawing_ocr_recognition_spark.kernel import crop_box

    cases = [(999, 33.3), (999, 66.6), (100, 0.0), (100, 100.0), (7, 50.0)]
    df = spark.createDataFrame(cases, "h INT, pct DOUBLE")
    rows = df.select(
        "h", "pct", crop_bounds(F.col("h"), F.col("pct")).alias("b")
    ).collect()
    for r in rows:
        want, _, _, _ = crop_box(r["h"], 1, (r["pct"], 100.0, 0.0, 100.0))
        assert r["b"] == want, (r["h"], r["pct"])


def test_simhash_close_for_near_texts(spark):
    from pdf_drawing_ocr_recognition_spark.functions.dedup import hamming16, simhash16

    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog today"),
            ("b", "the quick brown fox jumps over the lazy cat today"),
            ("c", "entirely different words about spark query planning engines"),
        ],
        "id STRING, text STRING",
    )
    sh = df.select("id", simhash16(F.split(F.col("text"), " ")).alias("h"))
    vals = {r["id"]: r["h"] for r in sh.collect()}
    a = sh.filter("id='a'").select(F.col("h").alias("ha"))
    pairs = (
        sh.crossJoin(a)
        .select("id", hamming16(F.col("h"), F.col("ha")).alias("d"))
        .collect()
    )
    d = {r["id"]: r["d"] for r in pairs}
    assert d["a"] == 0
    assert d["b"] <= d["c"], (d, vals)


def test_jaccard_and_shingles(spark):
    from pdf_drawing_ocr_recognition_spark.functions.dedup import jaccard, shingles

    df = spark.createDataFrame([("abcdef", "abcdef"), ("abcdef", "zzzzzz")], "x STRING, y STRING")
    rows = df.select(
        jaccard(shingles(F.col("x"), 3), shingles(F.col("y"), 3)).alias("j")
    ).collect()
    assert rows[0]["j"] == 1.0
    assert rows[1]["j"] == 0.0


def test_cosine_self_is_one(spark, sf_dir):
    from pdf_drawing_ocr_recognition_spark.functions.vectors import cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    rows = emb.select(
        F.round(cosine(F.col("embedding"), F.col("embedding")), 6).alias("c")
    ).collect()
    assert all(abs(r["c"] - 1.0) < 1e-6 for r in rows)


def test_lang_guess_markers(spark):
    from pdf_drawing_ocr_recognition_spark.functions.text import lang_guess

    df = spark.createDataFrame(
        [
            ("the cat and the hat of oz",),
            ("der hund und die katze nicht",),
            ("xyzzy plugh",),
        ],
        "text STRING",
    )
    got = [r[0] for r in df.select(lang_guess(F.col("text"))).collect()]
    assert got == ["en", "de", "und"]


def test_winnow_guarantee_shared_fingerprint(spark):
    """Winnowing guarantee (SIGMOD'03): any common substring of length
    >= w + k - 1 (= 13 here) yields at least one shared fingerprint; and
    unrelated texts share none."""
    from pdf_drawing_ocr_recognition_spark.functions.text import (
        kgram_hashes,
        winnow_minima,
    )

    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, "AAAA " + common + " BBBB"),
        (1, "XXXX " + common + " YYYY"),
        (2, "zq jv wk pf xd cb nm lr ts gh"),  # disjoint trigrams
        (3, "shrt"),  # shorter than k: empty fingerprint set
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_minima(kgram_hashes(F.col("text"), 8), 6).alias("fps")
        ).collect()
    }
    assert out[0] & out[1], "common 43-char substring must share a fingerprint"
    assert not (out[0] & out[2])
    assert out[3] == set()
