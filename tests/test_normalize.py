"""T53 webtext normalization: rule-by-rule semantics, Spark/DuckDB parity
of the SQL twin, and collapse-to-one-digest on typographic variants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.functions.normalize import (
    normalize_text,
    normalize_text_sql,
)

CASES = [
    # typographic quotes fold to ascii
    ("“quoted” and ‘single’", '"quoted" and \'single\''),
    # dash family folds to '-'
    ("a—b–c−d", "a-b-c-d"),
    # exotic spaces fold, runs collapse, edges trim
    (" lead mid  end　", "lead mid end"),
    # ellipsis expands BEFORE folding
    ("wait… what", "wait... what"),
    # zero-width + soft hyphen + controls stripped
    ("z​ero­width\x07bell", "zerowidthbell"),
    # \t\n\r collapse into single spaces
    ("tabs\tand\nnewlines\r\nhere", "tabs and newlines here"),
    # plain ascii is a fixed point
    ("already clean text", "already clean text"),
]


def test_rules(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "raw string")
    got = [r["n"] for r in df.select(normalize_text(F.col("raw")).alias("n")).collect()]
    assert got == [want for _, want in CASES]


def test_casefold(spark):
    df = spark.createDataFrame([("MiXeD Case",)], "raw string")
    [r] = df.select(normalize_text(F.col("raw"), casefold=True).alias("n")).collect()
    assert r["n"] == "mixed case"


def test_sql_twin_matches_spark(spark):
    """The DuckDB rendering of the SAME constants produces identical bytes."""
    sql = normalize_text_sql("raw")
    con = duckdb.connect()
    for raw, want in CASES:
        [(got,)] = con.execute(f"SELECT {sql} FROM (SELECT ? AS raw)", [raw]).fetchall()
        assert got == want, (raw, got, want)


def test_variants_collapse_to_one_digest(spark):
    """The dedup-key property: typographically-noised variants of one text
    normalize to the same md5 — the exact collapse `normalized_dedup`
    oracles over the corpus."""
    base = "the quick brown fox - it said \"hello\" and left..."
    noisy = (
        base.replace('"', "“", 1)
        .replace('"', "”", 1)
        .replace(" ", " ")
        .replace("-", "–")
        .replace("...", "…")
        .replace("e", "e​")
    )
    df = spark.createDataFrame([(base,), (noisy,)], "raw string")
    rows = df.select(F.md5(normalize_text(F.col("raw"))).alias("fp")).collect()
    assert rows[0]["fp"] == rows[1]["fp"]
