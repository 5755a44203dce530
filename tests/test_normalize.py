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


# ---------------------------------------------------------------------------
# T134 --- Unicode NFC canonicalization (functions/normalize.py:nfc_text)
# ---------------------------------------------------------------------------

import unicodedata

from pdf_drawing_ocr_recognition_spark.functions.normalize import nfc_py, nfc_text

# (input, expected NFC) --- composition, canonical reorder, Hangul LV/LVT
# arithmetic, and the compatibility forms NFC must NOT fold.
NFC_CASES = [
    ("Cafe\u0301", "Caf\u00e9"),          # combining acute composes
    ("Caf\u00e9", "Caf\u00e9"),           # already composed: fixed point
    ("A\u030a", "\u00c5"),                # A + ring above -> angstrom A
    ("q\u0307\u0323", "q\u0323\u0307"), # canonical reorder (ccc 220<230)
    ("\u1112\u1161\u11ab", "\ud55c"),   # Hangul jamo -> LVT syllable
    ("\ufb01le", "\ufb01le"),             # fi ligature kept (NFKC folds)
    ("\uff46\uff55", "\uff46\uff55"),   # fullwidth kept
    ("x\u0338", "x\u0338"),               # no composition exists
    ("", ""),
]


def test_nfc_py_matches_unicodedata_cases():
    for raw, want in NFC_CASES:
        assert nfc_py(raw) == want == unicodedata.normalize("NFC", raw)


def test_nfc_idempotent():
    for raw, _ in NFC_CASES:
        assert nfc_py(nfc_py(raw)) == nfc_py(raw)


def test_nfc_spark_column_matches_pure_twin(spark):
    """The Arrow pandas_udf batch path returns byte-identical strings to the
    pure kernel, non-BMP and NULL included."""
    rows = [(r,) for r, _ in NFC_CASES] + [("\U0001f600 e\u0301",), (None,)]
    df = spark.createDataFrame(rows, "raw string")
    got = df.select("raw", nfc_text("raw").alias("n")).collect()
    for r in got:
        want = None if r["raw"] is None else nfc_py(r["raw"])
        assert r["n"] == want, (r["raw"], r["n"], want)


def test_nfc_duckdb_twin_is_byte_identical():
    """DuckDB's utf8proc nfc_normalize (the driver oracle) agrees with
    Python's unicodedata on every fixture shape --- two independent UAX #15
    implementations pinning each other."""
    con = duckdb.connect()
    for raw, want in NFC_CASES + [("\U0001f600 e\u0301", "\U0001f600 \u00e9")]:
        [(got,)] = con.execute("SELECT nfc_normalize(?)", [raw]).fetchall()
        assert got == want == nfc_py(raw), (raw, got, want)


def test_nfc_dedup_collapse(spark):
    """The dedup-key property T134 oracles over the corpus: composed, fully
    decomposed and mixed byte forms of one logical string share one md5
    after nfc_text; the raw forms have three distinct md5s."""
    variants = ["Caf\u00e9 d\u00e9j\u00e0", "Cafe\u0301 de\u0301ja\u0300",
                "Caf\u00e9 de\u0301ja\u0300"]
    df = spark.createDataFrame([(v,) for v in variants], "raw string")
    out = df.select(
        F.md5(F.col("raw")).alias("raw_fp"),
        F.md5(nfc_text("raw")).alias("nfc_fp"),
    ).collect()
    assert len({r["raw_fp"] for r in out}) == 3
    assert len({r["nfc_fp"] for r in out}) == 1
