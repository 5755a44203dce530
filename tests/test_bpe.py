"""BPE tokenizer training: kernel semantics + Spark-trainer identity."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.kernel.bpe import (
    END,
    apply_merge,
    encode_word,
    train_bpe,
    word_symbols,
)
from pdf_drawing_ocr_recognition_spark.operators.bpe import (
    encode_words,
    train_bpe_distributed,
    word_frequencies,
)

# Sennrich et al. 2016's worked example vocabulary
SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_kernel_sennrich_merges():
    """('e','s') ties ('s','t') and ('t','</w>') at 9 — lexicographic pair
    order resolves, then the merged symbol chains: es → est → est</w>."""
    merges = train_bpe(SENNRICH, 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", END)]


def test_kernel_apply_merge_leftmost_nonoverlapping():
    assert apply_merge(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert apply_merge(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")
    assert apply_merge(("x", "y"), ("a", "a")) == ("x", "y")


def test_kernel_encode_concatenates_back():
    merges = train_bpe(SENNRICH, 6)
    for w in list(SENNRICH) + ["lowest", "news", "zzz"]:
        pieces = encode_word(w, merges)
        assert "".join(pieces) == w + END
    assert encode_word("newest", merges) == ["newest" + END] or "".join(
        encode_word("newest", merges)
    ) == "newest" + END


def test_kernel_early_stop_and_validation():
    # single repeated char fully merges before the merge budget runs out
    merges = train_bpe({"aa": 3}, 10)
    assert len(merges) < 10
    with pytest.raises(ValueError):
        train_bpe(SENNRICH, -1)
    assert word_symbols("ab") == ("a", "b", END)


def test_spark_trainer_identical_to_kernel(spark):
    """The distributed trainer's merge list is the kernel's, bit for bit,
    on the real sf0.001 word-frequency table."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = word_frequencies(docs)
    freqs = {r["word"]: r["freq"] for r in wf.collect()}
    expect = train_bpe(freqs, 8)
    got = train_bpe_distributed(wf, 8)
    assert got == expect
    assert len(got) == 8


def test_spark_trainer_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = word_frequencies(docs)
    assert train_bpe_distributed(wf, 4) == train_bpe_distributed(
        wf.repartition(7), 4
    )


def test_spark_encode_words_matches_kernel(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wf = word_frequencies(docs)
    merges = train_bpe_distributed(wf, 6)
    enc = encode_words(wf, merges).collect()
    assert len(enc) == wf.count()  # distinct word dim, encoded once each
    for r in enc:
        assert r["tokens"] == encode_word(r["word"], merges)
        assert r["n_pieces"] == len(r["tokens"])
        assert "".join(r["tokens"]) == r["word"] + END


def test_spark_trainer_validation(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        train_bpe_distributed(word_frequencies(docs), -2)


class TestBpeEncodeOracleTwin:
    """T140 — the separator-guarded chained-replace replay used by the
    bpe_encode oracle is semantically identical to kernel encode_word."""

    def _duck_encode(self, word, merges):
        import duckdb
        import sys

        sys.path.insert(0, ".")
        from __spark_entry__ import _bpe_encode_sql_expr

        expr = _bpe_encode_sql_expr(merges)
        [(s,)] = duckdb.sql(
            f"SELECT {expr} FROM (SELECT '{word}' AS word)"
        ).fetchall()
        return s.strip("~").split("~~")

    def test_leftmost_nonoverlapping_runs(self):
        """'aaaa'+(a,a): symbol-aware scan pairs (aa)(aa); the replace
        replay must not re-match across a fresh boundary."""
        from pdf_drawing_ocr_recognition_spark.kernel.bpe import encode_word

        for word in ["aaa", "aaaa", "aaaaa", "ababa", "aabaa"]:
            for merges in [
                [("a", "a")],
                [("a", "a"), ("aa", "aa")],
                [("a", "b"), ("ab", "a")],
            ]:
                assert self._duck_encode(word, merges) == encode_word(
                    word, merges
                ), (word, merges)

    def test_boundary_cannot_match_across_symbols(self):
        """After (w,i)->wi, a later (i,d) must NOT fire inside 'wid'-adjacent
        sequences: 'wid' = [wi, d] has no (i, d) pair."""
        from pdf_drawing_ocr_recognition_spark.kernel.bpe import encode_word

        merges = [("w", "i"), ("i", "d")]
        assert encode_word("wid", merges) == ["wi", "d", "</w>"]
        assert self._duck_encode("wid", merges) == ["wi", "d", "</w>"]

    def test_driver_fixture_words(self):
        import sys

        sys.path.insert(0, ".")
        from __spark_entry__ import BPE_ENCODE_MERGES, BPE_ENCODE_WORDS
        from pdf_drawing_ocr_recognition_spark.kernel.bpe import encode_word

        for w in BPE_ENCODE_WORDS:
            assert self._duck_encode(w, BPE_ENCODE_MERGES) == encode_word(
                w, BPE_ENCODE_MERGES
            )

    def test_fuzz_replay_equals_kernel(self):
        """Property pin: random words × random merge lists — the SQL replay
        and the kernel tokenizer agree everywhere, not just on fixtures."""
        import itertools
        import random

        from pdf_drawing_ocr_recognition_spark.kernel.bpe import encode_word

        rng = random.Random(42)
        alpha = "abc"
        sym_pool = ["a", "b", "c", "ab", "bc", "aa", "abc", "</w>"]
        for trial in range(60):
            word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
            merges = []
            for _ in range(rng.randint(1, 5)):
                a = rng.choice(sym_pool[:-1])
                b = rng.choice(sym_pool)
                merges.append((a, b))
            assert self._duck_encode(word, merges) == encode_word(
                word, merges
            ), (word, merges)


def test_tokenizer_fertility_hand_computed(spark):
    """T141 — per-language fertility rollup over the encode dim: exact
    piece counts on a corpus small enough to verify by hand."""
    import sys

    sys.path.insert(0, ".")
    from __spark_entry__ import BPE_ENCODE_MERGES
    from pdf_drawing_ocr_recognition_spark.operators.bpe import encode_words

    rows = [("en", "low lowest"), ("en", "low"), ("de", "wilder")]
    docs = spark.createDataFrame(rows, "lang string, text string")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    dim = encode_words(toks.select("word"), BPE_ENCODE_MERGES)
    out = {
        r["lang"]: r
        for r in toks.join(dim.select("word", "n_pieces"), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces_total"),
        )
        .collect()
    }
    # low -> [low, </w>] = 2; lowest -> [low, est</w>] = 2; wilder -> 4
    assert out["en"]["n_words"] == 3 and out["en"]["n_pieces_total"] == 6
    assert out["de"]["n_words"] == 1 and out["de"]["n_pieces_total"] == 4
