"""T184: byte-granular ExactSubstr (exact Lee et al. 2022 semantics).

Pins the exactness claim the operator's docstring proves: stride-1 k-byte
windows cover EXACTLY the bytes inside duplicated spans of length >= k, at
ANY byte offset — including offsets the token-window form (T71) structurally
misses (mid-token starts, even mid-code-point starts), plus the UTF-8
code-point widening of the rebuild and the ASCII contract the DuckDB oracle
replay relies on.
"""

import pytest

from pdf_drawing_ocr_recognition_spark.operators.dedup import (
    exact_substring_dedupe_bytes,
    rebuild_uncovered_bytes,
)

K = 40


class TestRebuildKernel:
    """Pure twin: byte coverage widened to whole code points."""

    def test_ascii_mid_span(self):
        text = "a" * 10 + "b" * 10 + "c" * 10
        out, kept, dropped = rebuild_uncovered_bytes(text, [10], 10)
        assert out == "a" * 10 + "c" * 10
        assert (kept, dropped) == (20, 10)

    def test_overlapping_starts_union(self):
        out, kept, dropped = rebuild_uncovered_bytes("abcdefgh", [1, 3], 3)
        # cover [1,4) ∪ [3,6) = bytes 1..5
        assert out == "agh"
        assert (kept, dropped) == (3, 5)

    def test_empty_and_no_starts(self):
        assert rebuild_uncovered_bytes("", [], 5) == ("", 0, 0)
        assert rebuild_uncovered_bytes("xyz", [], 2) == ("xyz", 3, 0)

    def test_codepoint_widening(self):
        # "é" = 0xC3 0xA9; covering only its FIRST byte removes the whole
        # character, so the output stays valid UTF-8
        text = "Aé B"  # bytes: A, C3, A9, space, B
        out, kept, dropped = rebuild_uncovered_bytes(text, [1], 1)
        assert out == "A B"
        assert (kept, dropped) == (3, 2)  # counts are post-widening bytes

    def test_clip_past_end(self):
        out, kept, dropped = rebuild_uncovered_bytes("abcd", [3], 10)
        assert out == "abc"
        assert (kept, dropped) == (3, 1)


class TestExactSubstringBytes:
    SPAN = "the quick brown fox jumps over the lazy dog!!!"  # 46 bytes

    @pytest.fixture(scope="class")
    def result(self, spark):
        assert len(self.SPAN.encode()) == 46
        rows = [
            (1, "aaa " + self.SPAN + " bbb"),
            # NOT token-aligned with doc 1 — the T71 form's structural miss
            (2, "zz" + self.SPAN + "cc"),
            (3, "completely unique text that nothing else shares here."),
            (4, "short dup short dup"),  # duplicated span << k: survives
            (5, "short dup and more padding words to cross forty bytes"),
            (6, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = exact_substring_dedupe_bytes(docs, k=K, min_count=2)
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_arbitrary_offset_duplication_removed_everywhere(self, result):
        # the shared 46-byte span vanishes from BOTH docs, exactly
        assert result[1]["text"] == "aaa  bbb"
        assert (result[1]["n_bytes_kept"], result[1]["n_bytes_dropped"]) == (
            8, 46)
        assert result[2]["text"] == "zzcc"
        assert (result[2]["n_bytes_kept"], result[2]["n_bytes_dropped"]) == (
            4, 46)

    def test_sub_threshold_duplication_survives(self, result):
        # "short dup" appears 3x corpus-wide but every occurrence is inside
        # spans shorter than k=40 duplicated bytes — the PAPER's threshold
        # semantics, not an approximation artifact
        assert result[4]["text"] == "short dup short dup"
        assert result[5]["n_bytes_dropped"] == 0

    def test_unique_and_empty_intact(self, result):
        assert result[3]["n_bytes_dropped"] == 0
        assert result[6]["text"] == ""
        assert (result[6]["n_bytes_kept"], result[6]["n_bytes_dropped"]) == (
            0, 0)

    def test_byte_count_conservation(self, result):
        for r in result.values():
            # kept+dropped == octet_length of the INPUT (widened accounting)
            assert r["n_bytes_kept"] == len(r["text"].encode("utf-8"))

    def test_mid_codepoint_duplicated_prefix(self, spark):
        """A duplicated span ENDING on the first byte of a 2-byte char:
        byte windows catch it (41 shared bytes >= k), widening then removes
        the torn character whole. Token windows can never see this."""
        f = "A" * 40 + "é x"  # ...AAA + C3 A9 + " x"
        g = "A" * 40 + "èz"   # ...AAA + C3 A8 + "z"
        docs = spark.createDataFrame(
            [(1, f), (2, g)], "doc_id LONG, text STRING"
        )
        out = exact_substring_dedupe_bytes(docs, k=K, min_count=2)
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        assert got[1]["text"] == " x"
        assert (got[1]["n_bytes_kept"], got[1]["n_bytes_dropped"]) == (2, 42)
        assert got[2]["text"] == "z"
        assert (got[2]["n_bytes_kept"], got[2]["n_bytes_dropped"]) == (1, 42)

    def test_stable_under_repartition(self, spark):
        rows = [(1, "aaa " + self.SPAN + " bbb"), (2, "zz" + self.SPAN + "cc")]
        docs = spark.createDataFrame(
            rows, "doc_id LONG, text STRING"
        ).repartition(5)
        out = exact_substring_dedupe_bytes(docs, k=K, min_count=2)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got == {1: "aaa  bbb", 2: "zzcc"}

    def test_matches_kernel_on_fixture_sample(self, spark, sf_dir):
        """Spark result == a single-process pure-Python reference built
        from the same window/count semantics, on real fixture docs."""
        import collections
        import hashlib

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pdf = docs.select("doc_id", "text").toPandas()
        counts = collections.Counter()
        for t in pdf["text"]:
            b = t.encode("utf-8")
            for i in range(len(b) - K + 1):
                counts[hashlib.md5(b[i : i + K]).digest()] += 1
        expect = {}
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            b = t.encode("utf-8")
            starts = [
                i
                for i in range(len(b) - K + 1)
                if counts[hashlib.md5(b[i : i + K]).digest()] >= 2
            ]
            expect[did] = rebuild_uncovered_bytes(t, starts, K)
        out = exact_substring_dedupe_bytes(docs, k=K, min_count=2)
        got = {r["doc_id"]: r.asDict() for r in out.collect()}
        assert set(got) == set(expect)
        n_dropped_docs = 0
        for did, (txt, kept, dropped) in expect.items():
            assert got[did]["text"] == txt
            assert got[did]["n_bytes_kept"] == kept
            assert got[did]["n_bytes_dropped"] == dropped
            n_dropped_docs += dropped > 0
        assert n_dropped_docs > 0  # the fixture makes the pass load-bearing

    def test_xxhash64_digest_path_agrees(self, spark, sf_dir):
        """The 8-byte shuffle path (digest='xxhash64', for the 10^14-window
        run) produces identical results to the exact 128-bit default at
        test scale — collisions are a documented 2^-64-per-pair event, not
        a behavior difference."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = {
            r["doc_id"]: (r["text"], r["n_bytes_dropped"])
            for r in exact_substring_dedupe_bytes(docs, k=K).collect()
        }
        b = {
            r["doc_id"]: (r["text"], r["n_bytes_dropped"])
            for r in exact_substring_dedupe_bytes(
                docs, k=K, digest="xxhash64"
            ).collect()
        }
        assert a == b
        with pytest.raises(ValueError):
            exact_substring_dedupe_bytes(docs, digest="sha1")

    def test_fixture_corpus_is_ascii(self, sf_dir):
        """The DuckDB oracle replays byte windows with CHARACTER substring;
        that is only valid while the fixture corpus is pure ASCII — pin it."""
        import pyarrow.parquet as pq

        texts = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )["text"].to_pylist()
        assert all(len(t.encode("utf-8")) == len(t) for t in texts)
