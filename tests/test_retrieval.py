"""T72: BM25 lexical retrieval — ranking semantics on a hand-checkable corpus."""

import pytest


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (1, "cat dog"),                       # short doc, one cat
        (2, "cat cat cat filler filler pad"), # high tf, longer
        (3, "bird"),                          # rare term only
        (4, "filler pad pad pad filler pad"), # matches nothing
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _run(spark, docs, queries, top_k=10):
    from pdf_drawing_ocr_recognition_spark.operators.retrieval import bm25_topk

    qt = spark.createDataFrame(queries, "query_id string, term string")
    out = bm25_topk(docs, qt, top_k=top_k).collect()
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["bm25_scaled"])
        for r in out
    }


def test_tf_and_length_norm_order(spark, tiny_corpus):
    got = _run(spark, tiny_corpus, [("q1", "cat")])
    # doc 2 has tf=3: saturating tf-norm still beats doc 1's single hit
    assert got[("q1", 1)][0] == 2
    assert got[("q1", 2)][0] == 1
    assert ("q1", 3) not in got  # docs without the term never score


def test_rare_term_idf_exceeds_common(spark, tiny_corpus):
    got = _run(spark, tiny_corpus, [("qb", "bird"), ("qc", "cat")])
    # df(bird)=1 < df(cat)=2 and dl(doc3)=1, so the bird hit outscores
    # every cat hit despite tf=1
    bird_score = got[("qb", 1)][1]
    assert got[("qb", 1)][0] == 3
    assert bird_score > got[("qc", 1)][1]


def test_multi_term_sum_and_topk_bound(spark, tiny_corpus):
    got = _run(spark, tiny_corpus, [("q", "cat"), ("q", "dog")], top_k=1)
    # doc 1 matches both terms; top_k=1 keeps only the winner per query
    assert list(got) == [("q", 1)]
    assert got[("q", 1)][0] in (1, 2)


def test_tie_break_is_min_key(spark):
    spark_ = spark
    docs = spark_.createDataFrame(
        [(7, "x y"), (5, "x y")], "doc_id LONG, text STRING"
    )
    got = _run(spark_, docs, [("q", "x")])
    # identical tf/dl → identical score → ascending key breaks the tie
    assert got[("q", 1)][0] == 5
    assert got[("q", 2)][0] == 7
    assert got[("q", 1)][1] == got[("q", 2)][1]


class TestBm25Indexed:
    """T79: persisted postings index — write-once/probe-many BM25."""

    QUERIES = [("q1", "cat"), ("q1", "dog"), ("q2", "bird")]

    def test_indexed_equals_direct_and_zero_postings_exchange(
        self, spark, tiny_corpus
    ):
        from pdf_drawing_ocr_recognition_spark.operators.retrieval import (
            bm25_topk,
            bm25_topk_indexed,
            write_postings_index,
        )

        qt = spark.createDataFrame(self.QUERIES, "query_id string, term string")
        try:
            write_postings_index(tiny_corpus, "bm25_postings_t", n_buckets=4)
            postings = spark.table("bm25_postings_t")
            stats = spark.table("bm25_postings_t_stats")
            got = bm25_topk_indexed(postings, stats, qt)
            direct = bm25_topk(tiny_corpus, qt)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, direct.collect())
            )
            # write-once/probe-many: every Exchange in the probe plan hashes
            # query-derived frames, never the bucketed postings scan
            import re

            plan = got._jdf.queryExecution().executedPlan().toString()
            for frag in re.findall(r"Exchange [^\n]*", plan):
                assert "bm25_postings_t" not in frag, plan
            assert "bm25_postings_t" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS bm25_postings_t")
            spark.sql("DROP TABLE IF EXISTS bm25_postings_t_stats")


class TestPhraseSearch:
    def _run(self, spark, docs, phrases):
        from pdf_drawing_ocr_recognition_spark.operators.retrieval import (
            phrase_search,
        )

        d = spark.createDataFrame(docs, ["doc_id", "text"])
        p = spark.createDataFrame(phrases, ["query_id", "phrase"])
        return {
            (r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
            for r in phrase_search(d, p).collect()
        }

    def test_exact_match_and_position(self, spark):
        got = self._run(
            spark,
            [(1, "the quick brown fox"), (2, "brown the quick")],
            [("q", "quick brown")],
        )
        assert got == {("q", 1): (1, 1)}  # doc 2 has both words, wrong order

    def test_overlapping_occurrences_each_count(self, spark):
        # 'a a' occurs at positions 0,1,2,3 of 'a a a a a'
        got = self._run(spark, [(1, "a a a a a")], [("q", "a a")])
        assert got == {("q", 1): (4, 0)}

    def test_repeated_term_phrase_offset_algebra(self, spark):
        # 'x y x' needs x at p AND p+2 — bag-of-words would accept doc 2
        got = self._run(
            spark,
            [(1, "z x y x z"), (2, "x x y z")],
            [("q", "x y x")],
        )
        assert got == {("q", 1): (1, 1)}

    def test_case_folded_and_multi_query(self, spark):
        got = self._run(
            spark,
            [(1, "Alpha Beta gamma")],
            [("q1", "alpha beta"), ("q2", "beta gamma"), ("q3", "gamma alpha")],
        )
        assert got == {("q1", 1): (1, 0), ("q2", 1): (1, 1)}

    def test_phrase_longer_than_doc_no_match(self, spark):
        got = self._run(spark, [(1, "a b")], [("q", "a b c")])
        assert got == {}


class TestPhraseSearchIndexed:
    """T123: persisted positional index — write-once/probe-many phrases."""

    def test_indexed_equals_direct_and_no_retokenize(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.retrieval import (
            phrase_search,
            phrase_search_indexed,
            write_positions_index,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "quick brown quick brown"),
                (3, "a a a a"),
                (4, "brown the quick"),
            ],
            ["doc_id", "text"],
        )
        phrases = spark.createDataFrame(
            [("q1", "quick brown"), ("q2", "a a"), ("q3", "fox jumps")],
            ["query_id", "phrase"],
        )
        try:
            write_positions_index(docs, "phrase_pos_t", n_buckets=4)
            postings = spark.table("phrase_pos_t")
            got = phrase_search_indexed(postings, phrases)
            direct = phrase_search(docs, phrases)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, direct.collect())
            )
            plan = got._jdf.queryExecution().executedPlan().toString()
            # the probe never re-tokenizes the CORPUS: the only explode in
            # the plan is the tiny phrase dim, and the bucketed index is
            # the corpus-side scan
            assert "posexplode(split(lower(text" not in plan, plan
            assert "posexplode(split(lower(phrase" in plan
            assert "phrase_pos_t" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS phrase_pos_t")
