"""T167: pagination stitching — overlap joins, scoping, short docs."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
    stitch_continuations,
)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string, host string")
    return {
        (r["prev_doc"], r["next_doc"])
        for r in stitch_continuations(df, k=3, **kw).collect()
    }


def test_tail_head_overlap_links_pages(spark):
    docs = [
        (1, "intro words here carry over now", "h1"),
        (2, "carry over now and the story continues", "h1"),
        (3, "unrelated text block entirely different", "h2"),
    ]
    assert _run(spark, docs) == {(1, 2)}


def test_three_page_chain(spark):
    docs = [
        (1, "a b c d e", "h"),
        (2, "c d e f g h", "h"),
        (3, "f g h i j", "h"),
    ]
    assert _run(spark, docs) == {(1, 2), (2, 3)}


def test_group_scoping_blocks_cross_host_links(spark):
    docs = [
        (1, "x y z carry me over", "h1"),
        (2, "carry me over elsewhere now", "h2"),
    ]
    assert _run(spark, docs) == {(1, 2)}
    assert _run(spark, docs, group_col="host") == set()


def test_short_docs_and_self_pairs_excluded(spark):
    docs = [
        (1, "a b", "h"),  # shorter than k -> no key
        (2, "p q r p q r", "h"),  # own tail == own head -> self pair excluded
    ]
    assert _run(spark, docs) == set()
