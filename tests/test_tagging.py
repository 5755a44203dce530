"""Keyword-taxonomy tagging (operators/tagging.py)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.tagging import (
    tag_documents,
    topic_profile,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "Join the hash JOIN now", "en"),
            (1, "scan the table scan scan", "en"),
            (2, "nothing matches here", "de"),
            (3, "join table", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    tax = spark.createDataFrame(
        [("join", "joins"), ("hash", "joins"), ("table", "storage"),
         ("scan", "storage"), ("JOIN", "joins")],  # dup after lowering
        "term string, topic string",
    )
    return docs, tax


def test_hit_counts_and_case_folding(spark, corpus):
    docs, tax = corpus
    got = {
        (r["doc_id"], r["topic"]): r["n_hits"]
        for r in tag_documents(docs, tax).collect()
    }
    # doc 0: join x2 (case-folded) + hash = 3 hits on "joins"; the duplicate
    # ("JOIN","joins") dim row must NOT double-count
    assert got[(0, "joins")] == 3
    assert got[(1, "storage")] == 4  # table + scan x3
    assert got[(3, "joins")] == 1 and got[(3, "storage")] == 1
    assert (2, "joins") not in got and (2, "storage") not in got


def test_multi_label_term(spark, corpus):
    docs, _ = corpus
    tax = spark.createDataFrame(
        [("join", "joins"), ("join", "verbs")], "term string, topic string"
    )
    got = {
        (r["doc_id"], r["topic"]): r["n_hits"]
        for r in tag_documents(docs, tax).collect()
    }
    assert got[(0, "joins")] == 2 and got[(0, "verbs")] == 2


def test_profile_rollup(spark, corpus):
    docs, tax = corpus
    prof = {
        (r["lang"], r["topic"]): (r["n_docs"], r["n_hits"])
        for r in topic_profile(tag_documents(docs, tax), docs, group_col="lang").collect()
    }
    assert prof[("en", "joins")] == (1, 3)
    assert prof[("en", "storage")] == (1, 4)
    assert prof[("de", "joins")] == (1, 1)
    assert prof[("de", "storage")] == (1, 1)
    # ungrouped variant
    total = {
        r["topic"]: (r["n_docs"], r["n_hits"])
        for r in topic_profile(tag_documents(docs, tax), docs).collect()
    }
    assert total["joins"] == (2, 4) and total["storage"] == (2, 5)
