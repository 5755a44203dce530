"""T163: semantic decontamination — flags, argmax ties, guards."""

from __future__ import annotations

import pytest

from pdf_drawing_ocr_recognition_spark.operators.similarity import (
    semantic_decontaminate,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_flags_only_similar_vectors(spark):
    bench = _emb(spark, [(100, [1.0, 0.0]), (101, [0.0, 1.0])])
    corpus = _emb(
        spark,
        [
            (1, [2.0, 0.0]),  # cos 1.0 vs bench 100
            (2, [1.0, 1.0]),  # cos ~0.707 vs both
            (3, [-1.0, 0.0]),  # cos -1 / 0 -> below threshold
            (4, [0.0, 0.0]),  # zero vector -> cos defined 0.0
        ],
    )
    got = {
        r["vec_id"]: (r["bench_id"], r["cosine"])
        for r in semantic_decontaminate(corpus, bench, 0.9).collect()
    }
    assert got == {1: (100, 1.0)}


def test_argmax_prefers_best_then_smallest_bench_id(spark):
    bench = _emb(spark, [(7, [1.0, 0.0]), (5, [1.0, 0.0]), (6, [0.0, 1.0])])
    corpus = _emb(spark, [(1, [3.0, 1.0])])
    row = semantic_decontaminate(corpus, bench, 0.1).collect()[0]
    # bench 5 and 7 are identical -> exact tie -> smallest id wins
    assert row["bench_id"] == 5


def test_empty_benchmark_raises(spark):
    bench = _emb(spark, [])
    corpus = _emb(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ValueError):
        semantic_decontaminate(corpus, bench, 0.5)


def test_threshold_is_inclusive(spark):
    bench = _emb(spark, [(9, [1.0, 0.0])])
    corpus = _emb(spark, [(1, [1.0, 0.0])])
    got = semantic_decontaminate(corpus, bench, 1.0).collect()
    assert len(got) == 1 and got[0]["cosine"] == 1.0
