"""T160: edit-distance confirmation stage — bounds, ppm arithmetic, scope."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.operators.dedup import edit_verified_pairs


def _run(spark, docs, pairs, max_distance):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = edit_verified_pairs(d, p, max_distance=max_distance).collect()
    return {(r["doc_a"], r["doc_b"]): (r["edit_distance"], r["edit_sim_ppm"]) for r in rows}


def test_distances_and_threshold_rejection(spark):
    docs = [
        (1, "kitten"),
        (2, "sitting"),  # classic d=3
        (3, "kitten"),  # d=0 vs 1
        (4, "completely different text entirely"),
    ]
    pairs = [(1, 2), (1, 3), (1, 4)]
    got = _run(spark, docs, pairs, max_distance=3)
    assert got[(1, 2)][0] == 3
    assert got[(1, 3)] == (0, 1000000)
    assert (1, 4) not in got  # beyond bound -> short-circuited out


def test_ppm_is_exact_integer_div(spark):
    # maxlen 7, d 3 -> (7-3)*1e6 // 7 = 571428
    got = _run(spark, [(1, "kitten"), (2, "sitting")], [(1, 2)], 5)
    assert got[(1, 2)] == (3, 571428)


def test_both_empty_is_full_similarity(spark):
    got = _run(spark, [(1, ""), (2, "")], [(1, 2)], 2)
    assert got[(1, 2)] == (0, 1000000)


def test_only_candidate_pairs_are_scored(spark):
    # identical docs 3/4 exist but are NOT candidates -> no row
    docs = [(1, "aa"), (2, "ab"), (3, "zz"), (4, "zz")]
    got = _run(spark, docs, [(1, 2)], 2)
    assert set(got) == {(1, 2)}
    assert got[(1, 2)][0] == 1
