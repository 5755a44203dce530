"""T162: bag-of-words canonical dedup — multiset semantics, farm signal."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.operators.dedup import bow_dedup


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["bow_digest"]: (
            r["cluster_size"],
            r["n_exact_variants"],
            r["keeper_doc_id"],
        )
        for r in bow_dedup(df, **kw).collect()
    }


def test_permutations_cluster_with_variant_count(spark):
    got = _run(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "fox brown the quick"),  # permutation -> same bag
            (3, "the quick brown fox"),  # byte-exact copy of 1
            (4, "unrelated text here"),
        ],
    )
    assert len(got) == 1
    (size, variants, keeper) = next(iter(got.values()))
    assert (size, variants, keeper) == (3, 2, 1)


def test_counts_are_part_of_the_bag(spark):
    # "a a b" and "a b b" share the word SET but not the multiset
    got = _run(spark, [(1, "a a b"), (2, "a b b")], min_cluster=1)
    assert len(got) == 2


def test_case_folds_into_the_bag(spark):
    got = _run(spark, [(1, "Alpha Beta"), (2, "beta alpha")])
    assert len(got) == 1 and next(iter(got.values()))[0] == 2


def test_singletons_dropped_by_default(spark):
    got = _run(spark, [(1, "x y"), (2, "p q")])
    assert got == {}
