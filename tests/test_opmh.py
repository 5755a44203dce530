"""T161: one-permutation MinHash sketches — merge law, estimator accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sketches import (
    opmh_merge,
    opmh_overlap,
    opmh_sketch,
)


def _items(spark, group, values):
    return spark.createDataFrame(
        [(group, v) for v in values], "g string, v string"
    )


def test_merge_equals_whole(spark):
    a = _items(spark, "s", [f"w{i}" for i in range(0, 300)])
    b = _items(spark, "s", [f"w{i}" for i in range(200, 500)])
    whole = opmh_sketch(a.unionByName(b), "g", "v", k=16)
    merged = opmh_merge(
        opmh_sketch(a, "g", "v", k=16), opmh_sketch(b, "g", "v", k=16), "g"
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_identical_sets_estimate_full_overlap(spark):
    vals = [f"tok{i}" for i in range(400)]
    df = _items(spark, "a", vals).unionByName(_items(spark, "b", vals))
    row = opmh_overlap(opmh_sketch(df, "g", "v", k=64), "g").collect()[0]
    assert row["jaccard_est_ppm"] == 1000000 and row["n_match"] == row["n_both"]


def test_estimator_concentrates_on_planted_jaccard(spark):
    # |A|=|B|=600, |A∩B|=300 -> J = 300/900 = 1/3
    a = _items(spark, "a", [f"c{i}" for i in range(600)])
    b = _items(
        spark, "b", [f"c{i}" for i in range(300)] + [f"x{i}" for i in range(300)]
    )
    row = opmh_overlap(
        opmh_sketch(a.unionByName(b), "g", "v", k=256), "g"
    ).collect()[0]
    est = row["jaccard_est_ppm"] / 1e6
    assert abs(est - 1 / 3) < 0.12  # ±~2σ at k=256
    # disjoint halves: near-zero estimate
    d = _items(spark, "p", [f"p{i}" for i in range(500)]).unionByName(
        _items(spark, "q", [f"q{i}" for i in range(500)])
    )
    row2 = opmh_overlap(opmh_sketch(d, "g", "v", k=256), "g").collect()[0]
    assert row2["jaccard_est_ppm"] / 1e6 < 0.05


def test_sketch_is_k_bounded_and_k_validated(spark):
    df = _items(spark, "s", [f"w{i}" for i in range(5000)])
    assert opmh_sketch(df, "g", "v", k=32).count() <= 32
    with pytest.raises(ValueError):
        opmh_sketch(df, "g", "v", k=33)
