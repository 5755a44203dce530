"""Efraimidis–Spirakis weighted sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sampling import (
    weighted_sample_wor,
)


@pytest.fixture(scope="module")
def frame(spark):
    """40 rows, weight 1 each except doc 7 at weight 400."""
    return spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(400)).otherwise(F.lit(1)).alias("w"),
    )


def test_exact_size_and_subset(spark, frame):
    s = weighted_sample_wor(frame, 10, "w", "doc_id")
    rows = s.collect()
    assert len(rows) == 10
    assert {r["doc_id"] for r in rows} <= set(range(40))
    assert set(s.columns) == {"doc_id", "w", "priority_e6"}


def test_partition_invariance(spark, frame):
    s1 = weighted_sample_wor(frame, 10, "w", "doc_id")
    s2 = weighted_sample_wor(frame.repartition(9), 10, "w", "doc_id")
    assert s1.exceptAll(s2).count() == 0
    assert s2.exceptAll(s1).count() == 0


def test_zero_and_null_weights_never_sample(spark):
    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, F.lit(None).cast("long"))
        .when(F.col("id") < 15, F.lit(0))
        .otherwise(F.lit(5))
        .alias("w"),
    )
    s = weighted_sample_wor(df, 20, "w", "doc_id")
    ids = {r["doc_id"] for r in s.collect()}
    assert ids == set(range(15, 20))  # only the 5 positive-weight rows


def test_raising_a_weight_never_hurts_its_rank(spark, frame):
    """E-S monotonicity: priority u^(1/w) is increasing in w for fixed u,
    so the heavy doc must rank at least as high as its weight-1 twin."""
    flat = frame.select("doc_id", F.lit(1).alias("w"))
    in_flat = {
        r["doc_id"] for r in weighted_sample_wor(flat, 10, "w").collect()
    }
    in_heavy = {
        r["doc_id"] for r in weighted_sample_wor(frame, 10, "w").collect()
    }
    if 7 in in_flat:
        assert 7 in in_heavy


def test_weight_proportional_inclusion(spark, frame):
    """Across 12 independent seeds, the 400x-weight doc must win a top-5
    slot far more often than any unit-weight doc can expect (deterministic
    given the fixed seed list)."""
    hits = 0
    for k in range(12):
        s = weighted_sample_wor(frame, 5, "w", "doc_id", seed=f"s{k}")
        if s.filter(F.col("doc_id") == 7).count():
            hits += 1
    # unit-weight expectation is ~5/439 per seed; weight 400 dominates
    assert hits >= 9


def test_validation(spark, frame):
    with pytest.raises(ValueError):
        weighted_sample_wor(frame, 0, "w")


class TestWeightedQuotaSample:
    @pytest.fixture(scope="class")
    def strata(self, spark):
        return spark.range(60).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
            F.when(F.col("id") == 4, F.lit(500)).otherwise(F.lit(1)).alias("w"),
        )

    def test_exact_quota_per_stratum(self, spark, strata):
        from pdf_drawing_ocr_recognition_spark.operators.sampling import (
            weighted_quota_sample,
        )

        s = weighted_quota_sample(strata, 5, "w", ("lang",))
        per = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        assert per == {"L0": 5, "L1": 5, "L2": 5}

    def test_heavy_doc_sampled_in_its_stratum(self, spark, strata):
        from pdf_drawing_ocr_recognition_spark.operators.sampling import (
            weighted_quota_sample,
        )

        hits = 0
        for k in range(8):
            s = weighted_quota_sample(strata, 3, "w", ("lang",), seed=f"s{k}")
            hits += s.filter(F.col("doc_id") == 4).count()
        assert hits >= 6  # 500x weight dominates its 20-doc stratum

    def test_partition_invariance_and_validation(self, spark, strata):
        from pdf_drawing_ocr_recognition_spark.operators.sampling import (
            weighted_quota_sample,
        )

        a = weighted_quota_sample(strata, 4, "w", ("lang",))
        b = weighted_quota_sample(strata.repartition(7), 4, "w", ("lang",))
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        with pytest.raises(ValueError):
            weighted_quota_sample(strata, 0, "w", ("lang",))
        with pytest.raises(ValueError):
            weighted_quota_sample(strata, 3, "w", ())
