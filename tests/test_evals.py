"""T205 exact distributed ROC-AUC + reliability table."""

import random

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.evals import (
    exact_auc,
    reliability_table,
)


def _py_auc(pairs):
    """Reference midrank AUC, pure python: (num, den) exact integers."""
    pairs = sorted(pairs)
    two_rpos = 0
    seen = 0
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        cnt = j - i
        pos = sum(y for _s, y in pairs[i:j])
        two_rpos += pos * (2 * (seen + cnt) - cnt + 1)
        seen += cnt
        i = j
    n_pos = sum(y for _s, y in pairs)
    n_neg = len(pairs) - n_pos
    return two_rpos - n_pos * (n_pos + 1), 2 * n_pos * n_neg


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "score long, y int")


class TestExactAuc:
    def test_matches_reference_with_heavy_ties(self, spark):
        rng = random.Random(42)
        pairs = [
            (rng.randrange(10), 1 if rng.random() < 0.3 else 0)
            for _ in range(500)
        ]
        if not any(y for _s, y in pairs):
            pairs[0] = (pairs[0][0], 1)
        row = exact_auc(_df(spark, pairs), "score", "y").collect()[0]
        num, den = _py_auc(pairs)
        assert (row["auc_num"], row["auc_den"]) == (num, den)
        assert row["n_pos"] == sum(y for _s, y in pairs)

    def test_perfect_and_random_separability(self, spark):
        perfect = [(i, 1 if i >= 50 else 0) for i in range(100)]
        row = exact_auc(_df(spark, perfect), "score", "y").collect()[0]
        assert row["auc_num"] == row["auc_den"]  # AUC = 1 exactly
        all_tied = [(7, i % 2) for i in range(100)]
        row = exact_auc(_df(spark, all_tied), "score", "y").collect()[0]
        assert row["auc_num"] * 2 == row["auc_den"]  # AUC = 1/2 exactly

    def test_single_class_raises(self, spark):
        with pytest.raises(ValueError, match="undefined"):
            exact_auc(_df(spark, [(1, 1), (2, 1)]), "score", "y")

    def test_float_scores_rejected(self, spark):
        df = spark.createDataFrame([(0.5, 1)], "score double, y int")
        with pytest.raises(ValueError, match="integral"):
            exact_auc(df, "score", "y")

    def test_no_window_in_plan(self, spark):
        pairs = [(i % 17, (i * 7) % 3 == 0) for i in range(300)]
        df = _df(spark, [(s, int(y)) for s, y in pairs])
        out = exact_auc(df, "score", "y")
        # the result frame is a 1-row localized frame; assert the PIPELINE
        # (histogram + prefix sum) plan instead
        hist = df.groupBy("score").agg(F.count("*").alias("_cnt"))
        from pdf_drawing_ocr_recognition_spark.operators.order import (
            global_prefix_sums,
        )

        plan = (
            global_prefix_sums(hist, [F.col("score")], "_cnt")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert out.collect()[0]["auc_den"] > 0


class TestReliabilityTable:
    def test_bins_and_integer_sums(self, spark):
        pairs = [(i, 1 if i % 3 == 0 else 0) for i in range(100)]
        out = reliability_table(_df(spark, pairs), "score", "y", 25).collect()
        assert [r["bin"] for r in out] == [0, 1, 2, 3]
        assert all(r["n"] == 25 for r in out)
        assert sum(r["n_pos"] for r in out) == 34
        assert sum(r["sum_score"] for r in out) == sum(range(100))

    def test_bin_width_validated(self, spark):
        with pytest.raises(ValueError, match="bin_width"):
            reliability_table(_df(spark, [(1, 0)]), "score", "y", 0)
