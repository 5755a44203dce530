"""T54 fixed-quota sampling: pruned ≡ naive window, quota law, determinism
under repartitioning, order_col mode, and the plan property (the exact
Window runs on the pruned survivor set, after the Arrow stage)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sampling import (
    quota_sample,
    quota_sample_naive,
)


@pytest.fixture(scope="module")
def corpus(spark):
    langs = ["en", "zh", "de", "fr"]
    rows = [(i, langs[i % 4], float((i * 37) % 100)) for i in range(800)]
    return spark.createDataFrame(rows, "doc_id long, lang string, quality double")


def _key(rows):
    return sorted((r["lang"], r["doc_id"], r["pick_rank"]) for r in rows)


class TestSelection:
    def test_equals_naive_window(self, corpus):
        got = quota_sample(corpus, ["lang"], 25, "doc_id").collect()
        want = quota_sample_naive(corpus, ["lang"], 25, "doc_id").collect()
        assert _key(got) == _key(want)

    def test_exact_quota_per_stratum(self, corpus):
        out = quota_sample(corpus, ["lang"], 25, "doc_id")
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"en": 25, "zh": 25, "de": 25, "fr": 25}

    def test_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
        )
        out = quota_sample(df, ["lang"], 10, "doc_id").collect()
        assert len(out) == 3
        assert max(r["pick_rank"] for r in out) == 2

    def test_stable_under_repartitioning(self, corpus):
        a = quota_sample(corpus.repartition(13), ["lang"], 25, "doc_id").collect()
        b = quota_sample(corpus.repartition(2), ["lang"], 25, "doc_id").collect()
        assert _key(a) == _key(b)

    def test_order_col_mode_picks_best(self, corpus):
        out = quota_sample(
            corpus, ["lang"], 5, "doc_id", order_col="quality"
        ).collect()
        # ascending quality: every pick must be <= the stratum's 5th-lowest
        naive = quota_sample_naive(
            corpus, ["lang"], 5, "doc_id", order_col="quality"
        ).collect()
        assert _key(out) == _key(naive)

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            quota_sample(corpus, ["lang"], 0, "doc_id")
        with pytest.raises(ValueError):
            quota_sample(corpus, [], 5, "doc_id")


class TestPlan:
    def test_window_sorts_survivors_not_corpus(self, corpus):
        out = quota_sample(corpus.repartition(8), ["lang"], 10, "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the full-corpus stage is the Arrow prune; the Window must sit
        # ABOVE it (i.e. printed before MapInPandas in top-down output),
        # consuming only the pruned survivors
        win_at = plan.find("Window")
        arrow_at = plan.find("MapInPandas")
        assert -1 < win_at < arrow_at
