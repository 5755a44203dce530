"""T54 fixed-quota sampling: quota law, determinism under repartitioning,
order_col mode, and the load-bearing plan property — Catalyst's
WindowGroupLimit rewrite fires, with the Partial (map-side) group limit
below the Exchange, so no whole stratum ever sorts in one task."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sampling import quota_sample


@pytest.fixture(scope="module")
def corpus(spark):
    langs = ["en", "zh", "de", "fr"]
    rows = [(i, langs[i % 4], float((i * 37) % 100)) for i in range(800)]
    return spark.createDataFrame(rows, "doc_id long, lang string, quality double")


def _key(rows):
    return sorted((r["lang"], r["doc_id"], r["pick_rank"]) for r in rows)


class TestSelection:
    def test_exact_quota_per_stratum(self, corpus):
        out = quota_sample(corpus, ["lang"], 25, "doc_id")
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
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

    def test_order_col_mode_picks_lowest(self, corpus):
        out = quota_sample(corpus, ["lang"], 5, "doc_id", order_col="quality")
        got = {
            (r["lang"], r["quality"]) for r in out.collect()
        }
        # ascending quality: each stratum's picks are its 5 smallest
        # (quality, doc_id) pairs — recompute expectation driver-side
        rows = corpus.collect()
        want = set()
        for lang in ("en", "zh", "de", "fr"):
            members = sorted(
                ((r["quality"], r["doc_id"]) for r in rows if r["lang"] == lang)
            )[:5]
            want |= {(lang, q) for q, _ in members}
        assert got == want

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            quota_sample(corpus, ["lang"], 0, "doc_id")
        with pytest.raises(ValueError):
            quota_sample(corpus, [], 5, "doc_id")


class TestPlan:
    def test_window_group_limit_partial_below_exchange(self, corpus):
        out = quota_sample(corpus.repartition(8), ["lang"], 10, "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Catalyst must rewrite the rank-limit into WindowGroupLimit with a
        # map-side Partial below the Exchange: at most k rows per stratum
        # per input partition shuffle — the property that makes the
        # declarative window the scale-safe plan
        partial_at = plan.find("WindowGroupLimit")
        assert "Partial" in plan and partial_at != -1
        exch_at = plan.find("Exchange")
        final_at = plan.find("Final")
        assert -1 < final_at < exch_at  # top-down print: Final above Exchange
        assert plan.find("Partial") > exch_at  # Partial below (map side)
