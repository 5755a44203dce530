"""Histogram-based exact quantile bucketing (CCNet head/middle/tail mixing)."""

import pytest
from pyspark.sql import functions as F


def _buckets(spark, rows, n=3, groups=("g",), labels=("tail", "middle", "head")):
    from pdf_drawing_ocr_recognition_spark.operators.mixing import (
        histogram_quantile_buckets,
    )

    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = histogram_quantile_buckets(df, "v", n, groups, labels=labels)
    return {r["id"]: r["bucket"] for r in out.collect()}


def _reference(rows, n_buckets):
    """Threshold-bucketing oracle: bucket of v = ceil(n_buckets * c_le(v) / n)."""
    by_g = {}
    for _id, g, v in rows:
        by_g.setdefault(g, []).append((v, _id))
    out = {}
    for g, vs in by_g.items():
        n = len(vs)
        for v, _id in vs:
            c_le = sum(1 for (u, _) in vs if u <= v)
            out[_id] = -(-(n_buckets * c_le) // n)  # ceil
    return out


def test_buckets_match_threshold_reference(spark):
    rows = [
        (i, "en" if i % 3 else "de", float((i * 37) % 11)) for i in range(60)
    ]
    got = _buckets(spark, rows)
    ref = _reference(rows, 3)
    label = {1: "tail", 2: "middle", 3: "head"}
    assert got == {i: label[b] for i, b in ref.items()}


def test_ties_share_a_bucket(spark):
    # 6 rows, scores [1,1,1,1,2,3]: the four 1s have cum_le=4 of 6 ->
    # ceil(12/6)=2 -> ALL land in 'middle'; 2 -> ceil(15/6)=3 head; 3 -> head
    rows = [(i, "g", 1.0) for i in range(4)] + [(4, "g", 2.0), (5, "g", 3.0)]
    got = _buckets(spark, rows)
    assert got == {0: "middle", 1: "middle", 2: "middle", 3: "middle",
                   4: "head", 5: "head"}


def test_null_scores_dropped_and_label_count_enforced(spark):
    from pdf_drawing_ocr_recognition_spark.operators.mixing import (
        histogram_quantile_buckets,
    )

    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", None)], "id int, g string, v double"
    )
    out = histogram_quantile_buckets(df, "v", 2, ("g",))
    assert [r["id"] for r in out.collect()] == [1]
    with pytest.raises(ValueError):
        histogram_quantile_buckets(df, "v", 3, ("g",), labels=("a", "b"))


def test_no_group_single_distribution(spark):
    rows = [(i, "x", float(i)) for i in range(9)]
    from pdf_drawing_ocr_recognition_spark.operators.mixing import (
        histogram_quantile_buckets,
    )

    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = histogram_quantile_buckets(df, "v", 3, (), labels=("lo", "mid", "hi"))
    got = {r["id"]: r["bucket"] for r in out.collect()}
    assert got == {0: "lo", 1: "lo", 2: "lo", 3: "mid", 4: "mid", 5: "mid",
                   6: "hi", 7: "hi", 8: "hi"}


def test_window_runs_on_histogram_not_rows(spark):
    """The per-group sort must be over DISTINCT values (the histogram), with
    the row stream only hash-joined against the broadcast bucket dim — no
    document-sized Sort above the row scan."""
    from pdf_drawing_ocr_recognition_spark.operators.mixing import (
        histogram_quantile_buckets,
    )

    df = spark.range(1000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 5).cast("double").alias("v"),
    )
    out = histogram_quantile_buckets(df, "v", 3, ("g",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only Window sits above the aggregated histogram (HashAggregate),
    # i.e. the plan has exactly one Window and it follows an aggregate
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan, plan


class TestDsirLogweights:
    """T73: DSIR hashed-unigram importance weights."""

    @pytest.fixture(scope="class")
    def weights(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            dsir_logweights,
        )

        rows = [
            (1, "wiki clean text", True),
            (2, "wiki good text", True),
            (3, "spam spam buy", False),
            (4, "wiki text", False),   # target-like candidate
            (5, "spam buy", False),    # raw-like candidate
        ]
        docs = spark.createDataFrame(
            rows, "doc_id LONG, text STRING, is_target BOOLEAN"
        )
        out = dsir_logweights(docs, "is_target")
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_target_like_doc_outweighs_raw_like(self, weights):
        # every token of doc 4 is overrepresented in the target domain,
        # every token of doc 5 underrepresented → strict weight order
        assert weights[4]["dsir_scaled"] > weights[5]["dsir_scaled"]
        assert weights[5]["dsir_scaled"] < 0

    def test_token_counts_and_coverage(self, weights):
        assert set(weights) == {1, 2, 3, 4, 5}
        assert weights[4]["n_tokens"] == 2
        assert weights[3]["n_tokens"] == 3

    def test_weight_is_sum_of_per_token_logratios(self, weights):
        # doc 4 = "wiki text": both tokens also appear in docs 1/2, so its
        # weight equals the wiki + text contributions of doc 1 minus the
        # "clean" contribution — cross-check additivity via doc 2's tokens
        d1, d2, d4 = (weights[k]["dsir_scaled"] for k in (1, 2, 4))
        # docs 1 and 2 differ by one token ("clean" vs "good", both unique:
        # same smoothed log-ratio) → identical total weight
        assert d1 == d2
        # absolute sign is smoothing-dominated at toy scale (256 buckets vs
        # 13 tokens pulls every ratio toward ct/cq < 1); the resampling
        # ORDER is the contract: target-like docs rank above raw-like ones
        assert d4 > weights[3]["dsir_scaled"]

    def test_zero_target_docs_yields_finite_weights(self, spark):
        # no row satisfies target_col: the target total coalesces to 0 and
        # smoothing keeps every ratio finite — never silent nulls
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            dsir_logweights,
        )

        docs = spark.createDataFrame(
            [(1, "some raw text", False), (2, "more raw", False)],
            "doc_id LONG, text STRING, is_target BOOLEAN",
        )
        rows = {r["doc_id"]: r.asDict() for r in dsir_logweights(docs, "is_target").collect()}
        assert set(rows) == {1, 2}
        for r in rows.values():
            assert r["dsir_scaled"] is not None
            assert r["dsir_scaled"] < 0  # pure smoothing: target-unseen ⇒ ratio < 1


class TestLargestRemainderQuotas:
    """T77: Hamilton apportionment — exact integer quota splits."""

    def _quotas(self, spark, rows, budget):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            largest_remainder_quotas,
        )

        dim = spark.createDataFrame(rows, "lang STRING, w LONG")
        return {
            r["lang"]: r["quota"]
            for r in largest_remainder_quotas(dim, "w", budget).collect()
        }

    def test_sum_equals_budget_and_within_one_of_share(self, spark):
        rows = [("a", 218), ("b", 75), ("c", 73), ("d", 70), ("e", 64)]
        total = sum(w for _, w in rows)
        for budget in (0, 1, 7, 100, 999):
            got = self._quotas(spark, rows, budget)
            assert sum(got.values()) == budget
            for lang, w in rows:
                exact = budget * w / total
                assert exact - 1 < got[lang] < exact + 1

    def test_largest_remainder_tiebreak_is_key_order(self, spark):
        # equal weights, budget not divisible: leftovers go to the
        # lexicographically smallest keys
        got = self._quotas(spark, [("x", 5), ("y", 5), ("z", 5)], 7)
        assert got == {"x": 3, "y": 2, "z": 2}

    def test_validation(self, spark):
        import pytest as _pytest

        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            largest_remainder_quotas,
        )

        dim = spark.createDataFrame([("a", 1)], "lang STRING, w LONG")
        with _pytest.raises(ValueError):
            largest_remainder_quotas(dim, "w", -1)

    def test_zero_total_weight_raises_not_nulls(self, spark):
        # all-zero weights (or an empty dim) must fail loudly at execution
        # instead of silently returning null quotas
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            largest_remainder_quotas,
        )

        zeros = spark.createDataFrame(
            [("a", 0), ("b", 0)], "lang STRING, w LONG"
        )
        with pytest.raises(Exception) as exc:
            largest_remainder_quotas(zeros, "w", 10).collect()
        assert "sum(weight) must be > 0" in str(exc.value)

        neg = spark.createDataFrame([("a", 5), ("b", -1)], "lang STRING, w LONG")
        with pytest.raises(Exception) as exc:
            largest_remainder_quotas(neg, "w", 10).collect()
        assert "negative weight" in str(exc.value)

        # empty dim: the optimizer's empty-relation propagation collapses
        # the whole plan — documented contract is 0 output rows (nothing to
        # apportion), never null-quota rows
        empty = zeros.where(F.lit(False))
        assert largest_remainder_quotas(empty, "w", 10).count() == 0


class TestShrunkGroupMeans:
    """T80: empirical-Bayes shrinkage of per-group means."""

    def _run(self, spark, rows, k):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            shrunk_group_means,
        )

        df = spark.createDataFrame(rows, "g STRING, v LONG")
        return {
            r["g"]: r.asDict()
            for r in shrunk_group_means(df, "g", "v", k).collect()
        }

    def test_small_group_pulled_to_global_mean_big_group_stays(self, spark):
        # global mean = 5000; "tiny" (one doc at 10000) must shrink hard,
        # "big" (100 docs at 4950) barely moves
        rows = [("big", 4950)] * 100 + [("tiny", 10000)]
        got = self._run(spark, rows, 20)
        tiny, big = got["tiny"], got["big"]
        assert tiny["mean_raw"] == 10000.0
        # posterior with k=20 virtual docs at mu: (10000 + 20*mu)/21
        mu = (4950 * 100 + 10000) / 101
        # output is rounded to 4dp
        assert tiny["mean_shrunk"] == round((10000 + 20 * mu) / 21, 4)
        assert abs(big["mean_shrunk"] - big["mean_raw"]) < abs(
            tiny["mean_shrunk"] - tiny["mean_raw"]
        )

    def test_zero_prior_is_identity_and_validation(self, spark):
        import pytest as _pytest

        rows = [("a", 10), ("a", 20), ("b", 100)]
        got = self._run(spark, rows, 0)
        assert got["a"]["mean_shrunk"] == got["a"]["mean_raw"] == 15.0
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            shrunk_group_means,
        )

        df = spark.createDataFrame(rows, "g STRING, v LONG")
        with _pytest.raises(ValueError):
            shrunk_group_means(df, "g", "v", -1)


class TestCurriculumOrder:
    """T104: fixed-threshold binning + deterministic in-bin shuffle."""

    def _scored(self, spark):
        rows = [(i, round(i / 10.0, 4)) for i in range(11)]  # 0.0 .. 1.0
        return spark.createDataFrame(rows, "doc_id long, quality double")

    def test_bin_thresholds_and_top_clamp(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            curriculum_order,
        )

        out = {
            r["doc_id"]: r["bin"]
            for r in curriculum_order(
                self._scored(spark), "doc_id", "quality", n_bins=4
            ).collect()
        }
        # floor(q*4) with the top edge clamped into the last bin
        assert out[0] == 0 and out[2] == 0
        assert out[3] == 1 and out[5] == 2 and out[9] == 3
        assert out[10] == 3  # q=1.0 clamps to n_bins-1

    def test_positions_are_a_permutation_per_bin(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            curriculum_order,
        )

        rows = curriculum_order(
            self._scored(spark), "doc_id", "quality", n_bins=2
        ).collect()
        by_bin = {}
        for r in rows:
            by_bin.setdefault(r["bin"], []).append(r["pos_in_bin"])
        for b, ps in by_bin.items():
            assert sorted(ps) == list(range(1, len(ps) + 1))

    def test_seed_changes_order_and_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            curriculum_order,
        )

        df = self._scored(spark)
        a = sorted(
            map(tuple, curriculum_order(df, "doc_id", "quality", 2, seed="a").collect())
        )
        a2 = sorted(
            map(
                tuple,
                curriculum_order(
                    df.repartition(5), "doc_id", "quality", 2, seed="a"
                ).collect(),
            )
        )
        b = sorted(
            map(tuple, curriculum_order(df, "doc_id", "quality", 2, seed="b").collect())
        )
        assert a == a2
        assert a != b  # the shuffle key actually depends on the seed
        import pytest as _pytest

        with _pytest.raises(ValueError):
            curriculum_order(df, "doc_id", "quality", n_bins=0)


class TestPerGroupPercentiles:
    """T109: within-group percent-rank calibration."""

    def test_known_percentiles_and_fair_cut(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            per_group_percentiles,
        )

        # source A scores inflated (0.8..0.95), source B deflated (0.1..0.25)
        rows = [(i, "A", 0.8 + i * 0.05) for i in range(4)] + [
            (10 + i, "B", 0.1 + i * 0.05) for i in range(4)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, q double")
        got = {
            r["doc_id"]: r["pctile"]
            for r in per_group_percentiles(df, "source", "q", "doc_id").collect()
        }
        # percent_rank = (rank-1)/(n-1): 0, 1/3, 2/3, 1 within EACH source
        for base in (0, 10):
            assert [got[base + k] for k in range(4)] == [
                0.0,
                round(1 / 3, 6),
                round(2 / 3, 6),
                1.0,
            ]
        # the fair top-50% cut keeps 2 docs from EACH source
        keep = {d for d, p in got.items() if p >= 0.5}
        assert len(keep & {2, 3}) == 2 and len(keep & {12, 13}) == 2

    def test_tie_break_and_singleton(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.mixing import (
            per_group_percentiles,
        )

        rows = [(0, "A", 0.5), (1, "A", 0.5), (2, "B", 0.9)]
        df = spark.createDataFrame(rows, "doc_id long, source string, q double")
        got = {
            r["doc_id"]: r["pctile"]
            for r in per_group_percentiles(df, "source", "q", "doc_id").collect()
        }
        # (score, id) total order: equal scores still rank deterministically
        assert got[0] == 0.0 and got[1] == 1.0
        assert got[2] == 0.0  # percent_rank of a singleton group
