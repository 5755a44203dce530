"""Distributed prefix sums + token-budget greedy selection (T196).

global_prefix_sums is the scalable twin of the unpartitioned
``SUM(x) OVER (ORDER BY …)`` window (one task at corpus scale): range
repartition, n_partitions driver scalars, one Arrow cumsum pass.
Contracts pinned here:
- bit-identity with the sequential window form on integer costs (the
  reason the value column MUST be integral — float partials would depend
  on where range boundaries land);
- max_total partition pruning never changes surviving values;
- token_budget_select == the window-filter reference, boundary row
  excluded (inclusive sum ≤ budget);
- loud failures: float column, negative costs under pruning.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.mixing import (
    token_budget_select,
)
from pdf_drawing_ocr_recognition_spark.operators.order import (
    global_prefix_sums,
)


def _docs(spark, n=500):
    # adversarial: heavy ties in the score (forcing the tiebreaker to
    # matter) and wildly uneven costs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("score"),
        ((F.col("id") * 37) % 100 + 1).cast("long").alias("cost"),
    )


def _window_reference(df, order_cols):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("cum_ref", F.sum("cost").over(w))


class TestGlobalPrefixSums:
    def test_matches_window_form_exactly(self, spark):
        df = _docs(spark)
        order = [F.col("score").desc(), F.col("doc_id")]
        got = global_prefix_sums(df, order, "cost", out_col="cum", n_partitions=8)
        ref = _window_reference(df, order)
        joined = got.join(ref, "doc_id")
        assert joined.filter(F.col("cum") != F.col("cum_ref")).count() == 0
        assert got.count() == 500

    def test_single_row_and_empty(self, spark):
        one = _docs(spark, 1)
        got = global_prefix_sums(one, [F.col("doc_id")], "cost", out_col="cum")
        r = got.collect()[0]
        assert r["cum"] == r["cost"]
        empty = _docs(spark, 0)
        assert (
            global_prefix_sums(empty, [F.col("doc_id")], "cost").count() == 0
        )

    def test_float_column_rejected(self, spark):
        df = _docs(spark).withColumn("cost", F.col("cost").cast("double"))
        with pytest.raises(ValueError, match="integral value column"):
            global_prefix_sums(df, [F.col("doc_id")], "cost")

    def test_negative_values_under_pruning_fail_loudly(self, spark):
        df = _docs(spark, 50).withColumn(
            "cost", F.when(F.col("doc_id") == 25, F.lit(-5)).otherwise(
                F.col("cost")
            ).cast("long")
        )
        with pytest.raises(ValueError, match="non-negative"):
            global_prefix_sums(df, [F.col("doc_id")], "cost", max_total=100)

    def test_null_values_fail_loudly(self, spark):
        df = _docs(spark, 50).withColumn(
            "cost",
            F.when(F.col("doc_id") == 7, F.lit(None)).otherwise(
                F.col("cost")
            ).cast("long"),
        )
        with pytest.raises(ValueError, match="null"):
            global_prefix_sums(df, [F.col("doc_id")], "cost")

    def test_max_total_prunes_but_never_changes_values(self, spark):
        df = _docs(spark)
        order = [F.col("score").desc(), F.col("doc_id")]
        full = global_prefix_sums(
            df, order, "cost", out_col="cum", n_partitions=16
        )
        capped_total = 2000
        pruned = global_prefix_sums(
            df, order, "cost", out_col="cum",
            n_partitions=16, max_total=capped_total,
        )
        want = {
            (r["doc_id"], r["cum"])
            for r in full.filter(F.col("cum") <= capped_total).collect()
        }
        got = {
            (r["doc_id"], r["cum"])
            for r in pruned.filter(F.col("cum") <= capped_total).collect()
        }
        assert got == want
        # and pruning actually dropped rows from the scan
        assert pruned.count() < full.count()


class TestTokenBudgetSelect:
    def test_equals_window_filter_reference(self, spark):
        df = _docs(spark)
        order = [F.col("score").desc(), F.col("doc_id")]
        budget = 5000
        got = token_budget_select(df, order, "cost", budget, cum_col="cum")
        ref = (
            _window_reference(df, order)
            .filter(F.col("cum_ref") <= budget)
        )
        g = sorted((r["doc_id"], r["cum"]) for r in got.collect())
        w = sorted((r["doc_id"], r["cum_ref"]) for r in ref.collect())
        assert g == w
        # the boundary row that would cross the budget is excluded
        assert max(r[1] for r in g) <= budget

    def test_selection_is_best_first(self, spark):
        df = _docs(spark)
        got = token_budget_select(
            df, [F.col("score").desc(), F.col("doc_id")], "cost", 3000
        )
        kept_min = got.agg(F.min("score")).collect()[0][0]
        # every strictly-better score class is fully kept
        n_better = df.filter(F.col("score") > kept_min).count()
        n_kept_better = got.filter(F.col("score") > kept_min).count()
        assert n_better == n_kept_better

    def test_zero_budget_selects_nothing(self, spark):
        df = _docs(spark, 50)
        assert (
            token_budget_select(df, [F.col("doc_id")], "cost", 0).count() == 0
        )

    def test_budget_larger_than_corpus_keeps_all(self, spark):
        df = _docs(spark, 100)
        total = df.agg(F.sum("cost")).collect()[0][0]
        got = token_budget_select(df, [F.col("doc_id")], "cost", int(total))
        assert got.count() == 100
