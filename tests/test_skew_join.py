"""Skewed-join evidence (M4 join form): the same 50%-one-key join survives
via AQE skew-split (plan-asserted) and via declarative salting, both
row-identical to the plain join."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.skew import (
    SKEW_JOIN_TUNING,
    restore_confs,
    salted_dim_join,
    set_confs,
)

N_ROWS = 50_000
HOSTS = ["heavy.example.com"] + [f"h{i}.example.com" for i in range(997)]


def _skewed_left(spark):
    # doc_id % 2 == 0 → one host owns 50% of the rows
    return spark.range(0, N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("heavy.example.com"))
        .otherwise(
            F.concat(
                F.lit("h"), (F.col("id") % 997).cast("string"), F.lit(".example.com")
            )
        )
        .alias("host"),
        (F.col("id") % 100).alias("n"),
    )


def _dim(spark):
    return spark.createDataFrame(
        [(h, len(h)) for h in HOSTS], "host string, prio int"
    )


def _agg(joined):
    # NOT keyed on the join key: leaves AQE free to split the hot partition
    return joined.agg(
        F.sum(F.col("n") + F.col("prio")).alias("s"),
        F.count(F.lit(1)).alias("cnt"),
    )


class TestAqeSkewSplit:
    def test_plan_shows_skew_split_and_result_matches(self, spark):
        prev = set_confs(spark, SKEW_JOIN_TUNING)
        try:
            df = _agg(_skewed_left(spark).join(_dim(spark), "host"))
            rows = df.collect()
            # post-execution adaptive plan: the SMJ must be marked skew=true
            # and the hot side read through a skew-splitting AQEShuffleRead
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in plan, plan
            assert "skewed" in plan  # AQEShuffleRead ... skewed
        finally:
            restore_confs(spark, prev)
        want = _agg(_skewed_left(spark).join(_dim(spark), "host")).collect()
        assert rows == want  # splitting changed the schedule, not the result

    def test_structural_constraints_documented(self, spark):
        # a groupBy on the JOIN KEY downstream forbids the split (AQE must
        # preserve the required hash partitioning) — the documented reason
        # salting exists; assert the constraint is real so the docs stay true
        prev = set_confs(spark, SKEW_JOIN_TUNING)
        try:
            df = (
                _skewed_left(spark)
                .join(_dim(spark), "host")
                .groupBy("host")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" not in plan
        finally:
            restore_confs(spark, prev)


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        left, dim = _skewed_left(spark), _dim(spark)
        got = sorted(
            (r["doc_id"], r["prio"])
            for r in salted_dim_join(left, dim, "host", "doc_id").collect()
        )
        want = sorted(
            (r["doc_id"], r["prio"]) for r in left.join(dim, "host").collect()
        )
        assert got == want

    def test_hot_key_spreads_over_salts(self, spark):
        # the heavy host's rows must land in ~uniform per-salt groups
        left = _skewed_left(spark)
        salted = left.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(16)).cast("int")
        )
        sizes = [
            r["c"]
            for r in salted.filter(F.col("host") == "heavy.example.com")
            .groupBy("_salt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        assert len(sizes) == 16
        hot_total = sum(sizes)
        assert max(sizes) < hot_total / 16 * 1.3  # no salt bucket re-skews

    def test_join_runs_on_salted_key(self, spark):
        df = salted_dim_join(_skewed_left(spark), _dim(spark), "host", "doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # the shuffle key includes the salt

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            salted_dim_join(
                _skewed_left(spark), _dim(spark), "host", "doc_id", salt_buckets=0
            )
