"""T200 storage-partitioned join: shuffle-free bucket-local join over two
snapshot tables sharing a bucket[N] spec on the join key — result must be
exactly the plain join, under deletes, schema evolution, and null keys."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.spj import bucket_local_join
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    delete_from,
    evolve_schema,
    read_snapshot,
)

SPEC = [{"source": "k", "transform": "bucket[8]"}]


def _a(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )


def _b(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") + 1).cast("int").alias("vb")
    )


def _tables(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    append_snapshot(_a(spark, 0, 100), ra, partition_spec=SPEC)
    append_snapshot(_b(spark, 50, 150), rb, partition_spec=SPEC)
    return ra, rb


class TestBucketLocalJoin:
    def test_matches_plain_join(self, spark, tmp_path):
        ra, rb = _tables(spark, tmp_path)
        got = sorted(
            tuple(r) for r in bucket_local_join(spark, ra, rb, "k").collect()
        )
        ref = sorted(
            tuple(r)
            for r in read_snapshot(spark, ra)
            .join(read_snapshot(spark, rb), "k", "inner")
            .select("k", "va", "vb")
            .collect()
        )
        assert got == ref and len(got) == 50

    def test_null_keys_match_nothing(self, spark, tmp_path):
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        with_null = _a(spark, 0, 10).union(
            spark.createDataFrame([(None, 999)], "k long, va long")
        )
        append_snapshot(with_null, ra, partition_spec=SPEC)
        b_null = _b(spark, 0, 10).union(
            spark.createDataFrame([(None, 111)], "k long, vb int")
        )
        append_snapshot(b_null, rb, partition_spec=SPEC)
        out = bucket_local_join(spark, ra, rb, "k").collect()
        assert len(out) == 10  # pandas NaN==NaN matching must NOT leak in
        assert all(r["k"] is not None for r in out)

    def test_deletes_and_evolution_resolve(self, spark, tmp_path):
        ra, rb = _tables(spark, tmp_path)
        delete_from(spark, ra, [("k", ">=", 90)])
        evolve_schema(rb, rename={"vb": "value_b"})
        evolve_schema(rb, widen={"value_b": "long"})
        out = bucket_local_join(spark, ra, rb, "k")
        assert dict(out.dtypes)["value_b"] == "bigint"
        got = sorted(tuple(r) for r in out.collect())
        assert got == [(i, 2 * i, i + 1) for i in range(50, 90)]

    def test_no_join_or_data_exchange_in_plan(self, spark, tmp_path):
        ra, rb = _tables(spark, tmp_path)
        plan = (
            bucket_local_join(spark, ra, rb, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "CartesianProduct"):
            assert op not in plan
        # the only scan feeding the stage is the N-row task-descriptor
        # relation — table data enters through the Arrow kernel, unshuffled
        assert "FileScan" not in plan

    def test_refuses_unbucketed_table(self, spark, tmp_path):
        ra = str(tmp_path / "a")
        rb = str(tmp_path / "b")
        append_snapshot(_a(spark, 0, 10), ra)  # no spec
        append_snapshot(_b(spark, 0, 10), rb, partition_spec=SPEC)
        with pytest.raises(ValueError, match="not bucket-partitioned"):
            bucket_local_join(spark, ra, rb, "k")

    def test_refuses_mismatched_bucket_counts(self, spark, tmp_path):
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        append_snapshot(_a(spark, 0, 10), ra, partition_spec=SPEC)
        append_snapshot(
            _b(spark, 0, 10),
            rb,
            partition_spec=[{"source": "k", "transform": "bucket[4]"}],
        )
        with pytest.raises(ValueError, match="bucket counts differ"):
            bucket_local_join(spark, ra, rb, "k")

    def test_refuses_files_without_bucket_tuples(self, spark, tmp_path):
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        append_snapshot(_a(spark, 0, 10), ra)  # pre-spec files
        append_snapshot(_a(spark, 10, 20), ra, partition_spec=SPEC)
        append_snapshot(_b(spark, 0, 20), rb, partition_spec=SPEC)
        with pytest.raises(ValueError, match="no bucket"):
            bucket_local_join(spark, ra, rb, "k")

    def test_collision_and_empty(self, spark, tmp_path):
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        append_snapshot(_a(spark, 0, 10), ra, partition_spec=SPEC)
        append_snapshot(
            _a(spark, 20, 30), rb, partition_spec=SPEC
        )  # same column names (va collides)
        with pytest.raises(ValueError, match="collision"):
            bucket_local_join(spark, ra, rb, "k")
