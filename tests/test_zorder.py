"""Z-order clustering (T174): Morton key construction (exact-integer,
codegen, Python-twin-checked) and the physical payoff — manifest min/max
pruning on EVERY clustered column after a clustered rewrite."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.zorder import (
    attach_zvalue,
    quantize_col,
    zvalue_col,
)
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    plan_scan,
    read_manifest,
    read_snapshot,
    rewrite_data_files,
)


def _py_z(q1: int, q2: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((q1 >> b) & 1) << (2 * b + 1)
        z |= ((q2 >> b) & 1) << (2 * b)
    return z


def _two_col(spark, n=1000):
    # val is a decorrelated permutation-ish column: linear layouts sorted
    # by doc_id give val no pruning at all
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % n).alias("val"),
    )


class TestZValue:
    def test_interleave_matches_python_twin(self, spark):
        df = attach_zvalue(_two_col(spark, 256), ["doc_id", "val"], bits=8)
        rows = df.collect()
        assert len(rows) == 256
        for r in rows:
            # span 256 -> step 1 -> q == value
            assert r["_z"] == _py_z(r["doc_id"], r["val"]), r

    def test_quantize_is_exact_past_double_precision(self, spark):
        # values near 2^60: floor(a/b) on doubles would misquantize
        base = 1 << 60
        df = spark.range(4).select(
            (F.col("id") * (1 << 52) + base).alias("v")
        )
        lo, hi = base, base + 3 * (1 << 52)
        got = df.select(
            quantize_col("v", lo, hi, 2).alias("q")
        ).collect()
        # span = 3*2^52 + 1, step = ceil(span/4) -> q = 0,1,2,3
        assert sorted(r["q"] for r in got) == [0, 1, 2, 3]

    def test_single_column_degenerates_to_range_rank(self, spark):
        df = attach_zvalue(_two_col(spark, 512), ["doc_id"], bits=8)
        rows = {r["doc_id"]: r["_z"] for r in df.collect()}
        # span 512 -> step 2 -> q = doc_id div 2
        assert rows[0] == 0 and rows[511] == 255 and rows[101] == 50

    def test_constant_column_quantizes_to_zero(self, spark):
        df = spark.range(8).select(
            F.col("id").alias("a"), F.lit(7).alias("b")
        )
        rows = attach_zvalue(df, ["b", "a"], bits=8).collect()
        for r in rows:
            assert r["_z"] == _py_z(0, r["a"])

    def test_validation(self, spark):
        df = _two_col(spark, 10)
        with pytest.raises(ValueError, match="at least one column"):
            attach_zvalue(df, [])
        with pytest.raises(ValueError, match="unknown cluster column"):
            attach_zvalue(df, ["nope"])
        with pytest.raises(ValueError, match="bits"):
            attach_zvalue(df, ["doc_id"], bits=40)

    def test_zvalue_stays_codegen(self, spark):
        # the z projection must not break whole-stage codegen (no UDF)
        df = attach_zvalue(_two_col(spark, 100), ["doc_id", "val"], bits=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # "*(1) Project" = the projection sits inside a codegen stage
        assert "*(1) Project" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestClusteredRewrite:
    def test_zorder_rewrite_prunes_on_both_columns(self, spark, tmp_path):
        root = str(tmp_path / "zt")
        n = 1024
        append_snapshot(
            _two_col(spark, n).repartitionByRange(16, "doc_id"), root
        )
        # linear layout: doc_id prunes hard, val not at all
        _, skip_doc = plan_scan(root, 1, [("doc_id", ">=", n - n // 8)])
        _, skip_val = plan_scan(root, 1, [("val", ">=", n - n // 8)])
        assert len(skip_doc) >= 12
        assert len(skip_val) == 0
        sid = rewrite_data_files(
            spark, root, target_files=16, cluster_by=["doc_id", "val"]
        )
        man = read_manifest(root, sid)
        assert man["operation"] == "replace"
        # clustered layout: BOTH columns prune (>= half the files each)
        _, zskip_doc = plan_scan(root, sid, [("doc_id", ">=", n - n // 8)])
        _, zskip_val = plan_scan(root, sid, [("val", ">=", n - n // 8)])
        assert len(zskip_doc) >= 8, f"doc_id pruning lost: {len(zskip_doc)}"
        assert len(zskip_val) >= 8, f"val gained no pruning: {len(zskip_val)}"
        # rows are bit-identical through the rewrite
        before = sorted(
            (r["doc_id"], r["val"])
            for r in read_snapshot(spark, root, 1).collect()
        )
        after = sorted(
            (r["doc_id"], r["val"])
            for r in read_snapshot(spark, root, sid).collect()
        )
        assert before == after

    def test_pruned_read_equals_filter_after_clustering(self, spark, tmp_path):
        root = str(tmp_path / "zf")
        append_snapshot(_two_col(spark, 500).repartition(8), root)
        rewrite_data_files(
            spark, root, target_files=8, cluster_by=["doc_id", "val"]
        )
        got = sorted(
            r["doc_id"]
            for r in read_snapshot(
                spark, root, filters=[("val", ">=", 400)]
            ).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in _two_col(spark, 500).filter(F.col("val") >= 400).collect()
        )
        assert got == want
