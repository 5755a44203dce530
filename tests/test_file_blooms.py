"""T207 per-file bloom filters: point-lookup file skipping where min/max
bounds are useless, Puffin-style sidecars, field-id keyed (rename-proof),
provable-only pruning (no false negatives)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.file_blooms import (
    bloom_file_params,
    compute_file_blooms,
)
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_from,
    evolve_schema,
    expire_snapshots,
    merge_into,
    plan_scan,
    read_manifest,
    read_snapshot,
    remove_orphan_files,
    rewrite_data_files,
)


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )


def _table(spark, tmp_path, n=20000, files=8):
    root = str(tmp_path / "t")
    append_snapshot(_urls(spark, 0, n).repartition(files), root)
    compute_file_blooms(spark, root, "url", fp_rate=0.01)
    return root


class TestBloomPruning:
    def test_point_lookup_skips_files(self, spark, tmp_path):
        root = _table(spark, tmp_path)
        sid = current_snapshot_id(root)
        # hash-distributed strings: min/max alone keeps all 8 files
        kept, skipped = plan_scan(root, sid, [("url", "==", "u777")])
        assert len(kept) <= 2 and len(skipped) >= 6
        rows = read_snapshot(
            spark, root, filters=[("url", "==", "u777")]
        ).collect()
        assert [r["doc_id"] for r in rows] == [777]

    def test_no_false_negatives(self, spark, tmp_path):
        root = _table(spark, tmp_path, n=2000, files=4)
        for probe in range(0, 2000, 97):
            got = read_snapshot(
                spark, root, filters=[("url", "==", f"u{probe}")]
            ).count()
            assert got == 1, f"bloom dropped a real value u{probe}"

    def test_miss_prunes_everything(self, spark, tmp_path):
        root = _table(spark, tmp_path)
        sid = current_snapshot_id(root)
        kept, _sk = plan_scan(root, sid, [("url", "==", "not-a-url")])
        # 8 files × 1% fp — overwhelmingly all pruned; never a wrong result
        assert len(kept) <= 2
        assert read_snapshot(
            spark, root, filters=[("url", "==", "not-a-url")]
        ).count() == 0

    def test_range_ops_ignore_blooms(self, spark, tmp_path):
        root = _table(spark, tmp_path, n=2000, files=4)
        out = read_snapshot(spark, root, filters=[("url", ">=", "u999")])
        assert out.count() == sum(
            1 for i in range(2000) if f"u{i}" >= "u999"
        )

    def test_rename_keeps_blooms_working(self, spark, tmp_path):
        root = _table(spark, tmp_path)
        evolve_schema(root, rename={"url": "page_url"})
        sid = current_snapshot_id(root)
        kept, skipped = plan_scan(root, sid, [("page_url", "==", "u777")])
        assert len(skipped) >= 6  # field-id keyed: rename-proof
        assert read_snapshot(
            spark, root, filters=[("page_url", "==", "u777")]
        ).count() == 1

    def test_int_column_blooms(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_urls(spark, 0, 5000).repartition(4), root)
        compute_file_blooms(spark, root, "doc_id")
        sid = current_snapshot_id(root)
        kept, _ = plan_scan(root, sid, [("doc_id", "==", 123)])
        assert len(kept) <= 2
        assert read_snapshot(
            spark, root, filters=[("doc_id", "==", 123)]
        ).count() == 1


class TestBloomLifecycle:
    def test_carried_through_delete_and_merge(self, spark, tmp_path):
        root = _table(spark, tmp_path, n=4000, files=4)
        delete_from(spark, root, [("doc_id", "<", 10)])
        src = spark.createDataFrame(
            [(2000, "u2000-v2")], "doc_id long, url string"
        )
        merge_into(spark, root, src, "doc_id")
        man = read_manifest(root, current_snapshot_id(root))
        untouched_with_blooms = [
            f for f in man["files"] if man.get("blooms", {}).get(f)
        ]
        assert untouched_with_blooms  # carried by name
        # lookups still correct through masks + the rewritten file
        assert read_snapshot(
            spark, root, filters=[("url", "==", "u3999")]
        ).count() == 1
        assert read_snapshot(
            spark, root, filters=[("url", "==", "u5")]
        ).count() == 0  # deleted

    def test_compaction_drops_then_recompute(self, spark, tmp_path):
        root = _table(spark, tmp_path, n=2000, files=4)
        rewrite_data_files(spark, root, target_files=2)
        man = read_manifest(root, current_snapshot_id(root))
        assert not man.get("blooms")  # rewritten files: stats age out
        sid = compute_file_blooms(spark, root, "url")
        assert read_manifest(root, sid)["summary"]["properties"][
            "bloom_files"
        ] == 2

    def test_sidecars_survive_expiry_of_old_snapshots(self, spark, tmp_path):
        root = _table(spark, tmp_path, n=2000, files=4)
        append_snapshot(_urls(spark, 2000, 2100), root)
        expire_snapshots(root, keep_last=1)
        remove_orphan_files(root, older_than_s=0.0)
        # blooms of retained files still referenced and still pruning
        sid = current_snapshot_id(root)
        kept, skipped = plan_scan(root, sid, [("url", "==", "u777")])
        assert skipped
        assert read_snapshot(
            spark, root, filters=[("url", "==", "u777")]
        ).count() == 1

    def test_unknown_column_and_incremental_cross(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_appends_between,
        )

        root = _table(spark, tmp_path, n=500, files=2)
        with pytest.raises(ValueError, match="no column"):
            compute_file_blooms(spark, root, "nope")
        append_snapshot(_urls(spark, 500, 600), root)
        # appends-only incremental read crosses the compute-stats commit
        inc = read_appends_between(root=root, spark=spark, from_id=1, to_id=3)
        assert inc.count() == 100

    def test_params_sane(self):
        m, k = bloom_file_params(100_000, 0.01)
        assert m % 8 == 0 and 6 <= k <= 8 and m / 100_000 > 9
        with pytest.raises(ValueError):
            bloom_file_params(10, 2.0)
