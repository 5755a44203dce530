"""T201 rollback (metadata-only rollback_to with non-ancestor history
flags) and T202 binpack partial compaction (rewrite only small/masked
files, carry right-sized files by name)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.metadata_tables import (
    metadata_history,
)
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_from,
    evolve_schema,
    expire_snapshots,
    read_manifest,
    read_snapshot,
    rewrite_small_files,
    rollback_to,
    set_ref,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )


def _ids(spark, root, sid=None):
    return sorted(
        r["doc_id"] for r in read_snapshot(spark, root, sid).collect()
    )


class TestRollback:
    def test_rollback_restores_and_flags_history(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        append_snapshot(_docs(spark, 10, 20), root)
        append_snapshot(_docs(spark, 20, 30), root)
        files_before = read_manifest(root, 3)["files"]
        sid = rollback_to(root, 1)
        assert sid == 4 and current_snapshot_id(root) == 4
        assert _ids(spark, root) == list(range(10))
        # metadata-only: no file was touched, abandoned commits intact
        assert read_manifest(root, 3)["files"] == files_before
        flags = {
            r["snapshot_id"]: r["is_current_ancestor"]
            for r in metadata_history(spark, root).collect()
        }
        assert flags == {1: True, 2: False, 3: False, 4: True}
        assert read_manifest(root, 4)["parent_id"] == 1
        # abandoned snapshots stay time-travelable until expiry
        assert _ids(spark, root, 3) == list(range(30))

    def test_rollback_noop_and_validation(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        assert rollback_to(root, 1) == 1  # already current: no commit
        with pytest.raises(FileNotFoundError):
            rollback_to(root, 99)

    def test_writes_continue_from_rolled_back_state(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        evolve_schema(root, rename={"lang": "language"})
        append_snapshot(
            spark.range(10, 15).select(
                F.col("id").alias("doc_id"), F.lit("de").alias("language")
            ),
            root,
        )
        rollback_to(root, 1)  # back before the rename
        cur = read_snapshot(spark, root)
        assert cur.columns == ["doc_id", "lang"]
        append_snapshot(_docs(spark, 30, 32), root)
        assert _ids(spark, root) == list(range(10)) + [30, 31]

    def test_rollback_then_expire_reclaims_abandoned(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        append_snapshot(_docs(spark, 5, 9), root)
        rollback_to(root, 1)
        set_ref(root, "keep", 3, "tag")
        out = expire_snapshots(root, keep_last=1)
        assert out["expired_snapshots"] >= 1
        # snapshot 2's files (abandoned) are reclaimable; current still reads
        assert _ids(spark, root) == list(range(5))


class TestPartialCompaction:
    def test_untouched_big_file_carried_by_name(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 20000).coalesce(1), root)
        for i in range(3):
            append_snapshot(
                _docs(spark, 20000 + 4 * i, 20004 + 4 * i).coalesce(1), root
            )
        man = read_manifest(root, current_snapshot_id(root))
        big = max(man["file_sizes"], key=man["file_sizes"].get)
        before = _ids(spark, root)
        sid = rewrite_small_files(
            spark, root, target_bytes=50_000, min_input_files=2
        )
        man2 = read_manifest(root, sid)
        assert man2["operation"] == "replace"
        assert big in man2["files"]  # carried, never re-read
        assert len(man2["files"]) < len(man["files"])
        assert _ids(spark, root) == before
        # carried metadata intact
        assert man2["stats"][big] == man["stats"][big]
        assert man2["row_counts"][big] == man["row_counts"][big]

    def test_masked_file_compacts_and_purges_masks(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 20000).coalesce(1), root)
        append_snapshot(_docs(spark, 20000, 20010).coalesce(1), root)
        delete_from(spark, root, [("doc_id", "<", 5)])  # masks the BIG file
        sid = rewrite_small_files(
            spark, root, target_bytes=50_000, min_input_files=1
        )
        man = read_manifest(root, sid)
        assert not man.get("delete_files")
        assert _ids(spark, root) == list(range(5, 20010))

    def test_noop_below_threshold(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 100), root)
        sid = current_snapshot_id(root)
        assert rewrite_small_files(spark, root, target_bytes=1) == sid

    def test_respects_partition_spec(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spec = [{"source": "doc_id", "transform": "bucket[4]"}]
        for i in range(3):
            append_snapshot(
                _docs(spark, i * 10, (i + 1) * 10), root, partition_spec=spec
            )
        before = _ids(spark, root)
        sid = rewrite_small_files(spark, root, target_bytes=10**9)
        man = read_manifest(root, sid)
        # every output file carries a bucket tuple under the table spec
        assert all(
            man["partitions"].get(f) for f in man["files"]
        )
        assert _ids(spark, root) == before

    def test_legacy_manifest_without_sizes_falls_back(self, spark, tmp_path):
        import json

        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            _manifest_path,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10).coalesce(1), root)
        append_snapshot(_docs(spark, 10, 20).coalesce(1), root)
        p = _manifest_path(root, 2)
        man = json.load(open(p))
        man.pop("file_sizes")
        json.dump(man, open(p, "w"))
        sid = rewrite_small_files(spark, root, target_bytes=10**9)
        assert sid == 3
        assert _ids(spark, root) == list(range(20))


class TestPositionDeleteCompaction:
    def test_masks_merge_to_one_per_file(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            rewrite_position_deletes,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 100).coalesce(1), root)
        delete_from(spark, root, [("doc_id", "<", 5)])
        delete_from(spark, root, [("doc_id", ">=", 95)])
        delete_from(spark, root, [("doc_id", "==", 50)])
        man = read_manifest(root, current_snapshot_id(root))
        (data_file,) = man["files"]
        assert len(man["delete_files"][data_file]) == 3
        before = _ids(spark, root)
        sid = rewrite_position_deletes(spark, root)
        man2 = read_manifest(root, sid)
        assert man2["files"] == man["files"]  # data files untouched
        assert len(man2["delete_files"][data_file]) == 1
        assert _ids(spark, root) == before
        assert man2["summary"]["properties"]["rewritten_delete_files"] == 3
        # no multi-mask files left -> no-op
        assert rewrite_position_deletes(spark, root) == sid

    def test_superseded_masks_reclaimed_after_expiry(self, spark, tmp_path):
        import os

        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            remove_orphan_files,
            rewrite_position_deletes,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 100).coalesce(1), root)
        delete_from(spark, root, [("doc_id", "<", 5)])
        delete_from(spark, root, [("doc_id", ">=", 95)])
        rewrite_position_deletes(spark, root)
        out = expire_snapshots(root, keep_last=1)
        # the two superseded del-files were referenced ONLY by the expired
        # snapshots — expiry itself reclaims them (orphan sweep for debris)
        assert out["deleted_files"] >= 2
        remove_orphan_files(root, older_than_s=0.0)
        assert _ids(spark, root) == list(range(5, 95))
