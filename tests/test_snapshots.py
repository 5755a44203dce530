"""Snapshot-versioned parquet tables (the executable Iceberg analogue):
atomic commits, time travel, crash semantics, conflicts, expiry, and the
time-travel CDC composition with snapshot_diff (T22 × T55)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    CommitConflictError,
    _commit,
    _manifest_path,
    _write_data_files,
    append_snapshot,
    current_snapshot_id,
    expire_snapshots,
    init_table,
    overwrite_snapshot,
    read_manifest,
    read_snapshot,
    remove_orphan_files,
    snapshot_log,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of document "), F.col("id")).alias("text"),
    )


def _rows(df):
    return sorted((r["doc_id"], r["text"]) for r in df.collect())


class TestCommitAndTimeTravel:
    def test_append_then_read_current(self, spark, tmp_path):
        root = str(tmp_path / "t")
        s1 = append_snapshot(_docs(spark, 0, 50), root)
        assert s1 == 1 == current_snapshot_id(root)
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 0, 50))

    def test_time_travel_is_byte_identical_to_pre_append_state(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 50), root)
        before = _rows(read_snapshot(spark, root, 1))
        s2 = append_snapshot(_docs(spark, 50, 80), root)
        assert s2 == 2
        # snapshot N-1 read AFTER N lands == the pre-append state, exactly
        assert _rows(read_snapshot(spark, root, 1)) == before
        assert _rows(read_snapshot(spark, root, 2)) == _rows(
            _docs(spark, 0, 80)
        )

    def test_overwrite_keeps_history(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        overwrite_snapshot(_docs(spark, 100, 105), root)
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 100, 105))
        assert _rows(read_snapshot(spark, root, 1)) == _rows(_docs(spark, 0, 10))
        ops = [m["operation"] for m in snapshot_log(root)]
        assert ops == ["append", "overwrite"]

    def test_empty_table_raises(self, spark, tmp_path):
        root = str(tmp_path / "t")
        init_table(root)
        with pytest.raises(ValueError, match="no committed snapshot"):
            read_snapshot(spark, root)


class TestCrashSemantics:
    def test_crash_before_manifest_is_invisible(self, spark, tmp_path):
        # writer dies after moving data files but before the manifest link:
        # readers see the old snapshot; orphans are reclaimable
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        before = _rows(read_snapshot(spark, root))
        _write_data_files(_docs(spark, 10, 20), root)  # crash: no _commit
        assert current_snapshot_id(root) == 1
        assert _rows(read_snapshot(spark, root)) == before
        # a later writer is not blocked
        append_snapshot(_docs(spark, 20, 30), root)
        assert current_snapshot_id(root) == 2
        # the crashed writer's files are orphans: swept once old enough
        assert remove_orphan_files(root, older_than_s=0.0) > 0
        assert _rows(read_snapshot(spark, root, 2)) == _rows(
            _docs(spark, 0, 10).union(_docs(spark, 20, 30))
        )

    def test_crash_after_manifest_is_committed(self, spark, tmp_path):
        # writer dies between manifest link and hint swap: the commit is
        # durable — readers roll forward over the stale hint
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        files, n, schema_json, _st, _pt, _rc, _fz = _write_data_files(_docs(spark, 10, 20), root)
        prior = read_manifest(root, 1)["files"]
        _commit(root, 1, prior + files, files, n, schema_json, "append")
        # simulate the crash: reset the hint to the stale value
        hint = os.path.join(root, "metadata", "version-hint.text")
        with open(hint, "w") as f:
            f.write("1")
        assert current_snapshot_id(root) == 2  # rolled forward
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 0, 20))

    def test_conflicting_writers_one_wins(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        # two writers prepared against parent=1; the second to commit loses
        f_a, n_a, sj, _sa, _pa, _ra, _fa = _write_data_files(_docs(spark, 10, 20), root)
        f_b, n_b, _, _sb, _pb, _rb, _fb = _write_data_files(_docs(spark, 20, 30), root)
        prior = read_manifest(root, 1)["files"]
        _commit(root, 1, prior + f_a, f_a, n_a, sj, "append")
        with pytest.raises(CommitConflictError):
            _commit(root, 1, prior + f_b, f_b, n_b, sj, "append")
        # loser retries against the new parent and succeeds
        prior2 = read_manifest(root, 2)["files"]
        _commit(root, 2, prior2 + f_b, f_b, n_b, sj, "append")
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 0, 30))

    def test_manifest_name_never_has_partial_content(self, tmp_path, spark):
        # the published manifest must always parse (link-from-fsynced-tmp)
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        with open(_manifest_path(root, 1)) as f:
            man = json.load(f)
        assert man["snapshot_id"] == 1 and man["files"]


class TestExpiry:
    def test_expire_keeps_referenced_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)    # s1
        append_snapshot(_docs(spark, 10, 20), root)   # s2 inherits s1 files
        overwrite_snapshot(_docs(spark, 50, 55), root)  # s3 references new only
        stats = expire_snapshots(root, keep_last=1)
        assert stats["expired_snapshots"] == 2
        assert stats["deleted_files"] > 0  # s1/s2 files were orphaned by s3
        assert [m["snapshot_id"] for m in snapshot_log(root)] == [3]
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 50, 55))
        with pytest.raises(FileNotFoundError):
            read_snapshot(spark, root, 1)

    def test_expire_never_deletes_inherited_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        append_snapshot(_docs(spark, 10, 20), root)
        stats = expire_snapshots(root, keep_last=1)
        # s2 inherits every s1 file: expiry may drop the manifest only
        assert stats == {"expired_snapshots": 1, "deleted_files": 0}
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 0, 20))

    def test_validation_and_noop(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        with pytest.raises(ValueError):
            expire_snapshots(root, keep_last=0)
        assert expire_snapshots(root, keep_last=5) == {
            "expired_snapshots": 0,
            "deleted_files": 0,
        }


class TestRewriteDataFiles:
    def test_compaction_preserves_rows_and_history(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_manifest,
            rewrite_data_files,
        )

        root = str(tmp_path / "t")
        # many small commits (the streaming daily-append pattern)
        for lo in range(0, 40, 10):
            append_snapshot(_docs(spark, lo, lo + 10).repartition(4), root)
        before = _rows(read_snapshot(spark, root))
        pre_files = read_manifest(root, current_snapshot_id(root))["files"]
        sid = rewrite_data_files(spark, root, target_files=1)
        man = read_manifest(root, sid)
        assert man["operation"] == "replace"
        assert len(man["files"]) == 1 < len(pre_files)
        assert _rows(read_snapshot(spark, root)) == before  # pure rewrite
        # pre-compaction history still time-travels
        assert _rows(read_snapshot(spark, root, sid - 1)) == before
        assert _rows(read_snapshot(spark, root, 1)) == _rows(_docs(spark, 0, 10))
        # expiry after compaction reclaims the small files
        stats = expire_snapshots(root, keep_last=1)
        assert stats["deleted_files"] == len(pre_files)
        assert _rows(read_snapshot(spark, root)) == before

    def test_validation(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            rewrite_data_files,
        )

        root = str(tmp_path / "t")
        init_table(root)
        with pytest.raises(ValueError, match="no committed snapshot"):
            rewrite_data_files(spark, root)
        append_snapshot(_docs(spark, 0, 5), root)
        with pytest.raises(ValueError):
            rewrite_data_files(spark, root, target_files=0)


class TestMergeInto:
    def _table_with_files(self, spark, tmp_path, n_files=4):
        root = str(tmp_path / "t")
        # one commit, n_files data files, keys range-partitioned so a merge
        # source can target a known subset of files
        df = _docs(spark, 0, 40).repartitionByRange(n_files, "doc_id")
        append_snapshot(df, root)
        return root

    def test_file_granular_copy_on_write(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            merge_into,
            read_manifest,
        )

        root = self._table_with_files(spark, tmp_path)
        pre = read_manifest(root, 1)["files"]
        # update keys 0 and 3 (same range file) + insert brand-new key 100
        source = spark.createDataFrame(
            [(0, "updated zero"), (3, "updated three"), (100, "brand new")],
            "doc_id long, text string",
        )
        sid = merge_into(spark, root, source, "doc_id")
        man = read_manifest(root, sid)
        assert man["operation"] == "merge"
        # copy-on-write at file granularity: files without matched keys are
        # carried BY NAME into the new manifest, never rewritten
        carried = set(man["files"]) & set(pre)
        assert len(carried) == len(pre) - 1  # exactly one file was affected
        # row semantics: WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT
        got = dict(_rows(read_snapshot(spark, root)))
        assert got[0] == "updated zero" and got[3] == "updated three"
        assert got[100] == "brand new"
        assert got[5] == "text of document 5"  # unmatched rows intact
        assert len(got) == 41
        # pre-merge history still time-travels
        assert _rows(read_snapshot(spark, root, 1)) == _rows(_docs(spark, 0, 40))

    def test_merge_with_no_matches_is_pure_insert(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            merge_into,
            read_manifest,
        )

        root = self._table_with_files(spark, tmp_path)
        pre = read_manifest(root, 1)["files"]
        sid = merge_into(
            spark, root, _docs(spark, 200, 210), "doc_id"
        )
        man = read_manifest(root, sid)
        assert set(pre) <= set(man["files"])  # nothing rewritten
        assert len(_rows(read_snapshot(spark, root))) == 50

    def test_merge_validation(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            merge_into,
        )

        root = str(tmp_path / "t")
        init_table(root)
        with pytest.raises(ValueError, match="no committed snapshot"):
            merge_into(spark, root, _docs(spark, 0, 1), "doc_id")
        append_snapshot(_docs(spark, 0, 5), root)
        bad = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="columns"):
            merge_into(spark, root, bad, "doc_id")


class TestIncrementalReads:
    def test_appends_between_returns_only_the_delta(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_appends_between,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 20), root)
        append_snapshot(_docs(spark, 20, 30), root)
        append_snapshot(_docs(spark, 30, 45), root)
        assert _rows(read_appends_between(spark, root, 1, 2)) == _rows(
            _docs(spark, 20, 30)
        )
        # spanning two appends
        assert _rows(read_appends_between(spark, root, 1, 3)) == _rows(
            _docs(spark, 20, 45)
        )

    def test_rejects_non_append_boundaries(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            merge_into,
            read_appends_between,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        merge_into(
            spark,
            root,
            spark.createDataFrame([(0, "upd")], "doc_id long, text string"),
            "doc_id",
        )
        append_snapshot(_docs(spark, 50, 55), root)
        with pytest.raises(ValueError, match="merge"):
            read_appends_between(spark, root, 1, 3)
        # a pure-append subrange is still fine
        assert _rows(read_appends_between(spark, root, 2, 3)) == _rows(
            _docs(spark, 50, 55)
        )
        with pytest.raises(ValueError):
            read_appends_between(spark, root, 2, 2)


class TestSchemaEvolution:
    def test_add_column_reads_null_for_old_files(self, spark, tmp_path):
        # Iceberg-style by-name evolution: a later append may carry a new
        # column; the snapshot's schema governs the read, and rows from
        # pre-evolution files surface NULL for it — no rewrite of old data
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        evolved = _docs(spark, 10, 20).withColumn("lang", F.lit("en"))
        append_snapshot(evolved, root)
        cur = read_snapshot(spark, root)
        assert set(cur.columns) == {"doc_id", "text", "lang"}
        langs = {r["doc_id"]: r["lang"] for r in cur.collect()}
        assert all(langs[i] is None for i in range(10))
        assert all(langs[i] == "en" for i in range(10, 20))
        # time travel to the pre-evolution snapshot keeps the OLD schema
        assert set(read_snapshot(spark, root, 1).columns) == {"doc_id", "text"}


class TestTimeTravelCdc:
    def test_snapshot_diff_over_two_versions(self, spark, tmp_path):
        # T22 x T55: CDC computed purely from the table's own history —
        # diff(version N-1, version N) without any external "yesterday" copy
        from pdf_drawing_ocr_recognition_spark.operators.cdc import (
            snapshot_diff,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 30), root)
        changed = _docs(spark, 0, 40).withColumn(
            "text",
            F.when(F.col("doc_id") < 5, F.lit("edited")).otherwise(
                F.col("text")
            ),
        )
        overwrite_snapshot(changed, root)
        sid = current_snapshot_id(root)
        diff = snapshot_diff(
            read_snapshot(spark, root, sid - 1),
            read_snapshot(spark, root, sid),
            "doc_id",
            ["text"],
        )
        counts = {
            r["change_type"]: r["n"]
            for r in diff.groupBy("change_type").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert counts == {"changed": 5, "unchanged": 25, "added": 10}


class TestManifestStats:
    """Round-5: Iceberg's manifest-level column statistics — per-file
    min/max bounds recorded at commit from the parquet footers, inherited
    by name, and used to prune files from a scan plan WITHOUT opening
    them."""

    def _ranged(self, spark, tmp_path, n=800, files=8):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            plan_scan,
        )

        root = str(tmp_path / "t")
        df = _docs(spark, 0, n).repartitionByRange(files, "doc_id")
        append_snapshot(df, root)
        return root, plan_scan

    def test_bounds_recorded_and_prune_skips_dead_files(self, spark, tmp_path):
        root, plan_scan = self._ranged(spark, tmp_path)
        man = read_manifest(root, 1)
        assert len(man["files"]) == 8
        for f in man["files"]:
            assert "doc_id" in man["stats"][f]  # numeric bounds recorded
        kept, skipped = plan_scan(root, 1, [("doc_id", ">=", 700)])
        # range-partitioned on doc_id: only the top range file(s) survive
        assert len(skipped) >= 6 and len(kept) + len(skipped) == 8
        kept_eq, skipped_eq = plan_scan(root, 1, [("doc_id", "==", 5)])
        assert len(kept_eq) == 1 and len(skipped_eq) == 7

    def test_pruned_read_equals_full_filter(self, spark, tmp_path):
        root, _ = self._ranged(spark, tmp_path)
        for filt in ([("doc_id", ">=", 700)], [("doc_id", "<", 100)],
                     [("doc_id", "==", 5)],
                     [("doc_id", ">=", 100), ("doc_id", "<=", 150)]):
            pruned = read_snapshot(spark, root, 1, filters=filt)
            full = read_snapshot(spark, root, 1)
            for col, op, val in filt:
                import operator as _op
                ops = {"==": _op.eq, ">=": _op.ge, ">": _op.gt,
                       "<=": _op.le, "<": _op.lt}
                full = full.filter(ops[op](F.col(col), F.lit(val)))
            assert _rows(pruned) == _rows(full), filt

    def test_all_files_pruned_returns_typed_empty(self, spark, tmp_path):
        root, plan_scan = self._ranged(spark, tmp_path)
        kept, skipped = plan_scan(root, 1, [("doc_id", ">", 10_000)])
        assert kept == [] and len(skipped) == 8
        got = read_snapshot(spark, root, 1, filters=[("doc_id", ">", 10_000)])
        assert got.count() == 0 and got.columns == ["doc_id", "text"]

    def test_stats_inherited_by_name_on_append_and_merge(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            merge_into,
            plan_scan,
        )

        root = str(tmp_path / "t")
        append_snapshot(
            _docs(spark, 0, 400).repartitionByRange(4, "doc_id"), root
        )
        append_snapshot(
            _docs(spark, 400, 800).repartitionByRange(4, "doc_id"), root
        )
        man2 = read_manifest(root, 2)
        assert len(man2["files"]) == 8
        assert all("doc_id" in man2["stats"][f] for f in man2["files"])
        # merge touching only the top range: untouched files carry bounds
        upd = _docs(spark, 780, 800).withColumn("text", F.lit("merged"))
        merge_into(spark, root, upd, "doc_id")
        man3 = read_manifest(root, 3)
        assert all("doc_id" in man3["stats"][f] for f in man3["files"])
        kept, skipped = plan_scan(root, 3, [("doc_id", "<", 100)])
        assert len(skipped) >= 5  # pruning still effective post-merge
        got = read_snapshot(spark, root, 3, filters=[("doc_id", ">=", 780)])
        assert {r["text"] for r in got.collect()} == {"merged"}

    def test_unknown_column_bounds_never_prune(self, spark, tmp_path):
        """A column without recorded bounds (here: a >64-char string) must
        keep every file — pruning is never optimistic."""
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            plan_scan,
        )

        root = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("x" * 80), F.col("id").cast("string")).alias("text"),
        ).repartitionByRange(4, "doc_id")
        append_snapshot(df, root)
        man = read_manifest(root, 1)
        assert all("text" not in man["stats"][f] for f in man["files"])
        kept, skipped = plan_scan(root, 1, [("text", ">=", "zzz")])
        assert skipped == [] and len(kept) == 4
        # row-wise filter still applies even though nothing was pruned
        assert read_snapshot(
            spark, root, 1, filters=[("text", ">=", "zzz")]
        ).count() == 0

    def test_string_bounds_prune(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            plan_scan,
        )

        root = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(0, "en"), (1, "en"), (2, "fr"), (3, "fr")],
            "doc_id long, lang string",
        ).repartitionByRange(2, "lang")
        append_snapshot(df, root)
        kept, skipped = plan_scan(root, 1, [("lang", "==", "fr")])
        assert len(kept) == 1 and len(skipped) == 1
        got = read_snapshot(spark, root, 1, filters=[("lang", "==", "fr")])
        assert sorted(r["doc_id"] for r in got.collect()) == [2, 3]


class TestPositionDeletes:
    """Iceberg v2 merge-on-read DELETE: position-delete files masked at
    scan time, data files never rewritten, compaction purges the masks."""

    def _table(self, spark, tmp_path):
        root = str(tmp_path / "mor")
        append_snapshot(_docs(spark, 0, 100), root)
        return root

    def test_delete_masks_rows_without_rewriting_data_files(
        self, spark, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        files_before = read_manifest(root, 1)["files"]
        sid = delete_from(spark, root, [("doc_id", "<", 30)])
        assert sid == 2
        man = read_manifest(root, 2)
        # same data files, BY NAME — the delete rewrote nothing
        assert man["files"] == files_before
        assert man["operation"] == "delete"
        assert man["delete_files"], "delete files must be recorded"
        got = _rows(read_snapshot(spark, root))
        want = _rows(_docs(spark, 30, 100))
        assert got == want

    def test_time_travel_ignores_later_deletes(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", ">=", 50)])
        assert _rows(read_snapshot(spark, root, snapshot_id=1)) == _rows(
            _docs(spark, 0, 100)
        )

    def test_deletes_accumulate_across_commits(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 10)])
        delete_from(spark, root, [("doc_id", ">=", 90)])
        got = _rows(read_snapshot(spark, root))
        assert got == _rows(_docs(spark, 10, 90))
        # second delete carries the first commit's masks forward
        man = read_manifest(root, current_snapshot_id(root))
        n_masks = sum(len(v) for v in man["delete_files"].values())
        assert n_masks >= 2

    def test_empty_delete_commits_nothing(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        sid = delete_from(spark, root, [("doc_id", ">=", 1000)])
        assert sid == 1 == current_snapshot_id(root)

    def test_overlapping_delete_records_no_duplicate_positions(
        self, spark, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 40)])
        # overlaps [0, 40) — only [40, 60) is newly dead
        delete_from(spark, root, [("doc_id", "<", 60)])
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 60, 100))

    def test_compaction_applies_and_purges_masks(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
            rewrite_data_files,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 25)])
        sid = rewrite_data_files(spark, root, target_files=1)
        man = read_manifest(root, sid)
        assert man["delete_files"] == {}
        assert len(man["files"]) == 1
        assert _rows(read_snapshot(spark, root)) == _rows(_docs(spark, 25, 100))

    def test_merge_into_over_masked_table(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
            merge_into,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 10)])
        source = spark.createDataFrame(
            [(5, "resurrect?"), (50, "updated"), (200, "inserted")],
            "doc_id long, text string",
        )
        merge_into(spark, root, source, "doc_id")
        rows = dict(_rows(read_snapshot(spark, root)))
        # doc 5 was deleted, so MERGE sees it as NOT MATCHED -> insert
        assert rows[5] == "resurrect?"
        assert rows[50] == "updated"
        assert rows[200] == "inserted"
        assert 7 not in rows  # other deleted rows stay dead through merge
        assert rows[60] == "text of document 60"

    def test_expiry_keeps_masks_of_retained_snapshots(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 30)])
        append_snapshot(_docs(spark, 100, 110), root)
        expire_snapshots(root, keep_last=2)
        got = _rows(read_snapshot(spark, root))
        assert got == _rows(_docs(spark, 30, 110))

    def test_incremental_appends_refuse_delete_boundaries(
        self, spark, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
            read_appends_between,
        )

        root = self._table(spark, tmp_path)
        delete_from(spark, root, [("doc_id", "<", 30)])
        append_snapshot(_docs(spark, 100, 110), root)
        with pytest.raises(ValueError, match="delete"):
            read_appends_between(spark, root, 1, 3)

    def test_pruned_filtered_read_composes_with_deletes(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = str(tmp_path / "morp")
        # two appends -> distinct files with disjoint doc_id bounds
        append_snapshot(_docs(spark, 0, 50).coalesce(1), root)
        append_snapshot(_docs(spark, 50, 100).coalesce(1), root)
        delete_from(spark, root, [("doc_id", ">=", 80)])
        got = _rows(
            read_snapshot(spark, root, filters=[("doc_id", ">=", 40)])
        )
        assert got == _rows(_docs(spark, 40, 80))

    def test_delete_validation(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            delete_from,
        )

        root = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match="unsupported delete op"):
            delete_from(spark, root, [("doc_id", "!=", 3)])
        with pytest.raises(ValueError, match="unknown column"):
            delete_from(spark, root, [("nope", "<", 3)])
        with pytest.raises(ValueError, match="no committed snapshot"):
            delete_from(spark, str(tmp_path / "void"), [("doc_id", "<", 3)])


class TestRefs:
    """Iceberg branches/tags: pinned named reads, WAP publish flow,
    ref'd snapshots as retention roots."""

    def test_tag_pins_a_read_point(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
            set_ref,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 30), root)
        set_ref(root, "v1", 1, ref_type="tag")
        append_snapshot(_docs(spark, 30, 60), root)
        got = _rows(read_snapshot(spark, root, ref="v1"))
        assert got == _rows(_docs(spark, 0, 30))
        # default reader follows the tip
        assert len(_rows(read_snapshot(spark, root))) == 60

    def test_tags_are_immutable_branches_move(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            resolve_ref,
            set_ref,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        append_snapshot(_docs(spark, 10, 20), root)
        set_ref(root, "rel", 1, ref_type="tag")
        with pytest.raises(ValueError, match="immutable"):
            set_ref(root, "rel", 2, ref_type="tag")
        set_ref(root, "main", 1)
        set_ref(root, "main", 2)  # branches re-point (the publish step)
        assert resolve_ref(root, "main") == 2

    def test_write_audit_publish_flow(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
            resolve_ref,
            set_ref,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 20), root)
        set_ref(root, "published", 1)
        # writer lands snapshot 2; consumers on the ref still see 1
        append_snapshot(_docs(spark, 20, 40), root)
        assert len(_rows(read_snapshot(spark, root, ref="published"))) == 20
        # audit passes -> fast-forward the branch
        audited = current_snapshot_id(root)
        set_ref(root, "published", audited)
        assert resolve_ref(root, "published") == 2
        assert len(_rows(read_snapshot(spark, root, ref="published"))) == 40

    def test_expiry_keeps_ref_snapshots(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
            set_ref,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        set_ref(root, "keepme", 1, ref_type="tag")
        for k in range(1, 5):
            overwrite_snapshot(_docs(spark, 10 * k, 10 * k + 10), root)
        out = expire_snapshots(root, keep_last=1)
        assert out["expired_snapshots"] == 3  # 2,3,4 — never 1 (tagged)
        assert _rows(read_snapshot(spark, root, ref="keepme")) == _rows(
            _docs(spark, 0, 10)
        )

    def test_validation(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            drop_ref,
            read_snapshot,
            resolve_ref,
            set_ref,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        with pytest.raises(ValueError, match="does not exist"):
            set_ref(root, "x", 9)
        with pytest.raises(ValueError, match="branch|tag"):
            set_ref(root, "x", 1, ref_type="commitish")
        with pytest.raises(ValueError, match="unknown ref"):
            resolve_ref(root, "nope")
        with pytest.raises(ValueError, match="unknown ref"):
            drop_ref(root, "nope")
        set_ref(root, "x", 1)
        with pytest.raises(ValueError, match="at most one"):
            read_snapshot(spark, root, snapshot_id=1, ref="x")
        drop_ref(root, "x")
        with pytest.raises(ValueError, match="unknown ref"):
            read_snapshot(spark, root, ref="x")
