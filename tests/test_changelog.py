"""Row-level changelog (T210): per-commit-kind derivation, seq-scoped
interplay with equality deletes, net rewrites, the replay invariant
(fold(changelog) == final table), and range guards."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.changelog import read_changelog
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_from,
    delete_where_eq,
    evolve_schema,
    expire_snapshots,
    merge_into,
    overwrite_snapshot,
    read_snapshot,
    rewrite_data_files,
    rollback_to,
    upsert_eq,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _changes(spark, root, from_id, to_id=None):
    return sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["doc_id"], r[1])
        for r in read_changelog(spark, root, from_id, to_id).collect()
    )


class TestPerCommitKinds:
    def test_all_kinds_full_range(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(i, f"t{i}") for i in range(6)]), root)
        delete_from(spark, root, [("doc_id", "==", 1)])
        delete_where_eq(
            spark, root, spark.createDataFrame([(2,)], "doc_id long")
        )
        upsert_eq(spark, root, _mk(spark, [(3, "t3new"), (9, "t9")]),
                  ["doc_id"])
        rewrite_data_files(spark, root, target_files=1)  # row-preserving
        merge_into(spark, root, _mk(spark, [(4, "t4new"), (8, "t8")]),
                   "doc_id")
        assert _changes(spark, root, 0) == sorted([
            *[(1, "insert", i, f"t{i}") for i in range(6)],
            (2, "delete", 1, "t1"),
            (3, "delete", 2, "t2"),
            (4, "delete", 3, "t3"),
            (4, "insert", 3, "t3new"),
            (4, "insert", 9, "t9"),
            (6, "delete", 4, "t4"),   # netted: untouched rewritten rows
            (6, "insert", 4, "t4new"),  # of the merge slice cancel
            (6, "insert", 8, "t8"),
        ])
        # sub-range sees only its commits
        assert _changes(spark, root, 4, 5) == []

    def test_overwrite_nets_full_swap(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a"), (2, "b")]), root)
        overwrite_snapshot(_mk(spark, [(2, "b"), (3, "c")]), root)
        # row (2,b) carried over → cancels; only the real delta remains
        assert _changes(spark, root, 1) == [
            (2, "delete", 1, "a"),
            (2, "insert", 3, "c"),
        ]

    def test_rollback_reports_reversal(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a")]), root)
        append_snapshot(_mk(spark, [(2, "b")]), root)
        rollback_to(root, 1)
        assert _changes(spark, root, 2) == [(3, "delete", 2, "b")]

    def test_rename_projects_onto_end_schema(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a")]), root)
        evolve_schema(root, rename={"text": "body"})
        df = read_changelog(spark, root, 0)
        assert "body" in df.columns and "text" not in df.columns
        assert df.collect()[0]["body"] == "a"


class TestEqScoping:
    def test_posdelete_on_file_newer_than_entry(self, spark, tmp_path):
        # the row lives in a file NEWER than the eq entry: the entry must
        # not swallow its deletion report
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a")]), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(7,)], "doc_id long")
        )
        append_snapshot(_mk(spark, [(7, "reborn")]), root)  # visible again
        delete_from(spark, root, [("doc_id", "==", 7)])
        assert (4, "delete", 7, "reborn") in _changes(spark, root, 3)

    def test_posdelete_of_already_eq_hidden_row_not_rereported(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a"), (2, "b")]), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(2,)], "doc_id long")
        )
        # position-delete now masks the physically-present but already
        # eq-hidden row 2 — visible-row semantics: nothing new was deleted
        delete_from(spark, root, [("doc_id", ">=", 2)])
        assert _changes(spark, root, 2) == []

    def test_eq_delete_reports_only_visible_matches(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a"), (2, "b")]), root)
        delete_from(spark, root, [("doc_id", "==", 1)])  # 1 already gone
        delete_where_eq(
            spark, root,
            spark.createDataFrame([(1,), (2,)], "doc_id long"),
        )
        assert _changes(spark, root, 2) == [(3, "delete", 2, "b")]


class TestReplayInvariant:
    def test_fold_equals_final_table(self, spark, tmp_path):
        # the changelog IS the table: folding inserts/deletes from empty
        # reproduces the final visible content exactly (multiset)
        from collections import Counter

        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(i, f"t{i}") for i in range(10)]), root)
        delete_where_eq(
            spark, root,
            spark.createDataFrame([(i,) for i in range(0, 10, 3)],
                                  "doc_id long"),
        )
        upsert_eq(spark, root,
                  _mk(spark, [(4, "new4"), (20, "t20")]), ["doc_id"])
        merge_into(spark, root, _mk(spark, [(5, "new5")]), "doc_id")
        delete_from(spark, root, [("doc_id", "<", 2)])
        rewrite_data_files(spark, root, target_files=1)
        state: Counter = Counter()
        for r in read_changelog(spark, root, 0).collect():
            key = (r["doc_id"], r["text"])
            if r["_change_type"] == "insert":
                state[key] += 1
            else:
                state[key] -= 1
        final = Counter(
            (r["doc_id"], r["text"])
            for r in read_snapshot(spark, root).collect()
        )
        assert {k: v for k, v in state.items() if v} == dict(final)


class TestGuards:
    def test_bad_range_and_missing(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a")]), root)
        with pytest.raises(ValueError, match="from_id < to_id"):
            read_changelog(spark, root, 1, 1)
        with pytest.raises(ValueError, match="does not exist"):
            read_changelog(spark, root, 0, 99)

    def test_expired_range_raises(self, spark, tmp_path):
        root = str(tmp_path / "t")
        for i in range(4):
            append_snapshot(_mk(spark, [(i, f"t{i}")]), root)
        expire_snapshots(root, keep_last=2)
        with pytest.raises(ValueError, match="expired"):
            read_changelog(spark, root, 0)
        # retained suffix still works
        assert _changes(spark, root, 3) == [(4, "insert", 3, "t3")]

    def test_empty_range_schema(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_mk(spark, [(1, "a")]), root)
        rewrite_data_files(spark, root, target_files=1)
        df = read_changelog(spark, root, 1, 2)
        assert df.count() == 0
        assert df.columns == [
            "doc_id", "text", "_change_type", "_commit_snapshot_id"
        ]
