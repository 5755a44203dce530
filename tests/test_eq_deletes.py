"""Iceberg v2 equality deletes + sequence numbers (T208): O(keys) delete
commits, the strict seq< scoping rule, one-commit upserts, null-safe
matching, rename/widen-proof key resolution, compaction purge, and the
expiry/orphan lifecycle of eqdel files."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.consumer_offsets import (
    ack,
    next_appends,
)
from pdf_drawing_ocr_recognition_spark.sources.metadata_tables import (
    metadata_files,
)
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_from,
    delete_where_eq,
    evolve_schema,
    expire_snapshots,
    read_appends_between,
    read_manifest,
    read_snapshot,
    remove_orphan_files,
    rewrite_data_files,
    rewrite_small_files,
    rollback_to,
    upsert_eq,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def _ids(spark, root, **kw):
    return sorted(
        r["doc_id"] for r in read_snapshot(spark, root, **kw).collect()
    )


class TestEqualityDelete:
    def test_delete_and_time_travel(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        keys = spark.createDataFrame([(2,), (5,)], "doc_id long")
        sid = delete_where_eq(spark, root, keys)
        assert _ids(spark, root) == [0, 1, 3, 4, 6, 7, 8, 9]
        # pre-delete snapshot unaffected (time travel)
        assert _ids(spark, root, snapshot_id=sid - 1) == list(range(10))
        # no data file was rewritten, none added
        man = read_manifest(root, sid)
        assert man["files"] == read_manifest(root, sid - 1)["files"]
        assert man["operation"] == "eq-delete"
        assert man["eq_deletes"][0]["n_rows"] == 2

    def test_sequence_scoping_later_append_visible(self, spark, tmp_path):
        # THE v2 semantic: the entry deletes only from files written
        # strictly before it — a later append of the same key survives.
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(3,)], "doc_id long")
        )
        assert _ids(spark, root) == [0, 1, 2, 4]
        append_snapshot(
            spark.createDataFrame([(3, "reborn")], "doc_id long, text string"),
            root,
        )
        rows = {
            r["doc_id"]: r["text"]
            for r in read_snapshot(spark, root).collect()
        }
        assert rows[3] == "reborn"
        assert len(rows) == 5

    def test_stacked_entries_and_multi_keysets(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,)], "doc_id long")
        )
        # second entry on a DIFFERENT keyset (text)
        delete_where_eq(
            spark, root,
            spark.createDataFrame([("text 7",)], "text string"),
        )
        assert _ids(spark, root) == [0, 2, 3, 4, 5, 6, 8, 9]
        man = read_manifest(root, current_snapshot_id(root))
        assert len(man["eq_deletes"]) == 2

    def test_null_safe_matching(self, spark, tmp_path):
        # the Iceberg spec requires null == null for equality deletes
        root = str(tmp_path / "t")
        append_snapshot(
            spark.createDataFrame(
                [(1, "a"), (2, None), (3, "c")], "doc_id long, text string"
            ),
            root,
        )
        delete_where_eq(
            spark, root,
            spark.createDataFrame([(None,)], "text string"),
        )
        assert _ids(spark, root) == [1, 3]

    def test_composite_key(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(
            spark.createDataFrame(
                [(1, "a"), (1, "b"), (2, "a")], "k long, v string"
            ),
            root,
        )
        delete_where_eq(
            spark, root, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        got = sorted(
            (r["k"], r["v"]) for r in read_snapshot(spark, root).collect()
        )
        assert got == [(1, "b"), (2, "a")]

    def test_empty_keys_and_unknown_column(self, spark, tmp_path):
        root = str(tmp_path / "t")
        sid = append_snapshot(_docs(spark, 0, 3), root)
        empty = spark.createDataFrame([], "doc_id long")
        assert delete_where_eq(spark, root, empty) == sid  # no empty commit
        with pytest.raises(ValueError, match="unknown key column"):
            delete_where_eq(
                spark, root, spark.createDataFrame([(1,)], "nope long")
            )
        # wider key type than the column is refused (cast could wrap)
        append_snapshot(
            spark.createDataFrame([(1, 2)], "doc_id long, small int"),
            root,
        )
        with pytest.raises(ValueError, match="does not match table type"):
            delete_where_eq(
                spark, root, spark.createDataFrame([(2,)], "small long")
            )

    def test_position_and_equality_deletes_stack(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 8), root)
        delete_from(spark, root, [("doc_id", "==", 1)])
        delete_where_eq(
            spark, root, spark.createDataFrame([(4,)], "doc_id long")
        )
        assert _ids(spark, root) == [0, 2, 3, 5, 6, 7]


class TestUpsert:
    def test_one_commit_upsert(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        parent = current_snapshot_id(root)
        batch = spark.createDataFrame(
            [(2, "v2new"), (9, "v9")], "doc_id long, text string"
        )
        sid = upsert_eq(spark, root, batch, ["doc_id"])
        assert sid == parent + 1  # ONE commit
        rows = {
            r["doc_id"]: r["text"]
            for r in read_snapshot(spark, root).collect()
        }
        assert rows[2] == "v2new" and rows[9] == "v9" and len(rows) == 6
        # time travel to parent: old version intact
        old = {
            r["doc_id"]: r["text"]
            for r in read_snapshot(spark, root, parent).collect()
        }
        assert old[2] == "text 2" and 9 not in old

    def test_duplicate_key_in_batch_fails(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 3), root)
        dup = spark.createDataFrame(
            [(1, "a"), (1, "b")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="duplicate key"):
            upsert_eq(spark, root, dup, ["doc_id"])

    def test_upsert_bootstrap_and_chain(self, spark, tmp_path):
        # empty table → plain append; repeated upserts converge last-wins
        root = str(tmp_path / "t")
        b1 = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        upsert_eq(spark, root, b1, ["doc_id"])
        assert _ids(spark, root) == [1]
        for i, txt in enumerate(["b", "c", "d"]):
            upsert_eq(
                spark, root,
                spark.createDataFrame(
                    [(1, txt)], "doc_id long, text string"
                ),
                ["doc_id"],
            )
        rows = read_snapshot(spark, root).collect()
        assert len(rows) == 1 and rows[0]["text"] == "d"


class TestSchemaEvolutionInterplay:
    def test_rename_proof(self, spark, tmp_path):
        # entry recorded by field id keeps applying after a rename
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 6), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(2,)], "doc_id long")
        )
        evolve_schema(root, rename={"doc_id": "document_id"})
        got = sorted(
            r["document_id"] for r in read_snapshot(spark, root).collect()
        )
        assert got == [0, 1, 3, 4, 5]

    def test_widen_proof(self, spark, tmp_path):
        # int key column widened to long after the delete: keys cast up
        root = str(tmp_path / "t")
        append_snapshot(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
            root,
        )
        delete_where_eq(spark, root, spark.createDataFrame([(2,)], "k int"))
        append_snapshot(
            spark.createDataFrame([(5_000_000_000, "big")], "k long, v string"),
            root,
        )
        got = sorted(r["k"] for r in read_snapshot(spark, root).collect())
        assert got == [1, 5_000_000_000]


class TestMaintenanceInterplay:
    def test_major_compaction_applies_and_purges(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(0,), (9,)], "doc_id long")
        )
        before = _ids(spark, root)
        sid = rewrite_data_files(spark, root, target_files=2)
        man = read_manifest(root, sid)
        assert man["eq_deletes"] == []  # purged: every file re-sequenced
        assert _ids(spark, root) == before == [1, 2, 3, 4, 5, 6, 7, 8]

    def test_partial_compaction_never_resurrects(self, spark, tmp_path):
        # rewriting a file applies the entry to ITS rows; the new file's
        # fresh sequence must not bring deleted rows back
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 4).coalesce(1), root)
        append_snapshot(_docs(spark, 4, 8).coalesce(1), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,), (5,)], "doc_id long")
        )
        sid = rewrite_small_files(spark, root, target_bytes=1 << 30)
        assert sid > 3  # both small files rewritten
        assert _ids(spark, root) == [0, 2, 3, 4, 6, 7]

    def test_rollback_restores_entries(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        s2 = delete_where_eq(
            spark, root, spark.createDataFrame([(0,)], "doc_id long")
        )
        rewrite_data_files(spark, root, target_files=1)  # purges the entry
        rollback_to(root, s2)
        assert _ids(spark, root) == [1, 2, 3, 4]
        man = read_manifest(root, current_snapshot_id(root))
        assert len(man["eq_deletes"]) == 1

    def test_expiry_keeps_live_eqdel_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 6), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(3,)], "doc_id long")
        )
        append_snapshot(_docs(spark, 6, 8), root)
        expire_snapshots(root, keep_last=1)
        remove_orphan_files(root, older_than_s=0.0)
        # the entry is still live in the current manifest → file retained
        assert _ids(spark, root) == [0, 1, 2, 4, 5, 6, 7]

    def test_expiry_reclaims_dead_eqdel_files(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 6), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(3,)], "doc_id long")
        )
        rewrite_data_files(spark, root, target_files=1)  # entry now dead
        data = os.path.join(root, "data")
        assert any(f.startswith("eqdel-") for f in os.listdir(data))
        expire_snapshots(root, keep_last=1)
        remove_orphan_files(root, older_than_s=0.0)
        assert not any(f.startswith("eqdel-") for f in os.listdir(data))
        assert _ids(spark, root) == [0, 1, 2, 4, 5]


class TestConsumersAndMetadata:
    def test_incremental_read_refuses_eq_delete(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 3), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,)], "doc_id long")
        )
        append_snapshot(_docs(spark, 3, 5), root)
        with pytest.raises(ValueError, match="eq-delete"):
            read_appends_between(spark, root, 1, 3)

    def test_consumer_tails_across_upsert_with_opt_in(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 3), root)
        _f, to_id, df = next_appends(spark, root, "c")
        ack(root, "c", to_id)
        upsert_eq(
            spark, root,
            spark.createDataFrame(
                [(1, "new"), (7, "seven")], "doc_id long, text string"
            ),
            ["doc_id"],
        )
        with pytest.raises(ValueError, match="upsert"):
            next_appends(spark, root, "c")
        _f, to_id, df = next_appends(spark, root, "c", skip_non_appends=True)
        got = sorted(
            (r["doc_id"], r["text"]) for r in df.collect()
        )  # the new row versions, exactly once
        assert got == [(1, "new"), (7, "seven")]

    def test_files_table_sequences(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 4).coalesce(1), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,)], "doc_id long")
        )
        append_snapshot(_docs(spark, 4, 6).coalesce(1), root)
        mf = {r["file"]: r for r in metadata_files(spark, root).collect()}
        seqs = sorted(r["data_sequence_number"] for r in mf.values())
        assert seqs == [1, 3]
        by_seq = {r["data_sequence_number"]: r for r in mf.values()}
        assert by_seq[1]["n_eq_deletes"] == 1  # older file: entry applies
        assert by_seq[3]["n_eq_deletes"] == 0  # newer file: out of scope

    def test_vectorized_path_when_no_entry_applies(self, spark, tmp_path):
        # after the delete, a fresh append reads through the plain scan —
        # its plan slice has no join; the older file group carries the anti
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 4), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,)], "doc_id long")
        )
        rewrite_data_files(spark, root, target_files=1)
        plan = read_snapshot(
            spark, root
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # entries purged → pure scan again

    def test_eq_read_is_broadcast_anti_join(self, spark, tmp_path):
        # the read-time price of an equality delete is a BROADCAST anti
        # join (key files are small by construction) — never a shuffle of
        # the data side
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 100), root)
        delete_where_eq(
            spark, root, spark.createDataFrame([(1,)], "doc_id long")
        )
        plan = read_snapshot(
            spark, root
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan
