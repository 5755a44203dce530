"""T198 metadata tables (snapshots/files/history/refs as DataFrames, all
from manifest JSON alone) and T199 consumer-group offsets (tail-the-table
incremental consumption with atomic at-least-once checkpoints)."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.consumer_offsets import (
    ack,
    consumer_offset,
    next_appends,
)
from pdf_drawing_ocr_recognition_spark.sources.metadata_tables import (
    metadata_files,
    metadata_history,
    metadata_refs,
    metadata_snapshots,
)
from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    delete_from,
    evolve_schema,
    merge_into,
    read_snapshot,
    rewrite_data_files,
    set_ref,
)


def _docs(spark, lo, hi, lang="en"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(lang).alias("lang")
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


class TestMetadataTables:
    def test_snapshots_table_counters(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10).repartition(2), root)
        append_snapshot(_docs(spark, 10, 15), root)
        evolve_schema(root, rename={"lang": "language"})
        delete_from(spark, root, [("doc_id", ">=", 12)])
        ms = metadata_snapshots(spark, root).orderBy("snapshot_id").collect()
        assert [r["operation"] for r in ms] == [
            "append", "append", "alter-schema", "delete",
        ]
        assert [r["added_rows"] for r in ms] == [10, 5, 0, 0]
        # record counts are DATA-file rows, not net of delete masks
        assert [r["total_data_rows"] for r in ms] == [10, 15, 15, 15]
        assert ms[3]["total_delete_files"] >= 1
        assert [r["parent_id"] for r in ms] == [None, 1, 2, 3]

    def test_files_table_sums_to_table_rows(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(
            _docs(spark, 0, 20),
            root,
            partition_spec=[{"source": "lang", "transform": "identity"}],
        )
        delete_from(spark, root, [("doc_id", "<", 3)])
        mf = metadata_files(spark, root).collect()
        assert sum(r["record_count"] for r in mf) == 20
        assert sum(r["n_delete_files"] for r in mf) >= 1
        # hidden-partition tuples surface per file
        assert all(r["partition"] and "identity" in r["partition"] for r in mf)
        # the files table of the PRE-delete snapshot shows no masks
        mf1 = metadata_files(spark, root, snapshot_id=1).collect()
        assert sum(r["n_delete_files"] for r in mf1) == 0

    def test_history_and_refs(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        append_snapshot(_docs(spark, 5, 8), root)
        set_ref(root, "audited", 1, "tag")
        set_ref(root, "main", 2, "branch")
        mh = metadata_history(spark, root).orderBy("snapshot_id").collect()
        assert [r["snapshot_id"] for r in mh] == [1, 2]
        assert all(r["is_current_ancestor"] for r in mh)
        mr = metadata_refs(spark, root).orderBy("name").collect()
        assert [(r["name"], r["type"], r["snapshot_id"]) for r in mr] == [
            ("audited", "tag", 1), ("main", "branch", 2),
        ]

    def test_legacy_manifest_row_counts_absent(self, spark, tmp_path):
        """Pre-row_counts manifests surface NULL record counts, not lies."""
        import json

        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            _manifest_path,
        )

        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        p = _manifest_path(root, 1)
        man = json.load(open(p))
        man.pop("row_counts")
        json.dump(man, open(p, "w"))
        mf = metadata_files(spark, root).collect()
        assert all(r["record_count"] is None for r in mf)
        ms = metadata_snapshots(spark, root).collect()
        assert ms[0]["total_data_rows"] is None


class TestConsumerOffsets:
    def test_bootstrap_then_tail(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        got = next_appends(spark, root, "daily")
        assert got is not None
        from_id, to_id, df = got
        assert (from_id, to_id) == (0, 1) and _ids(df) == list(range(10))
        # unacked: the same delta again (at-least-once)
        f2, t2, df2 = next_appends(spark, root, "daily")
        assert (f2, t2) == (0, 1) and _ids(df2) == list(range(10))
        ack(root, "daily", 1)
        assert next_appends(spark, root, "daily") is None
        append_snapshot(_docs(spark, 10, 14), root)
        append_snapshot(_docs(spark, 14, 16), root)
        f3, t3, df3 = next_appends(spark, root, "daily")
        assert (f3, t3) == (1, 3) and _ids(df3) == list(range(10, 16))
        ack(root, "daily", 3)
        assert consumer_offset(root, "daily") == 3

    def test_independent_consumers(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        _f, t, _df = next_appends(spark, root, "a")
        ack(root, "a", t)
        assert next_appends(spark, root, "a") is None
        assert next_appends(spark, root, "b") is not None

    def test_ack_never_rewinds(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        append_snapshot(_docs(spark, 5, 8), root)
        ack(root, "c", 2)
        with pytest.raises(ValueError, match="rewind"):
            ack(root, "c", 1)
        ack(root, "c", 2)  # idempotent re-ack is fine

    def test_raises_on_rewrite_boundary_unless_skipping(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        _f, t, _df = next_appends(spark, root, "d")
        ack(root, "d", t)
        merge_into(
            spark,
            root,
            spark.createDataFrame([(0, "xx")], "doc_id long, lang string"),
            "doc_id",
        )
        append_snapshot(_docs(spark, 10, 12), root)
        with pytest.raises(ValueError, match="rewritten"):
            next_appends(spark, root, "d")
        f, t, df = next_appends(spark, root, "d", skip_non_appends=True)
        # ONLY the genuine append streams; the merge's rewritten rows don't
        assert _ids(df) == [10, 11]
        ack(root, "d", t)

    def test_tail_across_alter_schema_projects_delta(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        _f, t, _df = next_appends(spark, root, "e")
        ack(root, "e", t)
        evolve_schema(root, rename={"lang": "language"})
        append_snapshot(
            spark.range(5, 8).select(
                F.col("id").alias("doc_id"), F.lit("de").alias("language")
            ),
            root,
        )
        f, t, df = next_appends(spark, root, "e")
        assert df.columns == ["doc_id", "language"]
        assert _ids(df) == [5, 6, 7]

    def test_skipped_compaction_does_not_lose_appends(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 5), root)
        _f, t, _df = next_appends(spark, root, "g")
        ack(root, "g", t)
        append_snapshot(_docs(spark, 5, 9), root)
        rewrite_data_files(spark, root, target_files=1)  # replaces ALL files
        f, t, df = next_appends(spark, root, "g", skip_non_appends=True)
        # the appended files were compacted away from the current snapshot
        # but persist on disk until expiry — the delta still delivers them
        assert _ids(df) == [5, 6, 7, 8]

    def test_delete_commit_needs_opt_in(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_docs(spark, 0, 10), root)
        _f, t, _df = next_appends(spark, root, "h")
        ack(root, "h", t)
        delete_from(spark, root, [("doc_id", "<", 2)])
        append_snapshot(_docs(spark, 10, 11), root)
        with pytest.raises(ValueError, match="delete"):
            next_appends(spark, root, "h")
        f, t, df = next_appends(spark, root, "h", skip_non_appends=True)
        assert _ids(df) == [10]
