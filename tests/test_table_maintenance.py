"""End-to-end table-maintenance job (jobs/run_table_maintenance.py):
retention MOR delete → z-order compaction (masks applied + purged) →
snapshot expiry → orphan sweep, one run, summary JSON checked."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    read_manifest,
    read_snapshot,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % n).alias("val"),
        (F.col("id") * 100).alias("fetch_ts"),
    )


class TestParseWhere:
    def test_conjuncts(self):
        from jobs.run_table_maintenance import parse_where

        assert parse_where("a>=5&b==x") == [("a", ">=", 5), ("b", "==", "x")]
        assert parse_where("fetch_ts<1700") == [("fetch_ts", "<", 1700)]
        with pytest.raises(ValueError, match="bad --delete-where"):
            parse_where("a !! 3")


class TestTableMaintenanceJob:
    def test_full_cycle(self, spark, tmp_path, capsys):
        from jobs.run_table_maintenance import main

        root = str(tmp_path / "t")
        n = 400
        # several small appends = the realistic many-small-commits state
        for k in range(4):
            append_snapshot(
                _docs(spark, n).filter(F.col("doc_id") % 4 == k), root
            )
        assert current_snapshot_id(root) == 4

        rc = main(
            [
                "--table", root,
                "--delete-where", f"fetch_ts<{100 * (n // 4)}",
                "--cluster-by", "doc_id,val",
                "--target-files", "8",
                "--keep-last", "2",
                "--orphans-older-than", "0",
            ],
            spark=spark,
        )
        assert rc == 0
        out = capsys.readouterr().out
        summary = json.loads(out.split("table maintenance complete: ")[1])

        # delete committed masks, compaction purged them
        assert summary["masked_files_after_delete"] >= 1
        assert summary["masks_after_compaction"] == 0
        assert summary["files_after_compaction"] == 8
        assert summary["expiry"]["expired_snapshots"] >= 3

        # surviving rows = exactly the retention predicate's complement
        got = sorted(
            r["doc_id"] for r in read_snapshot(spark, root).collect()
        )
        want = sorted(
            r["doc_id"]
            for r in _docs(spark, n)
            .filter(~(F.col("fetch_ts") < 100 * (n // 4)))
            .collect()
        )
        assert got == want

        # clustered layout: manifest bounds prune on the SECOND column too
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            plan_scan,
        )

        sid = current_snapshot_id(root)
        _, skipped = plan_scan(root, sid, [("val", ">=", n - n // 8)])
        assert len(skipped) >= 4, f"val pruning after z-order: {skipped}"

        # orphan sweep left every referenced file on disk (reads work)
        man = read_manifest(root, sid)
        for f in man["files"]:
            assert os.path.exists(os.path.join(root, "data", f))

    def test_noop_on_empty_args(self, spark, tmp_path, capsys):
        from jobs.run_table_maintenance import main

        root = str(tmp_path / "t2")
        append_snapshot(_docs(spark, 40), root)
        rc = main(["--table", root], spark=spark)
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.split("table maintenance complete: ")[1]
        )
        assert summary["snapshot_after"] == 1
        assert summary["masked_files_before"] == 0
        assert summary["files_before"] >= 1


class TestRoutineMaintenanceModes:
    """T202/T204 in the job: mask compaction + partial binpack, composed."""

    def test_compact_masks_and_small_files(self, spark, tmp_path, capsys):
        import json as _json

        from jobs.run_table_maintenance import main
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            append_snapshot,
            current_snapshot_id,
            delete_from,
            read_manifest,
            read_snapshot,
        )
        from pyspark.sql import functions as F

        root = str(tmp_path / "t")
        docs = spark.range(0, 20000).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        )
        append_snapshot(docs.coalesce(1), root)  # one big file
        for i in range(3):  # streaming-style small appends
            append_snapshot(
                spark.range(20000 + 3 * i, 20003 + 3 * i).select(
                    F.col("id").alias("doc_id"), F.lit("de").alias("lang")
                ).coalesce(1),
                root,
            )
        delete_from(spark, root, [("doc_id", "<", 3)])
        delete_from(spark, root, [("doc_id", "==", 7)])  # stacked masks
        before = sorted(
            r["doc_id"] for r in read_snapshot(spark, root).collect()
        )
        rc = main(
            ["--table", root, "--compact-masks", "--small-file-bytes",
             "50000", "--keep-last", "2", "--orphans-older-than", "0"],
            spark=spark,
        )
        assert rc == 0
        out = capsys.readouterr().out
        summary = _json.loads(out.split("table maintenance complete: ")[1])
        assert summary["masks_after_mask_compaction"] <= 1
        man = read_manifest(root, current_snapshot_id(root))
        # small files binpacked; the big (masked→compacted) rewrite is fine
        assert summary["files_after_partial_compaction"] < summary[
            "files_before"
        ]
        assert sorted(
            r["doc_id"] for r in read_snapshot(spark, root).collect()
        ) == before
        assert not man.get("delete_files")
