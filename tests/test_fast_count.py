"""T214 — metadata-only COUNT(*) (Iceberg's manifest count).

fast_count must equal read_snapshot().count() on every table state while
touching data files only where equality deletes force it."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources import snapshots as S


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, n=1000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("n_chars")
    )


def _no_scan(monkeypatch):
    """Fail the test if fast_count touches the Spark read path."""

    def boom(*a, **k):
        raise AssertionError("fast_count scanned data files")

    monkeypatch.setattr(S, "_read_file_set", boom)


def test_pure_metadata_on_appends(spark, root, monkeypatch):
    S.append_snapshot(_docs(spark).repartitionByRange(4, "doc_id"), root)
    S.append_snapshot(
        _docs(spark, 500).withColumn("doc_id", F.col("doc_id") + 1000), root
    )
    expected = S.read_snapshot(spark, root).count()
    _no_scan(monkeypatch)
    assert S.fast_count(spark, root) == expected == 1500
    # time travel counts too
    assert S.fast_count(spark, root, snapshot_id=1) == 1000


def test_stacked_overlapping_masks_subtract_once(spark, root, monkeypatch):
    S.append_snapshot(_docs(spark).repartitionByRange(4, "doc_id"), root)
    S.delete_from(spark, root, [("doc_id", "<", 300)])
    S.delete_from(spark, root, [("doc_id", "<", 400)])  # overlaps the first
    expected = S.read_snapshot(spark, root).count()
    _no_scan(monkeypatch)
    assert S.fast_count(spark, root) == expected == 600


def test_eq_deletes_take_hybrid_path(spark, root, monkeypatch):
    S.append_snapshot(_docs(spark).repartitionByRange(4, "doc_id"), root)
    S.delete_where_eq(
        spark, root,
        spark.range(0, 1000, 10).select(F.col("id").alias("doc_id")),
    )
    # a post-delete append: its files outrank the entry → metadata tier
    S.append_snapshot(
        _docs(spark, 100).withColumn("doc_id", F.col("doc_id") + 5000), root
    )
    expected = S.read_snapshot(spark, root).count()
    seen: list[list[str]] = []
    orig = S._read_file_set

    def spy(spark_, root_, man_, files_, *a, **k):
        seen.append(list(files_))
        return orig(spark_, root_, man_, files_, *a, **k)

    monkeypatch.setattr(S, "_read_file_set", spy)
    assert S.fast_count(spark, root) == expected == 1000 - 100 + 100
    # only the entry-affected (pre-delete) files were scanned
    assert len(seen) == 1
    man = S.read_manifest(root, S.current_snapshot_id(root))
    affected = {
        f for f in man["files"]
        if any(
            int(man["seqs"].get(f, 0)) < int(e["seq"])
            for e in man["eq_deletes"]
        )
    }
    assert set(seen[0]) == affected
    assert len(affected) < len(man["files"])


def test_legacy_manifest_footer_fallback(spark, root, monkeypatch):
    S.append_snapshot(_docs(spark, 200).repartitionByRange(2, "doc_id"), root)
    sid = S.current_snapshot_id(root)
    path = S._manifest_path(root, sid)
    man = json.load(open(path))
    man.pop("row_counts")
    os.remove(path)
    with open(path, "w") as f:
        json.dump(man, f)
    _no_scan(monkeypatch)
    assert S.fast_count(spark, root) == 200
