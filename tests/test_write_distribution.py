"""T215 — write distribution modes (Iceberg's write.distribution-mode).

One extra shuffle on the derived partition tuple collapses the fanout
writer's O(tasks × tuples) files to O(tuples) — values never change."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources import snapshots as S

SPEC = [{"source": "lang", "transform": "identity"}]


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _docs(spark, n=2000):
    # 8 input partitions × 4 langs: the fanout explosion fixture
    return (
        spark.range(0, n)
        .repartition(8)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("lang"),
            (F.col("id") * 3).alias("n_chars"),
        )
    )


def _files_and_rows(spark, root, sid):
    man = S.read_manifest(root, sid)
    rows = sorted(
        tuple(r) for r in S.read_snapshot(spark, root, sid).collect()
    )
    return len(man["files"]), rows


def test_hash_mode_one_file_per_tuple(spark, root):
    df = _docs(spark)
    S.append_snapshot(df, root, partition_spec=SPEC)  # none: fanout
    n_none, rows_none = _files_and_rows(spark, root, 1)
    S.overwrite_snapshot(df, root, distribution="hash")
    n_hash, rows_hash = _files_and_rows(spark, root, 2)
    assert rows_hash == rows_none  # values never change
    assert n_hash == 4  # one file per lang tuple
    assert n_none > n_hash  # the fanout explosion the shuffle collapses
    # per-file tuples still recorded → pruning intact
    kept, skipped = S.plan_scan(root, 2, [("lang", "==", "2")])
    assert len(kept) == 1 and len(skipped) == 3


def test_range_mode_clusters_tuples(spark, root):
    df = _docs(spark)
    S.append_snapshot(
        df, root,
        partition_spec=[{"source": "doc_id", "transform": "truncate[500]"}],
        distribution="range",
    )
    man = S.read_manifest(root, 1)
    assert len(man["files"]) == 4  # one file per truncate bin
    assert S.read_snapshot(spark, root).count() == 2000


def test_validation(spark, root):
    df = _docs(spark, 100)
    with pytest.raises(ValueError, match="none|hash|range"):
        S.append_snapshot(df, root, partition_spec=SPEC, distribution="sort")
    with pytest.raises(ValueError, match="without a partition_spec"):
        S.append_snapshot(df, root, distribution="hash")
