"""T213 — runtime-filter (DPP-analogue) join pruning over snapshot tables.

What must hold: the dim side's keys, handed to plan_scan as one
``("col", "in", keys)`` conjunct, prune fact files through EVERY
manifest prover (bounds, hidden-partition tuples, bloom sidecars);
pruning is provable-only (join result identical to the plain join); the
key cap refuses loudly, never truncates."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.runtime_filter import (
    collect_join_keys,
    join_pruned,
    join_pruned_read,
)
from pdf_drawing_ocr_recognition_spark.sources import snapshots as S
from pdf_drawing_ocr_recognition_spark.sources.file_blooms import (
    compute_file_blooms,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "fact")


def _facts(spark, n=4000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("lang"),
        (F.col("id") * 3).alias("n_chars"),
    )


def _dim(spark, ids):
    return spark.createDataFrame(
        [(int(i), f"label{i}") for i in ids], "doc_id long, label string"
    )


def test_bounds_pruning_and_join_equivalence(spark, root):
    S.append_snapshot(_facts(spark).repartitionByRange(16, "doc_id"), root)
    dim = _dim(spark, [5, 7, 3605, 3607])  # two range files' worth
    kept, skipped = S.plan_scan(
        root, 1, [("doc_id", "in", [5, 7, 3605, 3607])]
    )
    assert len(kept) == 2 and len(skipped) == 14
    got = sorted(
        tuple(r)
        for r in join_pruned(spark, root, dim, "doc_id").collect()
    )
    exp = sorted(
        tuple(r)
        for r in S.read_snapshot(spark, root).join(dim, "doc_id").collect()
    )
    assert got == exp and len(got) == 4


def test_bloom_pruning_on_hash_distributed_key(spark, root):
    # round-robin layout: every file's doc_id bounds span ~the whole
    # range, so bounds prune nothing — blooms must carry the pruning
    S.append_snapshot(_facts(spark).repartition(8), root)
    compute_file_blooms(spark, root, "doc_id")
    keys = [11, 12]
    kept_bounds, _ = S.plan_scan(root, 1, [("doc_id", "in", keys)])
    kept, skipped = S.plan_scan(
        root, S.current_snapshot_id(root), [("doc_id", "in", keys)]
    )
    # blooms strictly add pruning over what bounds alone managed: the
    # 2 keys live in ≤2 files, the rest die modulo bloom FPs
    assert len(kept) < len(kept_bounds)
    assert len(kept) <= 4
    dim = _dim(spark, keys)
    got = sorted(
        r["doc_id"]
        for r in join_pruned_read(spark, root, dim, "doc_id").collect()
    )
    assert got == keys  # no false negatives, row filter exact


def test_bucket_partition_pruning(spark, root):
    S.append_snapshot(
        _facts(spark),
        root,
        partition_spec=[{"source": "doc_id", "transform": "bucket[8]"}],
    )
    kept, skipped = S.plan_scan(root, 1, [("doc_id", "in", [42])])
    assert len(kept) == 1  # one key lives in exactly one bucket
    dim = _dim(spark, [42])
    got = join_pruned(spark, root, dim, "doc_id").collect()
    assert len(got) == 1 and got[0]["doc_id"] == 42


def test_cap_refuses_loudly_and_nulls_drop(spark, root):
    S.append_snapshot(_facts(spark, 100), root)
    big = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="cap 100"):
        collect_join_keys(big, "doc_id", max_keys=100)
    with_null = spark.createDataFrame(
        [(1,), (None,), (2,)], "doc_id long"
    )
    assert sorted(collect_join_keys(with_null, "doc_id")) == [1, 2]
    # inner-join semantics: the NULL dim row matches nothing
    got = join_pruned_read(spark, root, with_null, "doc_id")
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]


def test_empty_dim_prunes_everything(spark, root):
    S.append_snapshot(_facts(spark, 100).repartitionByRange(4, "doc_id"), root)
    empty = spark.createDataFrame([], "doc_id long")
    kept, skipped = S.plan_scan(root, 1, [("doc_id", "in", [])])
    assert kept == [] and len(skipped) == 4
    out = join_pruned_read(spark, root, empty, "doc_id")
    assert out.count() == 0
    assert out.schema.fieldNames() == ["doc_id", "lang", "n_chars"]


def test_datasource_isin_pushdown(spark, root):
    from pyspark.sql.datasource import In

    from pdf_drawing_ocr_recognition_spark.sources.spark_datasource import (
        SnapshotBatchReader,
        register,
    )

    register(spark)
    S.append_snapshot(_facts(spark).repartitionByRange(16, "doc_id"), root)
    rd = SnapshotBatchReader({"path": root})
    rd.pushFilters([In(("doc_id",), (5, 3605))])
    assert len(rd.partitions()) == 2
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("pdor_snapshot")
        .load(root)
        .filter(F.col("doc_id").isin(5, 3605))
        .collect()
    )
    assert got == [5, 3605]
