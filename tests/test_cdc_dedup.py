"""T216 — CDC-maintained dedup index.

Invariant: the maintained index ≡ build_dedup_index over the corpus's
final state, as multisets, after any commit history — with deletions
landing as equality-delete commits (no index file rewritten)."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.cdc_dedup import (
    _maintained_to,
    maintain_dedup_index,
)
from pdf_drawing_ocr_recognition_spark.operators.dedup import (
    build_dedup_index,
    incremental_dedupe,
)
from pdf_drawing_ocr_recognition_spark.sources import snapshots as S


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "corpus"), str(tmp_path / "index")


def _docs(spark, n=300):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick brown fox document number "),
                 F.col("id").cast("string")).alias("text"),
    )


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def _expected(spark, corpus_root):
    corpus = S.read_snapshot(spark, corpus_root)
    dig, band = build_dedup_index(corpus)
    return _multiset(dig), _multiset(band)


def test_fold_equals_rebuild_through_history(spark, roots):
    corpus_root, index_root = roots
    docs = _docs(spark)
    # bootstrap
    S.append_snapshot(docs.filter("doc_id < 200"), corpus_root)
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
    # append fold
    S.append_snapshot(docs.filter("doc_id >= 200"), corpus_root)
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
    # eq-delete fold: index rows die at O(keys) metadata cost
    S.delete_where_eq(
        spark, corpus_root,
        docs.filter("doc_id % 10 = 3").select("doc_id"),
    )
    files_before = set(
        S.read_manifest(
            f"{index_root}/digests",
            S.current_snapshot_id(f"{index_root}/digests"),
        )["files"]
    )
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
    man = S.read_manifest(
        f"{index_root}/digests",
        S.current_snapshot_id(f"{index_root}/digests"),
    )
    # nothing rewritten: every pre-delete index file still listed
    assert files_before <= set(man["files"])
    assert man["eq_deletes"]
    # upsert fold: old index rows hidden, new text's rows visible
    S.upsert_eq(
        spark, corpus_root,
        docs.filter("doc_id % 10 = 7").withColumn(
            "text", F.concat(F.col("text"), F.lit(" revised"))
        ),
        ["doc_id"],
    )
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
    # idempotent at the same snapshot
    dig2, _ = maintain_dedup_index(spark, corpus_root, index_root)
    assert _multiset(dig2) == ed


def test_maintained_index_feeds_incremental_dedupe(spark, roots):
    corpus_root, index_root = roots
    docs = _docs(spark, 100)
    S.append_snapshot(docs, corpus_root)
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    batch = spark.createDataFrame(
        [
            (1000, "the quick brown fox document number 42"),  # exact dup
            (1001, "a genuinely novel sentence about lakehouses"),
        ],
        "doc_id long, text string",
    )
    survivors = incremental_dedupe(batch, dig, band)
    ids = sorted(r["doc_id"] for r in survivors.collect())
    assert 1000 not in ids and 1001 in ids


def test_watermark_and_rewind_refusal(spark, roots):
    corpus_root, index_root = roots
    S.append_snapshot(_docs(spark, 50), corpus_root)
    S.append_snapshot(
        _docs(spark, 50).withColumn("doc_id", F.col("doc_id") + 100),
        corpus_root,
    )
    maintain_dedup_index(spark, corpus_root, index_root)
    assert _maintained_to(f"{index_root}/digests") == 2
    assert _maintained_to(f"{index_root}/bands") == 2
    with pytest.raises(ValueError, match="never rewind"):
        maintain_dedup_index(spark, corpus_root, index_root, upto=1)


def test_fold_spanning_insert_then_delete_nets(spark, roots):
    """A doc inserted AND deleted inside one fold range must not leak
    into the index (the append outranks the delete entry — netting via
    exceptAll is what keeps it out)."""
    corpus_root, index_root = roots
    docs = _docs(spark, 300)
    S.append_snapshot(docs.filter("doc_id < 200"), corpus_root)
    maintain_dedup_index(spark, corpus_root, index_root)
    # two commits folded in ONE refresh: new docs land, then some of
    # them (and some old ones) are deleted
    S.append_snapshot(docs.filter("doc_id >= 200"), corpus_root)
    S.delete_where_eq(
        spark, corpus_root,
        docs.filter("doc_id % 10 = 3").select("doc_id"),
    )
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
    assert dig.count() == 270  # 300 − 30 deleted, incl. in-range births


def test_crash_between_relations_recovers(spark, roots):
    """digests folded, bands not (crash mid-refresh): the re-run folds
    only the lagging relation and both converge."""
    corpus_root, index_root = roots
    docs = _docs(spark, 200)
    S.append_snapshot(docs.filter("doc_id < 100"), corpus_root)
    maintain_dedup_index(spark, corpus_root, index_root)
    S.append_snapshot(docs.filter("doc_id >= 100"), corpus_root)
    # simulate the crash: fold ONLY the digests relation to snapshot 2
    from pdf_drawing_ocr_recognition_spark.operators.cdc_dedup import (
        _fold_relation,
    )
    from pdf_drawing_ocr_recognition_spark.operators.dedup import (
        build_dedup_index as bdi,
    )
    from pdf_drawing_ocr_recognition_spark.sources.changelog import (
        read_changelog,
    )

    changes = read_changelog(spark, corpus_root, 1, 2)
    ins = changes.filter("_change_type = 'insert'").drop(
        "_change_type", "_commit_snapshot_id"
    )
    d, _b = bdi(ins)
    _fold_relation(spark, f"{index_root}/digests", 2, d, None, "doc_id")
    assert _maintained_to(f"{index_root}/digests") == 2
    assert _maintained_to(f"{index_root}/bands") == 1
    dig, band = maintain_dedup_index(spark, corpus_root, index_root)
    ed, eb = _expected(spark, corpus_root)
    assert _multiset(dig) == ed and _multiset(band) == eb
