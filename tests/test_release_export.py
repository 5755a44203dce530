"""End-to-end release-export job (jobs/run_release_export.py): prep →
balanced train shards (one file each) → datasheet + audit."""

import glob

from pyspark.sql import functions as F


def test_release_export_end_to_end(spark, tmp_path, capsys):
    from jobs.run_release_export import main

    # enough quality-passing docs for every split to be populated
    rows = [
        (
            i,
            " ".join(
                f"the w{(i * 13 + j * 7) % 97} and of it quick brown"
                for j in range(4 + i % 5)
            ),
            "en" if i % 3 else "de",
            f"src{i % 4}",
            100 + i,
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    src = str(tmp_path / "docs_parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "release")

    rc = main(["--docs", src, "--out", out, "--shards", "4"])
    assert rc == 0
    assert "release export complete" in capsys.readouterr().out

    exported = spark.read.parquet(f"{out}/corpus")
    train = exported.filter(F.col("split") == "train")
    assert train.count() > 0

    # shard balance: per-shard word totals spread bounded by one doc's words
    totals = {
        r["shard"]: r["tw"]
        for r in train.groupBy("shard")
        .agg(F.sum("n_words").alias("tw"))
        .collect()
    }
    assert set(totals) <= set(range(4))
    max_doc = train.agg(F.max("n_words")).first()[0]
    assert max(totals.values()) - min(totals.values()) <= max_doc

    # one parquet file per train shard directory
    for shard in totals:
        files = glob.glob(f"{out}/corpus/split=train/shard={shard}/*.parquet")
        assert len(files) == 1, files

    # val/test pass through unsharded (sentinel shard)
    other_shards = (
        exported.filter(F.col("split") != "train")
        .select("shard")
        .distinct()
        .collect()
    )
    assert [r["shard"] for r in other_shards] == [-1]

    # datasheet: one row per exported language, exact-integer mean quality
    sheet = {
        r["lang"]: r.asDict()
        for r in spark.read.parquet(f"{out}/_datasheet").collect()
    }
    assert set(sheet) == {"en", "de"}
    for row in sheet.values():
        assert row["n_docs"] > 0 and row["total_words"] > 0
        assert 0 <= row["mean_quality_e4"] <= 10000

    # audit table covers every (split, lang) present
    audit = spark.read.parquet(f"{out}/_audit")
    assert audit.count() == exported.select("split", "lang").distinct().count()


class TestRendezvousShards:
    """T107: HRW sharding — the minimal-disruption re-shard property."""

    def _assign(self, spark, n):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            rendezvous_shards,
        )

        docs = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
        return {
            r["doc_id"]: r["shard"]
            for r in rendezvous_shards(docs, "doc_id", n).collect()
        }

    def test_minimal_disruption_growing_one_shard(self, spark):
        a = self._assign(spark, 8)
        b = self._assign(spark, 9)
        moved = {k for k in a if a[k] != b[k]}
        # every moved key moved TO the new shard, never between old shards
        assert all(b[k] == 8 for k in moved)
        # expected move fraction 1/9 of 400 ~ 44; allow generous noise band
        assert 15 <= len(moved) <= 90, len(moved)

    def test_all_shards_used_and_roughly_balanced(self, spark):
        a = self._assign(spark, 8)
        from collections import Counter

        c = Counter(a.values())
        assert set(c) == set(range(8))
        assert max(c.values()) <= 3 * min(c.values())  # loose balance

    def test_partition_invariance_and_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            rendezvous_shards,
        )

        docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        a = sorted(map(tuple, rendezvous_shards(docs, "doc_id", 5).collect()))
        b = sorted(
            map(tuple, rendezvous_shards(docs.repartition(7), "doc_id", 5).collect())
        )
        assert a == b
        import pytest

        with pytest.raises(ValueError):
            rendezvous_shards(docs, "doc_id", 0)


class TestShardManifest:
    """T137 — order-insensitive per-shard integrity manifests."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string, shard int")

    BASE = [(1, "alpha", 0), (2, "beta", 0), (3, "gamma", 1), (4, "delta", 1)]

    def test_manifest_invariant_under_order_and_partitioning(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            shard_manifest,
        )

        a = shard_manifest(self._docs(spark, self.BASE)).collect()
        shuffled = self._docs(spark, list(reversed(self.BASE))).repartition(5)
        b = shard_manifest(shuffled).collect()
        key = lambda r: r["shard"]
        assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
            map(tuple, b), key=lambda t: t[0]
        )

    def test_manifest_detects_single_char_mutation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            shard_manifest,
        )

        good = {r["shard"]: r["content_fp"]
                for r in shard_manifest(self._docs(spark, self.BASE)).collect()}
        mutated = [(1, "alphA", 0)] + self.BASE[1:]
        bad = {r["shard"]: r["content_fp"]
               for r in shard_manifest(self._docs(spark, mutated)).collect()}
        assert good[0] != bad[0]  # touched shard flags
        assert good[1] == bad[1]  # untouched shard does not

    def test_manifest_detects_moved_doc_and_xor_cancel_caveat(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            shard_manifest,
        )

        moved = [(1, "alpha", 1)] + self.BASE[1:]
        good = {r["shard"]: (r["n_docs"], r["content_fp"])
                for r in shard_manifest(self._docs(spark, self.BASE)).collect()}
        bad = {r["shard"]: (r["n_docs"], r["content_fp"])
               for r in shard_manifest(self._docs(spark, moved)).collect()}
        assert good != bad
        # documented caveat: an even number of identical rows xor-cancels,
        # but n_docs still shifts — the manifest reads both together
        doubled = self.BASE + [self.BASE[0], self.BASE[0]]
        dd = {r["shard"]: (r["n_docs"], r["content_fp"])
              for r in shard_manifest(self._docs(spark, doubled)).collect()}
        assert dd[0][1] == good[0][1] and dd[0][0] == good[0][0] + 2

    def test_manifest_null_text_digests_as_empty(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.packing import (
            shard_manifest,
        )

        with_null = [(1, None, 0)]
        with_empty = [(1, "", 0)]
        a = shard_manifest(self._docs(spark, with_null)).collect()[0]
        b = shard_manifest(self._docs(spark, with_empty)).collect()[0]
        assert a["content_fp"] == b["content_fp"] and a["n_chars"] == 0
