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
