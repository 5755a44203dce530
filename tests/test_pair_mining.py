"""T187 — image-text pair-mining job (jobs/run_pair_mining.py): e2e over a
hand-checkable page corpus; gates, dedup, hotlink audit, manifests."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def pages(spark, tmp_path):
    banner = '<img src="http://cdn.example.com/banner.png" alt="same banner ad">'
    rows = [
        ("http://a.example.com/p/1",
         f'<html><body><img src="/img/cat.png" alt="a sleepy tabby cat">{banner}</body></html>'),
        ("http://a.example.com/p/2",
         f'<html><body>{banner}<img src="/img/dog.jpg" alt="dog.jpg"></body></html>'),
        ("http://b.example.com/p/3",
         '<html><body><figure><img src="x.webp" alt="tiny"><figcaption>c</figcaption></figure>'
         '<img src="/gen.php" alt="long enough alt text"></body></html>'),
    ]
    p = str(tmp_path / "pages.parquet")
    spark.createDataFrame(rows, "url string, html string").select(
        "url", F.encode("html", "utf-8").alias("html")
    ).write.parquet(p)
    return p


def test_pair_mining_end_to_end(spark, tmp_path, pages, capsys):
    from jobs.run_pair_mining import main

    out = str(tmp_path / "pairs")
    rc = main(["--pages", pages, "--out", out, "--shards", "2"], spark=spark)
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().split("pair mining complete: ")[1]
    )
    # 6 harvested; drops: dog.jpg (filename alt), tiny (<5), gen.php (ext)
    assert summary["harvested"] == 6 and summary["gated"] == 3
    # the two banner copies dedup to one -> 2 distinct pairs
    assert summary["distinct_pairs"] == 2

    audit = {
        r["page_host"]: (r["n_pairs"], r["n_hotlinked"])
        for r in spark.read.parquet(f"{out}/host_audit").collect()
    }
    # cat (local) + banner (hotlinked, kept copy on a.example.com)
    assert audit["a.example.com"] == (2, 1)

    stored = {
        r["shard"]: r["content_fp"]
        for r in spark.read.parquet(f"{out}/shard_manifests").collect()
    }
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        shard_manifest,
    )

    re_fp = {
        r["shard"]: r["content_fp"]
        for r in shard_manifest(
            spark.read.parquet(f"{out}/shards"),
            key_col="pair_key",
            text_col="alt",
        ).collect()
    }
    assert re_fp == stored
