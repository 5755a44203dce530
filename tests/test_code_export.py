"""T170 — code-corpus export job (jobs/run_code_export.py): e2e over a
hand-checkable page corpus; dedup, gate, histogram, and manifests verified."""

import json

import pytest
from pyspark.sql import functions as F

_PY = '<pre><code class="language-python">def f(x):\n    return x + 1</code></pre>'
_GO = '<pre><code class="language-go">func g() int {\n\treturn 2\n}</code></pre>'


@pytest.fixture()
def pages(spark, tmp_path):
    rows = [
        ("u0", f"<html><body>{_PY}</body></html>"),       # python block
        ("u1", f"<html><body>{_PY}</body></html>"),       # EXACT dup of u0's
        ("u2", f"<html><body>{_GO}{_PY}</body></html>"),  # go + dup python
        ("u3", "<html><body><p>see <code>x=1</code></p></body></html>"),  # tiny
        ("u4", "<html><body><pre>no hint but long enough</pre></body></html>"),
        ("u5", "<html><body><p>no code at all</p></body></html>"),
    ]
    p = str(tmp_path / "pages.parquet")
    spark.createDataFrame(rows, "url string, html string").select(
        "url", F.encode("html", "utf-8").alias("html")
    ).write.parquet(p)
    return p


def test_code_export_end_to_end(spark, tmp_path, pages, capsys):
    from jobs.run_code_export import main

    out = str(tmp_path / "export")
    rc = main(["--pages", pages, "--out", out, "--min-chars", "8",
               "--shards", "2"], spark=spark)
    assert rc == 0
    summary = json.loads(
        capsys.readouterr().out.strip().split("code export complete: ")[1]
    )
    # 4 python (u0,u1,u2) is 3 + 1 go + 1 inline + 1 bare = 6 raw blocks
    assert summary["pages"] == 6 and summary["blocks"] == 6
    # inline x=1 (3 chars) gated out -> 5 kept; python dups collapse -> 3
    assert summary["kept_blocks"] == 5 and summary["distinct_blocks"] == 3

    langs = {
        r["lang_hint"]: (r["n_blocks"], r["n_chars"])
        for r in spark.read.parquet(f"{out}/lang_histogram").collect()
    }
    assert set(langs) == {"python", "go", "unknown"}
    assert langs["python"][0] == 1 and langs["unknown"][0] == 1

    # manifests re-verify against the shipped shards (the T137 contract)
    shipped = spark.read.parquet(f"{out}/shards")
    assert shipped.count() == 3
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        shard_manifest,
    )

    re_fp = {
        r["shard"]: r["content_fp"]
        for r in shard_manifest(
            shipped, key_col="block_key", text_col="code_text"
        ).collect()
    }
    stored = {
        r["shard"]: r["content_fp"]
        for r in spark.read.parquet(f"{out}/shard_manifests").collect()
    }
    assert re_fp == stored

    density = {
        r["url"]: r["n_code_blocks"]
        for r in spark.read.parquet(f"{out}/code_density").collect()
    }
    assert density["u5"] == 0 and density["u2"] == 2


def test_rerun_is_identical(spark, tmp_path, pages):
    from jobs.run_code_export import main

    out = str(tmp_path / "export2")
    main(["--pages", pages, "--out", out, "--shards", "2"], spark=spark)
    first = sorted(
        map(tuple, spark.read.parquet(f"{out}/blocks").collect())
    )
    main(["--pages", pages, "--out", out, "--shards", "2"], spark=spark)
    second = sorted(
        map(tuple, spark.read.parquet(f"{out}/blocks").collect())
    )
    assert first == second
