"""T144 — pre-release compliance audit job (jobs/run_release_audit.py):
e2e over a hand-checkable corpus; every summary count verified."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def corpus(spark, tmp_path):
    rows = []
    # source 'clean': 6 en docs, no PII
    for i in range(6):
        rows.append((i, "plain prose here", "en", "clean"))
    # source 'leaky': 4 docs with an email each
    for i in range(10, 14):
        rows.append((i, f"contact user{i}@example.com now", "en", "leaky"))
    # source 'mtfarm': 6 docs in 6 languages (gini 5/6 > 0.5)
    for j, lang in enumerate(["en", "de", "fr", "it", "nl", "pt"]):
        rows.append((20 + j, "same template", lang, "mtfarm"))
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(p)
    return p


def test_release_audit_end_to_end(spark, tmp_path, corpus, capsys):
    from jobs.run_release_audit import main

    out = str(tmp_path / "audit")
    rc = main(["--docs", corpus, "--out", out, "--shards", "4"], spark=spark)
    assert rc == 0
    line = [
        l for l in capsys.readouterr().out.splitlines()
        if l.startswith("release audit complete: ")
    ][-1]
    summary = json.loads(line.split(": ", 1)[1])
    assert summary["docs"] == 16
    assert summary["leaked_plds"] == 0
    assert summary["plds_with_pii"] == 1      # only leaky.example.com
    assert summary["mt_suspect_plds"] == 1    # only mtfarm.example.com
    assert summary["shards"] == 4

    pii = {
        r["pld"]: r
        for r in spark.read.parquet(f"{out}/pii_by_domain").collect()
    }
    assert pii["leaky.example.com"]["n_emails"] == 4
    assert pii["clean.example.com"]["n_emails"] == 0

    mix = {
        r["host"]: r
        for r in spark.read.parquet(f"{out}/lang_mixture").collect()
    }
    assert mix["mtfarm.example.com"]["lang_gini_ppm"] == 833333
    assert mix["clean.example.com"]["lang_gini_ppm"] == 0

    sizes = spark.read.parquet(f"{out}/split_sizes").collect()
    assert sum(r["n_docs"] for r in sizes) == 16

    man = spark.read.parquet(f"{out}/shard_manifests").collect()
    assert sum(r["n_docs"] for r in man) == 16
    assert len({r["content_fp"] for r in man}) == len(man)


def test_release_audit_rerun_is_identical(spark, tmp_path, corpus):
    from jobs.run_release_audit import main

    out1, out2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    main(["--docs", corpus, "--out", out1], spark=spark)
    main(["--docs", corpus, "--out", out2], spark=spark)
    for section in ["pii_by_domain", "lang_mixture", "split_sizes",
                    "shard_manifests"]:
        a = sorted(map(tuple, spark.read.parquet(f"{out1}/{section}").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{out2}/{section}").collect()))
        assert a == b, section
