"""T54 fixed-quota sampling: quota law, determinism under repartitioning,
order_col mode, and the load-bearing plan property — Catalyst's
WindowGroupLimit rewrite fires, with the Partial (map-side) group limit
below the Exchange, so no whole stratum ever sorts in one task."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sampling import quota_sample


@pytest.fixture(scope="module")
def corpus(spark):
    langs = ["en", "zh", "de", "fr"]
    rows = [(i, langs[i % 4], float((i * 37) % 100)) for i in range(800)]
    return spark.createDataFrame(rows, "doc_id long, lang string, quality double")


def _key(rows):
    return sorted((r["lang"], r["doc_id"], r["pick_rank"]) for r in rows)


class TestSelection:
    def test_exact_quota_per_stratum(self, corpus):
        out = quota_sample(corpus, ["lang"], 25, "doc_id")
        counts = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert counts == {"en": 25, "zh": 25, "de": 25, "fr": 25}

    def test_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
        )
        out = quota_sample(df, ["lang"], 10, "doc_id").collect()
        assert len(out) == 3
        assert max(r["pick_rank"] for r in out) == 2

    def test_stable_under_repartitioning(self, corpus):
        a = quota_sample(corpus.repartition(13), ["lang"], 25, "doc_id").collect()
        b = quota_sample(corpus.repartition(2), ["lang"], 25, "doc_id").collect()
        assert _key(a) == _key(b)

    def test_order_col_mode_picks_lowest(self, corpus):
        out = quota_sample(corpus, ["lang"], 5, "doc_id", order_col="quality")
        got = {
            (r["lang"], r["quality"]) for r in out.collect()
        }
        # ascending quality: each stratum's picks are its 5 smallest
        # (quality, doc_id) pairs — recompute expectation driver-side
        rows = corpus.collect()
        want = set()
        for lang in ("en", "zh", "de", "fr"):
            members = sorted(
                ((r["quality"], r["doc_id"]) for r in rows if r["lang"] == lang)
            )[:5]
            want |= {(lang, q) for q, _ in members}
        assert got == want

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            quota_sample(corpus, ["lang"], 0, "doc_id")
        with pytest.raises(ValueError):
            quota_sample(corpus, [], 5, "doc_id")


class TestPlan:
    def test_window_group_limit_partial_below_exchange(self, corpus):
        out = quota_sample(corpus.repartition(8), ["lang"], 10, "doc_id")
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        # Catalyst must rewrite the rank-limit into WindowGroupLimit with a
        # map-side Partial below the Exchange: at most k rows per stratum
        # per input partition shuffle — the property that makes the
        # declarative window the scale-safe plan
        partial_at = plan.find("WindowGroupLimit")
        assert "Partial" in plan and partial_at != -1
        exch_at = plan.find("Exchange")
        final_at = plan.find("Final")
        assert -1 < final_at < exch_at  # top-down print: Final above Exchange
        assert plan.find("Partial") > exch_at  # Partial below (map side)


# ---------------------------------------------------------------------------
# T135 — leakage-safe domain-level split (domain_split)
# ---------------------------------------------------------------------------


def _pld_rows():
    # 60 docs over 12 registered domains, 5 pages each, plus 4 NULL-pld rows
    rows = []
    for d in range(12):
        for p in range(5):
            rows.append((d * 5 + p, f"site{d}.co.uk"))
    rows += [(100 + i, None) for i in range(4)]
    return rows


def test_domain_split_is_pld_disjoint(spark):
    """The whole point: no registered domain straddles two splits."""
    from pdf_drawing_ocr_recognition_spark.operators.sampling import domain_split

    df = spark.createDataFrame(_pld_rows(), "doc_id long, pld string")
    out = domain_split(df, "pld")
    per_pld = (
        out.filter(F.col("pld").isNotNull())
        .groupBy("pld")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert per_pld and all(r["k"] == 1 for r in per_pld)


def test_domain_split_null_pld_goes_to_train(spark):
    from pdf_drawing_ocr_recognition_spark.operators.sampling import domain_split

    df = spark.createDataFrame(_pld_rows(), "doc_id long, pld string")
    nulls = domain_split(df, "pld").filter(F.col("pld").isNull()).collect()
    assert len(nulls) == 4 and all(r["split"] == "train" for r in nulls)


def test_domain_split_deterministic_under_repartition(spark):
    from pdf_drawing_ocr_recognition_spark.operators.sampling import domain_split

    df = spark.createDataFrame(_pld_rows(), "doc_id long, pld string")
    a = {(r["doc_id"], r["split"]) for r in domain_split(df, "pld").collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in domain_split(df.repartition(7), "pld").collect()
    }
    assert a == b


def test_domain_split_fixes_doc_level_leakage(spark):
    """Contrast with the T16 doc-hash split: hashing doc keys scatters one
    site's near-duplicate pages across splits (leakage); hashing the pld
    keeps them together.  Uses enough pages that doc-hash scatter is
    structurally certain (P[all 40 in one split] ~ 0.8^40)."""
    from pdf_drawing_ocr_recognition_spark.operators.sampling import domain_split

    df = spark.createDataFrame(
        [(i, "onesite.com") for i in range(40)], "doc_id long, pld string"
    )
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
    hexd = "0123456789abcdef"
    bucket = (
        (F.position(F.substring(h, 1, 1), F.lit(hexd)) - 1) * 16
        + F.position(F.substring(h, 2, 1), F.lit(hexd))
        - 1
    ) % 10
    doc_split = F.when(bucket == 0, "test").when(bucket == 1, "val").otherwise("train")
    n_doc = df.select(doc_split.alias("s")).distinct().count()
    n_dom = domain_split(df, "pld").select("split").distinct().count()
    assert n_doc > 1  # doc-level split leaks the site across splits
    assert n_dom == 1  # domain-level split keeps the registrant together


def test_domain_split_rejects_degenerate_buckets(spark):
    from pdf_drawing_ocr_recognition_spark.operators.sampling import domain_split

    df = spark.createDataFrame([(1, "a.com")], "doc_id long, pld string")
    with pytest.raises(ValueError):
        domain_split(df, "pld", val_buckets=5, test_buckets=5)
