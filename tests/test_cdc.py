"""T55 snapshot diff (CDC): classification law, null sentinel, carry-column
coalesce, and the bucketed zero-Exchange layout."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.cdc import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _collect_map(df):
    return {r["k"]: r["change_type"] for r in df.collect()}


class TestSnapshotDiff:
    def test_classification_law(self, spark):
        old = spark.createDataFrame(
            [(1, "same"), (2, "was"), (3, "gone")], "k int, body string"
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "now"), (4, "fresh")], "k int, body string"
        )
        got = _collect_map(snapshot_diff(old, new, "k", ["body"]))
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_null_vs_empty_and_column_shift(self, spark):
        # (NULL, "x") vs ("", "x") and ("a", "b") vs ("ab", "") must both be
        # `changed` — the digest's NUL sentinel keeps nulls and column
        # boundaries distinguishable.
        old = spark.createDataFrame(
            [(1, None, "x"), (2, "a", "b")], "k int, a string, b string"
        )
        new = spark.createDataFrame(
            [(1, "", "x"), (2, "ab", "")], "k int, a string, b string"
        )
        got = _collect_map(snapshot_diff(old, new, "k", ["a", "b"]))
        assert got == {1: "changed", 2: "changed"}

    def test_carry_cols_coalesce_new_over_old(self, spark):
        old = spark.createDataFrame(
            [(1, "t", "en"), (2, "t", "de")], "k int, body string, lang string"
        )
        new = spark.createDataFrame(
            [(1, "t2", "fr"), (3, "t", "es")], "k int, body string, lang string"
        )
        rows = {
            r["k"]: (r["change_type"], r["lang"])
            for r in snapshot_diff(
                old, new, "k", ["body"], carry_cols=["lang"]
            ).collect()
        }
        # changed row carries the NEW value; removed carries last-known OLD.
        assert rows == {
            1: ("changed", "fr"),
            2: ("removed", "de"),
            3: ("added", "es"),
        }

    def test_empty_compare_cols_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "k int, body string")
        with pytest.raises(ValueError):
            snapshot_diff(df, df, "k", [])

    def test_summary_counts(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        old = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
        new = docs.filter(F.col("doc_id") % 10 != 1).select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit("!")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        got = {
            r["change_type"]: r["n"]
            for r in snapshot_diff_summary(old, new, "doc_id", ["text"]).collect()
        }
        n = docs.count()
        ids = [r[0] for r in docs.select("doc_id").collect()]
        expect = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
        for i in ids:
            if i % 10 == 0:
                expect["added"] += 1
            elif i % 10 == 1:
                expect["removed"] += 1
            elif i % 7 == 0:
                expect["changed"] += 1
            else:
                expect["unchanged"] += 1
        assert got == {k: v for k, v in expect.items() if v} and sum(
            got.values()
        ) == len(set(ids)) == n

    def test_bucketed_snapshots_diff_with_zero_exchange(self, spark, sf_dir):
        """Daily layout: both snapshots bucketed on the key → the full-outer
        diff join needs NO Exchange (the T44 index layout reused for CDC)."""
        from pdf_drawing_ocr_recognition_spark.operators.skew import write_bucketed

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_bucketed(
            docs.select("doc_id", "text"), "cdc_old", 8, "doc_id", "doc_id"
        )
        write_bucketed(
            docs.select("doc_id", "text").filter(F.col("doc_id") % 3 != 0),
            "cdc_new",
            8,
            "doc_id",
            "doc_id",
        )
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            diff = snapshot_diff(
                spark.table("cdc_old"), spark.table("cdc_new"), "doc_id", ["text"]
            )
            plan = diff._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            got = {
                r["change_type"]: r["n"]
                for r in diff.groupBy("change_type").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            n = docs.count()
            n_removed = docs.filter(F.col("doc_id") % 3 == 0).count()
            assert got == {"removed": n_removed, "unchanged": n - n_removed}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            spark.sql("DROP TABLE IF EXISTS cdc_old")
            spark.sql("DROP TABLE IF EXISTS cdc_new")


class TestCategoryDrift:
    """T78: exact-rational day-over-day total-variation drift."""

    def _drift(self, spark, rows):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import (
            category_drift,
        )

        df = spark.createDataFrame(rows, "ts TIMESTAMP, cat STRING")
        out = category_drift(df, "ts", "cat")
        return {
            str(r["day"]): (r["tvd_num"], r["tvd_den"], r["tvd"])
            for r in out.collect()
        }

    def test_identical_mix_zero_and_disjoint_mix_one(self, spark):
        from datetime import datetime as dt

        rows = (
            # day 1: 2a + 2b; day 2: same mix (scaled) -> TVD 0
            [(dt(2024, 1, 1, 1), "a")] * 2 + [(dt(2024, 1, 1, 2), "b")] * 2
            + [(dt(2024, 1, 2, 1), "a")] * 3 + [(dt(2024, 1, 2, 2), "b")] * 3
            # day 3: all c (c appears, a/b vanish) -> TVD 1
            + [(dt(2024, 1, 3, 1), "c")] * 4
        )
        got = self._drift(spark, rows)
        assert got["2024-01-02"][2] == 0.0
        assert got["2024-01-03"][2] == 1.0
        assert "2024-01-01" not in got  # no previous day

    def test_hand_computed_rational(self, spark):
        from datetime import datetime as dt

        # day1: a=3, b=1 (N=4); day2: a=1, b=1 (N=2)
        # TVD = (|1*4-3*2| + |1*4-1*2|)/(2*2*4) = (2+2)/16 = 0.25
        rows = (
            [(dt(2024, 1, 1, 1), "a")] * 3 + [(dt(2024, 1, 1, 2), "b")]
            + [(dt(2024, 1, 2, 1), "a"), (dt(2024, 1, 2, 2), "b")]
        )
        got = self._drift(spark, rows)
        assert got["2024-01-02"] == (4, 16, 0.25)


class TestRecrawlTiers:
    def _run(self, spark, old_rows, new_rows, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import recrawl_tiers

        o = spark.createDataFrame(old_rows, ["k", "text", "host"])
        n = spark.createDataFrame(new_rows, ["k", "text", "host"])
        return {
            r["host"]: (
                r["n_common"], r["n_changed"], r["n_added"], r["n_removed"],
                r["change_ppm"], r["tier"],
            )
            for r in recrawl_tiers(o, n, "k", ["text"], "host", **kw).collect()
        }

    def test_tier_thresholds_and_churn(self, spark):
        old = (
            [(i, f"t{i}", "hot.com") for i in range(4)]
            + [(10 + i, f"t{i}", "warm.com") for i in range(10)]
            + [(30 + i, f"t{i}", "cold.com") for i in range(3)]
            + [(50, "gone", "warm.com")]
        )
        new = (
            [(i, f"t{i}'", "hot.com") for i in range(3)] + [(3, "t3", "hot.com")]
            + [(10 + i, ("t0x" if i == 0 else f"t{i}"), "warm.com")
               for i in range(10)]
            + [(30 + i, f"t{i}", "cold.com") for i in range(3)]
            + [(60, "fresh", "brand.example")]
        )
        got = self._run(spark, old, new)
        assert got["hot.com"] == (4, 3, 0, 0, 750000, "daily")
        assert got["warm.com"] == (10, 1, 0, 1, 100000, "weekly")
        assert got["cold.com"] == (3, 0, 0, 0, 0, "quarterly")
        assert got["brand.example"] == (0, 0, 1, 0, -1, "new")

    def test_monthly_band_and_exact_ppm(self, spark):
        old = [(i, f"t{i}", "slow.com") for i in range(100)]
        new = [(i, ("CHANGED" if i == 0 else f"t{i}"), "slow.com")
               for i in range(100)]
        got = self._run(spark, old, new)
        assert got["slow.com"] == (100, 1, 0, 0, 10000, "monthly")


class TestLinkChurn:
    """T149 — between-crawl link churn (link_churn)."""

    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src_host string, dst_host string")

    def test_added_removed_stable_counted(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import link_churn

        prev = [("h", "a"), ("h", "b"), ("h", "gone")]
        cur = [("h", "a"), ("h", "b"), ("h", "fresh1"), ("h", "fresh2")]
        [r] = link_churn(
            self._edges(spark, prev), self._edges(spark, cur)
        ).collect()
        assert (r["n_added"], r["n_removed"], r["n_stable"]) == (2, 1, 2)
        assert r["churn_ppm"] == 600000  # (2+1)/5

    def test_self_loops_and_dups_ignored(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import link_churn

        prev = [("h", "h"), ("h", "a"), ("h", "a")]
        cur = [("h", "a")]
        [r] = link_churn(
            self._edges(spark, prev), self._edges(spark, cur)
        ).collect()
        assert (r["n_added"], r["n_removed"], r["n_stable"]) == (0, 0, 1)
        assert r["churn_ppm"] == 0

    def test_fully_rotated_host(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import link_churn

        prev = [("rot", "s1"), ("rot", "s2")]
        cur = [("rot", "s3"), ("rot", "s4")]
        [r] = link_churn(
            self._edges(spark, prev), self._edges(spark, cur)
        ).collect()
        assert r["churn_ppm"] == 1000000 and r["n_stable"] == 0


class TestSitemapCoverage:
    """T150 — sitemap-vs-crawl coverage (sitemap_coverage)."""

    def _urls(self, spark, urls):
        return spark.createDataFrame([(u,) for u in urls], "url string")

    def test_both_gap_directions(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.politeness import (
            sitemap_coverage,
        )

        declared = [f"http://a.com/p/{i}" for i in range(4)]
        crawled = [f"http://a.com/p/{i}" for i in range(2, 7)]
        [r] = sitemap_coverage(
            self._urls(spark, declared), self._urls(spark, crawled)
        ).collect()
        assert (r["n_sitemap"], r["n_crawled"], r["n_both"]) == (4, 5, 2)
        assert r["coverage_ppm"] == 500000    # 2/4 declared got crawled
        assert r["undeclared_ppm"] == 600000  # 3/5 fetched undeclared

    def test_no_sitemap_host_reports_null_coverage(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.politeness import (
            sitemap_coverage,
        )

        out = {
            r["host"]: r
            for r in sitemap_coverage(
                self._urls(spark, ["http://a.com/1"]),
                self._urls(spark, ["http://b.com/1"]),
            ).collect()
        }
        assert out["b.com"]["coverage_ppm"] is None
        assert out["b.com"]["undeclared_ppm"] == 1000000
        assert out["a.com"]["coverage_ppm"] == 0
        assert out["a.com"]["undeclared_ppm"] is None


class TestScd2Merge:
    """T151 — SCD Type-2 history maintenance (scd2_merge)."""

    def _batch(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, policy string, as_of long"
        )

    def _fold(self, spark, batches):
        from pdf_drawing_ocr_recognition_spark.operators.cdc import scd2_merge

        hist = None
        for b in batches:
            hist = scd2_merge(hist, self._batch(spark, b), "host", ["policy"])
        return {
            (r["host"], r["valid_from"]): (r["policy"], r["valid_to"])
            for r in hist.collect()
        }

    def test_change_closes_and_inserts(self, spark):
        h = self._fold(
            spark,
            [
                [("a", "allow", 1), ("b", "deny", 1)],
                [("a", "deny", 2), ("b", "deny", 2)],
            ],
        )
        assert h[("a", 1)] == ("allow", 2)   # closed at the change
        assert h[("a", 2)] == ("deny", None)  # new open row
        assert h[("b", 1)] == ("deny", None)  # unchanged stays open
        assert len(h) == 3

    def test_absent_key_keeps_open_row(self, spark):
        h = self._fold(
            spark,
            [[("a", "allow", 1)], [("b", "deny", 2)]],
        )
        assert h[("a", 1)] == ("allow", None)
        assert h[("b", 2)] == ("deny", None)

    def test_reappearing_value_gets_new_interval(self, spark):
        h = self._fold(
            spark,
            [
                [("a", "x", 1)],
                [("a", "y", 2)],
                [("a", "x", 3)],
            ],
        )
        assert h[("a", 1)] == ("x", 2)
        assert h[("a", 2)] == ("y", 3)
        assert h[("a", 3)] == ("x", None)

    def test_null_attr_transitions(self, spark):
        """NULL-safe comparison: NULL->value and value->NULL are changes,
        NULL->NULL is not."""
        h = self._fold(
            spark,
            [
                [("a", None, 1)],
                [("a", None, 2)],
                [("a", "set", 3)],
            ],
        )
        assert h[("a", 1)] == (None, 3)
        assert h[("a", 3)] == ("set", None)
        assert len(h) == 2


def test_policy_at_fetch_edges(spark):
    """T153 — point-in-time lookup: a fetch during a closed interval gets
    the HISTORICAL policy; a fetch after the last change gets the open row
    (querying current policy would rewrite the past)."""
    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.operators.cdc import scd2_merge

    hist = None
    for day, pol in [(1, "allow"), (5, "deny")]:
        b = spark.createDataFrame(
            [("h", pol, day)], "host string, policy string, as_of long"
        )
        hist = scd2_merge(hist, b, "host", ["policy"])
    fetches = spark.createDataFrame(
        [(1, "h"), (3, "h"), (5, "h"), (9, "h")], "fetch_day long, fhost string"
    )
    j = fetches.join(
        hist,
        (F.col("fhost") == F.col("host"))
        & (F.col("valid_from") <= F.col("fetch_day"))
        & (F.col("valid_to").isNull() | (F.col("fetch_day") < F.col("valid_to"))),
    )
    got = {r["fetch_day"]: r["policy"] for r in j.collect()}
    assert got == {1: "allow", 3: "allow", 5: "deny", 9: "deny"}
    assert j.count() == 4  # exactly one interval matches each fetch
