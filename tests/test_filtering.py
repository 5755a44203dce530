"""T56 domain-blocklist filtering: suffix semantics (exact, subdomain, case,
lookalike), allow mode, and the zero-corpus-shuffle broadcast plan."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.filtering import (
    domain_block_filter,
    mark_blocked_hosts,
)

HOSTS = [
    (0, "ads.example.com"),          # exact rule match
    (1, "ADS.EXAMPLE.COM"),          # case-folded exact match
    (2, "sub.ads.example.com"),      # subdomain of a rule
    (3, "example.com"),              # parent of a rule — NOT blocked
    (4, "badads.example.com"),       # label-boundary lookalike — NOT blocked
    (5, "tracker.net"),              # exact match, 2-label rule
    (6, "a.b.c.d.e.tracker.net"),    # deep subdomain (7 labels)
    (7, "nottracker.net"),           # suffix-string lookalike — NOT blocked
    (8, "CDN.Tracker.NET"),          # case-folded subdomain
    (9, "news.example.org"),         # matches no rule
]
BLOCKED_IDS = {0, 1, 2, 5, 6, 8}


def _frames(spark):
    pages = spark.createDataFrame(HOSTS, "doc_id int, host string")
    bl = spark.createDataFrame(
        [("ads.example.com",), ("Tracker.net",), ("spam.example.org",)],
        "suffix string",
    )
    return pages, bl


class TestDomainBlockFilter:
    def test_suffix_semantics(self, spark):
        pages, bl = _frames(spark)
        kept = {
            r["doc_id"] for r in domain_block_filter(pages, "host", bl).collect()
        }
        assert kept == {i for i, _ in HOSTS} - BLOCKED_IDS

    def test_allow_mode_is_complement(self, spark):
        pages, bl = _frames(spark)
        allowed = {
            r["doc_id"]
            for r in domain_block_filter(pages, "host", bl, mode="allow").collect()
        }
        assert allowed == BLOCKED_IDS

    def test_invalid_mode_rejected(self, spark):
        pages, bl = _frames(spark)
        with pytest.raises(ValueError):
            domain_block_filter(pages, "host", bl, mode="drop")

    def test_duplicate_rules_do_not_duplicate_rows(self, spark):
        pages, _ = _frames(spark)
        bl = spark.createDataFrame(
            [("tracker.net",), ("tracker.net",), ("ads.example.com",)],
            "suffix string",
        )
        marked = mark_blocked_hosts(pages, "host", bl)
        assert marked.count() == len(HOSTS)
        assert marked.filter("is_blocked").count() == len(BLOCKED_IDS)

    def test_corpus_side_never_shuffles(self, spark):
        """Every ancestor join must plan as BroadcastHashJoin — no
        SortMergeJoin / ShuffledHashJoin anywhere, so corpus rows are marked
        entirely map-side (the only Exchanges belong to the tiny dim's
        distinct)."""
        pages, bl = _frames(spark)
        marked = mark_blocked_hosts(pages, "host", bl)
        plan = marked._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        assert plan.count("BroadcastHashJoin") == 7, plan  # 6 depths + full host
