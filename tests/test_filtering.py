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


class TestNgramNovelty:
    """T106: per-doc novelty vs a reference shingle set (corpus_prep)."""

    def test_known_overlap_fractions(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            ngram_novelty,
        )

        ref = spark.createDataFrame(
            [(100, "a b c d e f")], "doc_id long, text string"
        )  # ref shingles (n=3): abc bcd cde def
        docs = spark.createDataFrame(
            [
                (0, "a b c d e f"),      # all 4 shingles seen -> novelty 0
                (1, "x y z w"),          # none seen -> novelty 1e6
                (2, "a b c q x y z"),    # 1 of 5 seen -> 800000
                (3, "a b"),              # too short: no shingles -> dropped
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_seen"], r["novelty_ppm"])
            for r in ngram_novelty(docs, ref, n=3).collect()
        }
        assert got[0] == (4, 4, 0)
        assert got[1] == (2, 0, 1000000)
        assert got[2] == (5, 1, 800000)
        assert 3 not in got

    def test_distinct_shingles_not_occurrences(self, spark):
        """A repeated shingle counts once in both numerator and denominator."""
        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            ngram_novelty,
        )

        ref = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(0, "a b c a b c")], "doc_id long, text string"
        )
        # 3-shingles: "a b c","b c a","c a b","a b c" -> 3 distinct, 1 seen
        [(r_sh, r_seen)] = [
            (r["n_shingles"], r["n_seen"])
            for r in ngram_novelty(docs, ref, n=3).collect()
        ]
        assert (r_sh, r_seen) == (3, 1)

    def test_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            ngram_novelty,
        )

        d = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            ngram_novelty(d, d, n=0)
        with pytest.raises(ValueError):
            ngram_novelty(d, d, scale=0)


class TestUrlTemplateFarms:
    def _run(self, spark, rows, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            url_template_farms,
        )

        df = spark.createDataFrame(rows, ["url", "text"])
        return {
            (r["host"], r["template"]): (
                r["n_pages"], r["n_distinct_texts"], r["dup_ratio_ppm"]
            )
            for r in url_template_farms(df, **kw).collect()
        }

    def test_farm_detected_hex_masked_before_digits(self, spark):
        rows = [
            (f"https://spam.example.com/cal/2024/{d}?sid=deadbeef{d:02d}", "same body")
            for d in range(4)
        ] + [
            ("https://ok.example.com/about", "a"),
            ("https://ok.example.com/contact", "b"),
        ]
        got = self._run(spark, rows)
        # the 10-char hex run (deadbeefNN) masks as ONE <h>, not <n>s
        key = ("spam.example.com", "/cal/<n>/<n>?sid=<h>")
        assert key in got
        assert got[key] == (4, 1, 750000)  # floor(1e6*3/4)
        # distinct-template singletons fall under min_pages
        assert not any(h == "ok.example.com" for h, _ in got)

    def test_distinct_content_not_flagged_as_dup(self, spark):
        rows = [
            (f"https://news.example.com/p/{d}", f"unique body {d}")
            for d in range(5)
        ]
        got = self._run(spark, rows)
        assert got == {("news.example.com", "/p/<n>"): (5, 5, 0)}

    def test_fragment_excluded_query_kept(self, spark):
        rows = [
            ("https://a.example.com/x?page=1#frag", "t1"),
            ("https://a.example.com/x?page=2", "t2"),
        ]
        got = self._run(spark, rows)
        assert got == {("a.example.com", "/x?page=<n>"): (2, 2, 0)}


class TestRegisteredDomains:
    def _run(self, spark, hosts, psl):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            registered_domains,
        )

        df = spark.createDataFrame([(h,) for h in hosts], ["host"])
        pd_ = spark.createDataFrame([(s,) for s in psl], ["suffix"])
        return {
            r["host"]: r["pld"]
            for r in registered_domains(df, "host", pd_).collect()
        }

    def test_longest_suffix_wins_and_null_for_suffix_hosts(self, spark):
        psl = ["com", "uk", "co.uk", "io", "github.io"]
        got = self._run(
            spark,
            ["Blog.Shop.A.co.uk", "a.co.uk", "co.uk", "x.github.io",
             "deep.x.github.io", "plain.io"],
            psl,
        )
        assert got["Blog.Shop.A.co.uk"] == "a.co.uk"   # longest rule, lc
        assert got["a.co.uk"] == "a.co.uk"
        assert got["co.uk"] is None                    # suffix itself
        assert got["x.github.io"] == "x.github.io"     # github.io beats io
        assert got["deep.x.github.io"] == "x.github.io"
        assert got["plain.io"] == "plain.io"

    def test_unmatched_fallback_last_two_labels(self, spark):
        got = self._run(spark, ["a.b.weirdtld", "single"], ["com"])
        assert got["a.b.weirdtld"] == "b.weirdtld"
        assert got["single"] == "single"

    def test_no_corpus_side_exchange(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            registered_domains,
        )

        df = spark.createDataFrame([("a.com",)], ["host"])
        psl = spark.createDataFrame([("com",)], ["suffix"])
        plan = (
            registered_domains(df, "host", psl)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # every depth join broadcasts the PSL dim; the corpus side never
        # sort-merge-joins (the only Exchange in the plan is the tiny dim's
        # own distinct)
        assert plan.count("BroadcastHashJoin") >= 6
        assert "SortMergeJoin" not in plan, plan


class TestLanguageMixture:
    """T143 — per-host language-mixture Gini (language_mixture)."""

    def test_pure_host_gini_zero_and_mt_farm_high(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            language_mixture,
        )

        rows = [("pure", "en")] * 6
        rows += [("farm", l) for l in ["en", "de", "fr", "it", "nl", "pt"]]
        df = spark.createDataFrame(rows, "host string, lang string")
        out = {r["host"]: r for r in language_mixture(df, "host").collect()}
        assert out["pure"]["lang_gini_ppm"] == 0
        assert out["pure"]["n_langs"] == 1
        # 6 langs x 1 doc: gini = 1 - 6*(1/36) = 5/6
        assert out["farm"]["lang_gini_ppm"] == 833333
        assert out["farm"]["n_langs"] == 6

    def test_hand_computed_skewed_mixture(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            language_mixture,
        )

        # 3 en + 1 de: gini = 1 - (9+1)/16 = 6/16 = 0.375
        rows = [("h", "en")] * 3 + [("h", "de")]
        df = spark.createDataFrame(rows, "host string, lang string")
        [r] = language_mixture(df, "host").collect()
        assert r["n_docs"] == 4 and r["n_langs"] == 2
        assert r["lang_gini_ppm"] == 375000

    def test_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.filtering import (
            language_mixture,
        )

        rows = [(f"h{i % 5}", f"l{(i * 3) % 4}") for i in range(60)]
        df = spark.createDataFrame(rows, "host string, lang string")
        a = sorted(map(tuple, language_mixture(df, "host").collect()))
        b = sorted(
            map(tuple, language_mixture(df.repartition(11), "host").collect())
        )
        assert a == b


class TestDuplicationRate:
    """T180: corpus duplication-rate audit — hand-computed ppm."""

    def test_hand_computed_values(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            duplication_rate,
        )

        docs = spark.createDataFrame(
            [
                (1, "a", "one two three four five six"),
                (2, "a", "one two three four five"),
                (3, "b", "unique words only here now"),
                (4, "b", "shorty"),  # < 5 words: no grams, no denominator
            ],
            "doc_id long, source string, text string",
        )
        rows = {
            r["source"]: r for r in duplication_rate(docs, n=5).collect()
        }
        # source a: grams {g1 x2 (docs 1+2), g2 x1}; g1 total 2 -> dup
        assert rows["a"]["n_grams"] == 3
        assert rows["a"]["n_dup_grams"] == 2
        assert rows["a"]["dup_ppm"] == 666666
        # source b: one unique gram
        assert rows["b"]["n_grams"] == 1
        assert rows["b"]["n_dup_grams"] == 0
        assert rows["b"]["dup_ppm"] == 0

    def test_within_source_repeat_counts(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            duplication_rate,
        )

        docs = spark.createDataFrame(
            [(1, "a", "x y z w v"), (2, "a", "x y z w v")],
            "doc_id long, source string, text string",
        )
        r = duplication_rate(docs, n=5).collect()[0]
        assert (r["n_grams"], r["n_dup_grams"], r["dup_ppm"]) == (
            2, 2, 1000000,
        )

    def test_validation(self, spark):
        import pytest as _pytest

        from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
            duplication_rate,
        )

        docs = spark.createDataFrame(
            [(1, "a", "x")], "doc_id long, source string, text string"
        )
        with _pytest.raises(ValueError, match="n must be"):
            duplication_rate(docs, n=0)
        with _pytest.raises(ValueError, match="scale must be"):
            duplication_rate(docs, scale=0)
