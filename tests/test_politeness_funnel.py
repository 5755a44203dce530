"""Crawl-politeness operators (robots REP matching, crawl-delay scheduling)
and the Gopher-style quality funnel."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# quality funnel
# ---------------------------------------------------------------------------


def _funnel_fixture(spark):
    return spark.createDataFrame(
        [
            (1, 10, "pass-all"),
            (2, 3, "fail-a"),       # fails A only
            (3, 3, "fail-a"),       # fails A only
            (4, 10, "fail-b"),      # fails B only
            (5, 3, "fail-b"),       # fails A and B -> attributed to A
        ],
        "id int, x int, tag string",
    )


def test_funnel_first_fail_attribution(spark):
    from pdf_drawing_ocr_recognition_spark.operators.quality_funnel import (
        filter_funnel,
    )

    df = _funnel_fixture(spark)
    rules = [
        ("rule_a", F.col("x") >= 5),
        ("rule_b", ~F.col("tag").startswith("fail-b")),
    ]
    rows = {r["rule"]: r for r in filter_funnel(df, rules).collect()}
    assert rows["rule_a"]["n_in"] == 5
    # ids 2, 3, 5 fail rule_a (5 double-fails but attributes to the FIRST)
    assert rows["rule_a"]["n_dropped"] == 3
    assert rows["rule_a"]["n_out"] == 2
    assert rows["rule_b"]["n_in"] == 2
    assert rows["rule_b"]["n_dropped"] == 1
    assert rows["rule_b"]["n_out"] == 1


def test_funnel_survivors_match_last_n_out(spark):
    from pdf_drawing_ocr_recognition_spark.operators.quality_funnel import (
        apply_funnel,
        filter_funnel,
    )

    df = _funnel_fixture(spark)
    rules = [
        ("rule_a", F.col("x") >= 5),
        ("rule_b", ~F.col("tag").startswith("fail-b")),
    ]
    funnel = filter_funnel(df, rules).collect()
    kept = apply_funnel(df, rules)
    assert kept.count() == funnel[-1]["n_out"]
    assert {r["id"] for r in kept.collect()} == {1}


def test_funnel_null_predicate_counts_as_drop(spark):
    from pdf_drawing_ocr_recognition_spark.operators.quality_funnel import (
        filter_funnel,
    )

    df = spark.createDataFrame([(1, None), (2, "ok")], "id int, s string")
    rules = [("non_null_prefix", F.col("s").startswith("o"))]
    rows = filter_funnel(df, rules).collect()
    assert rows[0]["n_dropped"] == 1 and rows[0]["n_out"] == 1


def test_funnel_zero_drop_rule_and_empty_rules_error(spark):
    from pdf_drawing_ocr_recognition_spark.operators.quality_funnel import (
        filter_funnel,
        first_fail_label,
    )

    df = _funnel_fixture(spark)
    rows = filter_funnel(df, [("never_drops", F.lit(True))]).collect()
    assert rows[0]["n_in"] == 5 and rows[0]["n_dropped"] == 0
    with pytest.raises(ValueError):
        first_fail_label([])


# ---------------------------------------------------------------------------
# robots REP matching
# ---------------------------------------------------------------------------


def _robots(spark, pages, rules):
    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        robots_filter,
    )

    pages_df = spark.createDataFrame(pages, "doc_id int, host string, path string")
    rules_df = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    out = robots_filter(pages_df, rules_df)
    return {r["doc_id"]: r["is_allowed"] for r in out.collect()}


def test_robots_longest_match_wins(spark):
    decided = _robots(
        spark,
        [(1, "a.com", "/article/x"), (2, "a.com", "/other")],
        [("a.com", "/", False), ("a.com", "/article/", True)],
    )
    assert decided == {1: True, 2: False}


def test_robots_tie_allow_wins_and_no_rule_allows(spark):
    decided = _robots(
        spark,
        [(1, "a.com", "/api/v1/x"), (2, "norules.com", "/anything")],
        [("a.com", "/api/v1/", False), ("a.com", "/api/v1/", True)],
    )
    assert decided == {1: True, 2: True}


def test_robots_draft_subtree_blocked_under_allowed_tree(spark):
    decided = _robots(
        spark,
        [(1, "a.com", "/article/draft/1"), (2, "a.com", "/article/1")],
        [("a.com", "/article/", True), ("a.com", "/article/draft/", False)],
    )
    assert decided == {1: False, 2: True}


def test_robots_rules_for_other_hosts_never_match(spark):
    decided = _robots(
        spark,
        [(1, "b.com", "/admin/x")],
        [("a.com", "/admin/", False)],
    )
    assert decided == {1: True}


# ---------------------------------------------------------------------------
# politeness scheduling
# ---------------------------------------------------------------------------


def _sequential_schedule(ts_list, delay):
    """Reference implementation of sched_i = max(ts_i, sched_{i-1} + d)."""
    out, prev = [], None
    for ts in sorted(ts_list):
        s = ts if prev is None else max(ts, prev + delay)
        out.append(s)
        prev = s
    return out


def test_politeness_matches_sequential_recurrence(spark):
    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        politeness_schedule,
    )

    # bursty host: three requests at t=0 then a gap, plus a quiet host
    data = [("hot", t, i) for i, t in enumerate([0, 0, 0, 3, 40, 41])] + [
        ("cold", t, i) for i, t in enumerate([100, 200])
    ]
    df = spark.createDataFrame(data, "host string, ts_us long, event_id int")
    out = politeness_schedule(
        df, "host", "ts_us", order_cols=("event_id",), delay_us=10
    )
    got = {
        h: [r["sched_us"] for r in rows]
        for h, rows in (
            ("hot", out.filter(F.col("host") == "hot").orderBy("ts_us", "event_id").collect()),
            ("cold", out.filter(F.col("host") == "cold").orderBy("ts_us", "event_id").collect()),
        )
    }
    assert got["hot"] == _sequential_schedule([0, 0, 0, 3, 40, 41], 10)
    assert got["cold"] == _sequential_schedule([100, 200], 10)


def test_politeness_summary_exact_integers(spark):
    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        host_schedule_summary,
        politeness_schedule,
    )

    df = spark.createDataFrame(
        [("h", 0, 1), ("h", 0, 2), ("h", 5, 3)], "host string, ts_us long, event_id int"
    )
    sched = politeness_schedule(df, "host", "ts_us", ("event_id",), delay_us=10)
    row = host_schedule_summary(sched).collect()[0]
    # schedules: 0, 10, 20 -> waits 0 + 10 + 15, makespan 20
    assert row["n_fetches"] == 3
    assert row["total_wait_us"] == 25
    assert row["makespan_us"] == 20


def test_politeness_single_shuffle_plan(spark):
    """Window partitioning is reused by the per-host summary: exactly one
    Exchange in the whole plan."""
    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        host_schedule_summary,
        politeness_schedule,
    )

    df = spark.range(100).select(
        (F.col("id") % 7).cast("string").alias("host"),
        (F.col("id") * 37 % 1000).alias("ts_us"),
        F.col("id").alias("event_id"),
    )
    out = host_schedule_summary(
        politeness_schedule(df, "host", "ts_us", ("event_id",))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# threshold boilerplate-line removal (T69)
# ---------------------------------------------------------------------------


def _boiler(spark, rows, **kw):
    from pdf_drawing_ocr_recognition_spark.operators.dedup import (
        boilerplate_line_removal,
    )

    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = boilerplate_line_removal(df, "text", "doc_id", host_col="source", **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_boilerplate_removed_from_every_doc_including_first(spark):
    rows = [
        (1, "h", "FOOTER\nbody one"),
        (2, "h", "body two\nFOOTER"),
        (3, "h", "FOOTER\nbody three\nFOOTER"),
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got[1]["text"] == "body one"
    assert got[2]["text"] == "body two"
    assert got[3]["text"] == "body three"
    assert got[3]["n_lines_dropped"] == 2


def test_below_threshold_and_cross_host_lines_kept(spark):
    rows = [
        (1, "a", "SHARED\nuniq1"),
        (2, "a", "SHARED\nuniq2"),   # only 2 docs on host a -> kept
        (3, "b", "SHARED\nuniq3"),   # host b alone -> kept
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got[1]["text"] == "SHARED\nuniq1"
    assert got[3]["text"] == "SHARED\nuniq3"


def test_boilerplate_order_preserved_and_duplicate_doc_counts_once(spark):
    # the same doc repeating a line twice counts as ONE distinct doc
    rows = [
        (1, "h", "X\nmid\nX"),
        (2, "h", "X\nother"),
    ]
    got = _boiler(spark, rows, min_docs=3)
    assert got[1]["text"] == "X\nmid\nX"  # distinct-doc freq is 2 < 3
    rows3 = rows + [(3, "h", "pre\nX")]
    got3 = _boiler(spark, rows3, min_docs=3)
    assert got3[1]["text"] == "mid"
    assert got3[3]["text"] == "pre"


# ---------------------------------------------------------------------------
# crawl-budget waterfilling (T70)
# ---------------------------------------------------------------------------


def _ref_waterfill(dem: dict, budget: int) -> dict:
    """Brute-force reference: raise the level one unit at a time."""
    total = sum(dem.values())
    if budget >= total:
        return dict(dem)
    level = 0
    while sum(min(d, level + 1) for d in dem.values()) <= budget:
        level += 1
    base = {h: min(d, level) for h, d in dem.items()}
    leftover = budget - sum(base.values())
    capped = sorted(
        (h for h, d in dem.items() if d > level), key=lambda h: (-dem[h], h)
    )
    for h in capped[:leftover]:
        base[h] += 1
    return base


def _spark_waterfill(spark, dem: dict, budget: int) -> dict:
    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        crawl_budget_waterfill,
    )

    df = spark.createDataFrame(
        [(h, d) for h, d in dem.items()], "host string, demand long"
    )
    out = crawl_budget_waterfill(df, budget)
    return {r["host"]: r["alloc"] for r in out.collect()}


def test_waterfill_matches_reference_across_budgets(spark):
    dem = {"a": 100, "b": 40, "c": 40, "d": 7, "e": 1}
    total = sum(dem.values())
    for budget in (0, 3, 5, 50, 90, 150, total, total + 10):
        got = _spark_waterfill(spark, dem, budget)
        ref = _ref_waterfill(dem, budget)
        assert got == ref, (budget, got, ref)
        assert sum(got.values()) == min(budget, total)


def test_waterfill_negative_budget_rejected(spark):
    import pytest as _pytest

    from pdf_drawing_ocr_recognition_spark.operators.politeness import (
        crawl_budget_waterfill,
    )

    df = spark.createDataFrame([("a", 1)], "host string, demand long")
    with _pytest.raises(ValueError):
        crawl_budget_waterfill(df, -1)


class TestBotRegularity:
    """T156 — metronome detection (bot_regularity)."""

    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long"
        )

    def test_metronome_vs_bursty(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.politeness import (
            bot_regularity,
        )

        M = 60_000_000
        rows = [(1, i, i * 10 * M) for i in range(8)]          # exact 10-min beat
        rows += [(2, i, [0, 1, 2, 30, 31, 200, 201, 500][i] * M)
                 for i in range(8)]                            # bursty human
        out = {r["actor"]: r for r in bot_regularity(
            self._ev(spark, rows)).collect()}
        assert out[1]["cv2_ppm"] == 0
        assert out[1]["mean_gap_units"] == 10
        assert out[2]["cv2_ppm"] > 500000

    def test_min_gaps_and_zero_total_dropped(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.politeness import (
            bot_regularity,
        )

        M = 60_000_000
        rows = [(1, i, i * M) for i in range(3)]       # only 2 gaps
        rows += [(3, i, i * 1000 + 5_000_000) for i in range(6)]  # sub-minute
        out = {r["actor"] for r in bot_regularity(
            self._ev(spark, rows)).collect()}
        assert out == set()  # user1: too few gaps; user3: all-zero gaps

    def test_hand_computed_cv2(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.politeness import (
            bot_regularity,
        )

        M = 60_000_000
        # gaps 1,1,1,5 minutes: n=4, s=8, sq=28 -> cv2 = (4*28-64)/64 = 0.75
        ts = [0, 1, 2, 3, 8]
        rows = [(9, i, t * M) for i, t in enumerate(ts)]
        [r] = bot_regularity(self._ev(spark, rows)).collect()
        assert r["n_gaps"] == 4 and r["mean_gap_units"] == 2
        assert r["cv2_ppm"] == 750000
