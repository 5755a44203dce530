"""End-to-end daily ingest job (jobs/run_daily_ingest.py): WARC → CDC delta
→ extraction → incremental dedup probe → state advance, across two days."""

import json

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import make_html
from pdf_drawing_ocr_recognition_spark.kernel.warc import build_warc


def _page(i: int, h: int) -> dict:
    html, _, _ = make_html(h, "en")
    return {
        "rec_type": "response",
        "url": f"https://t{i}.example/p",
        "date": "2024-03-05T00:00:00Z",
        "body": html,
    }


def _run(spark, tmp_path, capsys, day: str, records: list[dict], extra=()):
    from pdf_drawing_ocr_recognition_spark.sources.pattern_registry import (
        save_patterns,
    )
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from jobs.run_daily_ingest import main

    seg = tmp_path / f"warc_{day}"
    seg.mkdir(exist_ok=True)
    (seg / "part-000.warc").write_bytes(build_warc(records))
    pat = tmp_path / "patterns.json"
    if not pat.exists():
        save_patterns(PATTERNS, str(pat))
    rc = main(
        [
            "--warc", str(seg),
            "--patterns", str(pat),
            "--state", str(tmp_path / "state"),
            "--out", str(tmp_path / "out"),
            "--day", day,
            *extra,
        ],
        spark=spark,
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return summary


class TestDailyIngest:
    def test_two_day_ingest_processes_only_the_delta(
        self, spark, tmp_path, capsys
    ):
        day1 = [_page(i, 1000 + i) for i in range(4)]
        s1 = _run(spark, tmp_path, capsys, "d1", day1)
        assert s1["first_day"] and s1["pages_today"] == 4
        assert s1["delta_pages"] == 4  # everything is new on day 1
        surv1 = spark.read.parquet(s1["out"])
        assert surv1.count() == 4  # all unique content survives

        # day 2: pages 0-2 unchanged; page 3 changed body; one NEW url whose
        # content duplicates page 0 (must be dropped by the index probe);
        # one genuinely new page.
        day2 = [_page(i, 1000 + i) for i in range(3)]
        day2.append({**_page(3, 2000), "url": "https://t3.example/p"})
        day2.append({**_page(9, 1000), "url": "https://dup.example/p"})
        day2.append(_page(8, 3000))
        s2 = _run(spark, tmp_path, capsys, "d2", day2)
        assert not s2["first_day"] and s2["pages_today"] == 6
        # only changed(1) + added(2) pass the CDC gate — unchanged never
        # reaches extraction
        assert s2["delta_pages"] == 3
        surv2 = spark.read.parquet(s2["out"])
        urls2 = {r["url"] for r in surv2.select("url").collect()}
        # the content-dup url is dropped against day-1 history; the changed
        # and the new page survive
        assert urls2 == {"https://t3.example/p", "https://t8.example/p"}

        # state advanced: snapshot now holds day-2 urls
        snap = spark.read.parquet(str(tmp_path / "state" / "snapshot"))
        assert snap.count() == 6

    def test_rerun_of_same_day_is_idempotent_delta_zero(
        self, spark, tmp_path, capsys
    ):
        day1 = [_page(i, 500 + i) for i in range(3)]
        _run(spark, tmp_path, capsys, "d1", day1)
        s_again = _run(spark, tmp_path, capsys, "d1", day1)
        # identical crawl → zero delta, zero new survivors, state unchanged
        assert s_again["delta_pages"] == 0 and s_again["survivors"] == 0

    def test_hygiene_gates_blocklist_robots_and_funnel(
        self, spark, tmp_path, capsys
    ):
        day = [_page(i, 700 + i) for i in range(4)]
        # one page on a blocklisted domain, one under a robots-disallowed path
        day.append({**_page(5, 750), "url": "https://cdn.ads.tracker/p"})
        day.append({**_page(6, 760), "url": "https://t0.example/private/x"})
        (tmp_path / "bl.txt").write_text("# crawl blocklist\nads.tracker\n")
        (tmp_path / "robots.json").write_text(
            json.dumps([["t0.example", "/private/", False]])
        )
        s = _run(
            spark,
            tmp_path,
            capsys,
            "d1",
            day,
            extra=(
                "--blocklist", str(tmp_path / "bl.txt"),
                "--robots", str(tmp_path / "robots.json"),
                "--quality-funnel",
            ),
        )
        assert s["blocked_urls"] == 1
        assert s["robots_disallowed"] == 1
        # only the 4 clean pages reach CDC/extraction
        assert s["pages_today"] == 4 and s["delta_pages"] == 4
        # funnel accounting is consistent: extracted = survivors + dropped
        surv = spark.read.parquet(s["out"])
        urls = {r["url"] for r in surv.select("url").collect()}
        assert "https://cdn.ads.tracker/p" not in urls
        assert "https://t0.example/private/x" not in urls
        assert surv.count() + s["quality_dropped"] == 4
