"""End-to-end crawl-audit job (jobs/run_crawl_audit.py): metadata →
canonical groups → URL farms → host mirrors → recrawl tiers, one run."""

import json


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode()), t) for u, h, t in rows],
        "url STRING, html BINARY, text STRING",
    )


def _head(title, canonical=None, robots=None):
    parts = [f"<title>{title}</title>"]
    if robots:
        parts.append(f'<meta name="robots" content="{robots}">')
    if canonical:
        parts.append(f'<link rel="canonical" href="{canonical}">')
    return "<html><head>" + "".join(parts) + "</head><body>b</body></html>"


class TestCrawlAuditJob:
    def test_full_audit_sections_and_summary(self, spark, tmp_path, capsys):
        from jobs.run_crawl_audit import main

        cur = (
            # canonical pair: /alt declares /main
            [("http://a.com/main", _head("Main"), "main body")]
            + [("http://a.com/alt", _head("Alt", canonical="/main"), "alt body")]
            # farm: 4 calendar pages, one body; one is noindex
            + [
                (
                    f"http://spam.com/cal/2024/{d}",
                    _head(f"Day {d}", robots="noindex" if d == 0 else None),
                    "same calendar",
                )
                for d in range(4)
            ]
            # mirror pair: b.com mirrors m.com exactly (2 docs)
            + [("http://b.com/1", _head("x1"), "mx1"),
               ("http://b.com/2", _head("x2"), "mx2"),
               ("http://m.com/1", _head("x1"), "mx1"),
               ("http://m.com/2", _head("x2"), "mx2")]
        )
        prev = (
            [("http://a.com/main", "", "OLD body"),
             ("http://a.com/alt", "", "alt body")]
            + [(f"http://spam.com/cal/2024/{d}", "", "same calendar")
               for d in range(4)]
        )
        pages_p = str(tmp_path / "pages")
        prev_p = str(tmp_path / "prev")
        _pages(spark, cur).write.parquet(pages_p)
        spark.createDataFrame(
            [(u, t) for u, _, t in prev], "url STRING, text STRING"
        ).write.parquet(prev_p)

        rc = main(
            ["--pages", pages_p, "--prev", prev_p,
             "--out", str(tmp_path / "audit")],
            spark=spark,
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1].split(": ", 1)[1]
        )
        assert summary["pages"] == 10
        assert summary["noindex_pages"] == 1
        assert summary["farm_templates"] == 1  # /cal/<n>/<n> at 750000 ppm
        assert summary["mirror_pairs"] == 1
        # a.com + spam.com in both crawls, b.com/m.com churn-only → 'new'
        assert summary["hosts_tiered"] == 4

        aud = str(tmp_path / "audit")
        groups = {
            r["canonical_target"]: (r["n_pages"], r["keeper_url"])
            for r in spark.read.parquet(f"{aud}/canonical_groups").collect()
        }
        assert groups["http://a.com/main"] == (2, "http://a.com/alt")
        mirrors = spark.read.parquet(f"{aud}/host_mirrors").collect()
        assert [(m["host_a"], m["host_b"], m["jaccard_ppm"]) for m in mirrors] == [
            ("b.com", "m.com", 1000000)
        ]
        tiers = {
            r["host"]: r["tier"]
            for r in spark.read.parquet(f"{aud}/recrawl_tiers").collect()
        }
        assert tiers["a.com"] == "daily" and tiers["spam.com"] == "quarterly"
        assert tiers["b.com"] == "new" and tiers["m.com"] == "new"
