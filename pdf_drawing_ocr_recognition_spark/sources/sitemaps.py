"""Sitemap source operator — kernel/sitemap.py batched over Arrow.

The frontier-seeding read a crawl runs before fetching anything: explode
every sitemap into its URL entries (or an index into its shard list), keep
the scheduler fields.  One narrow ``mapInPandas`` stage — the protocol's
50k-URL/50 MB per-file cap makes files the natural unit of parallelism, so
no shuffle and no skew by construction.  Output composes directly with the
politeness/budget operators (T63/T64/T70) and recrawl tiers (T120).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ENTRY_SCHEMA = (
    "sitemap_url STRING, kind STRING, loc STRING, lastmod STRING, "
    "changefreq STRING, priority STRING"
)


def harvest_sitemaps(blobs: DataFrame) -> DataFrame:
    """(sitemap_url, content[binary|string]) → one row per sitemap entry:
    (sitemap_url, kind, loc, lastmod, changefreq, priority).  Sitemaps with
    no recognizable root or no loc-bearing entries produce no rows (a
    malformed sitemap is an empty frontier contribution, not a job
    failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.sitemap import parse_sitemap

        for pdf in batches:
            rows = []
            for url, content in zip(pdf["sitemap_url"], pdf["content"]):
                text = (
                    content.decode("utf-8", "replace")
                    if isinstance(content, (bytes, bytearray))
                    else content
                )
                parsed = parse_sitemap(text)
                for e in parsed["entries"]:
                    rows.append(
                        (
                            url,
                            parsed["kind"],
                            e["loc"],
                            e["lastmod"],
                            e["changefreq"],
                            e["priority"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url",
                    "kind",
                    "loc",
                    "lastmod",
                    "changefreq",
                    "priority",
                ],
            )

    return blobs.select("sitemap_url", "content").mapInPandas(run, ENTRY_SCHEMA)
