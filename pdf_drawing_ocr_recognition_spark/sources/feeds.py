"""Feed source operator — kernel/feed.py batched over Arrow.

The freshness read between full crawls: explode every RSS/Atom feed into
its entry rows.  Same narrow-Arrow, files-as-parallelism contract as
``sources/sitemaps.py`` (feeds are small by protocol convention — readers
poll them); composes with politeness (T63/T64) and recrawl tiers (T120).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEED_SCHEMA = (
    "feed_url STRING, kind STRING, link STRING, title STRING, "
    "published STRING, entry_id STRING"
)


def harvest_feeds(blobs: DataFrame) -> DataFrame:
    """(feed_url, content[binary|string]) → one row per feed entry:
    (feed_url, kind, link, title, published, entry_id).  Malformed feeds
    contribute no rows, never a failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.feed import parse_feed

        for pdf in batches:
            rows = []
            for url, content in zip(pdf["feed_url"], pdf["content"]):
                text = (
                    content.decode("utf-8", "replace")
                    if isinstance(content, (bytes, bytearray))
                    else content
                )
                parsed = parse_feed(text)
                for e in parsed["entries"]:
                    rows.append(
                        (
                            url,
                            parsed["kind"],
                            e["link"],
                            e["title"],
                            e["published"],
                            e["entry_id"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "feed_url",
                    "kind",
                    "link",
                    "title",
                    "published",
                    "entry_id",
                ],
            )

    return blobs.select("feed_url", "content").mapInPandas(run, FEED_SCHEMA)
