"""Heading-outline operators — kernel/headings.py batched over Arrow.

Same plumbing contract as the link/meta/table/code extractors: ONE narrow
``mapInPandas`` stage, bytes decoded with 'replace', fan-out bounded by
headings-per-page.  The profile rollup is a single map-side-combinable
hash aggregate — outline SHAPE (counts per level, depth, the h1 title
candidate) is the quality/spam feature, not the heading rows themselves.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEADING_SCHEMA = "url STRING, heading_idx INT, level INT, heading_text STRING"


def extract_page_headings(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per heading in document order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.headings import extract_headings

        cols = ["url", "heading_idx", "level", "heading_text"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for h in extract_headings(text):
                    rows.append((url, h["idx"], h["level"], h["text"]))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, HEADING_SCHEMA)


def heading_profile(headings: DataFrame) -> DataFrame:
    """Per-page outline profile: heading count, h1 count (a page with 40
    h1s is a spam signature), outline depth, and the FIRST h1's text as
    the title candidate (document-order min, deterministic).  ONE
    map-side-combinable hash aggregate.

    Returns (url, n_headings, n_h1, max_level, title_candidate) — the
    title is '' when the page has no h1.
    """
    first_h1 = F.min(
        F.when(
            F.col("level") == 1,
            F.struct(F.col("heading_idx"), F.col("heading_text")),
        )
    )
    return headings.groupBy("url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_headings"),
        F.sum((F.col("level") == 1).cast("bigint"))
        .cast("bigint")
        .alias("n_h1"),
        F.max("level").cast("int").alias("max_level"),
        F.coalesce(first_h1.getField("heading_text"), F.lit("")).alias(
            "title_candidate"
        ),
    )


SECTION_SCHEMA = (
    "url STRING, section_idx INT, level INT, title STRING, section_text STRING"
)


def extract_page_sections(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per outline section
    (kernel/headings.py:extract_sections) — heading + body-until-next-
    heading, the structure-aware chunking feed.  Same ONE-narrow-stage
    contract as the other extractors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.headings import extract_sections

        cols = ["url", "section_idx", "level", "title", "section_text"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for s in extract_sections(text):
                    rows.append((url, s["idx"], s["level"], s["title"], s["text"]))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, SECTION_SCHEMA)
