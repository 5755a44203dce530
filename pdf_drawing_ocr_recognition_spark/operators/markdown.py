"""Markdown-rendering operator — kernel/markdown.py batched over Arrow.

The corpus-serialization pass: pages → their markdown projections, ONE
narrow ``mapInPandas`` stage (no shuffle, bytes decoded with 'replace'),
ready for chunking/packing downstream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MD_SCHEMA = "url STRING, markdown STRING"


def render_pages_markdown(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → (url, markdown)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.markdown import render_markdown

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                rows.append((url, render_markdown(text)))
            yield pd.DataFrame(rows, columns=["url", "markdown"])

    return pages.select("url", "html").mapInPandas(run, MD_SCHEMA)
