"""List-extraction operator — kernel/lists.py batched over Arrow.

Same plumbing contract as the table/code/heading extractors: ONE narrow
``mapInPandas`` stage, bytes decoded with 'replace', fan-out bounded by
items-per-page.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITEM_SCHEMA = (
    "url STRING, list_idx INT, depth INT, ordered BOOLEAN, "
    "item_idx INT, item_text STRING"
)


def extract_page_lists(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per list item in document order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.lists import extract_list_items

        cols = ["url", "list_idx", "depth", "ordered", "item_idx", "item_text"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for it in extract_list_items(text):
                    rows.append(
                        (
                            url,
                            it["list_idx"],
                            it["depth"],
                            it["ordered"],
                            it["item_idx"],
                            it["text"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, ITEM_SCHEMA)
