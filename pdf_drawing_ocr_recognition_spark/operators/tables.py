"""HTML-table extraction operator — kernel/html_tables.py batched over Arrow.

Web tables are a first-class training-data payload (relational facts,
infoboxes, spec sheets); this operator recovers the same ordered
(table, row, col) → text grid the reference assembles from rule-line
detection (SURVEY.md A11/M2-M3), from declarative ``<table>`` markup.

Same plumbing contract as ``extract_page_links``/``extract_page_meta``:
ONE narrow ``mapInPandas`` stage — embarrassingly parallel, no shuffle,
no per-row Python UDF; bytes decode with 'replace' so hostile encodings
degrade instead of throwing.  At 10^12 documents the stage's cost is the
scan itself; the explode fan-out (cells per page) is bounded by page size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_SCHEMA = (
    "url STRING, table_idx INT, row_idx INT, col_idx INT, "
    "rowspan INT, colspan INT, is_header BOOLEAN, cell_text STRING"
)


def extract_html_tables(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per table CELL, grid-placed by the
    WHATWG placement algorithm (rowspan/colspan occupancy, auto-closing,
    nested-table isolation — kernel/html_tables.py).  Pages without
    tables contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.html_tables import extract_tables

        cols = [
            "url",
            "table_idx",
            "row_idx",
            "col_idx",
            "rowspan",
            "colspan",
            "is_header",
            "cell_text",
        ]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for c in extract_tables(text):
                    rows.append(
                        (
                            url,
                            c["table_idx"],
                            c["row_idx"],
                            c["col_idx"],
                            c["rowspan"],
                            c["colspan"],
                            c["is_header"],
                            c["text"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, CELL_SCHEMA)


def table_shape_stats(cells: DataFrame) -> DataFrame:
    """Per (url, table_idx) shape rollup — the "cell-count histogram"
    metric family of BASELINE.json's north star: row/cell/header counts
    and the rightmost occupied column.  ONE map-side-combinable hash agg
    over the cell stream."""
    return (
        cells.groupBy("url", "table_idx")
        .agg(
            (F.max("row_idx") + 1).cast("int").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(F.col("is_header").cast("bigint"))
            .cast("bigint")
            .alias("n_header_cells"),
            (F.max(F.col("col_idx") + F.col("colspan"))).cast("int").alias(
                "n_col_slots"
            ),
        )
    )
