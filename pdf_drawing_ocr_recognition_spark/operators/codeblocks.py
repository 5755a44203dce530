"""Code-block harvesting operator — kernel/codeblocks.py batched over Arrow.

Same plumbing contract as the table/link/meta extractors: ONE narrow
``mapInPandas`` stage (no shuffle, no per-row Python UDF), bytes decoded
with 'replace' so hostile encodings degrade instead of throwing; the
explode fan-out is bounded by blocks-per-page.  The per-doc density
rollup is a single map-side-combinable hash aggregate LEFT-joined back to
the page frame so code-free pages report zeros (absence is a signal —
code-density stratification wants both tails).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SCHEMA = (
    "url STRING, block_idx INT, tag STRING, lang_hint STRING, "
    "code_text STRING"
)


def extract_page_code_blocks(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per maximal <pre>/<code> block with
    verbatim (indentation-preserving) text — see kernel/codeblocks.py.
    Pages without code contribute no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.codeblocks import extract_code_blocks

        cols = ["url", "block_idx", "tag", "lang_hint", "code_text"]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for b in extract_code_blocks(text):
                    rows.append((url, b["idx"], b["tag"], b["lang_hint"], b["text"]))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(run, BLOCK_SCHEMA)


def code_density(pages: DataFrame, blocks: DataFrame) -> DataFrame:
    """Per-page code density: block count, code chars, and code chars as
    exact ppm of the page's HTML length — the stratification signal for
    code-aware corpus mixing ("keep code-heavy pages for the code mix,
    drop code-free ones from it").  One hash agg + one key join; the
    LEFT join keeps zero-block pages.

    Returns (url, n_code_blocks, code_chars, code_char_ppm).
    """
    rollup = blocks.groupBy("url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_code_blocks"),
        F.sum(F.length("code_text")).cast("bigint").alias("code_chars"),
    )
    base = pages.select(
        "url", F.length(F.decode(F.col("html"), "utf-8")).cast("bigint").alias("_hl")
    )
    # two selects: the ppm expression must bind the COALESCED counts, and
    # re-aliasing a name beside an expression that references it is the
    # lateral-alias shadowing hazard (CLAUDE.md rule) — split, don't stack.
    filled = base.join(rollup, "url", "left").select(
        "url",
        "_hl",
        F.coalesce("n_code_blocks", F.lit(0)).cast("bigint").alias(
            "n_code_blocks"
        ),
        F.coalesce("code_chars", F.lit(0)).cast("bigint").alias("code_chars"),
    )
    return filled.select(
        "url",
        "n_code_blocks",
        "code_chars",
        F.when(F.col("_hl") <= 0, F.lit(0))
        .otherwise(F.expr("code_chars * 1000000 div _hl"))
        .cast("bigint")
        .alias("code_char_ppm"),
    )
