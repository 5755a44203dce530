"""Page-metadata extraction operator — kernel/meta.py batched over Arrow.

Same plumbing contract as ``extract_page_links``: one narrow
``mapInPandas`` stage (no shuffle, no per-row Python UDF), bytes decoded
with 'replace' so hostile encodings degrade instead of throwing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "url STRING, title STRING, canonical STRING, meta_description STRING, "
    "meta_robots STRING, n_meta_tags INT"
)


def extract_page_meta(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one metadata row per page: title, resolved
    rel=canonical, the two metas pipelines act on (description → quality/
    display, robots → indexability gate), and the total meta-tag count.
    Embarrassingly parallel; composes with ``canonical_dedupe_key`` below.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.meta import extract_meta

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                m = extract_meta(text, base_url=url)
                rows.append(
                    (
                        url,
                        m["title"],
                        m["canonical"],
                        m["metas"].get("description"),
                        m["metas"].get("robots"),
                        len(m["metas"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "title",
                    "canonical",
                    "meta_description",
                    "meta_robots",
                    "n_meta_tags",
                ],
            )

    return pages.select("url", "html").mapInPandas(run, META_SCHEMA)


def canonical_groups(meta: DataFrame) -> DataFrame:
    """rel=canonical dedup groups: pages collapse onto their declared
    canonical target (RFC 6596), pages without a declaration stand for
    themselves.  One map-side-combinable hash agg keyed by the canonical
    URL — the publisher-declared twin of T48's rule-based URL dedup.
    Returns (canonical_target, n_pages, keeper_url) with keeper = the
    lexicographically-first member (deterministic, engine-portable).
    """
    target = F.coalesce(F.col("canonical"), F.col("url"))
    return (
        meta.select(target.alias("canonical_target"), "url")
        .groupBy("canonical_target")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.min("url").alias("keeper_url"),
        )
    )


HREFLANG_SCHEMA = "url STRING, hreflang STRING, alt_url STRING"


def extract_hreflang(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → one row per ``<link rel=alternate hreflang=…>``
    declaration: (url, hreflang, alt_url resolved).  The raw translation-
    graph edges of the hreflang protocol; same narrow-Arrow contract as
    ``extract_page_meta``."""

    def run(batches):
        from ..kernel.meta import extract_meta

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for hl, alt in extract_meta(text, base_url=url)["alternates"]:
                    rows.append((url, hl, alt))
            yield pd.DataFrame(rows, columns=["url", "hreflang", "alt_url"])

    return pages.select("url", "html").mapInPandas(run, HREFLANG_SCHEMA)


def hreflang_clusters(edges: DataFrame) -> DataFrame:
    """Translation groups from hreflang edges: each page keys to the
    lexicographic minimum of {itself} ∪ {its declared alternates} — for a
    well-formed reciprocal hreflang set (the protocol REQUIRES return
    links) every member computes the same key, so one map-side min + one
    hash agg clusters the whole group without connected components.
    Returns (cluster_key, n_pages, n_langs, langs CSV) — the multilingual
    sampling unit for bitext mining (T102) and per-language quota
    accounting (T77).  Malformed one-way declarations split clusters
    (conservative — never merges unrelated pages).
    """
    per_page = edges.groupBy("url").agg(
        F.least(F.min("alt_url"), F.first("url")).alias("cluster_key"),
        F.sort_array(F.collect_set("hreflang")).alias("_langs"),
    )
    return (
        per_page.groupBy("cluster_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.array_sort(F.flatten(F.collect_set("_langs"))).alias("_all"),
        )
        .select(
            "cluster_key",
            "n_pages",
            F.size(F.array_distinct("_all")).alias("n_langs"),
            F.array_join(F.array_distinct("_all"), ",").alias("langs"),
        )
    )


CHARSET_SCHEMA = "url STRING, charset STRING, charset_source STRING"


def sniff_page_charsets(pages: DataFrame) -> DataFrame:
    """(url, html binary) → (url, charset, charset_source) via the WHATWG
    sniff (kernel/charset.py).  O(1) per page (1024-byte cap), one narrow
    Arrow stage — runs BEFORE decode, so it takes the raw binary column,
    not text."""

    def run(batches):
        from ..kernel.charset import sniff_charset

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                raw = bytes(html) if html is not None else b""
                s = sniff_charset(raw)
                rows.append((url, s["charset"], s["source"]))
            yield pd.DataFrame(
                rows, columns=["url", "charset", "charset_source"]
            )

    return pages.select("url", "html").mapInPandas(run, CHARSET_SCHEMA)


LANG_SCHEMA = "url STRING, html_lang STRING"


def extract_page_lang(pages: DataFrame) -> DataFrame:
    """(url, html[, …]) → the root element's declared language (first
    <html lang> wins, '' when absent) — compared against the DETECTED or
    labeled language it is the mislabeled-page / MT-farm signal (a page
    declaring lang=en whose text is German is machine-translated or
    template spam).  Same ONE-narrow-Arrow-stage contract."""
    import pandas as pd

    def run(batches):
        from ..kernel.meta import extract_meta

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                rows.append((url, extract_meta(text)["html_lang"]))
            yield pd.DataFrame(rows, columns=["url", "html_lang"])

    return pages.select("url", "html").mapInPandas(run, LANG_SCHEMA)
