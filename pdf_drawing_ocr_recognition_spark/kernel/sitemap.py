"""Sitemap parsing — the crawl-frontier seeding source (sitemaps.org
protocol): ``<urlset>`` page lists and ``<sitemapindex>`` shards, with the
per-entry fields a scheduler acts on (loc, lastmod, changefreq, priority).

Rides the same strictly-linear ``iter_tokens`` scanner as the HTML kernels
(XML is a subset of what it already tokenizes), so parsing never throws and
stays linear on hostile input; entities in ``<loc>`` are unescaped (the
protocol REQUIRES &amp;-escaping of query URLs, so this is the common case,
not a corner).  The protocol caps one sitemap at 50k URLs / 50 MB, which is
exactly why the Spark operator treats files as the unit of parallelism —
one file never dominates a partition.

Reference analogue: none; north-rule crawl-ingest generalization
(same tier as kernel/links.py / kernel/meta.py).
"""

from __future__ import annotations

import html as _htmllib

from .html_extract import iter_tokens

_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def parse_sitemap(xml: str) -> dict:
    """``{"kind": "urlset"|"sitemapindex"|None, "entries": [...]}``.

    Each entry is ``{"loc", "lastmod", "changefreq", "priority"}`` (absent
    fields None, values stripped, loc entity-unescaped).  ``<url>`` entries
    come from urlsets, ``<sitemap>`` entries from index files; an entry
    without a loc is dropped (nothing to fetch).  Single pass, never raises.
    """
    kind: str | None = None
    entries: list[dict] = []
    cur: dict | None = None
    field: str | None = None
    buf: list[str] = []
    for tok_kind, a, _ in iter_tokens(xml):
        if tok_kind == "t":
            if a in ("urlset", "sitemapindex") and kind is None:
                kind = a
            elif a in ("url", "sitemap") and kind is not None:
                cur = {f: None for f in _FIELDS}
                field = None
            elif a in _FIELDS and cur is not None:
                field = a
                buf = []
        elif tok_kind == "e":
            if a in _FIELDS and cur is not None and field == a:
                val = _htmllib.unescape("".join(buf)).strip()
                if val:
                    cur[a] = val
                field = None
            elif a in ("url", "sitemap") and cur is not None:
                if cur["loc"]:
                    entries.append(cur)
                cur = None
                field = None
        elif field is not None and cur is not None:  # data run
            buf.append(a)
    return {"kind": kind, "entries": entries}
