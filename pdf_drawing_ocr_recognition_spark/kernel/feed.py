"""RSS 2.0 / Atom feed parsing — the freshness-frontier source.

Feeds are how a crawl discovers NEW pages minutes after publication
(sitemaps enumerate, feeds announce): parse ``<rss><channel><item>`` and
Atom ``<feed><entry>`` into scheduler rows.  Same strictly-linear
``iter_tokens`` scanner as the HTML/sitemap kernels — never throws, linear
on hostile input, entities unescaped.

Format notes encoded here: RSS carries the link as ELEMENT TEXT
(``<link>url</link>``) while Atom carries it as an ATTRIBUTE
(``<link href="url" rel="alternate"/>``) — rel=alternate (or no rel) is
the page link, enclosure/self links are skipped; dates come from
``pubDate`` (RSS) / ``published``/``updated`` (Atom, first present wins);
ids from ``guid``/``id``.

Reference analogue: none; north-rule crawl-ingest generalization.
"""

from __future__ import annotations

import html as _htmllib

from .html_extract import iter_tokens
from .meta import _attr_of

_TEXT_FIELDS = ("title", "link", "pubdate", "published", "updated", "guid", "id")


def parse_feed(xml: str) -> dict:
    """``{"kind": "rss"|"atom"|None, "entries": [...]}`` with each entry
    ``{"title", "link", "published", "entry_id"}`` (absent → None; an entry
    without a link is dropped — nothing to fetch).  Single pass."""
    kind: str | None = None
    entries: list[dict] = []
    cur: dict | None = None
    field: str | None = None
    buf: list[str] = []
    for tok_kind, a, span in iter_tokens(xml):
        if tok_kind == "t":
            if kind is None and a in ("rss", "feed"):
                kind = "rss" if a == "rss" else "atom"
            elif a in ("item", "entry") and kind is not None:
                cur = {"title": None, "link": None, "published": None,
                       "entry_id": None}
                field = None
            elif cur is not None and a == "link" and kind == "atom":
                raw = xml[span[0] : span[1]]
                rel = (_attr_of(raw, "rel") or "alternate").strip().lower()
                href = _attr_of(raw, "href")
                if rel == "alternate" and href and cur["link"] is None:
                    cur["link"] = href.strip()
            elif cur is not None and a in _TEXT_FIELDS:
                field = a
                buf = []
        elif tok_kind == "e":
            if cur is not None and field == a and a in _TEXT_FIELDS:
                val = _htmllib.unescape("".join(buf)).strip()
                if val:
                    if a == "title" and cur["title"] is None:
                        cur["title"] = val
                    elif a == "link" and kind == "rss" and cur["link"] is None:
                        cur["link"] = val
                    elif a in ("pubdate", "published", "updated"):
                        if cur["published"] is None:
                            cur["published"] = val
                    elif a in ("guid", "id") and cur["entry_id"] is None:
                        cur["entry_id"] = val
                field = None
            elif a in ("item", "entry") and cur is not None:
                if cur["link"]:
                    entries.append(cur)
                cur = None
                field = None
        elif field is not None and cur is not None:  # data run
            buf.append(a)
    return {"kind": kind, "entries": entries}
