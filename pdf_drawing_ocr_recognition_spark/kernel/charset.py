"""Charset sniffing — the decode decision a fetch pipeline makes per page
BEFORE any text exists (WHATWG encoding-sniffing order, the subset without
chardet-style statistics): byte-order mark, then a bounded scan of the
first 1024 bytes for ``<meta charset=…>`` / ``<meta http-equiv=Content-Type
content="…; charset=…">``, else the HTML5 default.

Feeds the T66 encoding-anomaly signals from the other side: T66 scores
mojibake AFTER a decode; this picks the decode.  Bounded prefix scan on the
shared linear tokenizer (the 1024-byte cap is the spec's, and also what
keeps the sniff O(1) per page regardless of document size).

Reference analogue: none; north-rule crawl-ingest generalization.
"""

from __future__ import annotations

import re

from .html_extract import iter_tokens
from .meta import _attr_of

SNIFF_LIMIT = 1024

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_CHARSET_IN_CONTENT_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.IGNORECASE)


def sniff_charset(raw: bytes) -> dict:
    """``{"charset", "source"}`` with source one of ``bom`` /
    ``meta-charset`` / ``meta-http-equiv`` / ``default``.  Charset names
    are lowercased and unquoted; the meta scan decodes the prefix as
    latin-1 (every byte maps, so the scan itself can never throw).  First
    declaration wins (browser behavior)."""
    for bom, name in _BOMS:
        if raw[: len(bom)] == bom:
            return {"charset": name, "source": "bom"}
    head = raw[:SNIFF_LIMIT].decode("latin-1")
    for kind, a, span in iter_tokens(head):
        if kind != "t" or a != "meta":
            continue
        tag = head[span[0] : span[1]]
        http_equiv = (_attr_of(tag, "http-equiv") or "").strip().lower()
        if http_equiv == "content-type":
            content = _attr_of(tag, "content") or ""
            m = _CHARSET_IN_CONTENT_RE.search(content)
            if m:
                return {
                    "charset": m.group(1).strip().lower(),
                    "source": "meta-http-equiv",
                }
        elif _attr_of(tag, "content") is None:
            # the standalone-attribute form; gated on "no content attr" so
            # a `charset=` INSIDE another attribute's value (Content-Type
            # strings, refresh URLs) can never false-match this path
            cs = _attr_of(tag, "charset")
            if cs is not None and cs.strip():
                return {"charset": cs.strip().lower(), "source": "meta-charset"}
    return {"charset": "utf-8", "source": "default"}
