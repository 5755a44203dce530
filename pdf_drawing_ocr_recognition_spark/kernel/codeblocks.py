"""Code-block extraction from HTML — <pre>/<code> spans as typed records.

Web pages are a major source of TRAINING CODE (docs sites, blogs, Q&A), and
the generic boilerplate-strip kernel deliberately whitespace-collapses text
— which destroys indentation, the one thing code needs.  This kernel rides
the same strictly-linear ``iter_tokens`` scanner as the extract/link/meta
kernels and pulls out maximal ``<pre>``/``<code>`` regions verbatim:

- a block spans from the tag that takes pre/code nesting depth 0→1 until
  depth returns to 0 — so the ubiquitous ``<pre><code>…</code></pre>``
  idiom yields ONE block (tagged by the OUTER element), never two;
- character data inside a block is entity-unescaped but NOT
  whitespace-collapsed (indentation and newlines survive verbatim);
- ``class="language-x"`` on any pre/code open tag inside the block (the
  markdown-renderer idiom, first wins) becomes the block's ``lang_hint``;
- script/style/svg/… content is dropped even inside a block (shared
  ``_DROP_TAGS`` discipline);
- hostile totality: unterminated blocks flush at EOF, stray closers are
  ignored, self-closing ``<code/>`` opens and closes empty — the kernel
  never throws and visits every character once.

Reference analogue: none (the reference extracts PDF drawings); this is
the Common-Crawl code-harvesting generalization, same tier as
kernel/links.py / kernel/meta.py.
"""

from __future__ import annotations

import html as _htmllib

from .html_extract import _DROP_TAGS, iter_tokens
from .meta import _attr_of

_CODE_TAGS = ("pre", "code")


def _lang_of(raw_tag: str) -> str:
    cls = _attr_of(raw_tag, "class")
    if cls:
        for tok in cls.split():
            if tok.startswith("language-"):
                return tok[9:]
    return ""


def extract_code_blocks(html: str) -> list[dict]:
    """All maximal <pre>/<code> regions of *html* in document order.

    Returns ``[{"idx", "tag", "lang_hint", "text"}]`` — ``tag`` is the
    outermost element ('pre' or 'code'), ``lang_hint`` the first
    ``language-*`` class seen on a pre/code open tag in the block (else
    ''), ``text`` the verbatim (entity-unescaped, whitespace-preserved)
    character data.
    """
    blocks: list[dict] = []
    depth = 0
    drop = 0
    parts: list[str] = []
    cur_tag = ""
    cur_lang = ""

    def flush() -> None:
        blocks.append(
            {
                "idx": len(blocks),
                "tag": cur_tag,
                "lang_hint": cur_lang,
                "text": "".join(parts),
            }
        )

    for kind, a, span in iter_tokens(html):
        if kind == "d":
            if depth > 0 and drop == 0 and a:
                if "&" in a:
                    a = _htmllib.unescape(a)
                parts.append(a)
        elif kind == "t":
            if a in _DROP_TAGS:
                drop += 1
            elif drop:
                pass  # tags inside dropped subtrees are payload, not markup
            elif a in _CODE_TAGS:
                if depth == 0:
                    parts = []
                    cur_tag = a
                    cur_lang = ""
                if not cur_lang:
                    cur_lang = _lang_of(html[span[0] : span[1]])
                depth += 1
                if html[span[1] - 2] == "/":  # self-closing: open+close
                    depth -= 1
                    if depth == 0:
                        flush()
        else:
            if a in _DROP_TAGS:
                drop = max(0, drop - 1)
            elif drop:
                pass
            elif a in _CODE_TAGS and depth > 0:
                depth -= 1
                if depth == 0:
                    flush()
    if depth > 0:  # unterminated block: flush what was captured
        flush()
    return blocks
