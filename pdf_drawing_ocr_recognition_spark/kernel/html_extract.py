"""HTML boilerplate-strip kernel (SURVEY.md M1).

Generalizes the reference's fixed-layout extraction to web pages, per
``BASELINE.json:north_star``: block segmentation of the raw HTML + per-block
link-density / text-density features + Boilerpipe/trafilatura-class threshold
rules (Kohlschütter et al., WSDM'10; Barbaresi, ACL'21 demo — PAPERS.md).

Deterministic pure-Python implementation on the stdlib ``html.parser`` — no
external parsing libs (none are installed).  The classifier:

- split the document into blocks at block-level element boundaries
  (p, div, li, td, h1-h6, section, article, br pairs, ...);
- per block compute
    * ``link_density``  = anchor-enclosed chars / total chars
    * ``text_density``  = words / wrapped-line-count at 80 cols (Kohlschütter's
      proxy for "full lines of running text")
- a block is CONTENT iff text_density >= 8 and link_density <= 0.33 and it has
  >= 10 words, with a short-block rescue rule: a block sandwiched between two
  content blocks is kept when link_density <= 0.33 (Boilerpipe's
  "NumWordsRulesClassifier" shape, simplified but deterministic);
- content blocks are emitted in document order joined by '\n\n'.

``<script>``/``<style>``/``<noscript>``/``<template>`` subtrees and comments are
dropped entirely; ``<nav>``/``<header>``/``<footer>``/``<aside>`` subtrees are
hard boilerplate (trafilatura-style structural pruning).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "td", "th", "tr", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "section", "article", "main", "figure", "figcaption", "dd", "dt",
}
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
_BOILER_TAGS = {"nav", "header", "footer", "aside"}
_WS_RE = re.compile(r"\s+")
_WRAP_COLS = 80


@dataclass
class Block:
    """One text block with link/text-density features."""

    text_parts: list[str] = field(default_factory=list)
    anchor_chars: int = 0
    in_boiler: bool = False

    def finish(self) -> dict | None:
        text = _WS_RE.sub(" ", "".join(self.text_parts)).strip()
        if not text:
            return None
        n_chars = len(text)
        words = text.split(" ")
        n_words = len(words)
        n_lines = max(1, math.ceil(n_chars / _WRAP_COLS))
        return {
            "text": text,
            "n_chars": n_chars,
            "n_words": n_words,
            "link_density": self.anchor_chars / n_chars if n_chars else 0.0,
            "text_density": n_words / n_lines,
            "in_boiler": self.in_boiler,
        }


# One-pass tag/comment tokenizer.  A hand-rolled find()-based scanner
# (instead of the stdlib html.parser event machine) keeps this kernel ~6x
# faster in the Arrow-batch hot path; the block/density semantics are
# identical and pinned by the unit tests.  The scanner is STRICTLY LINEAR:
# every character is consumed exactly once (str.find ranges never re-scan),
# so adversarial inputs — floods of unterminated "<!--" or "<" with no
# closing ">" — cost O(n), where a regex alternation tokenizer
# (`<!--.*?-->|...|<[^>]*>`) degrades to O(n²) retrying each dead "<".
# Quoted '>' inside attribute values is out of spec for this kernel;
# unterminated comments/CDATA swallow to EOF (the HTML5 eof-in-comment
# rule), and "<!-->"/"<!--->" close abruptly as in the HTML5 spec.
_TAG_NAME_RE = re.compile(r"<(/?)\s*([a-zA-Z][a-zA-Z0-9]*)")

# HTML5 RAWTEXT elements: between "<script…>"/"<style…>" and the matching
# case-insensitive close tag NOTHING is markup — "<p>" inside a JS string
# must not reach any kernel as a tag event (it would mutate parser state:
# open headings from document.write payloads, swallow the body into a code
# fence).  The close tag is "</script" / "</style" followed by whitespace,
# "/", ">" or EOF, exactly the spec's appropriate-end-tag check; an
# unterminated rawtext element swallows to EOF (eof-in-script rule).
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</{t}(?=[\s/>]|\Z)", re.IGNORECASE)
    for t in ("script", "style")
}


def iter_tokens(html: str):
    """Linear scan of *html* → (kind, a, b) events, SHARED by the
    boilerplate-strip and link-harvest kernels so both agree on what is
    markup and what is text.

    - ``("d", text, None)``       — a character-data run (raw, not unescaped)
    - ``("t", tag, (lt, end))``   — start tag; ``html[lt:end]`` is the raw token
    - ("e", tag, (lt, end))``     — end tag

    Comments, CDATA sections, doctypes, PIs and malformed ``<...>`` tokens
    are consumed silently.  Every character is visited exactly once.
    """
    n = len(html)
    find = html.find
    i = 0
    while i < n:
        lt = find("<", i)
        if lt < 0:
            break
        if html.startswith("<!--", lt):
            end = find("-->", lt + 2)
            tok_end = n if end < 0 else end + 3
        elif html.startswith("<![CDATA[", lt):
            end = find("]]>", lt + 9)
            tok_end = n if end < 0 else end + 3
        else:
            gt = find(">", lt + 1)
            if gt < 0:
                break  # no further tags: the rest (incl. '<') is data
            tok_end = gt + 1
            m = _TAG_NAME_RE.match(html, lt)
            if m is not None and m.end() <= gt:
                if lt > i:
                    yield ("d", html[i:lt], None)
                i = tok_end
                tag = m.group(2).lower()
                if m.group(1):
                    yield ("e", tag, (lt, tok_end))
                else:
                    yield ("t", tag, (lt, tok_end))
                    close = _RAWTEXT_CLOSE.get(tag)
                    if close is not None:
                        # RAWTEXT mode: one data run to the matching close
                        # tag (or EOF) — still strictly linear: the search
                        # scans the region once and i jumps past it.
                        mm = close.search(html, i)
                        if mm is None:
                            if i < n:
                                yield ("d", html[i:], None)
                            return
                        if mm.start() > i:
                            yield ("d", html[i : mm.start()], None)
                        gt2 = find(">", mm.end())
                        end2 = n if gt2 < 0 else gt2 + 1
                        yield ("e", tag, (mm.start(), end2))
                        i = end2
                continue
            # doctype / PI / malformed: drop the "<...>" token
        if lt > i:
            yield ("d", html[i:lt], None)
        i = tok_end
    if i < n:
        yield ("d", html[i:], None)


class _BlockTokenizer:
    """Streams tag/text tokens into Block objects (document order)."""

    def __init__(self) -> None:
        self.blocks: list[dict] = []
        self._cur = Block()
        self._drop_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        cur = self._cur
        in_boiler = self._boiler_depth > 0
        if not cur.text_parts:  # nothing buffered: reuse the block object
            cur.in_boiler = in_boiler
            return
        done = cur.finish()
        if done is not None:
            self.blocks.append(done)
        self._cur = Block(in_boiler=in_boiler)

    def _start(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth > 0:
            return  # tags inside svg/iframe/noscript/… are not structure
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler_depth += 1
            self._cur.in_boiler = True
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS or tag == "br":
            self._flush()

    def _end(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth > 0:
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            self._cur.in_boiler = self._boiler_depth > 0
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def _data(self, data: str) -> None:
        if self._drop_depth > 0 or not data:
            return
        if "&" in data:
            import html as _html

            data = _html.unescape(data)
        self._cur.text_parts.append(data)
        if self._anchor_depth > 0:
            self._cur.anchor_chars += len(_WS_RE.sub(" ", data).strip())

    def feed(self, html: str) -> None:
        for kind, a, span in iter_tokens(html):
            if kind == "d":
                self._data(a)
            elif kind == "t":
                self._start(a)
                # self-closing anchor: "<a .../>" opens and closes the link
                if a == "a" and html[span[1] - 2] == "/":
                    self._end(a)
            else:
                self._end(a)
        self._flush()


# classifier thresholds (Boilerpipe-class rules, fixed for determinism)
MIN_WORDS = 10
MAX_LINK_DENSITY = 0.33
MIN_TEXT_DENSITY = 8.0


def block_features(html: str) -> list[dict]:
    """Segment *html* into blocks and return their feature dicts in doc order."""
    parser = _BlockTokenizer()
    try:
        parser.feed(html)
    except Exception:
        # malformed markup: fall back to whatever blocks were collected
        parser._flush()
    return parser.blocks


def classify_blocks(blocks: list[dict]) -> list[bool]:
    """Apply the threshold rules + sandwich rescue; returns per-block keep flags."""
    base = [
        (not b["in_boiler"])
        and b["n_words"] >= MIN_WORDS
        and b["link_density"] <= MAX_LINK_DENSITY
        and b["text_density"] >= MIN_TEXT_DENSITY
        for b in blocks
    ]
    keep = list(base)
    for i, b in enumerate(blocks):
        if base[i] or b["in_boiler"]:
            continue
        prev_ok = i > 0 and base[i - 1]
        next_ok = i + 1 < len(blocks) and base[i + 1]
        if prev_ok and next_ok and b["link_density"] <= MAX_LINK_DENSITY:
            keep[i] = True
    return keep


def extract_main_text(html: str) -> str:
    """Main-content text: kept blocks joined by blank lines, document order."""
    blocks = block_features(html)
    keep = classify_blocks(blocks)
    return "\n\n".join(b["text"] for b, k in zip(blocks, keep) if k)
