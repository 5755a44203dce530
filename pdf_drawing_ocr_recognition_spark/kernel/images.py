"""Image + alt-text harvesting — the image-text-pair miner.

Multimodal training sets (LAION-class) are mined from exactly this:
``<img>`` URLs paired with their ALT text and, when present, the richer
``<figure>/<figcaption>`` caption.  Rides the shared strictly-linear
``iter_tokens`` scanner; composes with the repo's multimodal stack (T17/
T33/T117 operate on the fetched bytes this kernel points at).

Semantics (deterministic):
- one record per ``<img>`` with a followable http(s) ``src`` (resolved
  against the page URL by the link kernel's resolver — data:, javascript:
  etc. are skipped, the LAION discipline);
- ``alt``/``title`` attributes entity-unescaped and whitespace-collapsed
  ('' when absent);
- an img inside ``<figure>`` gets that figure's ``<figcaption>`` text as
  ``caption`` — even when the caption FOLLOWS the img (records emit at
  figure close); nested figures associate with the innermost; imgs
  outside figures carry '';
- script/style content dropped; unclosed figures flush at EOF; never
  throws, every character visited once.

Reference analogue: none (PDF reference); the web-native feeder for the
SURVEY Table-D multimodal family.
"""

from __future__ import annotations

import html as _htmllib
import re

from .html_extract import _DROP_TAGS, iter_tokens
from .links import resolve_href
from .meta import _attr_of

_WS_RE = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def extract_images(html: str, base_url: str) -> list[dict]:
    """All followable images of *html* in document order.

    Returns ``[{"idx", "src", "alt", "title", "caption"}]``.
    """
    out: list[dict] = []
    drop = 0
    # figure frames: {"imgs": [pending record], "cap": parts|None, "done": str}
    figures: list[dict] = []

    def emit(rec: dict, caption: str) -> None:
        rec["idx"] = len(out)
        rec["caption"] = caption
        out.append(rec)

    def close_figure() -> None:
        frame = figures.pop()
        caption = _norm("".join(frame["cap_parts"]))
        for rec in frame["imgs"]:
            emit(rec, caption)

    for kind, a, span in iter_tokens(html):
        if kind == "d":
            if drop == 0 and a and figures and figures[-1]["in_cap"]:
                if "&" in a:
                    a = _htmllib.unescape(a)
                figures[-1]["cap_parts"].append(a)
        elif kind == "t":
            if a in _DROP_TAGS:
                drop += 1
            elif a == "figure":
                figures.append({"imgs": [], "cap_parts": [], "in_cap": False})
            elif a == "figcaption":
                if figures:
                    figures[-1]["in_cap"] = True
            elif a == "img":
                raw = html[span[0] : span[1]]
                src = resolve_href(_attr_of(raw, "src") or "", base_url)
                if src is None:
                    continue
                rec = {
                    "src": src,
                    "alt": _norm(_attr_of(raw, "alt") or ""),
                    "title": _norm(_attr_of(raw, "title") or ""),
                }
                if figures:
                    figures[-1]["imgs"].append(rec)
                else:
                    emit(rec, "")
        else:
            if a in _DROP_TAGS:
                drop = max(0, drop - 1)
            elif a == "figcaption":
                if figures:
                    figures[-1]["in_cap"] = False
            elif a == "figure":
                if figures:
                    close_figure()
    while figures:  # unclosed figures flush at EOF
        close_figure()
    return out
