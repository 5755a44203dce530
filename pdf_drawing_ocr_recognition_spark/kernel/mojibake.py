"""Mojibake repair — undo the UTF-8-bytes-read-as-legacy-codepage class.

The dominant real-world text corruption in web crawls: a page's UTF-8
bytes were decoded as cp1252/latin-1 somewhere upstream and re-encoded,
turning every non-ASCII character into 2-4 legacy characters ("é" → "Ã©",
"'" → "â€™").  T66 DETECTS the signature; this kernel REPAIRS it: re-encode
through the legacy codepage and try a strict UTF-8 decode — the inverse
composition is only defined when the text really is mojibake, so a clean
round-trip is itself the proof.

Determinism contract:
- codepages are tried in a FIXED order (cp1252 first — the web's actual
  "latin-1"; latin-1 second, which covers the C1-control bytes cp1252
  cannot re-encode);
- a round applies only if encode AND strict decode both succeed; the
  repaired text must actually differ (ASCII-only text is a fixed point);
- doubly-mangled text (two upstream mis-decodes) peels one layer per
  round up to *max_rounds* (default 3, then stop — a documented cap, not
  an error);
- genuine legacy text does NOT round-trip (its bytes are not valid UTF-8
  sequences) and is returned untouched — the false-positive guard.
  Caveat (shared with ftfy): text that legitimately spells a valid UTF-8
  byte sequence in cp1252 characters ("Ã©" as intended content) is
  indistinguishable from mojibake and will be "repaired".

Reference analogue: none (the reference consumes PDFs); this is the
Common-Crawl encoding-hygiene generalization next to T66
(functions/encoding.py), which only scores the anomaly.
"""

from __future__ import annotations

_CODEPAGES = ("cp1252", "latin-1")


def _peel_once(s: str) -> str | None:
    """One repair round: the first codepage whose re-encode yields valid
    UTF-8 wins; None if neither applies."""
    for enc in _CODEPAGES:
        try:
            fixed = s.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        return fixed
    return None


def repair_mojibake(s: str, max_rounds: int = 3) -> tuple[str, int]:
    """Repair *s*, peeling up to *max_rounds* layers of mis-decoding.

    Returns ``(repaired_text, n_rounds)`` — ``n_rounds`` is 0 when the
    text was already clean (or unrepairable, indistinguishable by
    design: nothing round-tripped).
    """
    rounds = 0
    while rounds < max_rounds:
        fixed = _peel_once(s)
        if fixed is None or fixed == s:
            break
        s = fixed
        rounds += 1
    return s, rounds
