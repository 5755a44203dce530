"""Webtext normalization (T53) — the canonical-form pass every corpus runs
BEFORE hashing/dedup/tokenization (CCNet's normalization, Gopher's cleanup):
typographic quotes/dashes/ellipses to ASCII, exotic spaces to plain space,
zero-width and control characters stripped, whitespace runs collapsed,
edges trimmed, optional case fold.

Everything is a pure Column expression (translate + regexp_replace chains —
whole-stage codegen, no Python at run time), and every regex stays in the
Java ∩ RE2 portable subset: character classes with ``\\x{hhhh}`` codepoint
escapes (both engines), no lookaround, no backreferences — so the DuckDB
oracle twin evaluates the SAME patterns.  The normalized form IS the dedup
key (two docs differing only typographically must collapse — see
``normalized_dedup`` in ``__spark_entry__``), which is why cross-engine
byte parity of the normalized digest is the correctness bar.

No reference analogue (the reference never normalizes text —
pdor/pdor_out.py renders values verbatim); this is corpus-pipeline scope.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# 1-to-1 typographic fold (translate: cheapest engine path, identical
# semantics in DuckDB): curly quotes/primes → ascii quotes, the dash
# family → '-', exotic spaces → ' '.
_QUOTES_FROM = "‘’‚‛“”„‟′″"
_QUOTES_TO = "''''\"\"\"\"'\""
_DASHES_FROM = "‐‑‒–—―−"
_SPACES_FROM = (
    "          "
    "     　"
)
_FOLD_FROM = _QUOTES_FROM + _DASHES_FROM + _SPACES_FROM
_FOLD_TO = _QUOTES_TO + "-" * len(_DASHES_FROM) + " " * len(_SPACES_FROM)

# removed outright: zero-width family, BOM, soft hyphen, C0/C1 controls
# minus \t\n\r (those fold into the whitespace collapse instead).
# \x{hhhh} classes parse identically in Java regex and RE2.
_STRIP_RE = (
    "[\\x{200b}\\x{200c}\\x{200d}\\x{2060}\\x{feff}\\x{00ad}"
    "\\x{0000}-\\x{0008}\\x{000b}\\x{000c}\\x{000e}-\\x{001f}"
    "\\x{007f}-\\x{009f}]"
)
_WS_RE = "[ \\t\\n\\r]+"


def normalize_text(col: Column, casefold: bool = False) -> Column:
    """Canonical webtext form of *col* (see module docstring for the rules).

    Order matters and is part of the contract: ellipsis expand → 1:1 fold →
    strip invisibles → whitespace collapse → trim → optional lower().
    """
    out = F.regexp_replace(col, "…", "...")
    out = F.translate(out, _FOLD_FROM, _FOLD_TO)
    out = F.regexp_replace(out, _STRIP_RE, "")
    out = F.regexp_replace(out, _WS_RE, " ")
    out = F.trim(out)
    return F.lower(out) if casefold else out


def normalize_text_sql(expr: str, casefold: bool = False) -> str:
    """The DuckDB twin of :func:`normalize_text` over SQL expression *expr*.

    Built from the SAME constants so the two engines cannot drift; used by
    the oracle map (and usable by any SQL-surface consumer)."""
    fold_from = _FOLD_FROM.replace("'", "''")
    fold_to = _FOLD_TO.replace("'", "''")
    out = f"regexp_replace({expr}, '…', '...', 'g')"
    out = f"translate({out}, '{fold_from}', '{fold_to}')"
    out = f"regexp_replace({out}, '{_STRIP_RE}', '', 'g')"
    out = f"regexp_replace({out}, '{_WS_RE}', ' ', 'g')"
    out = f"trim({out})"
    return f"lower({out})" if casefold else out


# ---------------------------------------------------------------------------
# Unicode NFC canonicalization (T134)
# ---------------------------------------------------------------------------
# Byte-level dedup misses the classic web duplicate pair "café" (U+00E9)
# vs "café" (e + U+0301): same rendered text, different bytes, different
# md5.  UAX #15 NFC is the canonical fix every corpus pipeline applies
# before hashing.  Spark has no built-in normalizer, so this is an
# Arrow-batched scalar pandas_udf over Python's unicodedata (the reference
# UAX #15 implementation); DuckDB's utf8proc-backed ``nfc_normalize`` is
# the cross-engine oracle twin — both implement the same normative
# algorithm, so outputs are byte-identical (pinned by tests AND by the
# ``unicode_nfc_dedup`` driver oracle).
#
# No reference analogue (the reference renders values verbatim,
# pdor/pdor_out.py); corpus-pipeline scope, same contract as T53 above.


def nfc_py(text: str) -> str:
    """Pure-Python twin (the test oracle): UAX #15 canonical composition."""
    return unicodedata.normalize("NFC", text)


def _nfc_batch(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: None if t is None else unicodedata.normalize("NFC", t)
    )


def nfc_text(col: Column | str) -> Column:
    """Column form of :func:`nfc_py` (lazy pandas_udf — see T60 note on
    import-time DDL parsing).  NULL in → NULL out, matching SQL engines."""
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf(_nfc_batch, "string")(c)
