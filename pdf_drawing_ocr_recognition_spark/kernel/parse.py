"""Literal-result parsing kernel.

Re-expresses the reference's OCR-result parsing semantics
(``pdor/pdor_utils.py:87-115`` in Water-Run/pdf-drawing-ocr-recognition):

1. brace-balance gate: ``count('{') == count('}')`` or fail   (ref :94-96)
2. span extraction: first ``'{'`` .. last ``'}'`` inclusive; fail when either
   is absent or the first ``'{'`` is at/after the last ``'}'``  (ref :98-104)
3. ``ast.literal_eval`` of the span; the parse succeeds only when the result
   is exactly a ``dict`` (sets/lists/scalars are rejected)     (ref :106-115)

The payloads are Python literals (single-quoted strings), NOT JSON — which is
why this stays a Python kernel rather than ``from_json``.  A normalized
``from_json`` relational variant is exposed separately in ``functions/``.
"""

from __future__ import annotations

import ast


def has_balanced_braces(s: str) -> bool:
    """Brace-balance gate (ref pdor/pdor_utils.py:94-96)."""
    return s.count("{") == s.count("}")


def extract_brace_span(s: str) -> str | None:
    """Substring from the first '{' to the last '}' inclusive, or None.

    Fails (None) when either brace is missing or the first '{' is at or after
    the last '}' (ref pdor/pdor_utils.py:98-104).
    """
    start = s.find("{")
    end = s.rfind("}")
    if start == -1 or end == -1 or start >= end:
        return None
    return s[start : end + 1]


def parse_literal_result(raw: str) -> tuple[bool, dict]:
    """Full parse pipeline: balance gate → span → literal_eval → dict check.

    Returns ``(ok, result_dict)``; ``result_dict`` is ``{}`` on any failure
    (ref pdor/pdor_utils.py:87-115).
    """
    if not has_balanced_braces(raw):
        return False, {}
    span = extract_brace_span(raw)
    if span is None:
        return False, {}
    try:
        parsed = ast.literal_eval(span)
    except (SyntaxError, ValueError):
        return False, {}
    if not isinstance(parsed, dict):
        return False, {}
    return True, parsed


ERROR_PREFIX = "Error:"


def is_error_result(raw: str) -> bool:
    """Error-prefix filter (ref pdor/pdor_unit.py:238-241)."""
    return raw.startswith(ERROR_PREFIX)
