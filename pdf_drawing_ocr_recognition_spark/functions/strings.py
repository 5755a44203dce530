"""Reference string operators as pure Column expressions.

A13 error-prefix filter (ref pdor/pdor_unit.py:238-241), A14 brace balance
(ref pdor/pdor_utils.py:94-96), A15 brace-span extraction (ref :98-104), A20
key prefixing (ref pdor/pdor_unit.py:273-282) — each stays inside whole-stage
codegen; no Python is involved at run time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def count_char(col: Column, ch: str) -> Column:
    """Occurrences of one char: length(s) - length(replace(s, ch, ''))."""
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def brace_balanced(col: Column) -> Column:
    """A14: count('{') == count('}') (ref pdor/pdor_utils.py:94-96)."""
    return count_char(col, "{") == count_char(col, "}")


def brace_span(col: Column) -> Column:
    """A15: substring from first '{' to last '}' inclusive, NULL when invalid.

    last '}' found via the reverse trick: len(s) - locate('}', reverse(s)) + 1
    (ref pdor/pdor_utils.py:98-104).
    """
    start = F.locate("{", col)
    end = F.length(col) - F.locate("}", F.reverse(col)) + 1
    valid = (start > 0) & (F.locate("}", F.reverse(col)) > 0) & (start < end)
    return F.when(valid, F.substring(col, start, end - start + 1))


def is_error_prefixed(col: Column) -> Column:
    """A13: raw result starts with 'Error:' (ref pdor/pdor_unit.py:238)."""
    return col.startswith("Error:")


def sub_key(sub_idx: Column, key: Column) -> Column:
    """A20 key prefixing: format_string('sub_%d_%s', ...) (ref :282)."""
    return F.format_string("sub_%d_%s", sub_idx, key)
