"""A6 crop arithmetic as Column expressions (ref pdor/pdor_unit.py:199-202).

pct→pixel with truncation (floor — operands are non-negative) and [0, size]
clamping: ``least(size, greatest(0, floor(size * pct / 100)))``.  The kernel
twin is ``kernel.crop.crop_box``; this variant is the SQL-checkable one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def crop_bounds(size: Column, pct: Column) -> Column:
    """One bound: int truncation + clamp, matching the reference exactly for
    the valid domain (size ≥ 0, 0 ≤ pct ≤ 100)."""
    raw = F.floor(size * pct / F.lit(100.0)).cast("long")
    return F.least(size.cast("long"), F.greatest(F.lit(0).cast("long"), raw))
