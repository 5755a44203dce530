"""As-of join — an operator Spark lacks natively, composed from built-ins.

``asof_join(left, right)`` attaches to every left row the most recent right
row with the same key and ``right.ts <= left.ts``.  Implementation is the
scalable union-window pattern (no range join, no per-key explosion):

    tag rows → unionByName → Window.partitionBy(key).orderBy(ts, side)
    → last(right_value, ignorenulls=True) over rows UNBOUNDED..CURRENT
    → keep left rows.

One shuffle on the key (the window), linear state, AQE-skew-splittable —
this is what survives at 10^12 rows where a range-condition join would
quadratically explode hot keys.  Ties (equal ts) resolve right-before-left,
matching inclusive ASOF semantics (DuckDB's native ASOF JOIN is the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join; right *value_cols* arrive as ``asof_<name>`` columns."""
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )
