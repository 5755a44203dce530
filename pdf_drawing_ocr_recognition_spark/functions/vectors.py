"""Vector similarity — dot/cosine as sequential array folds, plus ANN helpers.

``F.aggregate`` folds the array left-to-right, so the floating-point sum is
order-deterministic (same bits on every engine that folds sequentially — the
DuckDB twin ``list_dot_product`` included).  Brute-force top-k is the exact
baseline; the LSH-bucketed variant in ``operators/similarity.py`` is the scale
path (bucket join instead of cross join).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two ARRAY<FLOAT/DOUBLE> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of dot(vec, plane_i) packed into an int.

    *planes* are deterministic literals (seeded offline) embedded in the plan,
    so the same constants can be pasted into the oracle SQL.
    """
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket
