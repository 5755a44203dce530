"""Z-order (Morton) clustering for manifest min/max data skipping — T174.

A linear file layout prunes well on the ONE column it is sorted by and not
at all on any other.  Z-ordering interleaves the quantized bits of k
columns into one sort key, so files cover small axis-aligned rectangles of
the value space and manifest min/max pruning (sources/snapshots.py
``plan_scan``) skips files for predicates on ANY clustered column — the
property Iceberg's ``rewrite_data_files(strategy => 'sort', sort_order =>
'zorder(a, b)')`` and Delta's ``OPTIMIZE ... ZORDER BY`` sell.  At 100 TB
this is the difference between "point lookups on a second column scan the
table" and "they scan ~√(files)".

Construction (everything exact integer arithmetic, whole-stage codegen —
no UDF, no window):

1. quantize each clustered column to ``bits`` bits against its global
   [min, max] (one tiny agg, collected as scalars — bounded by k):
   ``q = ((v - min) * 2^bits) // (max - min + 1)``
2. bit-interleave the quantized ranks, first column most significant at
   each level: bit b of column j lands at position ``b*k + (k-1-j)``.

The interleave is a fold of ~``bits*k`` shift/mask terms — small enough
for the JIT (CLAUDE.md: never unroll WIDE numeric kernels; 16 terms is
fine, 192 is not), and exactly replayable in ANSI SQL (the
``zorder_pruning_audit`` oracle re-derives every z bucket's bounds in
DuckDB).

Reference analogue: none (single-file reference); this is the lakehouse
layout-optimization citizenship the north rule's Iceberg framing implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_col(name: str, lo: int, hi: int, bits: int) -> Column:
    """Exact-integer quantization of column *name* to [0, 2^bits) against
    the closed value range [lo, hi]: ``(v - lo) div step`` with
    ``step = ceil((hi - lo + 1) / 2^bits)``.

    Spark's ``div`` is true integer division (exact at any magnitude —
    ``floor(a/b)`` on doubles is NOT past 2^53), and the step form never
    overflows int64 (the multiply form ``(v-lo) * 2^bits`` would past a
    2^55 span).  Strictly bounded below 2^bits: ``(span-1) div step <
    2^bits`` because ``step * 2^bits >= span``.  Monotone, so per-bucket
    min/max bounds stay valid for pruning."""
    span = (hi - lo) + 1
    step = max(1, -(-span // (1 << bits)))  # ceil div, python-side literal
    return F.expr(
        f"CAST(((CAST(`{name}` AS BIGINT) - ({lo})) div {step}) AS BIGINT)"
    )


def zvalue_col(qcols: list[Column], bits: int) -> Column:
    """Bit-interleave already-quantized columns (each in [0, 2^bits)) into
    a Morton z-value; ``qcols[0]`` is most significant at each bit level.
    One column degenerates to the rank itself (plain range clustering)."""
    k = len(qcols)
    if k == 1:
        return qcols[0].cast("long")
    # terms occupy DISJOINT bit positions, so summation == bitwise OR and
    # stays integer-exact (PySpark's Column `|` is boolean OR, not bitor)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, q in enumerate(qcols):
            pos = b * k + (k - 1 - j)
            z = z + F.shiftleft(
                F.shiftright(q.cast("long"), b) % 2, pos
            ).cast("long")
    return z


def attach_zvalue(
    df: DataFrame, cluster_by: list[str], bits: int = 8, out: str = "_z"
) -> DataFrame:
    """*df* plus a ``_z`` Morton key over *cluster_by* (numeric columns).

    The per-column [min, max] comes from ONE aggregate collected as 2k
    scalars (never rows).  Constant columns quantize to 0 everywhere;
    an empty frame gets z = 0 rows trivially."""
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    for c in cluster_by:
        if c not in df.columns:
            raise ValueError(f"unknown cluster column {c!r}")
    if not (1 <= bits <= 16):
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    aggs = []
    for c in cluster_by:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).collect()[0]  # 2k scalars to the driver, bounded
    qcols = []
    for c in cluster_by:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None:  # empty input: any constant works
            lo = hi = 0
        qcols.append(quantize_col(c, int(lo), int(hi), bits))
    return df.withColumn(out, zvalue_col(qcols, bits))
