"""Count-Min sketch: fixed-size frequency estimation whose shuffle is
bounded by the SKETCH, not the vocabulary.

The exact token-frequency table of a 100 TB web corpus is itself huge
(billions of distinct terms — Zipf's long tail), so "how often does term X
occur" as a plain ``groupBy(term).count()`` shuffles a vocabulary-sized
aggregate even when only a handful of candidate terms matter.  The
Count-Min sketch (Cormode & Muthukrishnan 2005) answers point queries from
a fixed d×w integer grid:

    cell(j, x) = h_j(x) mod w          (one row per hash function j)
    sketch[j][cell] = Σ 1 over stream items hashing there
    est(x) = min_j sketch[j][cell(j, x)]     — NEVER underestimates

Spark shape: the per-item cell assignment is a pure codegen projection —
the d hash rows are d DISJOINT hex windows of ONE md5 per item (the
MinHash one-digest/many-windows discipline, functions/dedup.py, at 1/d
of the cost of d salted digests) — and the build is ONE map-side-
combinable hash aggregate whose post-shuffle cardinality is ≤ d·w rows
regardless of corpus size.  Estimation joins the (candidate × d) probe frame against the
broadcast sketch dim.  Merging two sketches is cell-wise addition (union
of streams ≡ sum of sketches), so partial sketches from independent
corpus slices / days combine without re-reading the data — the property
that makes the sketch a streaming/incremental citizen.

Everything is exact integer arithmetic on deterministic hashes, so the
whole operator (build + probe + min) replays bit-identically in ANSI SQL:
the ``cms_heavy_hitters`` driver query is DuckDB-oracled end-to-end.

Reference analogue: none (the reference is single-machine and exact);
this is a training-data-pipeline operator in the SURVEY §2 Table-D sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _validate(depth: int, prefix_len: int) -> None:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if prefix_len < 1 or depth * prefix_len > 32:
        raise ValueError(
            f"need 1 <= prefix_len and depth*prefix_len <= 32 hex chars, "
            f"got depth={depth}, prefix_len={prefix_len}"
        )


def _cells(key_col, depth: int, prefix_len: int):
    """The d hash rows from ONE md5 per item: row j's cell is the j-th
    disjoint ``prefix_len``-hex window of md5(key) — the same
    one-digest/many-windows discipline as the MinHash kernel
    (functions/dedup.py), at 1/d of the per-item hash cost of d salted
    digests.  Identical bytes in Spark (md5 of UTF-8 encode) and DuckDB
    (md5 of VARCHAR).  Returns an ARRAY of structs (j, cell)."""
    h = F.md5(F.encode(key_col, "utf-8"))
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.substring(h, j * prefix_len + 1, prefix_len).alias("cell"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    prefix_len: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over the stream of ``items[key_col]``
    (NULL keys are skipped — no frequency to attribute).  Returns the
    sketch as a DataFrame ``(j INT, cell STRING, c BIGINT)`` with at most
    ``depth · 16**prefix_len`` rows.

    ``weight_col`` turns the sketch into a weighted-count sketch (e.g.
    token counts pre-reduced per document); default weight is 1 per row.

    Scale: the explode multiplies the stream by ``depth`` (a constant),
    the aggregate combines map-side, and the only shuffle is the final
    ≤ d·w-row hash agg — vocabulary size never appears in any exchange.
    """
    _validate(depth, prefix_len)
    w = F.lit(1).cast("bigint") if weight_col is None else F.col(weight_col)
    rows = items.filter(F.col(key_col).isNotNull()).select(
        w.alias("_w"),
        F.explode(_cells(F.col(key_col), depth, prefix_len)).alias("jc"),
    )
    return (
        rows.select(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"), "_w")
        .groupBy("j", "cell")
        .agg(F.sum("_w").cast("bigint").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (depth, prefix_len): cell-wise
    addition.  sketch(A) ⊕ sketch(B) ≡ sketch(A ∪ B) exactly — partial
    sketches from corpus slices combine without touching the data again."""
    return (
        a.select("j", "cell", "c")
        .unionByName(b.select("j", "cell", "c"))
        .groupBy("j", "cell")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    prefix_len: int = 3,
    est_col: str = "est",
) -> DataFrame:
    """Point-query the sketch for each distinct probe key: the classic
    ``min_j sketch[j][h_j(x)]`` upper bound (est ≥ true count always; the
    overestimate is collision mass, shrinking with width).

    The probe frame expands by ``depth`` then LEFT-joins the sketch as a
    broadcast dim (≤ d·w rows by construction) — probing never shuffles
    the sketch and never touches the original stream.
    """
    _validate(depth, prefix_len)
    p = (
        probes.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .select(
            "_k", F.explode(_cells(F.col("_k"), depth, prefix_len)).alias("jc")
        )
        .select("_k", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    )
    return (
        p.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias(est_col))
        .withColumnRenamed("_k", key_col)
    )
