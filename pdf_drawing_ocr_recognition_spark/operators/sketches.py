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

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "hll_build",
    "hll_merge",
    "hll_summary",
    "hll_cardinality",
    "hll_alpha_numerator",
]


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


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable distinct-count sketch, integer-exact registers
# ---------------------------------------------------------------------------
#
# The distinct-term count of a 100 TB corpus is the other vocabulary-sized
# question (the Count-Min sketch above answers frequencies): an exact
# ``countDistinct`` shuffles every distinct key.  HyperLogLog (Flajolet et
# al. 2007) answers it from m = 16**bucket_hex integer registers:
#
#     bucket(x) = first bucket_hex hex chars of md5(x)
#     rho(x)    = 1 + number of leading zero BITS of the next 48 hash bits
#     M[b]      = max rho over items in bucket b          (the sketch)
#     E         = alpha_m * m^2 / sum_b 2^-M[b]           (harmonic mean)
#
# Spark shape: rho is a pure codegen string/CASE projection (no UDF), the
# build is ONE map-side-combinable ``max`` hash aggregate whose post-shuffle
# cardinality is <= m rows per group regardless of corpus size, and merging
# two sketches is register-wise max (union of streams == max of sketches) —
# the property Spark's own ``approx_count_distinct`` uses internally but
# never exposes as a first-class, storable, mergeable TABLE.
#
# Everything through ``scaled_sum`` is exact integer arithmetic on a
# deterministic hash (rho via TRIM/LENGTH/BIN — verified char-identical in
# DuckDB), and the raw estimate is ONE literal-over-integer IEEE division
# + round, so build + merge + summary replay bit-identically in ANSI SQL.
# The small-range linear-counting correction needs ln() (libm-dependent
# across engines), so it lives driver-side in ``hll_cardinality`` over the
# per-group summary rows — never in the oracled plan.

_HLL_RHO = (
    "CASE WHEN {st} = '' THEN 49 "
    "ELSE 4 * (12 - length({st})) + 5 "
    "- length(bin(instr('123456789abcdef', substr({st}, 1, 1)))) END"
)


def _hll_validate(bucket_hex: int) -> None:
    if not 1 <= bucket_hex <= 4:
        raise ValueError(f"need 1 <= bucket_hex <= 4, got {bucket_hex}")


def hll_alpha_numerator(bucket_hex: int) -> float:
    """The constant ``alpha_m * m^2 * 2^49`` folded to ONE double literal in
    Python so both engines evaluate exactly ``round(lit / scaled_sum, 4)``
    — a single IEEE division, no ordering freedom left to diverge on."""
    _hll_validate(bucket_hex)
    m = 16**bucket_hex
    alpha = {16: 0.673, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    return alpha * m * m * float(1 << 49)


def hll_build(
    items: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    bucket_hex: int = 2,
) -> DataFrame:
    """Build per-group HLL registers over ``items[key_col]`` (NULL keys are
    skipped).  Returns ``(*group_cols, bucket STRING, reg INT)`` with at
    most ``16**bucket_hex`` rows per group.

    Scale: one codegen projection + one map-side-combinable ``max`` hash
    agg; the exchange carries <= m rows per group — distinct-key
    cardinality never appears in any shuffle."""
    _hll_validate(bucket_hex)
    gc = list(group_cols)
    h = F.md5(F.encode(F.col(key_col), "utf-8"))
    rows = (
        items.filter(F.col(key_col).isNotNull())
        .select(*gc, h.alias("_h"))
        .select(
            *gc,
            F.substring("_h", 1, bucket_hex).alias("bucket"),
            F.expr(
                f"trim(LEADING '0' FROM substr(_h, {bucket_hex + 1}, 12))"
            ).alias("_st"),
        )
        .select(*gc, "bucket", F.expr(_HLL_RHO.format(st="_st")).alias("_rho"))
    )
    return rows.groupBy(*gc, "bucket").agg(
        F.max("_rho").cast("int").alias("reg")
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge two register tables built with the SAME bucket_hex:
    register-wise max.  sketch(A) merge sketch(B) == sketch(A UNION B)
    exactly, so partial sketches from corpus slices / days combine without
    re-reading the data (pytest pins the identity)."""
    gc = list(group_cols)
    cols = [*gc, "bucket", "reg"]
    return (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy(*gc, "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )


def hll_summary(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    bucket_hex: int = 2,
) -> DataFrame:
    """Fold a register table to one row per group:

    - ``filled_buckets`` / ``zero_buckets`` — register occupancy (exact ints;
      zero_buckets feeds the linear-counting branch driver-side),
    - ``scaled_sum`` — sum over all m buckets of ``2^(49 - M[b])`` as an
      exact BIGINT (absent buckets contribute ``2^49``): the harmonic-mean
      denominator with every dyadic term integer-scaled so SQL SUM order
      cannot perturb it,
    - ``est_raw`` — the raw HLL estimate ``alpha*m^2*2^49 / scaled_sum``
      as one literal/integer division, round(.., 4).
    """
    _hll_validate(bucket_hex)
    gc = list(group_cols)
    m = 16**bucket_hex
    numer = hll_alpha_numerator(bucket_hex)
    agg = registers.groupBy(*gc).agg(
        F.count(F.lit(1)).cast("bigint").alias("filled_buckets"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - reg)"))
        .cast("bigint")
        .alias("_ps"),
    )
    zero = (F.lit(m).cast("bigint") - F.col("filled_buckets")).cast("bigint")
    scaled = (F.col("_ps") + zero * F.lit(1 << 49).cast("bigint")).cast("bigint")
    return agg.select(
        *gc,
        "filled_buckets",
        zero.alias("zero_buckets"),
        scaled.alias("scaled_sum"),
        F.round(F.lit(numer) / scaled.cast("double"), 4).alias("est_raw"),
    )


def hll_cardinality(
    filled_buckets: int,
    zero_buckets: int,
    est_raw: float,
    bucket_hex: int = 2,
) -> float:
    """Final cardinality for ONE summary row, applying Flajolet's
    small-range linear-counting correction (``m * ln(m / V)`` when the raw
    estimate is <= 2.5m and empty buckets remain).  Driver-side on
    group-count-many rows by design: ln() is libm-dependent, so it stays
    out of the oracled distributed plan."""
    import math

    _hll_validate(bucket_hex)
    m = 16**bucket_hex
    if est_raw <= 2.5 * m and zero_buckets > 0:
        return m * math.log(m / zero_buckets)
    return est_raw
