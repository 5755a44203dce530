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
    "qhist_build",
    "qhist_merge",
    "qhist_quantiles",
    "opmh_sketch",
    "opmh_merge",
    "opmh_overlap",
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


def _qhist_validate(sub_bits: int) -> None:
    if not 0 <= sub_bits <= 6:
        raise ValueError(f"need 0 <= sub_bits <= 6, got {sub_bits}")


def qhist_build(
    items: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    sub_bits: int = 3,
) -> DataFrame:
    """Mergeable log-binned quantile histogram — the HDR-histogram /
    DDSketch idea (Dunning's exponential bins; Masson et al., DDSketch,
    VLDB 2019) in EXACT integer arithmetic, so the sketch replays
    bit-identically in ANSI SQL.

    A non-negative integer value v lands in bin

        v < 2^s               → bin_id = v                  (exact region)
        v in [2^(b-1), 2^b)   → bin_id = (b-s)·2^s + sub,
                                 sub = (v >> (b-1-s)) - 2^s  (s = sub_bits)

    i.e. each power-of-two range splits into 2^s equal sub-buckets: the
    relative bin width — and so the worst-case quantile error — is ≤ 2^-s
    (12.5% at the default s=3), with values below 2^s stored EXACTLY.
    bin_id is monotone in v, so quantiles read off the cumulative counts.

    Returns (*group_cols, bin_id INT, n BIGINT): ONE codegen projection
    (length(bin(v)) is the bit-length — no floats anywhere) + one
    map-side-combinable count agg.  The exchange and the stored sketch are
    bounded by the ~64·2^s occupied bins per group, never the value
    cardinality — a 100 TB length distribution compresses to ≤ ~500 rows.
    NULL and negative values are rejected in-plan (assert folded into the
    bin computation would be pruned; an explicit filter + count contract
    documents them out instead — callers pre-clean).
    """
    _qhist_validate(sub_bits)
    gc = list(group_cols)
    s = sub_bits
    v = F.col(value_col).cast("bigint")
    # bit-length via length(bin(v)); variable shifts need the SQL form
    # (pyspark's shiftright only takes a literal shift)
    bin_id = F.expr(
        f"CASE WHEN _v < {1 << s} THEN CAST(_v AS INT) "
        f"ELSE CAST((length(bin(_v)) - {s}) * {1 << s} "
        f"     + shiftright(_v, length(bin(_v)) - {1 + s}) - {1 << s} AS INT) "
        f"END"
    )
    return (
        items.filter(v.isNotNull() & (v >= 0))
        .select(*gc, v.alias("_v"))
        .select(*gc, bin_id.alias("bin_id"))
        .groupBy(*gc, "bin_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def qhist_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge two histograms built with the SAME sub_bits: bin-wise count
    sum.  sketch(A) merge sketch(B) == sketch(A UNION ALL B) exactly
    (pytest pins the identity) — partial histograms from corpus slices,
    days, or stream micro-batches combine without re-reading data."""
    gc = list(group_cols)
    cols = [*gc, "bin_id", "n"]
    return (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy(*gc, "bin_id")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def qhist_bounds(col: str, sub_bits: int = 3):
    """(lo, hi) Columns — the exact integer value range of bin column
    *col*.  Inverse of the qhist_build bin map; pure shift arithmetic
    (SQL form: the shifts are data-dependent)."""
    s = sub_bits
    # b = (bin_id >> s) + s; lo = 2^(b-1) + sub·2^(b-1-s); hi = lo+width-1
    lo = F.expr(
        f"CASE WHEN {col} < {1 << s} THEN CAST({col} AS BIGINT) "
        f"ELSE shiftleft(CAST(1 AS BIGINT), shiftright({col}, {s}) + {s - 1}) "
        f"     + CAST({col} & {(1 << s) - 1} AS BIGINT) "
        f"       * shiftleft(CAST(1 AS BIGINT), shiftright({col}, {s}) - 1) "
        f"END"
    )
    hi = F.expr(
        f"CASE WHEN {col} < {1 << s} THEN CAST({col} AS BIGINT) "
        f"ELSE shiftleft(CAST(1 AS BIGINT), shiftright({col}, {s}) + {s - 1}) "
        f"     + (CAST({col} & {(1 << s) - 1} AS BIGINT) + 1) "
        f"       * shiftleft(CAST(1 AS BIGINT), shiftright({col}, {s}) - 1) - 1 "
        f"END"
    )
    return lo, hi


def qhist_quantiles(
    hist: DataFrame,
    quantiles_ppm: tuple[int, ...] = (500000, 900000, 990000),
    group_cols: tuple[str, ...] = (),
    sub_bits: int = 3,
) -> DataFrame:
    """Quantile read-off: for each group and each quantile q (given in ppm
    so the rank target ``ceil(q·n)`` is EXACT integer arithmetic —
    ``(ppm·n + 999999) div 10^6`` — never a float), find the first bin
    whose cumulative count reaches the target and report its exact integer
    value bounds (est_lo, est_hi): the true quantile provably lies inside,
    and (est_hi - est_lo)/est_lo ≤ 2^-sub_bits.

    Runs entirely on the ≤ ~500-row sketch: a window cumsum per group, a
    tiny quantile cross join, one min_by — nothing here ever sees the
    corpus.  Returns (*group_cols, q_ppm, n_total, bin_id, est_lo, est_hi).
    """
    _qhist_validate(sub_bits)
    from pyspark.sql import Window

    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy("bin_id") if gc else Window.orderBy("bin_id")
    cum = hist.select(
        *gc,
        "bin_id",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_cum"),
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n_total"),
    )
    qdim = F.array(*[F.lit(int(q)) for q in quantiles_ppm])
    probes = cum.select(
        *gc, "bin_id", "_cum", "n_total", F.explode(qdim).alias("q_ppm")
    )
    target = F.expr("(q_ppm * n_total + 999999) div 1000000")
    hits = probes.filter(F.col("_cum") >= target)
    best = hits.groupBy(*gc, "q_ppm").agg(
        F.min("bin_id").alias("bin_id"), F.max("n_total").alias("n_total")
    )
    lo, hi = qhist_bounds("bin_id", sub_bits)
    return best.select(
        *gc, "q_ppm", "n_total", "bin_id", lo.alias("est_lo"), hi.alias("est_hi")
    )


# ---------------------------------------------------------------------------
# one-permutation MinHash source sketches (set-overlap between corpus slices)
# ---------------------------------------------------------------------------


def opmh_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "om",
) -> DataFrame:
    """One-permutation MinHash sketch per group (Li, Owen & Zhang 2012):
    a fixed k-row summary of each group's VALUE SET, built with one
    map-side-combinable min aggregate — the mergeable answer to "how much
    does source A's vocabulary/shingle set overlap source B's", which an
    exact ``groupBy(source, value)`` would answer with a vocabulary-sized
    shuffle per source.

    One md5 per value, two disjoint hex windows (the MinHash one-digest
    discipline): chars 1-15 are the 60-bit comparable hash, chars 16-19
    pick the bucket (16 bits; k must divide 65536 so the residue is
    unbiased).  Each group keeps min(hash) per bucket — the post-shuffle
    exchange is ≤ k rows per group per task regardless of corpus size,
    and two sketches of the same group merge by bucket-wise min (union
    of streams ≡ min of sketches; see ``opmh_merge``).

    Returns (group_col, bucket, min_hash) — ≤ k rows per group.
    """
    if k <= 0 or 65536 % k != 0:
        raise ValueError(f"k must be a positive divisor of 65536, got {k}")
    m = F.md5(
        F.encode(
            F.concat_ws("|", F.lit(salt), F.col(value_col).cast("string")),
            "utf-8",
        )
    )
    h = F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint")
    bucket = (
        F.conv(F.substring(m, 16, 4), 16, 10).cast("bigint") % F.lit(k)
    ).cast("int")
    return (
        df.select(
            F.col(group_col), bucket.alias("bucket"), h.alias("_h")
        )
        .groupBy(group_col, "bucket")
        .agg(F.min("_h").alias("min_hash"))
    )


def opmh_merge(a: DataFrame, b: DataFrame, group_col: str) -> DataFrame:
    """Merge two one-permutation MinHash sketches of the same universe:
    bucket-wise min — sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)), so
    daily partial sketches fold without re-reading the corpus."""
    return (
        a.unionByName(b)
        .groupBy(group_col, "bucket")
        .agg(F.min("min_hash").alias("min_hash"))
    )


def opmh_overlap(sketch: DataFrame, group_col: str) -> DataFrame:
    """Pairwise set-overlap matrix from one-permutation MinHash sketches:
    for each unordered group pair, the fraction of co-occupied buckets
    whose min hashes COLLIDE estimates Jaccard(A, B) — the uniform-min
    argument: P[min_A = min_B | both buckets occupied] = |A∩B|/|A∪B|
    within the bucket's residue class.

    The join input is the k-row-per-group sketch dim (never the corpus),
    so the pair expansion is dimension-sized: |groups|²·k at worst, and
    the final aggregate is map-side combinable.  Estimator contract:
    buckets occupied by only one side are EXCLUDED from the denominator
    (n_both counts co-occupied buckets); with |set| >> k empties are
    rare and the estimate concentrates at ±O(1/√k).

    Returns (group_a, group_b, n_both, n_match, jaccard_est_ppm) with
    jaccard_est_ppm = 10⁶·n_match div n_both — exact integer arithmetic.
    """
    a = sketch.select(
        F.col(group_col).alias("group_a"),
        "bucket",
        F.col("min_hash").alias("_ha"),
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"),
        "bucket",
        F.col("min_hash").alias("_hb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_both"),
            F.sum(
                (F.col("_ha") == F.col("_hb")).cast("bigint")
            ).alias("n_match"),
        )
        .select(
            "group_a",
            "group_b",
            "n_both",
            "n_match",
            F.expr("n_match * 1000000 div n_both").alias("jaccard_est_ppm"),
        )
    )
