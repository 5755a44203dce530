"""Count-Min sketch (operators/sketches.py): guarantee + merge + size."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, PREFIX = 4, 2  # width 256: small enough to force real collisions


@pytest.fixture(scope="module")
def tokens(spark):
    """Skewed synthetic stream: one 30%-mass heavy hitter over a 997-token
    Zipf-ish tail — vocab (998) exceeds the width (256), so a depth-1
    sketch MUST collide (pigeonhole) and the d·w bound is genuinely
    tighter than an exact vocabulary count."""
    return (
        spark.range(20000)
        .select(
            F.when(F.col("id") % 10 < 3, F.lit("the"))
            .otherwise(F.concat(F.lit("w"), (F.col("id") % 997).cast("string")))
            .alias("w")
        )
        .cache()
    )


def test_never_underestimates(spark, tokens):
    """est(x) >= true count for EVERY distinct token — the CMS contract."""
    sketch = cms_build(tokens, "w", DEPTH, PREFIX)
    truth = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("true_c"))
    est = cms_estimate(sketch, truth, "w", DEPTH, PREFIX)
    joined = est.join(truth, "w")
    n = joined.count()
    assert n == truth.count()
    assert joined.filter(F.col("est") < F.col("true_c")).count() == 0
    # depth-1 sketch with vocab > width: pigeonhole forces a collision, so
    # SOME overestimate must exist — guards against a broken "exact count"
    # implementation that would trivially pass the >= check above
    est1 = cms_estimate(cms_build(tokens, "w", 1, PREFIX), truth, "w", 1, PREFIX)
    over = est1.join(truth, "w").filter(F.col("est") > F.col("true_c"))
    assert over.count() > 0


def test_merge_equals_whole(spark, tokens):
    """sketch(A) ⊕ sketch(B) is cell-for-cell identical to sketch(A∪B) —
    partial sketches from corpus slices combine without the data."""
    with_id = tokens.select("w", F.monotonically_increasing_id().alias("i"))
    half_a = with_id.filter(F.col("i") % 2 == 0)
    half_b = with_id.filter(F.col("i") % 2 == 1)
    merged = cms_merge(
        cms_build(half_a, "w", DEPTH, PREFIX),
        cms_build(half_b, "w", DEPTH, PREFIX),
    )
    whole = cms_build(tokens, "w", DEPTH, PREFIX)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sketch_is_dimension_sized(spark, tokens):
    """post-agg cardinality is bounded by d·w, never by vocabulary size."""
    sketch = cms_build(tokens, "w", DEPTH, PREFIX)
    n_cells = sketch.count()
    assert n_cells <= DEPTH * 16**PREFIX
    vocab = tokens.select("w").distinct().count()
    assert vocab > 16**PREFIX  # the bound is genuinely tighter than exact


def test_weighted_build_matches_row_level(spark, tokens):
    """pre-reduced (token, count) input with weight_col ≡ raw stream."""
    reduced = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    via_weights = cms_build(reduced, "w", DEPTH, PREFIX, weight_col="n")
    via_rows = cms_build(tokens, "w", DEPTH, PREFIX)
    assert via_weights.exceptAll(via_rows).count() == 0
    assert via_rows.exceptAll(via_weights).count() == 0


def test_validation(spark, tokens):
    with pytest.raises(ValueError):
        cms_build(tokens, "w", depth=0)
    with pytest.raises(ValueError):
        cms_build(tokens, "w", prefix_len=0)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

from pdf_drawing_ocr_recognition_spark.operators.sketches import (  # noqa: E402
    hll_build,
    hll_cardinality,
    hll_merge,
    hll_summary,
)


@pytest.fixture(scope="module")
def hll_stream(spark):
    """20k rows over exactly 5000 distinct keys (each appears ~4x) — the
    duplication is the point: HLL must see through repeats."""
    return (
        spark.range(20000)
        .select(F.concat(F.lit("k"), (F.col("id") % 5000).cast("string")).alias("k"))
        .cache()
    )


def test_hll_estimate_accuracy(spark, hll_stream):
    """Raw estimate within 3 sigma (sigma = 1.04/sqrt(m) ~ 6.5% at m=256)
    of the true 5000 distinct; and duplicates don't move the registers
    (sketch(stream) register-identical to sketch(distinct(stream)))."""
    regs = hll_build(hll_stream, "k", bucket_hex=2)
    [row] = hll_summary(regs, bucket_hex=2).collect()
    est = hll_cardinality(
        row["filled_buckets"], row["zero_buckets"], row["est_raw"], bucket_hex=2
    )
    assert abs(est - 5000) / 5000 < 0.20, est
    regs_distinct = hll_build(hll_stream.distinct(), "k", bucket_hex=2)
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, regs_distinct.collect())
    )


def test_hll_merge_equals_whole(spark, hll_stream):
    """Register-wise max of two half-stream sketches is register-identical
    to the whole-stream sketch — the mergeability that lets per-day partial
    sketches combine without re-reading the corpus."""
    with_id = hll_stream.withColumn("_r", F.monotonically_increasing_id())
    a = with_id.filter(F.col("_r") % 2 == 0).select("k")
    b = with_id.filter(F.col("_r") % 2 == 1).select("k")
    merged = hll_merge(hll_build(a, "k"), hll_build(b, "k"))
    whole = hll_build(hll_stream, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_linear_counting_small_range(spark):
    """At 30 distinct << m=256 the raw harmonic estimate biases high and
    the linear-counting branch (zero buckets remain, est <= 2.5m) must
    engage and land within 15% of truth."""
    small = spark.range(30).select(F.concat(F.lit("s"), F.col("id")).alias("k"))
    [row] = hll_summary(hll_build(small, "k"), bucket_hex=2).collect()
    assert row["zero_buckets"] > 0
    est = hll_cardinality(
        row["filled_buckets"], row["zero_buckets"], row["est_raw"], bucket_hex=2
    )
    assert est != row["est_raw"]  # the correction branch actually fired
    assert abs(est - 30) / 30 < 0.15, est


def test_hll_partition_invariance(spark, hll_stream):
    """max is commutative/associative: registers and summary are identical
    under any repartitioning."""
    s1 = hll_summary(hll_build(hll_stream, "k")).collect()
    s2 = hll_summary(hll_build(hll_stream.repartition(13), "k")).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]


def test_hll_grouped_and_validation(spark, hll_stream):
    """Per-group sketches are independent (same keys in two groups give
    identical registers), and bucket_hex is range-checked."""
    two = hll_stream.withColumn("g", F.lit("a")).unionByName(
        hll_stream.withColumn("g", F.lit("b"))
    )
    summ = {
        r["g"]: (r["filled_buckets"], r["scaled_sum"])
        for r in hll_summary(hll_build(two, "k", ("g",)), ("g",)).collect()
    }
    assert summ["a"] == summ["b"]
    with pytest.raises(ValueError):
        hll_build(hll_stream, "k", bucket_hex=0)
    with pytest.raises(ValueError):
        hll_summary(hll_build(hll_stream, "k"), bucket_hex=9)


# ---------------------------------------------------------------------------
# T118: log-binned quantile histogram
# ---------------------------------------------------------------------------


class TestQhist:
    def _bounds(self, bin_id, s=3):
        if bin_id < (1 << s):
            return bin_id, bin_id
        b = (bin_id >> s) + s
        sub = bin_id & ((1 << s) - 1)
        width = 1 << (b - 1 - s)
        lo = (1 << (b - 1)) + sub * width
        return lo, lo + width - 1

    def test_every_value_lands_inside_its_bin_bounds(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            qhist_build,
        )

        vals = list(range(0, 300)) + [2**k + d for k in range(9, 40, 7)
                                      for d in (-1, 0, 1, 12345 % (2**k))]
        df = spark.createDataFrame([(v,) for v in vals], "v LONG")
        hist = {r["bin_id"]: r["n"] for r in qhist_build(df, "v").collect()}
        assert sum(hist.values()) == len(vals)
        # replay: every value's python-computed bin must exist, bounds contain
        for v in vals:
            if v < 8:
                bid = v
            else:
                b = v.bit_length()
                bid = (b - 3) * 8 + (v >> (b - 4)) - 8
            assert bid in hist
            lo, hi = self._bounds(bid)
            assert lo <= v <= hi
            assert hi - lo <= max(0, lo >> 3)  # relative width <= 2^-3

    def test_merge_equals_whole_and_is_sketch_sized(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            qhist_build,
            qhist_merge,
        )

        a_rows = [(("en" if i % 2 else "de"), (i * 37) % 5000) for i in range(400)]
        b_rows = [(("en" if i % 3 else "de"), (i * 91) % 9000) for i in range(300)]
        a = spark.createDataFrame(a_rows, "lang STRING, v LONG")
        b = spark.createDataFrame(b_rows, "lang STRING, v LONG")
        ha = qhist_build(a, "v", ("lang",))
        hb = qhist_build(b, "v", ("lang",))
        merged = qhist_merge(ha, hb, ("lang",))
        whole = qhist_build(a.unionAll(b), "v", ("lang",))
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0
        assert merged.count() <= 2 * 64 * 8

    def test_quantile_bracket_contains_true_quantile(self, spark):
        import math

        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            qhist_build,
            qhist_quantiles,
        )

        vals = [(i * i) % 7919 for i in range(1000)]
        df = spark.createDataFrame([(v,) for v in vals], "v LONG")
        hist = qhist_build(df, "v")
        got = {
            r["q_ppm"]: r
            for r in qhist_quantiles(hist, (500000, 900000, 990000)).collect()
        }
        srt = sorted(vals)
        for ppm in (500000, 900000, 990000):
            rank = math.ceil(ppm * len(vals) / 1e6)
            true_q = srt[rank - 1]
            r = got[ppm]
            assert r["est_lo"] <= true_q <= r["est_hi"], (ppm, true_q, dict(r.asDict()))
            assert r["n_total"] == len(vals)

    def test_negative_and_null_values_excluded_validation(self, spark):
        import pytest as _pytest

        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            qhist_build,
        )

        df = spark.createDataFrame(
            [(5,), (-3,), (None,), (0,)], "v LONG"
        )
        hist = {r["bin_id"]: r["n"] for r in qhist_build(df, "v").collect()}
        assert hist == {5: 1, 0: 1}
        with _pytest.raises(ValueError):
            qhist_build(df, "v", sub_bits=9)
