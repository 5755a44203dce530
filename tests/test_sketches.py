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
