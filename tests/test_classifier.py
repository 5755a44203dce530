"""Hashed linear classifier (operators/classifier.py): batch-perceptron
training convergence, determinism, dimension-bounded state, inference."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.classifier import (
    hashed_token_features,
    linear_margin,
    train_batch_perceptron,
)

GOOD = "alpha beta gamma delta reference article figure table"
BAD = "buy cheap pills casino winner click subscribe offer"


@pytest.fixture(scope="module")
def labeled(spark):
    """40 separable docs: disjoint class vocabularies (plus a shared stop
    token so the model must learn to ignore a common bucket)."""
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0, F.lit("the " + GOOD + " the")
        )
        .otherwise(F.lit("the " + BAD + " the"))
        .alias("text"),
        F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
    )
    feats = hashed_token_features(docs, prefix_len=2).cache()
    labels = docs.select("doc_id", "y")
    return feats, labels


def test_converges_to_zero_error(spark, labeled):
    feats, labels = labeled
    weights, history = train_batch_perceptron(feats, labels, n_epochs=10)
    assert history[-1]["n_wrong"] == 0
    assert history[0]["n_wrong"] == 40  # all-zero model misclassifies all
    # final margins separate the classes strictly
    m = linear_margin(feats, weights).join(labels, "doc_id")
    assert m.filter(F.col("y") * F.col("margin") <= 0).count() == 0


def test_training_is_deterministic_and_partition_invariant(spark, labeled):
    feats, labels = labeled
    w1, h1 = train_batch_perceptron(feats, labels, n_epochs=5)
    w2, h2 = train_batch_perceptron(feats.repartition(7), labels, n_epochs=5)
    assert h1 == h2
    assert w1.exceptAll(w2).count() == 0
    assert w2.exceptAll(w1).count() == 0


def test_weight_state_is_dimension_bounded(spark, labeled):
    feats, labels = labeled
    weights, _ = train_batch_perceptron(feats, labels, n_epochs=3)
    assert weights.count() <= 256  # B = 16**2, never vocabulary-sized


def test_margin_missing_buckets_weigh_zero(spark, labeled):
    feats, _ = labeled
    empty = spark.createDataFrame([("zz", 7)], "b string, w long")
    m = linear_margin(feats, empty)
    assert m.filter(F.col("margin") != 0).count() == 0
    # n_tokens still counts every token
    assert m.filter(F.col("n_tokens") <= 0).count() == 0


def test_validation(spark, labeled):
    feats, labels = labeled
    with pytest.raises(ValueError):
        train_batch_perceptron(feats, labels, n_epochs=0)
    with pytest.raises(ValueError):
        train_batch_perceptron(feats, labels, lr=0)
    with pytest.raises(ValueError):
        hashed_token_features(feats, prefix_len=9)
