"""T159: label propagation — clamping, weighted majority, deterministic ties."""

from __future__ import annotations

from pdf_drawing_ocr_recognition_spark.operators.links import label_propagation


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(
        edges, "src_host string, dst_host string, weight long"
    )
    s = spark.createDataFrame(seeds, "node string, label string")
    return {
        r["host"]: (r["label"], r["is_seed"])
        for r in label_propagation(e, s, n_rounds=rounds).collect()
    }


def test_weighted_majority_and_seed_clamp(spark):
    edges = [
        ("a", "x", 1),
        ("b", "x", 3),  # b's mass outweighs a's
        ("x", "a", 99),  # heavy inbound mass must NOT relabel seed a
    ]
    seeds = [("a", "ham"), ("b", "spam")]
    got = _run(spark, edges, seeds, 1)
    assert got["x"] == ("spam", 0)
    assert got["a"] == ("ham", 1) and got["b"] == ("spam", 1)


def test_tie_breaks_to_smallest_label(spark):
    edges = [("a", "x", 2), ("b", "x", 2)]
    got = _run(spark, edges, [("a", "zzz"), ("b", "aaa")], 1)
    assert got["x"][0] == "aaa"


def test_two_hop_spread_and_unreached_absent(spark):
    edges = [("s", "m", 1), ("m", "far", 1), ("island", "island2", 1)]
    seeds = [("s", "c0")]
    one = _run(spark, edges, seeds, 1)
    assert "far" not in one and one["m"] == ("c0", 0)
    two = _run(spark, edges, seeds, 2)
    assert two["far"] == ("c0", 0)
    assert "island" not in two and "island2" not in two


def test_self_loops_ignored(spark):
    edges = [("a", "a", 50), ("a", "x", 1)]
    got = _run(spark, edges, [("a", "c")], 1)
    assert got["x"] == ("c", 0) and got["a"] == ("c", 1)
