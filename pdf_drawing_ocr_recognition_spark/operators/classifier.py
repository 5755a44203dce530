"""Hashed-feature linear quality classifier: the fastText-style gate of a
web-corpus pipeline (CCNet / LLaMA "quality classifier" stage), Spark-first.

Production pretraining corpora run a cheap linear model over hashed
bag-of-words features to score every page ("looks like a reference page"
vs "looks like boilerplate/spam").  Two halves:

* **Inference** (`hashed_token_features` + `linear_margin`) — per document,
  token → md5-hex-prefix bucket (the engine-portable hash-mod this repo
  standardizes on, T73), counts reduced MAP-SIDE to ≤B rows per document,
  then one broadcast join against the B-row weight dim and one hash agg:
  margin(d) = Σ_b c_d[b]·w[b].  All-integer (weights are quantized
  ×10⁶-style ints), so the score is exact under any partitioning and the
  whole pass replays bit-identically in ANSI SQL — the
  ``quality_classifier_scores`` driver query is DuckDB-oracled.

* **Training** (`train_batch_perceptron`) — the batch perceptron: each
  epoch scores every labeled doc with the current weights, and every
  misclassified doc contributes y·c[b] to bucket b's update.  The epoch
  update is ONE map-side-combinable hash agg over the feature stream
  (never a sequential pass), weights stay a ≤B-row dim pulled to the
  driver and re-broadcast as fresh literals each epoch (the ivf_refine
  iterative shape — lineage stays flat, the corpus never moves), and all
  arithmetic is integer, so a fixed epoch count is bitwise reproducible
  across reruns and partitionings (tested).  On linearly separable data
  the batch perceptron converges to zero training error (Novikoff); the
  per-epoch error count returns as history so callers can stop early.

Reference analogue: none (single-machine reference); Table-D operator in
the SURVEY §2 sense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hashed_token_features",
    "linear_margin",
    "train_batch_perceptron",
]


def hashed_token_features(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """Whitespace tokens → B = 16**prefix_len hashed-count features:
    ``(key, b STRING, c BIGINT)`` with ≤B rows per document (the groupBy
    combines map-side, so the shuffle carries bucket counts, not tokens)."""
    if not (1 <= prefix_len <= 8):
        raise ValueError(f"prefix_len must be in [1, 8], got {prefix_len}")
    return (
        docs.select(
            F.col(key_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"),
        )
        .select(
            key_col,
            F.substring(
                F.md5(F.encode(F.col("_w"), "utf-8")), 1, prefix_len
            ).alias("b"),
        )
        .groupBy(key_col, "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def linear_margin(
    features: DataFrame,
    weights: DataFrame,
    key_col: str = "doc_id",
    margin_col: str = "margin",
) -> DataFrame:
    """Score each key against a ``(b, w)`` integer weight dim:
    margin = Σ c·w (missing buckets weigh 0).  The weight dim broadcasts
    (≤B rows by construction); the sum is one hash agg — exact integers,
    deterministic under any partitioning."""
    return (
        features.join(F.broadcast(weights.select("b", "w")), "b", "left")
        .groupBy(key_col)
        .agg(
            F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("bigint")
            .alias(margin_col),
            F.sum("c").cast("bigint").alias("n_tokens"),
        )
    )


def train_batch_perceptron(
    features: DataFrame,
    labels: DataFrame,
    key_col: str = "doc_id",
    n_epochs: int = 10,
    lr: int = 1,
) -> tuple[DataFrame, list[dict]]:
    """Batch-perceptron training over hashed features.

    ``labels`` is ``(key, y)`` with y ∈ {-1, +1}.  Per epoch: margins via
    the current weights (one broadcast join + hash agg), misclassified =
    y·margin ≤ 0 (zero margin counts as wrong, so epoch 0 updates on every
    doc from the all-zero model), update[b] = lr·Σ_misclassified y·c[b]
    (one map-side-combinable agg over the feature stream).  Only the ≤B-row
    weight dim crosses the driver per epoch — never documents — and it
    re-enters as fresh literals so lineage stays flat across epochs
    (the ivf_refine discipline, similarity.py).

    Returns ``(weights DataFrame (b, w), history [{epoch, n_wrong, n_docs}])``.
    Integer arithmetic end-to-end: a fixed epoch count is bitwise
    reproducible (tested), unlike float SGD.
    """
    if n_epochs < 1:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    if lr < 1:
        raise ValueError(f"lr must be a positive integer, got {lr}")
    spark = features.sparkSession
    labeled = features.join(labels.select(key_col, "y"), key_col).cache()
    w: dict[str, int] = {}
    history: list[dict] = []
    try:
        for epoch in range(n_epochs):
            wdf = spark.createDataFrame(
                sorted(w.items()) or [("", 0)], "b string, w long"
            )
            scored = (
                labeled.join(F.broadcast(wdf), "b", "left")
                .groupBy(key_col)
                .agg(
                    F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0))).alias(
                        "_m"
                    ),
                    F.max("y").alias("_y"),
                )
            )
            wrong = scored.filter(F.col("_y") * F.col("_m") <= 0)
            n_docs = scored.count()
            n_wrong = wrong.count()
            history.append(
                {"epoch": epoch, "n_wrong": n_wrong, "n_docs": n_docs}
            )
            if n_wrong == 0:
                break
            upd = (
                labeled.join(wrong.select(key_col), key_col, "left_semi")
                .groupBy("b")
                .agg(F.sum(F.col("y") * F.col("c")).alias("_u"))
                .collect()  # ≤B rows: the weight dim, never documents
            )
            for r in upd:
                w[r["b"]] = w.get(r["b"], 0) + lr * int(r["_u"])
                if w[r["b"]] == 0:
                    del w[r["b"]]
    finally:
        labeled.unpersist()
    wdf = spark.createDataFrame(sorted(w.items()) or [("", 0)], "b string, w long")
    return wdf.filter(F.col("b") != ""), history
