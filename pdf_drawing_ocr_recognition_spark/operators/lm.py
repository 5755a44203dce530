"""Stupid-Backoff trigram LM scoring (T94) — Brants et al., EMNLP 2007
("Large Language Models in Machine Translation"), the n-gram model DESIGNED
for distributed count tables: no discounting, no normalization state, just
count ratios with a fixed backoff penalty, which is why it scales to
trillions of tokens on a shuffle engine where Kneser–Ney's held-out mass
bookkeeping does not.

    S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)        if the trigram survives pruning
                  = α · c(w2w3)/c(w2)        else if the bigram is seen
                  = α² · c(w3)/N             otherwise           (α = 0.4)

Count-cutoff pruning (drop trigrams with count < prune_min — the Brants
size lever) shrinks the trigram dim by the Zipf tail; pruned trigrams fall
through to backoff, exactly like the shipped Google models.

Exactness discipline: with α = 2/5 every branch quantizes to a PURE INTEGER
per token — floor(1e6·c3/c12), floor(400000·c23/c2), floor(160000·c1/N) —
so per-doc sums are exact under any partitioning and the whole scorer
replays bit-identically in DuckDB (no float arithmetic anywhere).

Scale posture: all count dims aggregate with map-side partials; trigram
and bigram dims shuffle-join on their own keys (too big to broadcast at
web scale), the vocabulary-sized unigram/context dims broadcast by
default with a documented shuffle-join escape hatch for 10⁷⁺-type
vocabularies (``broadcast_unigrams=False``), the scored
subset filters BEFORE any join, and left joins + one CASE implement the
backoff chain — no per-row Python.

Reference analogue: none (the reference never scores text); Table-D scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stupid_backoff_scores"]


def stupid_backoff_scores(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    prune_min: int = 2,
    score_pred: Column | None = None,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Per-document mean Stupid-Backoff trigram score (quantized ×1e6).

    Counts come from ALL of *docs*; only rows passing *score_pred* (default:
    every row) are scored — the corpus-model / audited-subset split of a
    production quality pass.  Documents with fewer than 3 tokens have no
    trigrams and drop out (documented).  Returns per-doc totals plus the
    backoff-level hit counts (n_tri/n_bi/n_uni) — the observability a
    pruning decision needs.
    """
    if prune_min < 1:
        raise ValueError(f"prune_min must be >= 1, got {prune_min}")
    toks = docs.select(
        key_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(key_col).orderBy("pos")
    tri = toks.select(
        key_col,
        F.col("w").alias("w1"),
        F.lead("w", 1).over(w_ord).alias("w2"),
        F.lead("w", 2).over(w_ord).alias("w3"),
    ).filter(F.col("w3").isNotNull())

    c3 = (
        tri.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n3"))
        .filter(F.col("n3") >= prune_min)  # Brants count cutoff
    )
    c12 = tri.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    b23 = (
        tri.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("n23"))
        .filter(F.col("n23") >= prune_min)  # cutoff applies per order
    )
    c2 = tri.groupBy("w2").agg(F.count(F.lit(1)).alias("n2"))
    u3 = tri.groupBy("w3").agg(F.count(F.lit(1)).alias("nu"))
    tot = tri.agg(F.count(F.lit(1)).alias("nn"))

    # the unigram/context dims are VOCABULARY-sized: broadcastable for the
    # ≲10⁶-type corpora these tests run, but at web scale (10⁷-10⁸ word
    # types) pass broadcast_unigrams=False and they shuffle-join on their
    # keys like the trigram/bigram dims — same results, one more exchange
    dim = F.broadcast if broadcast_unigrams else (lambda d: d)
    stream = tri if score_pred is None else tri.filter(score_pred)
    scored = (
        stream.join(c3, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"])
        .join(b23, ["w2", "w3"], "left")
        .join(dim(c2), "w2")
        .join(dim(u3), "w3")
        .crossJoin(F.broadcast(tot))
    )
    # integer-only backoff chain: α = 2/5 ⇒ the three branches are
    # floor(1e6·n3/n12), floor(4e5·n23/n2), floor(1.6e5·nu/nn)
    q = (
        F.when(
            F.col("n3").isNotNull(),
            F.floor(F.col("n3") * 1_000_000 / F.col("n12")),
        )
        .when(
            F.col("n23").isNotNull(),
            F.floor(F.col("n23") * 400_000 / F.col("n2")),
        )
        .otherwise(F.floor(F.col("nu") * 160_000 / F.col("nn")))
    )
    level = (
        F.when(F.col("n3").isNotNull(), F.lit(0))
        .when(F.col("n23").isNotNull(), F.lit(1))
        .otherwise(F.lit(2))
    )
    per_tok = scored.select(key_col, q.alias("q"), level.alias("lvl"))
    return (
        per_tok.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("q").cast("bigint").alias("sb_score_sum"),
            F.sum((F.col("lvl") == 0).cast("int")).cast("bigint").alias("n_tri"),
            F.sum((F.col("lvl") == 1).cast("int")).cast("bigint").alias("n_bi"),
            F.sum((F.col("lvl") == 2).cast("int")).cast("bigint").alias("n_uni"),
        )
        .select(
            key_col,
            "n_trigrams",
            "sb_score_sum",
            "n_tri",
            "n_bi",
            "n_uni",
            F.round(F.col("sb_score_sum") / F.col("n_trigrams"), 4).alias(
                "avg_sb_q"
            ),
        )
    )


def kn_continuation(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Kneser–Ney continuation statistics (Kneser & Ney, ICASSP 1995; Chen &
    Goodman 1999 §2.7): per word w, ``n_left`` = N1+(·w) — the number of
    DISTINCT left contexts preceding w — and the continuation probability
    P_cont(w) = N1+(·w) / N1+(··) as exact floor-ppm.  The KN insight raw
    frequency misses: "francisco" is frequent but follows only "san", so
    its continuation mass — how likely it starts NEW material — is tiny;
    count-based unigram backoff (T94's leaf) overweights exactly such
    words.  Corpus curation reads P_cont as a vocabulary-versatility /
    templated-text signal; the LM stack reads it as the proper backoff
    leaf.  Also emits ``n_right`` = N1+(w·) (the numerator of the KN
    higher-order discount) and the raw token count for contrast.

    Scale shape: doc-ordered bigrams via codegen lead() windows (window
    sort bounded by doc length, the T71 discipline), ONE distinct over
    bigram TYPES, then two word-keyed counts — every exchange carries
    types, never the token stream.  N1+(··) is a broadcast scalar.
    """
    toks = docs.select(
        key_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "w"),
    )
    w_ord = Window.partitionBy(key_col).orderBy("pos")
    big = (
        toks.select(
            F.col("w").alias("l"), F.lead("w", 1).over(w_ord).alias("r")
        )
        .filter(F.col("r").isNotNull())
    )
    types = big.distinct()
    n_bigram_types = types.agg(
        F.count(F.lit(1)).cast("bigint").alias("_nn")
    )
    n_left = types.groupBy(F.col("r").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    n_right = types.groupBy(F.col("l").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right")
    )
    raw = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    out = (
        raw.join(n_left, "w", "left")
        .join(n_right, "w", "left")
        .crossJoin(F.broadcast(n_bigram_types))
        .select(
            "w",
            "n_tokens",
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
            F.floor(
                F.lit(1000000.0) * F.coalesce("n_left", F.lit(0)) / F.col("_nn")
            ).alias("pcont_ppm"),
        )
    )
    return out
