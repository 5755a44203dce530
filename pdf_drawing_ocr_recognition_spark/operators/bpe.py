"""Distributed BPE tokenizer training (T90) — Spark twin of ``kernel/bpe.py``.

The scale shape (why BPE training is cheap even at 100 TB): the corpus is
touched exactly ONCE, by ``word_frequencies`` — a map-side-combinable hash
agg producing the word-TYPE frequency dim (Zipf: millions of types for
trillions of tokens).  Every training iteration then runs on that
vocabulary-sized frame only:

    pairs   one HOF projection (adjacent symbol pairs, freq-weighted)
            + one hash agg over the pair dim
    argmax  min_by over struct(-count, a, b) — the kernel's
            (count DESC, pair ASC) rule as a single-row aggregate,
            no sort, no window
    merge   one Arrow batch calling the SAME ``kernel.bpe.apply_merge``
            the pure-Python twin uses (byte-identity by construction),
            re-materialized via localCheckpoint so K merges never build
            a K-deep lineage (the order.py discipline)

Only the 1-row winning pair crosses the driver per iteration (plus the
final merge list — the tokenizer artifact itself).  The trained merge list
is pytest-pinned IDENTICAL to ``kernel.bpe.train_bpe`` on the same
frequency table, and the first iteration's corpus-scale pair counts are
DuckDB-oracled (``bpe_pair_counts``).

Reference analogue: none (the reference never tokenizes); Table-D scope.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_drawing_ocr_recognition_spark.kernel.bpe import (
    apply_merge,
    encode_word,
    word_symbols,
)

__all__ = ["word_frequencies", "train_bpe_distributed", "encode_words"]

_SYMS_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(StringType())),
        StructField("freq", LongType()),
    ]
)


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The single corpus-scale pass: whitespace word-type frequencies
    (lowercased).  Map-side combinable; output is the Zipf-bounded dim
    every later iteration runs on.  Empty tokens are dropped."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _symbolize(word_freqs: DataFrame) -> DataFrame:
    """(word, freq) → (syms, freq) via the kernel's word_symbols — one
    Arrow batch over the vocabulary dim, so Spark and the pure twin agree
    on every unicode edge by construction."""

    def init(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "syms": [list(word_symbols(w)) for w in pdf["word"]],
                    "freq": pdf["freq"],
                }
            )

    return word_freqs.select("word", "freq").mapInPandas(init, _SYMS_SCHEMA)


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-position pair counts — HOF projection over
    the vocab dim + one hash agg (pair-dim sized)."""
    n = F.size("syms")
    pairs = syms_df.filter(n >= 2).select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").cast("bigint").alias("cnt")
    )


def train_bpe_distributed(
    word_freqs: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a (word, freq) dim — the
    kernel's (count DESC, pair ASC) rule per round, one vocab-dim job per
    merge, stopping early when nothing mergeable remains."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    syms = _symbolize(word_freqs).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        row = (
            _pair_counts(syms)
            .agg(
                F.min_by(
                    F.struct("a", "b"),
                    F.struct((-F.col("cnt")).alias("n"), "a", "b"),
                ).alias("best")
            )
            .collect()[0]["best"]
        )
        if row is None:
            break
        pair = (row["a"], row["b"])
        merges.append(pair)

        def rewrite(batches, _p=pair):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pdf = pdf.copy()
                pdf["syms"] = [
                    list(apply_merge(tuple(s), _p)) for s in pdf["syms"]
                ]
                yield pdf

        # re-materialize: flat lineage across K merges, and the next
        # iteration's pair counts read the rewritten symbols exactly once
        syms = syms.mapInPandas(rewrite, _SYMS_SCHEMA).localCheckpoint(
            eager=True
        )
    return merges


def encode_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Tokenize a word dim with a trained merge list (training-order
    application — the kernel's encode_word, one Arrow batch).  Encode the
    DISTINCT word dim once and broadcast-join tokens back onto the corpus
    rather than re-encoding every token occurrence."""
    out_schema = StructType(
        [
            StructField(word_col, StringType()),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_pieces", LongType()),
        ]
    )

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = [encode_word(w, merges) for w in pdf[word_col]]
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "tokens": toks,
                    "n_pieces": [len(t) for t in toks],
                }
            )

    return words.select(word_col).distinct().mapInPandas(enc, out_schema)
