"""End-to-end corpus deduplication operators.

Composes the SQL-portable hash primitives (functions/dedup.py) into the
operators a training-data pipeline actually runs:

- ``exact_dedupe``      keep one representative (min key) per byte-equal text;
- ``near_dupe_pairs``   MinHash+LSH candidate pairs, optionally confirmed by
  true Jaccard over word shingles;
- ``near_dedupe``       drop every doc that appears as the GREATER member of a
  confirmed pair — the standard one-pass approximation of
  connected-component dedup (each cluster keeps its minimum;
  chains collapse transitively over repeated application).

Scale notes: pairs are generated inside band buckets via grouped collect +
in-array combinations (one shuffle; no self-join → no recompute of the digest
stage), with an optional per-bucket cap against adversarial hot buckets —
capped buckets are REPORTED, not silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dedup import jaccard, lsh_band_keys, minhash_sig_fold, word_shingles


def exact_dedupe(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep min(key) per md5(text) digest; one shuffle keyed by digest."""
    digests = docs.withColumn(
        "_digest", F.md5(F.encode(F.col(text_col), "utf-8"))
    )
    keepers = digests.groupBy("_digest").agg(F.min(key_col).alias(key_col))
    return digests.join(keepers, [key_col, "_digest"], "left_semi").drop("_digest")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    parallelism: int | None = None,
    salts: tuple[str, ...] = ("0", "1"),
    n_windows: int = 8,
    width: int = 4,
) -> DataFrame:
    """(key, sig ARRAY<STRING>[16]) — windowed-digest MinHash, codegen path.

    Formulation: explode the word-trigram shingles, compute one salted md5
    per (salt, shingle) plus its hex windows as plain projections, then
    ``groupBy(key).agg(min(window_j)...)`` — every stage is whole-stage
    codegen (Generate + Project + partial HashAggregate), unlike the
    higher-order-function fold (``minhash_sig_fold``), whose interpreted
    ``Expression.eval`` path measured ~9x slower after other jobs polluted
    the JIT profile (see memory/spark-graft-hof-jit).  The map-side partial
    min means the shuffle carries one row per (doc, partition) — at 10^12
    docs this is the same bytes as the fold path but far less CPU.

    Output is value-identical to ``window_minima`` over per-salt digest
    arrays; docs whose text yields no shingles (<3 words) are absent from
    the result (the fold path gave them a NULL sig — no such docs exist in
    any driver corpus, asserted in tests).
    """
    par = parallelism or docs.sparkSession.sparkContext.defaultParallelism
    # Word trigrams via posexplode + lead() instead of a transform() over the
    # word array: the HOF's interpreted Expression.eval was the last
    # non-codegen piece of this path (and the window's sort shares the
    # groupBy's hash partitioning on the key, so it costs no extra shuffle).
    words = docs.repartition(par, key_col).select(
        key_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("_pos", "_w"),
    )
    w = Window.partitionBy(key_col).orderBy("_pos")
    shingled = (
        words.select(
            key_col,
            F.concat_ws(
                " ", F.col("_w"), F.lead("_w", 1).over(w), F.lead("_w", 2).over(w)
            ).alias("_sh"),
            F.lead("_w", 2).over(w).alias("_w3"),
        )
        .filter(F.col("_w3").isNotNull())
        .drop("_w3")
    )
    win_cols = []
    proj = [F.col(key_col)]
    for s_i, salt in enumerate(salts):
        digest = F.md5(F.encode(F.concat(F.lit(salt + "|"), F.col("_sh")), "utf-8"))
        for j in range(n_windows):
            name = f"_w{s_i}_{j}"
            proj.append(F.substring(digest, j * width + 1, width).alias(name))
            win_cols.append(name)
    return (
        shingled.select(*proj)
        .groupBy(key_col)
        .agg(*[F.min(c).alias(c) for c in win_cols])
        .select(key_col, F.array(*[F.col(c) for c in win_cols]).alias("sig"))
    )


def near_dupe_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 10000,
    min_jaccard: float | None = None,
) -> DataFrame:
    """LSH candidate pairs (key_a < key_b), optionally Jaccard-confirmed."""
    sigs = minhash_signatures(docs, text_col, key_col)
    banded = sigs.select(
        key_col,
        F.explode(lsh_band_keys(F.col("sig"), n_bands, rows_per_band)).alias("band_key"),
    )
    buckets = banded.groupBy("band_key").agg(
        F.sort_array(F.collect_set(key_col)).alias("ids")
    )
    capped = buckets.withColumn("bucket_size", F.size("ids")).withColumn(
        "capped", F.col("bucket_size") > max_bucket
    )
    pairs = (
        capped.filter(~F.col("capped"))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ids"),
                                i + 2,
                                F.greatest(F.size(F.col("ids")) - i - 1, F.lit(0)),
                            ),
                            lambda y: F.struct(x.alias("key_a"), y.alias("key_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.key_a", "p.key_b")
        .distinct()
    )
    if min_jaccard is not None:
        grams = docs.select(
            F.col(key_col), word_shingles(F.col(text_col), 3).alias("grams")
        )
        pairs = (
            pairs.join(grams.withColumnRenamed(key_col, "key_a").withColumnRenamed("grams", "ga"), "key_a")
            .join(grams.withColumnRenamed(key_col, "key_b").withColumnRenamed("grams", "gb"), "key_b")
            .withColumn("jaccard", jaccard(F.col("ga"), F.col("gb")))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("key_a", "key_b", "jaccard")
        )
    return pairs


def near_dedupe(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    **pair_kwargs,
) -> DataFrame:
    """Drop the greater member of every candidate pair (keep cluster minima)."""
    pairs = near_dupe_pairs(docs, text_col, key_col, **pair_kwargs)
    losers = pairs.select(F.col("key_b").alias(key_col)).distinct()
    return docs.join(losers, key_col, "left_anti")
