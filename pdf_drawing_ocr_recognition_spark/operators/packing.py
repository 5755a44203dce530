"""Sequence packing — fill fixed token budgets from chunked documents.

Training consumes fixed-length sequences; packing chunks into bins close to
the budget minimizes padding waste.  Optimal bin packing is NP-hard and
global packing is inherently sequential, so the distributed compromise is
the standard one: greedy next-fit WITHIN each partition, bins namespaced by
partition id.  Packing quality loses only O(1) bins per partition vs a
single-threaded greedy pass, while the work stays embarrassingly parallel —
the right trade at 10^12 chunks.

Determinism: rows are hash-repartitioned by the document key and sorted
within partitions by (key, chunk_idx), so for a fixed partition count the
bin assignment is a pure function of the data (tested: re-runs agree).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 2048,
    key_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
    n_partitions: int | None = None,
) -> DataFrame:
    """chunks → same rows + ``bin_id`` (STRING ``p<partition>_b<k>``).

    Greedy next-fit per partition: a chunk opens a new bin when adding it
    would exceed *budget_tokens* (an oversized single chunk gets its own
    bin).  Chunks of one document stay in one partition (hash on the key),
    so a document's chunks land in contiguous bins.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    part = chunks.repartition(
        n_partitions or chunks.sparkSession.sparkContext.defaultParallelism,
        key_col,
    ).sortWithinPartitions(key_col, idx_col)
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        with_pid.schema.fields + [StructField("bin_id", StringType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # generator state persists across Arrow batches of ONE partition
        bin_k = 0
        filled = 0
        started = False
        for pdf in batches:
            bins = []
            for tok in pdf[tokens_col]:
                tok = int(tok)
                if started and filled + tok > budget_tokens:
                    bin_k += 1
                    filled = 0
                started = True
                filled += tok
                bins.append(bin_k)
            pdf["bin_id"] = [
                f"p{pid}_b{b}" for pid, b in zip(pdf["_pid"], bins)
            ]
            yield pdf

    return with_pid.mapInPandas(assign, schema).drop("_pid")


def packing_stats(packed: DataFrame, tokens_col: str = "n_chunk_tokens") -> DataFrame:
    """Per-bin fill audit: chunk count, token total — feeds the padding-waste
    metric (budget - tokens summed over bins)."""
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(tokens_col).alias("tokens"),
    )


def balanced_shards(
    docs: DataFrame,
    weight_col: str,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Weight-balanced export sharding: assign every document to one of
    *n_shards* output shards so per-shard weight totals are near-equal —
    the "write S balanced training files" step after curation.  Docs are
    globally ranked by (weight DESC, key ASC) with the scalable two-job
    range sort (``global_row_numbers`` — never a single-reducer window),
    then dealt boustrophedon (snake): 0-based rank r goes to shard r mod S
    on even passes and S−1−(r mod S) on odd passes.  Snake dealing over
    descending weights is the one-pass approximation of LPT scheduling:
    every shard receives exactly one doc per pass in alternating order, so
    consecutive pass-pairs cancel each other's spread and the final
    imbalance is bounded by a single document's weight — independent of
    corpus size.  Deterministic: the assignment depends only on the total
    order, not on partitioning (pytest-asserted).

    Returns the input plus (rank BIGINT 1-based, shard INT).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from .order import global_row_numbers

    ranked = global_row_numbers(
        docs,
        [F.col(weight_col).desc(), F.col(key_col).asc()],
        id_col="rank",
    )
    r0 = F.col("rank") - 1
    pos = r0 % n_shards
    even_pass = (F.floor(r0 / n_shards) % 2) == 0
    shard = F.when(even_pass, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn("shard", shard.cast("int"))


def rendezvous_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "hrw",
    shard_col: str = "shard",
) -> DataFrame:
    """STABLE document→shard assignment via rendezvous / highest-random-
    weight hashing (Thaler & Ravishankar 1998): each key goes to the shard
    with the highest ``md5(salt|shard|key)``.  The property plain
    ``hash(key) % n`` lacks and export pipelines need when a shard count
    changes (re-sharding a checkpointed corpus, growing a serving fleet):
    going n → n+1 moves ONLY the keys the new shard wins (~1/(n+1) of
    them), and NEVER moves a key between two old shards — both properties
    pytest-pinned.

    Shape: a constant ×n_shards explode (HRW is O(n_shards) per key by
    construction — for thousands of shards use a consistent-hash ring
    instead, documented trade) + ONE map-side-combinable max hash agg; no
    window, no shuffle beyond the per-key agg.  The winner is the max of
    the ``weight:zero-padded-shard`` string (total order, tie-free even
    under hash collision), replayed verbatim in SQL.

    Returns ``(id_col, shard_col INT)``.
    """
    if not 1 <= n_shards <= 9999:
        raise ValueError(f"need 1 <= n_shards <= 9999, got {n_shards}")
    cand = df.select(
        id_col,
        F.explode(
            F.array(*[F.lit(s) for s in range(n_shards)])
        ).alias("_s"),
    ).select(
        id_col,
        F.concat(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit(salt),
                        F.lit("|"),
                        F.col("_s").cast("string"),
                        F.lit("|"),
                        F.col(id_col).cast("string"),
                    ),
                    "utf-8",
                )
            ),
            F.lit(":"),
            F.lpad(F.col("_s").cast("string"), 4, "0"),
        ).alias("_wk"),
    )
    return cand.groupBy(id_col).agg(
        F.substring(F.max("_wk"), 35, 4).cast("int").alias(shard_col)
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str = "shard",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard integrity manifest for an exported training corpus: doc
    count, char volume, key range, and an ORDER-INSENSITIVE content
    fingerprint — ``bit_xor`` of per-doc 60-bit digests
    (md5(key ‖ ':' ‖ md5(content)) → first 15 hex → bigint).  Two exports
    of a shard match the manifest iff they hold the same (key, content)
    rows, regardless of row order, file count or partitioning — the check
    a data loader or a cross-datacenter copy runs BEFORE training, without
    sorting a terabyte shard.

    XOR is associative/commutative → one map-side-combinable hash
    aggregate; the shuffle carries one row per shard.  Caveats (documented
    contract): an EVEN number of identical duplicate rows XOR-cancels, so
    the fingerprint is read together with n_docs — any duplication that
    cancels in the xor still shifts the count; NULL content digests as the
    empty string (engines disagree on NULL propagation through string
    concat, so the manifest pins one deterministic answer).

    Returns (shard, n_docs, n_chars, min_key, max_key, content_fp).
    """
    content = F.coalesce(F.col(text_col), F.lit(""))
    doc_fp = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        ":",
                        F.col(key_col).cast("string"),
                        F.md5(F.encode(content, "utf-8")),
                    ),
                    "utf-8",
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(F.col(shard_col).alias("shard"), F.col(key_col).alias("_k"),
                  F.length(content).alias("_len"), doc_fp.alias("_fp"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_len").cast("bigint").alias("n_chars"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
            F.bit_xor("_fp").alias("content_fp"),
        )
    )
