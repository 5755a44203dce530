"""Similarity search over embedding columns — exact baseline + LSH scale path.

- ``brute_force_topk``: exact cosine top-k via broadcast of the (small) query
  set against the full corpus — the correctness baseline.  One pass, no
  shuffle on the corpus side; ranking via per-query window.
- ``ann_topk``: LSH-bucketed approximate search: corpus and queries are
  hashed to hyperplane sign-bit buckets; each query probes its own bucket
  plus every bucket at Hamming distance ≤ ``probes`` (multiprobe), and only
  those candidates are scored.  At 10^9+ vectors the bucket join touches
  ~(candidates/2^planes · probes) of the corpus instead of all of it, and the
  bucketed corpus can be written once and reused (the IVF analogue: buckets
  are the inverted lists).

Determinism: hyperplanes are caller-supplied literals (seeded offline), so
results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, hyperplane_sign_bits


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (query set small)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def _probe_buckets(bucket_col, n_planes: int, probes: int):
    """Array of bucket ids within Hamming distance <= probes of bucket_col."""
    variants = [bucket_col]
    bits = list(range(n_planes))
    for r in range(1, probes + 1):
        for flip in combinations(bits, r):
            mask = 0
            for b in flip:
                mask |= 1 << b
            variants.append(bucket_col.bitwiseXOR(F.lit(mask)))
    return F.array(*variants)


def bucketize(
    df: DataFrame, planes: list[list[float]], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Attach the hyperplane sign-bit bucket (the writable 'inverted list' key)."""
    return df.withColumn("bucket", hyperplane_sign_bits(F.col(vec_col), planes))


def embedding_near_dupe_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-comparison.

    Vectors are compared only within their hyperplane bucket (near-identical
    embeddings share all sign bits with overwhelming probability), so the
    work is sum-of-squares of bucket sizes, not corpus².  Returns
    (id_a < id_b, cos) pairs with cosine >= min_cosine.
    """
    b = bucketize(corpus, planes, id_col, vec_col)
    a = b.select(F.col("bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    c = b.select(F.col("bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH multiprobe approximate top-k (same output schema as brute force)."""
    n_planes = len(planes)
    c = bucketize(corpus, planes, id_col, vec_col)
    q = bucketize(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_probe_buckets(F.col("bucket"), n_planes, probes)).alias("bucket"),
    )
    cand = c.join(q, "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("qvec"), F.col(vec_col)), 6).alias("score"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
