"""SQ8 scalar-quantized embedding store + asymmetric top-k (T92).

A 100 TB corpus's float32 embedding store is itself tens of TB; the
standard production fix (Faiss ``SQ8``) stores each dimension as one byte
and searches against the RECONSTRUCTED vectors — queries stay exact, the
corpus is dequantized on the fly (the asymmetric-distance idea from
Jégou et al.'s PQ paper, with a scalar codebook): an 8×/4× memory cut vs
float64/float32 at negligible recall loss.

Spark shape:
- ``sq8_dims``: per-dimension (min, max) — one posexplode + hash agg,
  output is a DIM-sized frame (64 rows), the codebook.
- ``sq8_encode``: codes[i] = floor((x[i]-mn[i])/(mx[i]-mn[i])·254),
  clipped to [0,254]; constant dimensions code to 0.  One Arrow batch;
  codes ship as ``array<smallint>`` (the storage artifact).
- ``sq8_topk``: approx cosine of each exact query against reconstructed
  corpus rows (recon = mn + code·Δ, Δ = (mx−mn)/254 — every op a
  deterministic IEEE double op, and the dot the usual seq_dot_np cumsum
  fold), per-query shortlist of S via WindowGroupLimit, then EXACT rerank
  of the shortlist against the true vectors — identical output contract
  to ``brute_force_topk`` (and pytest-pinned equal to it on the fixture
  corpus, where shortlist recall is total).

Every stage replays bit-identically in DuckDB (indexed list lambdas
mirror the reconstruction), so the whole quantize→shortlist→rerank
pipeline is oracle-checkable end to end (``sq8_ann_topk``).

Reference analogue: none; Table-D training-data-pipeline scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from ..functions.vectors import seq_dot_np, seq_norm_np
from .similarity import _scored_cosine, _stack_f64, _with_pair_scores

__all__ = ["sq8_dims", "sq8_encode", "sq8_topk", "write_sq8_index", "sq8_topk_indexed"]

LEVELS = 254.0  # codes 0..254 (one byte, symmetric headroom)


def sq8_dims(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (pos, mn, mx) codebook — dim-sized output."""
    return (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "_x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("_x").cast("double")).alias("mn"),
            F.max(F.col("_x").cast("double")).alias("mx"),
        )
    )


def _dims_arrays(dims: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    rows = sorted(dims.collect(), key=lambda r: r["pos"])  # dim-bounded
    mn = np.array([r["mn"] for r in rows], dtype=np.float64)
    mx = np.array([r["mx"] for r in rows], dtype=np.float64)
    return mn, mx


def _encode_np(v: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.floor((v - mn) / span * LEVELS)
    c = np.where(span == 0.0, 0.0, c)
    return np.clip(c, 0.0, LEVELS)


def sq8_encode(
    corpus: DataFrame,
    mn: np.ndarray,
    mx: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<smallint>) — the byte store.  One Arrow batch."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("codes", ArrayType(ShortType())),
        ]
    )

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _stack_f64(pdf[vec_col])
            c = _encode_np(v, mn, mx).astype(np.int16)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(c)})

    return corpus.select(id_col, vec_col).mapInPandas(enc, schema)


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ8 top-k: shortlist by approx cosine against the
    reconstructed byte store, exact-rerank the shortlist.  Output
    (query_id, rank, neighbor_id, score) — the brute_force_topk contract.
    """
    if k < 1 or shortlist < k:
        raise ValueError(f"need 1 <= k <= shortlist, got k={k}, S={shortlist}")
    mn, mx = _dims_arrays(sq8_dims(corpus, vec_col))
    delta = (mx - mn) / LEVELS
    codes = sq8_encode(corpus, mn, mx, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = codes.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    a_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("_rawdot", DoubleType()),
            StructField("_nq", DoubleType()),
            StructField("_nr", DoubleType()),
        ]
    )

    def approx(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.float64)
            r = mn + c * delta  # reconstruction — bitwise the oracle's
            qv = _stack_f64(pdf["qvec"])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    id_col: pdf[id_col],
                    "_rawdot": seq_dot_np(qv, r),
                    "_nq": seq_norm_np(qv),
                    "_nr": seq_norm_np(r),
                }
            )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("ascore"), F.asc(id_col)
    )
    short = (
        cand.mapInPandas(approx, a_schema)
        .select(
            "query_id",
            id_col,
            F.round(
                _scored_cosine(F.col("_rawdot"), F.col("_nq"), F.col("_nr")), 6
            ).alias("ascore"),
        )
        .withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= shortlist)
        .select("query_id", id_col)
    )
    # exact rerank: only shortlist×(true vectors) pairs are scored
    pairs = (
        short.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), id_col
        )
        .join(
            F.broadcast(q.withColumnRenamed("qvec", "_qv")),
            "query_id",
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        _with_pair_scores(pairs, "_qv", "_cv", "_d", "_na", "_nb")
        .select(
            "query_id",
            id_col,
            F.round(
                _scored_cosine(F.col("_d"), F.col("_na"), F.col("_nb")), 6
            ).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col(id_col).alias("neighbor_id"), "score"
        )
    )


def write_sq8_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the byte store once: ``<path>/codebook`` (the dim-sized
    per-position (mn, mx) table) and ``<path>/codes`` (one array<smallint>
    row per vector) — the T38/T79 write-once/probe-many contract applied
    to the quantized store.  Probes then scan ~1/8 of the float64 bytes
    and never re-encode the corpus."""
    dims = sq8_dims(corpus, vec_col)
    dims.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    mn, mx = _dims_arrays(dims)
    sq8_encode(corpus, mn, mx, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")


def sq8_topk_indexed(
    corpus: DataFrame,
    queries: DataFrame,
    path: str,
    k: int = 10,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``sq8_topk`` probing the PERSISTED index: the codebook and codes are
    read back (no corpus-side encode stage in the probe plan — asserted in
    tests); only the exact rerank of the shortlist touches the float
    store.  Result-identical to the inline ``sq8_topk`` by construction
    (pytest-pinned)."""
    if k < 1 or shortlist < k:
        raise ValueError(f"need 1 <= k <= shortlist, got k={k}, S={shortlist}")
    spark = corpus.sparkSession
    dims = spark.read.parquet(f"{path}/codebook")
    mn, mx = _dims_arrays(dims)
    delta = (mx - mn) / LEVELS
    codes = spark.read.parquet(f"{path}/codes")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cand = codes.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    a_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField(id_col, LongType()),
            StructField("_rawdot", DoubleType()),
            StructField("_nq", DoubleType()),
            StructField("_nr", DoubleType()),
        ]
    )

    def approx(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.float64)
            r = mn + c * delta
            qv = _stack_f64(pdf["qvec"])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    id_col: pdf[id_col],
                    "_rawdot": seq_dot_np(qv, r),
                    "_nq": seq_norm_np(qv),
                    "_nr": seq_norm_np(r),
                }
            )

    w = Window.partitionBy("query_id").orderBy(F.desc("ascore"), F.asc(id_col))
    short = (
        cand.mapInPandas(approx, a_schema)
        .select(
            "query_id",
            id_col,
            F.round(
                _scored_cosine(F.col("_rawdot"), F.col("_nq"), F.col("_nr")), 6
            ).alias("ascore"),
        )
        .withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= shortlist)
        .select("query_id", id_col)
    )
    pairs = short.join(
        corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), id_col
    ).join(F.broadcast(q.withColumnRenamed("qvec", "_qv")), "query_id")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        _with_pair_scores(pairs, "_qv", "_cv", "_d", "_na", "_nb")
        .select(
            "query_id",
            id_col,
            F.round(
                _scored_cosine(F.col("_d"), F.col("_na"), F.col("_nb")), 6
            ).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col(id_col).alias("neighbor_id"), "score"
        )
    )
