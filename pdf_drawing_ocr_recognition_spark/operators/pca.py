"""Distributed PCA over an embedding column: one corpus pass, D² integer
accumulators, a D×D eigenproblem on the driver, and a bitwise-deterministic
Arrow projection.

The classic scale shape for covariance-based methods (Pearson 1901 PCA via
the method of moments): a 100 TB embedding store cannot be centered or
decomposed in memory, but its covariance is a SUM — so the corpus is
touched ONCE by a map-side kernel that accumulates the D×D Gram matrix,
the D first-order sums, and the row count per partition, and the only
shuffle carries partitions × (D(D+1)/2 + D + 1) scalar rows.  The driver
then solves the D×D symmetric eigenproblem (D=64 here — microseconds) and
broadcasts the top-k components; projection is another single narrow pass.

Exactness discipline: accumulating float products in arbitrary partition
order is not associative-safe, so embeddings are quantized first —
``q = floor(e * 2^scale_bits + 0.5)`` as int64 (the float32→double cast,
the power-of-two scale, and the +0.5 are all IEEE-exact, so quantization
is deterministic) — and every accumulator is an exact integer whose SQL
SUM order cannot perturb it.  That makes the corpus-touching stage (the
``pca_gram`` driver query) replay bit-identically in DuckDB; the
eigen/projection stages are pinned by a pure-NumPy twin in pytest instead
(LAPACK has no SQL oracle), mirroring the T90 BPE contract where the
corpus-touching stage is the oracle.

Overflow bound (documented, validated at runtime): |q| <= 2^scale_bits ·
max|e|, so the global Gram sum needs n · (2^scale_bits · max|e|)² < 2^63.
With unit-norm embeddings and the default scale_bits=20 that holds to
~2.5e7 rows; petabyte-scale corpora lower scale_bits (16 → ~1e10 rows) —
quantization error moves the covariance by O(2^-scale_bits), far below
sampling noise at that row count.

Reference analogue: none (single-machine, no linear algebra); this is a
training-data-pipeline operator in the SURVEY §2 Table-D sense
(embedding-space curation: whitening, redundancy axes, compact features).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_moments",
    "pca_fit",
    "pca_transform",
    "pca_outlier_scores",
    "PcaModel",
    "quantize",
]


def quantize(x: np.ndarray, scale_bits: int) -> np.ndarray:
    """The shared quantizer: floor(x * 2^b + 0.5) as int64.  float32→double
    is exact, ·2^b shifts the exponent (exact), +0.5 has mantissa room for
    |x·2^b| < 2^52 — every step deterministic IEEE, identical in NumPy and
    in the DuckDB oracle's ``floor(CAST(e AS DOUBLE) * s + 0.5)``."""
    return np.floor(x.astype(np.float64) * float(1 << scale_bits) + 0.5).astype(
        np.int64
    )


def gram_moments(
    embeddings: DataFrame, vec_col: str, dim: int, scale_bits: int = 20
) -> DataFrame:
    """ONE pass over the corpus producing every moment PCA needs, as exact
    integers: rows ``(i, j, s)`` where

    - ``0 <= i <= j < dim`` — Gram entries  Σ q_i·q_j  (upper triangle),
    - ``j = -1``            — first-order sums  Σ q_i,
    - ``i = j = -1``        — the row count n.

    Per-partition NumPy accumulates ``Q.T @ Q`` (int64 BLAS-free integer
    matmul) and emits D(D+1)/2 + D + 1 scalar rows; the final hash agg
    sums partials — the exchange never carries an embedding."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if not 8 <= scale_bits <= 24:
        raise ValueError(f"need 8 <= scale_bits <= 24, got {scale_bits}")
    iu, ju = (a.astype(np.int32) for a in np.triu_indices(dim))
    out_i = np.concatenate([iu, np.arange(dim, dtype=np.int32), [-1]])
    out_j = np.concatenate([ju, np.full(dim, -1, np.int32), [-1]])

    def part(batches):
        import pandas as pd

        g = np.zeros((dim, dim), dtype=np.int64)
        s1 = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            if x.shape[1] != dim:
                raise ValueError(f"expected dim {dim}, got {x.shape[1]}")
            q = quantize(x, scale_bits)
            g += q.T @ q
            s1 += q.sum(axis=0)
            n += q.shape[0]
        if n == 0:
            return
        s = np.concatenate([g[iu, ju], s1, [n]])
        yield pd.DataFrame({"i": out_i, "j": out_j, "s": s})

    return (
        embeddings.select(vec_col)
        .mapInPandas(part, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").cast("long").alias("s"))
    )


class PcaModel(NamedTuple):
    components: np.ndarray  # (k, dim) row-orthonormal, sign-canonicalized
    eigenvalues: np.ndarray  # (k,) descending
    mean: np.ndarray  # (dim,) de-quantized column means
    scale_bits: int
    n_rows: int
    total_variance: float  # trace of the covariance (for explained ratios)


def pca_fit(
    moments: DataFrame | list, dim: int, k: int, scale_bits: int = 20
) -> PcaModel:
    """Solve the D×D eigenproblem from the integer moments (collects
    exactly D(D+1)/2 + D + 1 scalar rows — never data).  Covariance is the
    de-quantized  G/n − mean·meanᵀ;  eigenvectors come sign-canonicalized
    (largest-|component| positive, first-index tiebreak) so the basis is
    reproducible across reruns."""
    if not 1 <= k <= dim:
        raise ValueError(f"need 1 <= k <= dim, got k={k}, dim={dim}")
    rows = moments if isinstance(moments, list) else moments.collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    s1 = np.zeros(dim, dtype=np.float64)
    n = 0
    sc = float(1 << scale_bits)
    for r in rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1:
            n = int(s)
        elif j == -1:
            s1[i] = s / sc
        else:
            g[i, j] = g[j, i] = s / (sc * sc)
    if n < 2:
        raise ValueError(f"need >= 2 rows to fit PCA, got {n}")
    mean = s1 / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in range(comps.shape[0]):  # sign canon: largest-|x| entry positive
        a = int(np.argmax(np.abs(comps[c])))
        if comps[c, a] < 0:
            comps[c] = -comps[c]
    return PcaModel(
        components=comps,
        eigenvalues=vals[order].copy(),
        mean=mean,
        scale_bits=scale_bits,
        n_rows=n,
        total_variance=float(np.trace(cov)),
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: PcaModel,
    out_col: str = "pca",
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Project each embedding onto the model's components: one narrow Arrow
    pass, no shuffle.  Each score is a strictly left-to-right cumsum fold
    (the repo's bitwise-stable dot — BLAS reduction trees are not
    partition-shape-invariant, cumsum is), so output is bit-identical
    under any repartitioning (pytest-pinned)."""
    comps = model.components
    mean = model.mean
    idc = list(id_cols)
    k = comps.shape[0]

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            scores = np.empty((x.shape[0], k), dtype=np.float64)
            for c in range(k):
                scores[:, c] = np.cumsum(x * comps[c], axis=1)[:, -1]
            out = {c: pdf[c] for c in idc}
            out[out_col] = list(scores)
            yield pd.DataFrame(out)

    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [*(f"{c} {in_schema[c]}" for c in idc), f"{out_col} array<double>"]
    )
    return df.select(*idc, vec_col).mapInPandas(part, schema)


def pca_outlier_scores(
    df: DataFrame,
    vec_col: str,
    model: PcaModel,
    id_cols: tuple[str, ...] = (),
    out_col: str = "recon_err",
) -> DataFrame:
    """Embedding-space outlier scoring for curation: squared reconstruction
    error of each vector against the k-component PCA model — vectors far
    from the corpus's principal subspace (corrupt embeddings, modality
    mixups, adversarial junk) score high and can be gated before dedup/ANN
    stages trust their geometry.

    One narrow Arrow pass (no shuffle): err = ||(x-μ) − Wᵀ·W·(x-μ)||² with
    every reduction a strict left-to-right cumsum fold, so the score is
    bit-identical under any repartitioning (pytest-pinned).  No SQL oracle
    BY CONTRACT: the components come from the driver-side LAPACK eigh
    (T99), which has no DuckDB twin — correctness is pinned by the
    pure-NumPy twin and the planted-outlier/zero-at-full-rank invariants
    instead (the documented rows-only contract class, like T60).
    """
    comps = model.components
    mean = model.mean
    idc = list(id_cols)
    k = comps.shape[0]

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            scores = np.empty((x.shape[0], k), dtype=np.float64)
            for c in range(k):
                scores[:, c] = np.cumsum(x * comps[c], axis=1)[:, -1]
            # strict c-order accumulation (BLAS gemm reduction order can
            # vary with batch shape; this cannot)
            rec = np.zeros_like(x)
            for c in range(k):
                rec += scores[:, c : c + 1] * comps[c]
            resid = x - rec
            err = np.cumsum(resid * resid, axis=1)[:, -1]
            out = {c: pdf[c] for c in idc}
            out[out_col] = err
            yield pd.DataFrame(out)

    in_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [*(f"{c} {in_schema[c]}" for c in idc), f"{out_col} double"]
    )
    return df.select(*idc, vec_col).mapInPandas(part, schema)
