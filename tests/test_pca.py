"""Distributed PCA (operators/pca.py): moment exactness vs a NumPy twin,
eigen invariants, projection determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.pca import (
    PcaModel,
    gram_moments,
    pca_fit,
    pca_transform,
    quantize,
)

DIM, N, BITS = 16, 400, 20


def _synth():
    """Deterministic anisotropic cloud: variance concentrated along a known
    unit direction u (scale 5) over isotropic noise (scale 0.5)."""
    rng = np.random.RandomState(7)
    u = rng.randn(DIM)
    u /= np.linalg.norm(u)
    t = rng.randn(N, 1) * 5.0
    x = (t @ u[None, :] + rng.randn(N, DIM) * 0.5).astype(np.float32)
    return x, u


@pytest.fixture(scope="module")
def cloud(spark):
    x, u = _synth()
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(N)], "vec_id int, embedding array<float>"
    ).cache()
    return df, x, u


def _twin_moments(x):
    q = quantize(x, BITS)
    return q.T @ q, q.sum(axis=0), len(x)


def test_gram_moments_exact_vs_twin(spark, cloud):
    """Every integer accumulator equals the single-machine NumPy twin —
    the corpus-touching stage is exact, not approximately summed."""
    df, x, _ = cloud
    rows = {(r["i"], r["j"]): r["s"] for r in gram_moments(df, "embedding", DIM, BITS).collect()}
    g, s1, n = _twin_moments(x)
    assert rows[(-1, -1)] == n
    for i in range(DIM):
        assert rows[(i, -1)] == s1[i]
        for j in range(i, DIM):
            assert rows[(i, j)] == g[i, j]
    assert len(rows) == DIM * (DIM + 1) // 2 + DIM + 1


def test_gram_moments_partition_invariant(spark, cloud):
    df, x, _ = cloud
    a = sorted(map(tuple, gram_moments(df, "embedding", DIM, BITS).collect()))
    b = sorted(
        map(tuple, gram_moments(df.repartition(11), "embedding", DIM, BITS).collect())
    )
    assert a == b


def test_fit_invariants_and_recovery(spark, cloud):
    """Components orthonormal, eigenvalues descending and summing to the
    trace, and the planted direction recovered (|cos| > 0.99)."""
    df, x, u = cloud
    m = pca_fit(gram_moments(df, "embedding", DIM, BITS), DIM, k=DIM, scale_bits=BITS)
    assert np.allclose(m.components @ m.components.T, np.eye(DIM), atol=1e-9)
    assert np.all(np.diff(m.eigenvalues) <= 1e-12)
    assert abs(m.eigenvalues.sum() - m.total_variance) < 1e-6
    assert abs(float(m.components[0] @ u)) > 0.99
    # sign canon: the largest-|x| entry of every component is positive
    for c in m.components:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_reconstruction_error_monotone(spark, cloud):
    """Mean squared reconstruction error shrinks as k grows and is ~0 at
    k=D (complete basis)."""
    df, x, _ = cloud
    moments = gram_moments(df, "embedding", DIM, BITS).collect()
    errs = []
    xc = x.astype(np.float64)
    for k in (1, 4, DIM):
        m = pca_fit(moments, DIM, k=k, scale_bits=BITS)
        z = (xc - m.mean) @ m.components.T
        rec = z @ m.components + m.mean
        errs.append(float(np.mean((xc - rec) ** 2)))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-9


def test_transform_matches_twin_and_partitioning(spark, cloud):
    """Spark projection is bitwise the cumsum-fold twin, under any
    partitioning, and carries id columns through."""
    df, x, _ = cloud
    m = pca_fit(gram_moments(df, "embedding", DIM, BITS), DIM, k=3, scale_bits=BITS)
    out = {
        r["vec_id"]: r["pca"]
        for r in pca_transform(df, "embedding", m, id_cols=("vec_id",)).collect()
    }
    out2 = {
        r["vec_id"]: r["pca"]
        for r in pca_transform(
            df.repartition(7), "embedding", m, id_cols=("vec_id",)
        ).collect()
    }
    assert out == out2
    xc = x.astype(np.float64) - m.mean
    for i in range(N):
        twin = [float(np.cumsum(xc[i] * m.components[c])[-1]) for c in range(3)]
        assert out[i] == twin


def test_validation():
    with pytest.raises(ValueError):
        pca_fit([], DIM, k=0)
    with pytest.raises(ValueError):
        pca_fit([{"i": -1, "j": -1, "s": 1}], DIM, k=2)  # n < 2


def test_dim_mismatch_raises(spark, cloud):
    df, _, _ = cloud
    with pytest.raises(Exception):
        gram_moments(df, "embedding", DIM + 1, BITS).collect()


def test_outlier_scores_planted_and_full_rank(spark, cloud):
    """T108: a vector far off the principal subspace gets the top score;
    at k=D the residual is ~0 for everything; scores are bitwise
    partition-invariant."""
    from pdf_drawing_ocr_recognition_spark.operators.pca import (
        pca_outlier_scores,
    )

    df, x, u = cloud
    moments = gram_moments(df, "embedding", DIM, BITS).collect()
    m1 = pca_fit(moments, DIM, k=1, scale_bits=BITS)
    # plant an outlier orthogonal-ish to u: flip sign pattern + big norm
    v = np.ones(DIM, dtype=np.float32) * 30.0
    v[::2] *= -1.0
    planted = df.unionByName(
        spark.createDataFrame([(999, [float(z) for z in v])], df.schema)
    )
    scores = {
        r["vec_id"]: r["recon_err"]
        for r in pca_outlier_scores(planted, "embedding", m1, ("vec_id",)).collect()
    }
    assert max(scores, key=scores.get) == 999
    # full-rank model: every residual collapses to ~0
    mD = pca_fit(moments, DIM, k=DIM, scale_bits=BITS)
    full = pca_outlier_scores(df, "embedding", mD, ("vec_id",)).collect()
    assert max(r["recon_err"] for r in full) < 1e-18
    # bitwise partition invariance
    a = sorted(
        (r["vec_id"], r["recon_err"])
        for r in pca_outlier_scores(planted, "embedding", m1, ("vec_id",)).collect()
    )
    b = sorted(
        (r["vec_id"], r["recon_err"])
        for r in pca_outlier_scores(
            planted.repartition(9), "embedding", m1, ("vec_id",)
        ).collect()
    )
    assert a == b
