"""SQ8 quantized ANN (operators/quantize.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.quantize import (
    _dims_arrays,
    _encode_np,
    sq8_dims,
    sq8_encode,
    sq8_topk,
)
from pdf_drawing_ocr_recognition_spark.operators.similarity import (
    brute_force_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_codes_are_bytes_and_dim_bounded(spark, emb):
    mn, mx = _dims_arrays(sq8_dims(emb))
    assert mn.shape == (64,) and (mx >= mn).all()
    codes = sq8_encode(emb, mn, mx).collect()
    assert len(codes) == emb.count()
    for r in codes[:20]:
        cs = r["codes"]
        assert len(cs) == 64
        assert all(0 <= c <= 254 for c in cs)


def test_quantization_error_bounded_by_half_step(spark, emb):
    """|x - recon(encode(x))| <= Δ per dimension — the SQ8 guarantee."""
    mn, mx = _dims_arrays(sq8_dims(emb))
    delta = (mx - mn) / 254.0
    rows = emb.limit(50).collect()
    v = np.array([r["embedding"] for r in rows], dtype=np.float64)
    recon = mn + _encode_np(v, mn, mx) * delta
    err = np.abs(v - recon)
    assert (err <= delta + 1e-12).all()


def test_constant_dimension_codes_zero():
    v = np.array([[1.5, 2.0], [1.5, 3.0]])
    mn, mx = v.min(0), v.max(0)
    c = _encode_np(v, mn, mx)
    assert (c[:, 0] == 0).all()  # span 0 -> code 0, recon = mn exactly


def test_sq8_topk_equals_exact_on_fixture(spark, emb):
    """Shortlist recall is total on this corpus, so the quantized pipeline
    must reproduce brute_force_topk bit for bit."""
    q = emb.filter(F.col("vec_id") < 5)
    got = sq8_topk(emb, q, k=10, shortlist=40)
    want = brute_force_topk(emb, q, k=10, dim=64)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_partition_invariance(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    a = sq8_topk(emb, q, k=5, shortlist=20)
    b = sq8_topk(emb.repartition(11), q, k=5, shortlist=20)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_validation(spark, emb):
    with pytest.raises(ValueError):
        sq8_topk(emb, emb.limit(1), k=0)
    with pytest.raises(ValueError):
        sq8_topk(emb, emb.limit(1), k=10, shortlist=5)


def test_persisted_index_probe_identical(spark, emb, tmp_path):
    """write-once/probe-many (T38/T79 contract): the persisted-index probe
    reproduces the inline sq8_topk bit for bit, and its plan scans the
    stored codes parquet instead of re-encoding the corpus."""
    from pdf_drawing_ocr_recognition_spark.operators.quantize import (
        sq8_topk_indexed,
        write_sq8_index,
    )

    path = str(tmp_path / "sq8idx")
    write_sq8_index(emb, path)
    q = emb.filter(F.col("vec_id") < 5)
    got = sq8_topk_indexed(emb, q, path, k=10, shortlist=40)
    want = sq8_topk(emb, q, k=10, shortlist=40)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "codes" in plan  # probe reads the byte store from disk
