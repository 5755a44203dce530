"""T165: Otsu auto-threshold — moments exactness, argmax vs brute force."""

from __future__ import annotations

from fractions import Fraction

import pytest

from pdf_drawing_ocr_recognition_spark.operators.mixing import (
    otsu_moments,
    otsu_threshold,
)


def _bins(spark, values):
    return spark.createDataFrame([(v,) for v in values], "bin long")


def _brute_otsu(values, n_bins):
    """Reference: evaluate sigma_B exactly at every threshold."""
    best_t, best = None, None
    for t in range(1, n_bins):
        lo = [v for v in values if v < t]
        hi = [v for v in values if v >= t]
        if not lo or not hi:
            continue
        num = sum(lo) * len(hi) - sum(hi) * len(lo)
        obj = Fraction(num * num, len(lo) * len(hi))
        if best is None or obj > best:
            best_t, best = t, obj
    return best_t, best


def test_bimodal_cut_lands_between_clusters(spark):
    vals = [4, 5, 5, 6] * 10 + [40, 41, 41, 42] * 10
    df = _bins(spark, vals)
    t, obj = otsu_threshold(otsu_moments(df, "bin", 64))
    bt, bobj = _brute_otsu(vals, 64)
    assert (t, obj) == (bt, bobj)
    assert 7 <= t <= 40


def test_matches_brute_force_on_irregular_data(spark):
    vals = [0, 0, 1, 2, 2, 2, 9, 9, 10, 30, 31, 31, 31, 63]
    df = _bins(spark, vals)
    assert otsu_threshold(otsu_moments(df, "bin", 64)) == _brute_otsu(vals, 64)


def test_moments_rows_cover_all_thresholds_with_zeros(spark):
    df = _bins(spark, [10, 10, 20])
    rows = {r["thr_bin"]: r for r in otsu_moments(df, "bin", 32).collect()}
    assert set(rows) == set(range(1, 32))
    assert rows[1]["cnt_lo"] == 0 and rows[1]["cnt_hi"] == 3
    assert rows[31]["cnt_lo"] == 3 and rows[31]["sum_lo"] == 40
    r15 = rows[15]
    assert (r15["cnt_lo"], r15["sum_lo"], r15["cnt_hi"], r15["sum_hi"]) == (
        2, 20, 1, 20,
    )


def test_single_bin_raises(spark):
    df = _bins(spark, [5, 5, 5])
    with pytest.raises(ValueError):
        otsu_threshold(otsu_moments(df, "bin", 16))
    with pytest.raises(ValueError):
        otsu_moments(df, "bin", 1)
