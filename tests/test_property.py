"""Property-based kernel tests (hypothesis) — robustness beyond goldens."""

import ast

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_drawing_ocr_recognition_spark.kernel import (
    crop_box,
    extract_brace_span,
    has_balanced_braces,
    merge_fold,
    parse_literal_result,
    render_plaintext,
)
from pdf_drawing_ocr_recognition_spark.kernel.png import decode_png, encode_png


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parse_never_raises_and_balance_consistent(s):
    ok, d = parse_literal_result(s)
    assert isinstance(d, dict)
    if ok:
        # success implies the brace gates passed and literal_eval agrees
        assert has_balanced_braces(s)
        span = extract_brace_span(s)
        assert span is not None
        assert ast.literal_eval(span) == d


@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=10_000),
    st.tuples(*[st.floats(min_value=0.0, max_value=100.0, allow_nan=False)] * 4),
)
@settings(max_examples=200, deadline=None)
def test_crop_box_always_clamped(h, w, box):
    y1, y2, x1, x2 = crop_box(h, w, box)
    assert 0 <= y1 <= h and 0 <= y2 <= h
    assert 0 <= x1 <= w and 0 <= x2 <= w


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.dictionaries(
                st.text(st.characters(codec="ascii", exclude_characters=":\n"), min_size=1, max_size=8),
                st.one_of(st.integers(), st.text(max_size=10)),
                max_size=4,
            ),
        ),
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_merge_fold_last_wins_property(results):
    merged = merge_fold(results)
    # every key's value equals the LAST occurrence that produced it
    expect = {}
    for sub_idx, d in results:
        if not d:
            continue
        if len(d) == 1 and "text" in d:
            expect[f"sub_{sub_idx}"] = d["text"]
        else:
            for k, v in d.items():
                expect[f"sub_{sub_idx}_{k}"] = v
    assert merged == expect
    render_plaintext(merged)  # must never raise


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_html_extract_never_raises(s):
    from pdf_drawing_ocr_recognition_spark.kernel import extract_main_text

    out = extract_main_text(s)
    assert isinstance(out, str)
