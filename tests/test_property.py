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


# ---- round-2 kernels ----

_toml_scalars = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.booleans(),
    st.text(max_size=40),
)
_toml_values = st.recursive(
    st.one_of(_toml_scalars, st.lists(_toml_scalars, max_size=5)),
    lambda children: st.dictionaries(
        st.text(min_size=1, max_size=12), children, max_size=4
    ),
    max_leaves=12,
)


@given(st.dictionaries(st.text(min_size=1, max_size=12), _toml_values, max_size=5))
@settings(max_examples=150, deadline=None)
def test_toml_emitter_always_roundtrips(data):
    import tomllib

    from pdf_drawing_ocr_recognition_spark.kernel.render import _toml_dumps

    assert tomllib.loads(_toml_dumps(data)) == data


@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=96),
)
@settings(max_examples=120, deadline=None)
def test_seq_dot_np_bitwise_fold_any_shape(n, d):
    from pdf_drawing_ocr_recognition_spark.functions.vectors import (
        seq_dot_np,
        seq_norm_np,
    )

    rng = np.random.default_rng(n * 1000 + d)
    a = rng.standard_normal((min(n, 8), d)).astype(np.float32).astype(np.float64)
    b = rng.standard_normal((min(n, 8), d)).astype(np.float32).astype(np.float64)
    dd = seq_dot_np(a, b)
    nn = seq_norm_np(a)
    for i in range(a.shape[0]):
        acc = 0.0
        for v in a[i] * b[i]:
            acc = acc + v
        assert dd[i] == acc
        acc2 = 0.0
        for v in a[i] * a[i]:
            acc2 = acc2 + v
        # IEEE-754 sqrt (np.sqrt == Math.sqrt == C sqrt, all correctly
        # rounded) — NOT x**0.5, whose libm pow may differ by 1 ulp
        import math

        assert nn[i] == math.sqrt(acc2)


@given(
    st.lists(
        st.lists(
            st.text(
                st.characters(min_codepoint=33, max_codepoint=126),
                min_size=0,
                max_size=6,
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=100, deadline=None)
def test_window_exact_raster_decodes_for_any_slack(token_rows, extra_h, extra_w):
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
        encode_grid_image_sized,
    )
    from pdf_drawing_ocr_recognition_spark.kernel.grid import decode_grid_image
    from pdf_drawing_ocr_recognition_spark.kernel.grid import (
        BIT_PX,
        CELL_PAD,
        CHAR_BITS,
        GLYPH_H,
        LINE_PX,
    )

    n_rows = len(token_rows)
    n_cols = max(len(r) for r in token_rows)
    max_len = max((len(t) for row in token_rows for t in row), default=1) or 1
    nat_h = n_rows * (2 * CELL_PAD + GLYPH_H) + (n_rows + 1) * LINE_PX
    nat_w = n_cols * (2 * CELL_PAD + max_len * BIT_PX + BIT_PX) + (n_cols + 1) * LINE_PX
    img = encode_grid_image_sized(token_rows, nat_h + extra_h, nat_w + extra_w)
    decoded = decode_grid_image(img)
    want = "\n".join(
        "\t".join(row + [""] * (n_cols - len(row))) for row in token_rows
    )
    assert decoded == want


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_extract_document_total_on_arbitrary_bytes(payload):
    """Totality of the per-document lifecycle: ANY byte string — including
    ones that start with the GRIDDOC magic or a PNG signature — must come
    back as a taxonomy row, never an exception (the T85/T91 contract)."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from pdf_drawing_ocr_recognition_spark.kernel.page import extract_document

    row = extract_document("u://fuzz", payload, "en", PATTERNS)
    assert row["status"] in ("ok", "empty", "failed")
    assert isinstance(row["extracted_text"], str)


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_grid_prefixed_fuzz_is_total(tail):
    """Same, but forcing the grid-container branch with the real magic."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from pdf_drawing_ocr_recognition_spark.kernel.page import (
        GRID_MAGIC,
        extract_document,
    )

    row = extract_document("u://fuzz", GRID_MAGIC + tail, "en", PATTERNS)
    assert row["status"] in ("ok", "empty", "failed")


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_decode_png_raises_only_valueerror_like(blob):
    """decode_png on arbitrary bytes either decodes or raises a normal
    exception (ValueError/struct.error/zlib.error/numpy) — never hangs,
    never allocates past the cap (bounded by construction, T91)."""
    import struct as _struct
    import zlib as _zlib

    try:
        img = decode_png(blob)
    except (ValueError, _struct.error, _zlib.error, IndexError):
        return
    assert img.dtype == np.uint8 and img.ndim == 2


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_mojibake_repair_total_and_idempotent(s):
    from pdf_drawing_ocr_recognition_spark.kernel.mojibake import (
        repair_mojibake,
    )

    fixed, n = repair_mojibake(s)
    assert isinstance(fixed, str) and 0 <= n <= 3
    # a full repair is a fixed point (unless the cap stopped it early)
    if n < 3:
        again, m = repair_mojibake(fixed)
        assert again == fixed and m == 0


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_heading_kernels_total_and_consistent(s):
    from pdf_drawing_ocr_recognition_spark.kernel.headings import (
        extract_headings,
        extract_sections,
    )

    hs = extract_headings(s)
    secs = extract_sections(s)
    assert all(1 <= h["level"] <= 6 for h in hs)
    assert [h["idx"] for h in hs] == list(range(len(hs)))
    # sections with level>0 correspond 1:1 (same order, same levels/titles)
    headed = [(x["level"], x["title"]) for x in secs if x["level"] > 0]
    assert headed == [(h["level"], h["text"]) for h in hs]


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_codeblock_kernel_total(s):
    from pdf_drawing_ocr_recognition_spark.kernel.codeblocks import (
        extract_code_blocks,
    )

    bs = extract_code_blocks(s)
    assert all(b["tag"] in ("pre", "code") for b in bs)
    assert [b["idx"] for b in bs] == list(range(len(bs)))
