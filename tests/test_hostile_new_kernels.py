"""Hostile linearity + totality for the round-4 structure kernels
(markdown, lists, images, headings, codeblocks) — the test_html_hostile
discipline extended: floods that defeated the old regex tokenizer must
stay near-linear on every kernel riding iter_tokens."""

from __future__ import annotations

import time

from pdf_drawing_ocr_recognition_spark.kernel.codeblocks import (
    extract_code_blocks,
)
from pdf_drawing_ocr_recognition_spark.kernel.headings import (
    extract_headings,
    extract_sections,
)
from pdf_drawing_ocr_recognition_spark.kernel.images import extract_images
from pdf_drawing_ocr_recognition_spark.kernel.lists import extract_list_items
from pdf_drawing_ocr_recognition_spark.kernel.markdown import render_markdown

KERNELS = [
    ("markdown", render_markdown),
    ("lists", extract_list_items),
    ("images", lambda h: extract_images(h, "http://h.example.com/")),
    ("headings", extract_headings),
    ("sections", extract_sections),
    ("codeblocks", extract_code_blocks),
]

FLOODS = [
    ("comment_flood", "<!--x " * 100_000),
    ("bare_lt_flood", "<y " * 100_000),
    ("deep_nesting", "<ul>" * 5_000 + "<li>deep" + "</ul>" * 5_000),
    ("tag_storm", "<li><img src='a.png'><h2>t<pre>c</pre>" * 20_000),
    ("ten_kb_entities", "&amp;" * 50_000),
]


def test_floods_never_throw_and_finish():
    for fname, flood in FLOODS:
        for kname, fn in KERNELS:
            t0 = time.monotonic()
            fn(flood)  # must not raise
            assert time.monotonic() - t0 < 20, (kname, fname)


def test_markdown_scaling_is_near_linear():
    base = "<p>text</p>" + ("<!--x " * 50_000) + ("<li>a" * 10_000)
    big = "<p>text</p>" + ("<!--x " * 200_000) + ("<li>a" * 40_000)
    t0 = time.monotonic()
    render_markdown(base)
    t1 = time.monotonic()
    render_markdown(big)
    t2 = time.monotonic()
    small_t, big_t = t1 - t0, t2 - t1
    # linear => ~4x; reject the ~16x quadratic signature, generous noise
    assert big_t < 8 * small_t + 0.5, (small_t, big_t)


def test_images_scaling_is_near_linear():
    base = '<figure><img src="/a.png" alt="x">' * 10_000
    big = '<figure><img src="/a.png" alt="x">' * 40_000
    t0 = time.monotonic()
    extract_images(base, "http://h.example.com/")
    t1 = time.monotonic()
    extract_images(big, "http://h.example.com/")
    t2 = time.monotonic()
    small_t, big_t = t1 - t0, t2 - t1
    assert big_t < 8 * small_t + 0.5, (small_t, big_t)
