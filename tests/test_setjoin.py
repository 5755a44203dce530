"""T158: prefix-filtering exact set-similarity join (AllPairs/PPJoin).

The load-bearing property is EXACTNESS: output ≡ brute-force all-pairs at
the threshold — boundary pairs (J exactly t) included, just-below pairs
excluded, regardless of token rarity skew.  Pinned here against a pure-
Python brute force on adversarial corpora; the driver oracle repeats the
same proof cross-engine at sf0.01/sf0.1.
"""

from __future__ import annotations

import math

from pdf_drawing_ocr_recognition_spark.operators.setjoin import ppjoin_pairs


def _brute(corpus, t_ppm):
    sets = {
        k: frozenset(w for w in text.lower().split() if w)
        for k, text in corpus
    }
    out = {}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            ta, tb = sets[a], sets[b]
            if not ta or not tb:
                continue
            inter = len(ta & tb)
            union = len(ta | tb)
            if 1_000_000 * inter >= t_ppm * union:
                out[(a, b)] = (
                    inter,
                    union,
                    math.floor(1_000_000.0 * inter / union),
                )
    return out


def _run(spark, corpus, t_ppm):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["key_a"], r["key_b"]): (r["n_inter"], r["n_union"], r["jaccard_ppm"])
        for r in ppjoin_pairs(df, threshold_ppm=t_ppm).collect()
    }
    return got


def test_matches_brute_force_with_threshold_boundaries(spark):
    corpus = [
        (1, "a b"),
        (2, "a b c d"),  # J(1,2) = 2/4 = exactly 0.5 -> included at t=0.5
        (3, "a b c"),
        (4, "a b c d e f"),  # J(3,4) = 3/6 = exactly 0.5
        (5, "a x"),  # J(1,5) = 1/3 < 0.5 -> excluded
        (6, "q r s t"),
        (7, "q r s t"),  # identical -> J=1
        (8, "zz"),  # singleton rare token, no partner
        (9, "the the the a b"),  # duplicate words collapse to a set
    ]
    got = _run(spark, corpus, 500_000)
    want = _brute(corpus, 500_000)
    assert got == want
    assert (1, 2) in got and (3, 4) in got and (6, 7) in got
    assert (1, 5) not in got
    assert got[(6, 7)] == (4, 4, 1_000_000)


def test_matches_brute_force_under_stopword_skew(spark):
    # every doc shares the hot tokens; near-dups differ only in rare tail
    # tokens — the prefix index must still find them, and must not emit
    # the hot-token-only pairs
    hot = "the of and to in is"
    corpus = [(i, f"{hot} rare{i // 2} tail{i}") for i in range(40)]
    got = _run(spark, corpus, 700_000)
    want = _brute(corpus, 700_000)
    assert got == want
    assert (0, 1) in got  # share 7 of 8 distinct tokens = 0.777


def test_high_threshold_prunes_to_exact_twins(spark):
    corpus = [(i, f"w{i} common base text body") for i in range(30)]
    corpus += [(100 + i, f"w{i} common base text body") for i in range(5)]
    got = _run(spark, corpus, 999_000)
    want = _brute(corpus, 999_000)
    assert got == want
    assert set(got) == {(i, 100 + i) for i in range(5)}


def test_empty_and_whitespace_docs_dropped(spark):
    corpus = [(1, "   "), (2, ""), (3, "a b c"), (4, "a b c")]
    got = _run(spark, corpus, 500_000)
    assert set(got) == {(3, 4)}
