"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands throughput scaling efficiency >= 0.8 from N to 4N executors;
this sandbox has no cluster, so per the task brief the evidence is the same
job on the same input at local[8] vs local[32] (see BASELINE.md).  Writes
BENCH/BASELINE.md with both throughputs, the efficiency, and the byte-identity
match rate against the kernel oracle on a deterministic sample.

    python BENCH/run_scaling.py [--rows 20000] [--n 8] [--xn 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_at(cpus: int, corpus: str, runs: int = 2) -> tuple[float, int]:
    """Best-of-N wall-clock of the extraction pipeline at local[cpus]."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from pdf_drawing_ocr_recognition_spark.plans.pipeline import extraction_pipeline
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    spark = build_session(
        app=f"pdor-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.range(1000).count()  # JVM/py-worker warmup
    best = float("inf")
    n_docs = 0
    for _ in range(runs):
        t0 = time.time()
        n_docs = extraction_pipeline(spark, corpus, PATTERNS).count()
        best = min(best, time.time() - t0)
    spark.stop()
    return best, n_docs


def match_rate(corpus_rows: int, corpus: str, sample_mod: int = 10) -> tuple[int, int]:
    """Byte-identity of Spark output vs kernel oracle on a 1/sample_mod sample."""
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS, gen_rows
    from pdf_drawing_ocr_recognition_spark.kernel import extract_document
    from pdf_drawing_ocr_recognition_spark.plans.pipeline import (
        TARGET_LANGS,
        extraction_pipeline,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    oracle = {}
    for i, (url, _ts, html, _text, lang) in enumerate(gen_rows(corpus_rows)):
        if i % sample_mod == 0 and lang in TARGET_LANGS:
            oracle[url] = extract_document(url, html, lang, PATTERNS)["extracted_text"]

    spark = build_session(app="pdor-match", master="local[16]")
    got = {
        r["url"]: r["extracted_text"]
        for r in extraction_pipeline(spark, corpus, PATTERNS)
        .select("url", "extracted_text")
        .collect()
        if r["url"] in oracle
    }
    spark.stop()
    matched = sum(1 for u, t in oracle.items() if got.get(u) == t)
    return matched, len(oracle)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import ensure_corpus

    corpus = ensure_corpus(args.rows)
    size_bytes = sum(
        os.path.getsize(os.path.join(corpus, f))
        for f in os.listdir(corpus)
        if f.endswith(".parquet")
    )

    t_n, n_docs = run_at(args.n, corpus, args.runs)
    t_xn, _ = run_at(args.xn, corpus, args.runs)
    thr_n = n_docs / t_n
    thr_xn = n_docs / t_xn
    eff = (thr_xn / thr_n) / (args.xn / args.n)

    matched, total = match_rate(args.rows, corpus)

    result = {
        "rows": args.rows,
        "docs_extracted": n_docs,
        "corpus_bytes": size_bytes,
        "n_cpus": args.n,
        "xn_cpus": args.xn,
        "wall_n_s": round(t_n, 3),
        "wall_xn_s": round(t_xn, 3),
        "docs_per_s_n": round(thr_n, 1),
        "docs_per_s_xn": round(thr_xn, 1),
        "scaling_efficiency": round(eff, 3),
        "match_rate": f"{matched}/{total}",
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured runs (SURVEY.md §6 targets)

Same job (extraction_pipeline: read pages → lang filter → mapInPandas kernel),
same input ({args.rows} synthesized pages, {size_bytes/1e6:.1f} MB parquet),
best of {args.runs} runs per parallelism after JVM warmup.

| run | parallelism | input rows | docs extracted | wall (s) | docs/s | match rate | scaling eff. |
|---|---|---|---|---|---|---|---|
| A | local[{args.n}] | {args.rows} | {n_docs} | {t_n:.2f} | {thr_n:.0f} | — | — |
| B | local[{args.xn}] | {args.rows} | {n_docs} | {t_xn:.2f} | {thr_xn:.0f} | {matched}/{total} byte-identical | **{eff:.3f}** vs local[{args.n}] |

Efficiency = (throughput[{args.xn}] / throughput[{args.n}]) / ({args.xn}/{args.n}).
Target (BASELINE.json): >= 0.8.  Match rate = byte-identical `extracted_text`
per url vs the single-process kernel oracle on a deterministic 10% sample.
"""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write(md)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
