"""spark-submit entrypoint for training-corpus preparation.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_corpus_prep.py \
        --docs <documents parquet> --out <output dir> \
        [--langs en,zh,de] [--min-quality 0.5] [--mix en:50,zh:100] \
        [--master local[8]]

Runs the full prep composition (language filter → quality gate → exact dedup
→ LSH near-dedup → optional stratified mixing → hash split) as ONE Spark
plan and writes:

- ``<out>/corpus/split=train|val|test/`` — split-partitioned parquet (the
  partition column makes per-split training reads prune directories);
- ``<out>/_audit/`` — per-(split, lang) doc counts + total chars.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--langs", default="en,zh,de")
    parser.add_argument("--min-quality", type=float, default=0.5)
    parser.add_argument(
        "--mix",
        default=None,
        help="per-lang keep percents, e.g. en:50,zh:100 (default: keep all)",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
        prep_audit,
        prepare_corpus,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    mix_rates = None
    if args.mix:
        mix_rates = {
            part.split(":")[0]: int(part.split(":")[1])
            for part in args.mix.split(",")
            if part
        }

    spark = build_session(app="pdor-corpus-prep", master=args.master)
    docs = spark.read.parquet(args.docs)
    prepared = prepare_corpus(
        docs,
        langs=tuple(x for x in args.langs.split(",") if x),
        min_quality=args.min_quality,
        mix_rates=mix_rates,
    )
    prepared.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.out}/corpus"
    )
    audit = prep_audit(
        spark.read.option("basePath", f"{args.out}/corpus").parquet(
            f"{args.out}/corpus/split=*"
        )
    )
    audit.write.mode("overwrite").parquet(f"{args.out}/_audit")
    rows = audit.collect()
    total = sum(r["n_docs"] for r in rows)
    print(f"corpus prep complete: {total} docs → {args.out}/corpus")
    for r in sorted(rows, key=lambda r: (r["split"], r["lang"])):
        print(f"  {r['split']:<6} {r['lang']:<3} {r['n_docs']:>8} docs")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
