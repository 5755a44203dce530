"""spark-submit entrypoint for cutting a training-data release.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_release_export.py \\
        --docs <documents parquet> --out <dir> [--shards 8] \\
        [--langs en,zh,de] [--min-quality 0.5] [--master local[8]]

The last mile after curation, as ONE composition: the T23 prep pipeline
(language filter → quality gate → exact dedup → LSH near-dedup → hash
split), then the train split dealt into ``--shards`` weight-balanced output
files (T75 snake/LPT over word counts — per-shard imbalance bounded by one
document, and every shard lands as exactly one parquet file so downstream
loaders see S equal-work inputs), val/test passed through unsharded, and
the release datasheet written alongside:

- ``<out>/corpus/split=train/shard=K/`` — balanced train shards (1 file each)
- ``<out>/corpus/split=val|test/``      — evaluation splits
- ``<out>/_datasheet/``  — per-language + overall card (docs, words, exact
  mean quality via the q·10⁴ BIGINT discipline) over the EXPORTED corpus
- ``<out>/_audit/``      — per-(split, lang) doc/char counts
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--langs", default="en,zh,de")
    parser.add_argument("--min-quality", type=float, default=0.5)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.functions.text import (
        quality_score,
        word_count,
    )
    from pdf_drawing_ocr_recognition_spark.operators.corpus_prep import (
        prep_audit,
        prepare_corpus,
    )
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        balanced_shards,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    spark = build_session(app="pdor-release-export", master=args.master)
    docs = spark.read.parquet(args.docs)
    prepared = prepare_corpus(
        docs,
        langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
    ).withColumn("n_words", word_count(F.col("text")))

    train = prepared.filter(F.col("split") == "train")
    rest = prepared.filter(F.col("split") != "train").withColumn(
        "shard", F.lit(-1)
    )
    sharded = balanced_shards(train, "n_words", args.shards).drop("rank")
    out_cols = [c for c in prepared.columns] + ["shard"]
    export = sharded.select(*out_cols).unionByName(rest.select(*out_cols))
    # one file per (split, shard) directory: the balance the snake dealt is
    # the balance the loader sees
    (
        export.repartition("split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(f"{args.out}/corpus")
    )

    exported = spark.read.parquet(f"{args.out}/corpus")
    card = (
        exported.select(
            "lang",
            F.col("n_words"),
            F.round(quality_score(F.col("text")) * 10000)
            .cast("bigint")
            .alias("q_e4"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("q_e4").alias("_qsum"),
        )
    )
    datasheet = card.select(
        "lang",
        "n_docs",
        "total_words",
        F.round(F.col("_qsum") / F.col("n_docs"), 4).alias("mean_quality_e4"),
    )
    datasheet.coalesce(1).write.mode("overwrite").parquet(
        f"{args.out}/_datasheet"
    )
    prep_audit(exported).coalesce(1).write.mode("overwrite").parquet(
        f"{args.out}/_audit"
    )

    n_train = exported.filter(F.col("split") == "train").count()
    n_total = exported.count()
    print(
        f"release export complete: {n_total} docs "
        f"({n_train} train across {args.shards} shards) → {args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
