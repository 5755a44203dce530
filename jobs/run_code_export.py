"""spark-submit entrypoint for the code-corpus export — harvest training
code from a crawled page corpus and ship deduplicated, sharded,
manifest-verified blocks:

    → verbatim code-block extraction (T164: <pre>/<code> on the shared
      linear tokenizer, indentation preserved, language-class hints)
    → trivia gate: blocks shorter than --min-chars are dropped (inline
      `x=1` snippets are markup, not training code)
    → exact dedup of block TEXT (T1 shape: min-key per md5 digest — the
      same snippet pasted across ten thousand pages ships once)
    → language-hint histogram (what the harvest actually contains)
    → per-page code-density profile (T164 rollup; the stratification
      artifact for code-aware corpus mixing)
    → hash-sharded export + order-insensitive integrity manifests (T137)

Each section lands as parquet under <out>/<section>/ plus a one-line JSON
summary on stdout.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_code_export.py \
        --pages <parquet with url, html binary> --out /tmp/code_export \
        [--min-chars 8] [--shards 8] [--master local[8]]

Scale posture: extraction is ONE narrow Arrow stage (no shuffle); dedup
shuffles 16-byte digests; the histogram and manifests are
map-side-combinable rollups; nothing corpus-sized reaches the driver —
summary counts are section-table counts.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", required=True,
                        help="parquet with url (string), html (binary)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--min-chars", type=int, default=8)
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.operators.codeblocks import (
        code_density,
        extract_page_code_blocks,
    )
    from pdf_drawing_ocr_recognition_spark.operators.dedup import exact_dedupe
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        shard_manifest,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-code-export", master=args.master)

    pages = spark.read.parquet(args.pages)
    blocks = extract_page_code_blocks(pages)

    # stable block key BEFORE any filtering so reruns agree
    keyed = blocks.select(
        F.concat_ws("#", F.col("url"), F.col("block_idx").cast("string")).alias(
            "block_key"
        ),
        "url",
        "block_idx",
        "tag",
        "lang_hint",
        "code_text",
    )
    summary: dict[str, int] = {"pages": pages.count(), "blocks": keyed.count()}

    kept = keyed.filter(F.length("code_text") >= args.min_chars)
    deduped = exact_dedupe(kept, text_col="code_text", key_col="block_key")
    deduped.write.mode("overwrite").parquet(f"{args.out}/blocks")
    summary["kept_blocks"] = kept.count()
    summary["distinct_blocks"] = deduped.count()

    langs = (
        deduped.groupBy(
            F.when(F.col("lang_hint") == "", "unknown")
            .otherwise(F.col("lang_hint"))
            .alias("lang_hint")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.length("code_text")).cast("bigint").alias("n_chars"),
        )
    )
    langs.write.mode("overwrite").parquet(f"{args.out}/lang_histogram")
    summary["langs"] = langs.count()

    density = code_density(pages, blocks)
    density.write.mode("overwrite").parquet(f"{args.out}/code_density")

    sharded = deduped.withColumn(
        "shard", F.pmod(F.hash("block_key"), F.lit(args.shards)).cast("int")
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{args.out}/shards"
    )
    manifests = shard_manifest(
        sharded, key_col="block_key", text_col="code_text"
    )
    manifests.write.mode("overwrite").parquet(f"{args.out}/shard_manifests")
    summary["shards"] = manifests.count()

    print("code export complete: " + json.dumps(summary, sort_keys=True))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
