"""spark-submit entrypoint for image-text-pair mining — the LAION-class
pipeline from crawled pages to a deduplicated, gated, manifest-verified
pair list ready for fetching/CLIP-filtering downstream:

    → image/alt-text harvesting (T183: followable <img> srcs resolved
      against the page URL, figure-caption association, data-URI skip)
    → junk gates (T186: filename-alt, too-short alt, non-image extension)
    → exact dedup on (src, alt) — the same banner fetched from ten
      thousand pages ships once (T1 shape, min-key per digest)
    → per-host pair counts + hotlink share (src host ≠ page host — the
      CDN/leech signal) as the audit section
    → hash-sharded export + order-insensitive integrity manifests (T137)

Each section lands as parquet under <out>/<section>/ plus a one-line JSON
summary on stdout.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_pair_mining.py \
        --pages <parquet with url, html binary> --out /tmp/pairs \
        [--min-alt-chars 5] [--shards 8] [--master local[8]]

Scale posture: harvesting is ONE narrow Arrow stage; gates are codegen
predicates fused into it; dedup shuffles 16-byte digests; audits and
manifests are map-side-combinable rollups.
"""

from __future__ import annotations

import argparse
import json

_IMG_EXT_RE = r"\.(png|jpg|jpeg|gif|webp)$"


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--min-alt-chars", type=int, default=5)
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.functions.urls import url_host
    from pdf_drawing_ocr_recognition_spark.operators.dedup import exact_dedupe
    from pdf_drawing_ocr_recognition_spark.operators.multimodal import (
        extract_page_images,
    )
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        shard_manifest,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-pair-mining", master=args.master)

    pages = spark.read.parquet(args.pages)
    harvested = extract_page_images(pages)
    summary: dict[str, int] = {
        "pages": pages.count(),
        "harvested": harvested.count(),
    }

    fname = F.regexp_extract(F.col("src"), r"/([^/]+)$", 1)
    kept = harvested.filter(
        (F.col("alt") != fname)
        & (F.length("alt") >= args.min_alt_chars)
        & F.col("src").rlike(_IMG_EXT_RE)
    )
    summary["gated"] = kept.count()

    keyed = kept.select(
        F.concat_ws("#", F.col("url"), F.col("img_idx").cast("string")).alias(
            "pair_key"
        ),
        "src",
        "alt",
        "caption",
        F.concat_ws("\x1f", F.col("src"), F.col("alt")).alias("_pair_text"),
        "url",
    )
    deduped = exact_dedupe(keyed, text_col="_pair_text", key_col="pair_key")
    deduped = deduped.drop("_pair_text")
    deduped.write.mode("overwrite").parquet(f"{args.out}/pairs")
    summary["distinct_pairs"] = deduped.count()

    audit = (
        deduped.select(
            url_host(F.col("url")).alias("page_host"),
            url_host(F.col("src")).alias("src_host"),
        )
        .groupBy("page_host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("src_host") != F.col("page_host")).cast("bigint")
            ).alias("n_hotlinked"),
        )
    )
    audit.write.mode("overwrite").parquet(f"{args.out}/host_audit")
    summary["hosts"] = audit.count()

    sharded = deduped.withColumn(
        "shard", F.pmod(F.hash("pair_key"), F.lit(args.shards)).cast("int")
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{args.out}/shards"
    )
    manifests = shard_manifest(sharded, key_col="pair_key", text_col="alt")
    manifests.write.mode("overwrite").parquet(f"{args.out}/shard_manifests")
    summary["shards"] = manifests.count()

    print("pair mining complete: " + json.dumps(summary, sort_keys=True))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
