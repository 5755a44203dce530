"""spark-submit entrypoint for the crawl-frontier audit — the standing
report a crawl operator runs between crawls, composing the frontier
operators over a fetch log (url, html, text[, prev snapshot]):

    → head metadata (T124): titles, robots meta, rel=canonical
    → canonical dedup groups (T125): publisher-declared collapses
    → URL-template farms (T119): page generators by distinct-content ratio
    → host mirrors (T122): content-set Jaccard between hosts
    → recrawl tiers (T120, when --prev given): per-host change rates

Each section lands as parquet under <out>/<section>/ plus a one-line JSON
summary on stdout — the shape a scheduler ingests to reprioritize the next
crawl (compose with T70's budget waterfilling).

    spark-submit --py-files dist/pdor_spark.zip jobs/run_crawl_audit.py \
        --pages <parquet with url, html, text> --out /tmp/audit \
        [--prev <yesterday parquet with url, text>] [--master local[8]]

Scale posture: every section is the already-plan-audited operator — one
narrow Arrow stage for metadata, digest-bounded aggregates everywhere else;
nothing here collects corpus-sized data to the driver.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", required=True,
                        help="parquet with url, html (binary), text columns")
    parser.add_argument("--prev", default=None,
                        help="previous-crawl parquet with url, text (enables "
                        "recrawl tiers)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--min-mirror-ppm", type=int, default=100000)
    parser.add_argument("--min-farm-pages", type=int, default=2)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.functions.urls import url_host
    from pdf_drawing_ocr_recognition_spark.operators.cdc import recrawl_tiers
    from pdf_drawing_ocr_recognition_spark.operators.dedup import (
        host_mirror_pairs,
    )
    from pdf_drawing_ocr_recognition_spark.operators.filtering import (
        url_template_farms,
    )
    from pdf_drawing_ocr_recognition_spark.operators.metadata import (
        canonical_groups,
        extract_page_meta,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-crawl-audit", master=args.master)

    pages = spark.read.parquet(args.pages)
    summary: dict[str, int] = {}

    meta = extract_page_meta(pages)
    meta.write.mode("overwrite").parquet(f"{args.out}/metadata")
    meta = spark.read.parquet(f"{args.out}/metadata")  # reuse, don't recompute
    summary["pages"] = meta.count()
    summary["noindex_pages"] = meta.filter(
        F.col("meta_robots").contains("noindex")
    ).count()

    groups = canonical_groups(meta)
    groups.write.mode("overwrite").parquet(f"{args.out}/canonical_groups")
    summary["canonical_groups"] = groups.count()

    farms = url_template_farms(
        pages, url_col="url", content_col="text", min_pages=args.min_farm_pages
    )
    farms.write.mode("overwrite").parquet(f"{args.out}/url_farms")
    summary["farm_templates"] = farms.filter(
        F.col("dup_ratio_ppm") >= 500000
    ).count()

    hosted = pages.select(url_host(F.col("url")).alias("host"), "text")
    mirrors = host_mirror_pairs(
        hosted, "host", "text", min_jaccard_ppm=args.min_mirror_ppm
    )
    mirrors.write.mode("overwrite").parquet(f"{args.out}/host_mirrors")
    summary["mirror_pairs"] = mirrors.count()

    if args.prev:
        prev = spark.read.parquet(args.prev).select(
            "url", "text", url_host(F.col("url")).alias("host")
        )
        cur = pages.select("url", "text", url_host(F.col("url")).alias("host"))
        tiers = recrawl_tiers(prev, cur, "url", ["text"], "host")
        tiers.write.mode("overwrite").parquet(f"{args.out}/recrawl_tiers")
        summary["hosts_tiered"] = tiers.count()

    print("crawl audit complete: " + json.dumps(summary, sort_keys=True))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
