"""spark-submit entrypoint for the pre-release compliance audit — the
report a corpus release runs AFTER curation and BEFORE shipping, composing
the round-4 audit operators over a documents parquet
(doc_id, text, lang, source[, host]):

    → registered domains (T133): PSL extraction over the host column
    → PII exposure by domain (T142): email/number densities per registrant
    → language-mixture Gini (T143): MT-farm suspects
    → leakage-safe domain split (T135): split sizes + the disjointness
      invariant re-checked against the data actually shipping
    → shard manifests (T137): order-insensitive integrity fingerprints
      a downstream loader verifies before training

Each section lands as parquet under <out>/<section>/ plus a one-line JSON
summary on stdout — the artifact that goes next to the datasheet (T67).

    spark-submit --py-files dist/pdor_spark.zip jobs/run_release_audit.py \
        --docs <parquet with doc_id, text, lang, source> --out /tmp/audit \
        [--host-col host] [--shards 8] [--master local[8]]

Scale posture: every section is an already-plan-audited operator — PSL
joins broadcast, all rollups map-side-combinable, nothing corpus-sized
reaches the driver; the summary counts are section-table counts (dims).
"""

from __future__ import annotations

import argparse
import json

DEFAULT_PSL = ["com", "org", "net", "io", "co.uk", "github.io", "example.com"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
NUM_RE = r"[0-9]{7,}"


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True,
                        help="parquet with doc_id, text, lang, source")
    parser.add_argument("--out", required=True)
    parser.add_argument("--host-col", default=None,
                        help="host column; default derives source.example.com")
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument("--mt-gini-ppm", type=int, default=500000,
                        help="lang-mixture suspect threshold")
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.operators.filtering import (
        language_mixture,
        registered_domains,
    )
    from pdf_drawing_ocr_recognition_spark.operators.packing import (
        shard_manifest,
    )
    from pdf_drawing_ocr_recognition_spark.operators.sampling import (
        domain_split,
    )
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-release-audit", master=args.master)

    docs = spark.read.parquet(args.docs)
    if args.host_col:
        docs = docs.withColumn("host", F.col(args.host_col))
    else:
        docs = docs.withColumn(
            "host", F.concat(F.col("source"), F.lit(".example.com"))
        )
    psl = spark.createDataFrame([(s,) for s in DEFAULT_PSL], ["suffix"])
    docs = registered_domains(docs, "host", psl)
    summary: dict[str, int] = {"docs": docs.count()}

    # PII exposure by registrant (T142 rollup over T32's codegen counters)
    pii = (
        docs.select(
            "pld",
            F.length("text").alias("_n"),
            F.regexp_count(F.col("text"), F.lit(EMAIL_RE))
            .cast("long")
            .alias("_e"),
            F.regexp_count(F.col("text"), F.lit(NUM_RE))
            .cast("long")
            .alias("_d"),
        )
        .groupBy("pld")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_e").cast("bigint").alias("n_emails"),
            F.sum("_d").cast("bigint").alias("n_numbers"),
            F.floor(
                F.lit(1000000.0) * (F.sum("_e") + F.sum("_d")) / F.sum("_n")
            ).alias("pii_density_ppm"),
        )
    )
    pii.write.mode("overwrite").parquet(f"{args.out}/pii_by_domain")
    summary["plds_with_pii"] = pii.filter(
        (F.col("n_emails") + F.col("n_numbers")) > 0
    ).count()

    # MT-farm suspects (T143)
    mix = language_mixture(docs, "pld")
    mix.write.mode("overwrite").parquet(f"{args.out}/lang_mixture")
    summary["mt_suspect_plds"] = mix.filter(
        F.col("lang_gini_ppm") >= args.mt_gini_ppm
    ).count()

    # leakage-safe split sizes + disjointness re-check (T135)
    split = domain_split(docs, "pld")
    split_sizes = split.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("pld").cast("bigint").alias("n_plds"),
    )
    split_sizes.write.mode("overwrite").parquet(f"{args.out}/split_sizes")
    leaked = (
        split.filter(F.col("pld").isNotNull())
        .groupBy("pld")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    summary["leaked_plds"] = leaked  # MUST be 0; a nonzero value blocks ship

    # shard integrity manifests (T137)
    sharded = split.withColumn(
        "shard", F.pmod(F.hash("doc_id"), F.lit(args.shards)).cast("int")
    )
    manifests = shard_manifest(sharded)
    manifests.write.mode("overwrite").parquet(f"{args.out}/shard_manifests")
    summary["shards"] = manifests.count()

    print("release audit complete: " + json.dumps(summary, sort_keys=True))
    if own_session:
        spark.stop()
    return 0 if leaked == 0 else 2


if __name__ == "__main__":
    raise SystemExit(main())
