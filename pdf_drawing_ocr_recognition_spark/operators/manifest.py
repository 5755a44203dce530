"""Checkpoint/lineage manifests — idempotent resume (SURVEY.md M5, A21).

Generalizes the reference's parse-once guard (pdor/pdor_unit.py:303-306,
is_parsed :323-328) into job-level machinery for 10^12-document runs:

- work is partitioned into **buckets** by ``pmod(xxhash64(url), n_buckets)``
  (content-addressed, independent of file layout, stable across runs);
- each completed bucket commits a manifest row (bucket id, row count, status,
  metrics) AND its result parquet, written atomically (temp dir + rename);
- resume = read committed manifests, **left-anti join** the input's buckets
  against them, and process only the remainder — a re-run after a kill
  re-does at most the in-flight bucket, and re-doing it is harmless because
  the kernel is deterministic and the commit is atomic.

The manifest is itself a small parquet table next to the results, so lineage
(which bucket produced which rows, at what throughput) is queryable with the
same engine.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(url_col, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def manifest_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_manifest")


def read_manifest(spark: SparkSession, output_dir: str) -> DataFrame:
    """Committed-bucket manifest (empty frame when no run has committed yet)."""
    path = manifest_path(output_dir)
    schema = "bucket INT, n_rows LONG, n_failed LONG, wall_s DOUBLE, committed_ts STRING"
    files = (
        [f for f in os.listdir(path) if f.endswith(".json")]
        if os.path.isdir(path)
        else []
    )
    if not files:
        return spark.createDataFrame([], schema)
    rows = []
    for f in sorted(files):
        with open(os.path.join(path, f), "r", encoding="utf-8") as fh:
            rows.append(json.load(fh))
    return spark.createDataFrame(rows, schema)


def pending_inputs(
    pages: DataFrame, manifest: DataFrame, n_buckets: int
) -> DataFrame:
    """Inputs minus completed buckets — the resume delta (left-anti join).

    The manifest side is tiny (≤ n_buckets rows) so Catalyst broadcasts it;
    the anti join therefore adds no shuffle to the big side.
    """
    with_bucket = pages.withColumn("bucket", bucket_of(F.col("url"), n_buckets))
    done = manifest.select("bucket")
    return with_bucket.join(F.broadcast(done), "bucket", "left_anti")


def _commit_bucket(output_dir: str, bucket: int, n_rows: int, n_failed: int, wall_s: float) -> None:
    """Atomic manifest commit: write temp file, fsync, rename."""
    path = manifest_path(output_dir)
    os.makedirs(path, exist_ok=True)
    payload = {
        "bucket": bucket,
        "n_rows": n_rows,
        "n_failed": n_failed,
        "wall_s": wall_s,
        "committed_ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    tmp = os.path.join(path, f".bucket-{bucket:05d}.json.tmp")
    final = os.path.join(path, f"bucket-{bucket:05d}.json")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)


def _process_bucket(todo: DataFrame, bucket: int, extract_fn, output_dir: str) -> None:
    """One restartable unit of work: filter → extract → write → commit.

    Row/failure stats are collected DURING the write via ``Observation``
    (accumulator-backed query metrics), so the bucket's data is scanned
    exactly once — no post-write re-read of the parquet.
    """
    from pyspark.sql import Observation

    t0 = time.time()
    part = todo.filter(F.col("bucket") == bucket).drop("bucket")
    result = extract_fn(part)
    obs = Observation(f"bucket_{bucket}")
    observed = result.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("status") == "failed").cast("long")).alias("nf"),
    )
    tmp_dir = os.path.join(output_dir, f".bucket={bucket}.tmp")
    final_dir = os.path.join(output_dir, f"bucket={bucket}")
    observed.write.mode("overwrite").parquet(tmp_dir)
    stats = obs.get
    if os.path.isdir(final_dir):
        import shutil

        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)
    _commit_bucket(
        output_dir, bucket, stats["n"], stats["nf"] or 0, time.time() - t0
    )


def run_with_manifest(
    spark: SparkSession,
    pages: DataFrame,
    extract_fn,
    output_dir: str,
    n_buckets: int = 8,
    max_concurrency: int = 1,
) -> DataFrame:
    """Run extraction bucket-by-bucket with manifest commits; returns results.

    Each bucket is one restartable unit of work: filter → extract → write
    parquet under ``bucket=K/`` → commit manifest row.  A killed run leaves
    committed buckets untouched; the next invocation processes only the
    left-anti remainder.  Bucket results land via directory rename so readers
    never observe half-written buckets.

    ``max_concurrency > 1`` submits bucket jobs from a bounded driver thread
    pool — Spark's scheduler interleaves their stages across the executors,
    so stragglers in one bucket no longer serialize the whole run (the fix
    for the driver-side sequential-loop scalability note).  Each bucket's
    write + manifest commit stays independent and atomic, so kill/resume
    semantics are unchanged at any concurrency.
    """
    manifest = read_manifest(spark, output_dir)
    todo = pending_inputs(pages, manifest, n_buckets)
    buckets = sorted(r["bucket"] for r in todo.select("bucket").distinct().collect())
    if max_concurrency <= 1:
        for bucket in buckets:
            _process_bucket(todo, bucket, extract_fn, output_dir)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            futures = [
                pool.submit(_process_bucket, todo, b, extract_fn, output_dir)
                for b in buckets
            ]
            for f in futures:
                f.result()  # surface the first failure, after all complete
    return spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "bucket=*")
    )
