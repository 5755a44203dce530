"""Small-files compaction — the operational tail of every landed output.

Streaming micro-batches and many-bucket manifest runs accumulate small
parquet files; at 100 TB the per-file open/footer cost and the NameNode/
listing pressure dominate reads long before the bytes do.  The compactor
rewrites a parquet directory into ``ceil(total_bytes / target)`` files and
swaps it in via rename.

Swap semantics (stated honestly): rename-old → rename-new → delete-old is
atomic per rename but has a reader-visible window between the two renames;
on a real deployment the Iceberg path (ICEBERG.md) replaces this with a
snapshot-commit rewrite (`rewrite_data_files`), which is why the operator
keeps the same directory contract as the manifest buckets rather than
inventing a pointer scheme.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of parquet part-files directly under *path*."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") or f.startswith("part-"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(path: str, target_mb: int = 256) -> int:
    """File count the directory SHOULD have at the target file size."""
    return max(1, math.ceil(dir_parquet_bytes(path) / (target_mb * 1024 * 1024)))


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
) -> int:
    """Rewrite *path* into the planned file count; returns the new count.

    Operates on a LEAF parquet directory (part-files directly under *path*
    — e.g. one manifest bucket or one split= partition dir); for a
    partitioned root, compact each leaf.  A no-op (returns the current
    part-file count) when the directory already has that many or fewer.
    """
    n_target = plan_compaction(path, target_mb)
    parts = [
        f
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    if len(parts) <= n_target:
        return len(parts)
    df: DataFrame = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_target
