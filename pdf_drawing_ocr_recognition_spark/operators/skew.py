"""Skew handling (SURVEY.md M4) — salted repartition by url hash.

The corpus is host-skewed (one host ≈ half the rows — the fixture models a
Common-Crawl reality).  File-split parallelism already decorrelates hosts from
tasks for the narrow extract stage; this operator exists for stages that are
keyed (grouped/joined) by host or url prefix, where Zipf hosts become straggler
partitions at 100 TB.

``salted_repartition`` redistributes on ``xxhash64(url, salt)`` — uniform by
construction because urls are unique even when hosts are not.  For keyed aggs
over hosts, pre-aggregate per (host, salt) then re-aggregate per host
(classic two-phase salting); ``salted_host_counts`` demonstrates the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Repartition on a salted url hash — uniform task sizing under host skew."""
    return df.repartition(
        num_partitions, F.xxhash64(F.col("url"), F.lit(salt_buckets))
    )


def host_of(url_col) -> F.Column:
    """Extract the host from an url column (pure built-ins, codegen-friendly)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/", 1)


def salted_host_counts(pages: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-host row counts via two-phase salted aggregation.

    Phase 1 groups on (host, salt) so the heavy host's rows spread across
    *salt_buckets* reducers; phase 2 sums the small per-salt partials.  With
    AQE the partial agg is also map-side combined, so the shuffle carries at
    most hosts × salt_buckets rows.
    """
    salted = pages.select(
        host_of(F.col("url")).alias("host"),
        (F.xxhash64("url") % salt_buckets).alias("_salt"),
    )
    partial = salted.groupBy("host", "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy("host").agg(F.sum("_c").alias("n_pages"))


def write_bucketed(
    df,
    table: str,
    n_buckets: int = 32,
    bucket_col: str = "url",
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a Hive-bucketed (+optionally sorted) managed table.

    Bucketing is the write-once answer to repeated joins/aggregations on the
    same key (task brief: "bucketing for co-located joins"): both sides of a
    join bucketed by the key with equal bucket counts scan pre-hashed files,
    so the join plans with NO Exchange on either side — at 100 TB that is
    the difference between re-shuffling the corpus per query and never
    shuffling it again.  Sorting within buckets additionally removes the
    per-task sort of a sort-merge join.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
