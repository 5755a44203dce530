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


# AQE skew-join tuning for sandbox-scale evidence runs.  Production keeps
# Spark's defaults (256 MB threshold / 64 MB advisory) — these exist because
# a 60k-row shuffle partition is a few MB, far under the default trigger.
# Two structural facts decide whether AQE can split at all (learned the hard
# way; asserted in tests/test_skew_join.py):
#   1. the skewed join side must be a BARE shuffle stage under the join —
#      an aggregate between the shuffle and the join breaks the
#      OptimizeSkewedJoin pattern match, and
#   2. no downstream operator may require the join's hash partitioning
#      (e.g. a groupBy on the join key) — splitting would violate it, so
#      AQE declines.  Salting (`salted_dim_join`) has neither constraint.
SKEW_JOIN_TUNING = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def set_confs(spark, confs: dict) -> dict:
    """Set session confs, returning the previous values for restore()."""
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_confs(spark, prev: dict) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def salted_dim_join(
    left: DataFrame,
    dim: DataFrame,
    key: str,
    row_key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof ``left ⋈ dim`` on *key*: the declarative salting fallback
    for when AQE cannot split (structural constraints above) or the dim is
    too large to broadcast.

    The dim side is replicated *salt_buckets* times (dim × salts — cheap:
    dims are small by definition); the left side computes a uniform salt
    from the row-unique *row_key* (urls/doc_ids are unique even when hosts
    are not), and the join runs on (key, salt) — the hot key's rows now
    spread over *salt_buckets* reducers instead of one straggler.  Result
    rows are identical to the unsalted join.
    """
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    left_s = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(row_key)), F.lit(salt_buckets)).cast("int"),
    )
    return left_s.join(dim_s, [key, "_salt"]).drop("_salt")


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
