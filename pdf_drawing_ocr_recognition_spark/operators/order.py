"""Global ordering primitives that avoid the single-reducer window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the whole
dataset through ONE task — the classic scale cliff.  The distributed form is
the two-job range-sort pattern every engine uses internally for ORDER BY:
range-repartition on the order key, count rows per partition (a tiny
driver-side prefix sum), then add each partition's offset to its local
running index.

Determinism: the output depends only on the global ORDER, not on where the
sampled range boundaries land, PROVIDED the order key is a total order —
callers must include a unique tiebreaker column (enforced in the docstring
contract; the driver-gate query orders by (n_chars DESC, doc_id)).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_row_numbers(
    df: DataFrame,
    order_cols: list[Column],
    id_col: str = "row_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Attach 1-based global row numbers in ``order_cols`` order — the
    scalable twin of an unpartitioned row_number window (no single-task
    sort; two jobs: per-partition counts + the numbering pass).

    ``order_cols`` MUST form a total order (include a unique tiebreaker);
    with ties the assignment at range boundaries would depend on sampling.

    The partitioning is materialized ONCE (eager ``localCheckpoint``) before
    the counts job: the counts pass and the numbering pass otherwise each
    re-execute the lazy ``repartitionByRange``, whose range boundaries are
    re-SAMPLED per execution above the exhaustive-sample threshold — two
    executions could split boundary rows differently and the offsets from
    job 1 would silently mis-number job 2's partitions.  Checkpointing pins
    one physical partitioning for both passes (and truncates lineage, so a
    lost block fails loudly instead of recomputing a different split; on a
    long-lived production cluster use a reliable ``checkpoint()`` dir if
    executor loss must be survivable mid-operator).
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    with_pid = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    schema = StructType(with_pid.schema.fields + [StructField(id_col, LongType())])

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf[id_col] = range(base + local + 1, base + local + 1 + len(pdf))
            local += len(pdf)
            yield pdf

    return with_pid.mapInPandas(number, schema).drop("_pid")


def global_prefix_sums(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "running_total",
    n_partitions: int | None = None,
    max_total: int | None = None,
) -> DataFrame:
    """Inclusive running ``SUM(value_col)`` in ``order_cols`` order — the
    scalable twin of ``SUM(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)``,
    which on an unpartitioned window funnels the corpus through ONE task.
    Same two-job range-sort shape as :func:`global_row_numbers`: the
    per-partition SUMs come to the driver (n_partitions scalars), their
    prefix gives each partition's starting offset, and one Arrow pass adds
    ``offset + local cumsum``.

    ``value_col`` MUST be integral and non-null: integer prefix sums are
    exact and order-independent in the partials, so partition-sum + offset
    reproduces the strictly-sequential fold bit-for-bit — a float column
    would make the result depend on where range boundaries land.
    ``order_cols`` MUST form a total order (unique tiebreaker).

    With ``max_total`` set (values must also be NON-NEGATIVE — validated
    driver-side from a per-partition MIN in the same scalars job, so the
    check costs nothing and sees pruned partitions too), partitions whose
    starting offset already reaches it are
    dropped BEFORE the Arrow pass: running totals are monotone, so every
    row there has ``cum > max_total`` provably.  That's the budgeted-
    selection scale path — at a 30% token budget, ~70% of a sorted corpus
    is never scanned by the numbering job.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, ShortType

    dt = df.schema[value_col].dataType
    if not isinstance(dt, (LongType, IntegerType, ShortType)):
        raise ValueError(
            f"global_prefix_sums needs an integral value column, "
            f"got {value_col}: {dt.simpleString()}"
        )
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    with_pid = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    count_rows = (
        with_pid.groupBy("_pid")
        .agg(
            F.sum(F.col(value_col).cast("long")).alias("s"),
            F.min(F.col(value_col)).alias("lo"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(value_col)).alias("nn"),
        )
        .collect()
    )
    for r in count_rows:
        if r["n"] != r["nn"]:
            raise ValueError(f"global_prefix_sums: null in {value_col}")
        if max_total is not None and r["lo"] is not None and r["lo"] < 0:
            raise ValueError(
                "global_prefix_sums: max_total pruning requires "
                f"non-negative {value_col} values"
            )
    sums = {r["_pid"]: int(r["s"]) for r in count_rows if r["s"] is not None}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(sums):
        offsets[pid] = running
        running += sums[pid]
    src = with_pid
    if max_total is not None:
        live = [pid for pid, off in offsets.items() if off < max_total]
        src = with_pid.filter(F.col("_pid").isin(live) if live else F.lit(False))
    schema = StructType(with_pid.schema.fields + [StructField(out_col, LongType())])

    def accumulate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            vals = pdf[value_col].to_numpy().astype(np.int64)
            cum = np.cumsum(vals)
            pdf[out_col] = base + carry + cum
            carry += int(cum[-1])
            yield pdf

    return src.mapInPandas(accumulate, schema).drop("_pid")


def grouped_row_numbers(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    id_col: str = "row_id",
    total_col: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """1-based row numbers WITHIN each group, in ``order_cols`` order — the
    scalable twin of ``row_number() OVER (PARTITION BY group ORDER BY …)``
    for the per-group-window scale cliff: a rank window partitioned by a
    low-cardinality or skewed group funnels each group through ONE task
    (2.5·10¹¹ rows per bin at 10¹² docs / 4 curriculum bins — spilling,
    not parallel).  Same two-job range-sort shape as
    :func:`global_row_numbers`, range-partitioned on (group, order) so ONE
    group spans many partitions and every partition stays
    memory-bounded.

    ``(group_cols, order_cols)`` MUST form a total order (unique
    tiebreaker).  Driver traffic is the per-(partition, group) count rows:
    range partitioning keeps each partition to a contiguous key span, so
    that's ≤ n_partitions + n_groups − 1 scalar rows — bins/sources/hosts,
    never documents.  With ``total_col`` set, each row also carries its
    group's total row count (free here; a separate count-join would cost
    another shuffle) — callers derive percent ranks as (rn−1)/(n−1).
    """
    import numpy as np

    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in group_cols] + list(order_cols)
    part = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
    with_pid = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    count_rows = (
        with_pid.groupBy("_pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )

    def gkey(row_or_vals) -> tuple:
        return tuple(row_or_vals[g] for g in group_cols)

    offsets: dict[tuple, dict[int, int]] = {}
    totals: dict[tuple, int] = {}
    for r in sorted(count_rows, key=lambda r: r["_pid"]):
        k = gkey(r)
        running = totals.get(k, 0)
        offsets.setdefault(k, {})[r["_pid"]] = running
        totals[k] = running + r["cnt"]

    fields = list(with_pid.schema.fields) + [StructField(id_col, LongType())]
    if total_col is not None:
        fields.append(StructField(total_col, LongType()))
    schema = StructType(fields)
    want_total = total_col is not None

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[tuple, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            grp = pdf.groupby(group_cols, sort=False, dropna=False)
            cc = grp.cumcount().to_numpy()
            base = np.empty(len(pdf), dtype=np.int64)
            tot = np.empty(len(pdf), dtype=np.int64) if want_total else None
            for k, idx in grp.indices.items():
                kk = k if isinstance(k, tuple) else (k,)
                start = offsets[kk][pid] + seen.get(kk, 0)
                base[idx] = start
                seen[kk] = start - offsets[kk][pid] + len(idx)
                if want_total:
                    tot[idx] = totals[kk]
            pdf[id_col] = base + cc + 1
            if want_total:
                pdf[total_col] = tot
            yield pdf

    return with_pid.mapInPandas(number, schema).drop("_pid")
