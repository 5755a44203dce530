"""Crawl politeness: robots.txt rule matching + per-host crawl-delay
scheduling — the two crawler-side operators a webtext ingest runs before any
fetch reaches extraction.

robots_filter
-------------
Google/REP semantics on a rules table ``(host, prefix, allow)``: among the
rules of a URL's host whose prefix matches the path, the LONGEST prefix wins;
on a length tie, allow beats disallow; no matching rule means allowed.
Re-expressed relationally: one equi-join on ``host`` (broadcast when the
ruleset is small; plain shuffled equi-join when millions of hosts' robots
rules don't fit — either way never a cross product), prefix test as
``startswith``, winner via ONE ``max_by`` hash-aggregate on the
``(len(prefix), allow)`` pair — no window, no per-doc sort.

politeness_schedule
-------------------
Crawl-delay queueing: per host, fetch i may start no earlier than its own
ready time and no earlier than fetch i-1's start + delay:

    sched_i = max(ts_i, sched_{i-1} + d)

The recurrence looks inherently sequential, but unrolls to a prefix maximum:

    sched_i = i*d + max_{j<=i}(ts_j - j*d)

so it is ONE running-max window per host — no iterative loop, no UDF, and
the same closed form a DuckDB/ANSI window computes, which is what makes the
operator oracle-able.  Cost at scale: a single hash Exchange on host + one
per-host sort; the per-host summary aggregation reuses the same hash
partitioning, so the whole operator is one shuffle.  Hot hosts are the
skew risk, but politeness is *semantically* serial per host — the schedule
for a 10M-page host is long because the crawl rule says it must be.

Reference analogue: none (the reference reads local files); this is the
north-rule crawl-ingest generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Add ``is_allowed`` to ``pages`` per REP longest-match semantics.

    ``rules`` columns: ``host string, prefix string, allow boolean``.
    Rules for other hosts never match (equi-join); a page with no matching
    rule is allowed.  Keeps every page row exactly once.
    """
    r = rules.select(
        F.col("host").alias("__r_host"),
        F.col("prefix").alias("__r_prefix"),
        F.col("allow").alias("__r_allow"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    matched = (
        pages.join(r, pages[host_col] == F.col("__r_host"), "left")
        .withColumn(
            "__hit",
            F.col("__r_prefix").isNotNull()
            & F.col(path_col).startswith(F.col("__r_prefix")),
        )
        # decision key: longest matching prefix; allow wins length ties.
        .withColumn(
            "__rank",
            F.when(
                F.col("__hit"),
                F.length("__r_prefix") * 2 + F.col("__r_allow").cast("int"),
            ).otherwise(F.lit(-1)),
        )
    )
    grp = [F.col(c) for c in pages.columns]
    return matched.groupBy(*grp).agg(
        F.when(F.max("__rank") < 0, F.lit(True))
        .otherwise(F.max_by(F.col("__r_allow"), F.col("__rank")))
        .alias("is_allowed")
    )


def politeness_schedule(
    fetches: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts_us",
    order_cols: tuple[str, ...] = (),
    delay_us: int = 5_000_000,
    sched_col: str = "sched_us",
) -> DataFrame:
    """Assign each fetch its politeness-compliant start time (``sched_col``,
    epoch microseconds) via the prefix-max closed form above.  ``ts_col``
    must already be epoch-us BIGINT so every step is exact integer math
    (identical in the DuckDB twin).  ``order_cols`` break ready-time ties
    deterministically."""
    w = Window.partitionBy(host_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols]
    )
    k = (F.row_number().over(w) - 1).cast("bigint")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = fetches.withColumn("__k", k).withColumn(
        "__base", F.col(ts_col) - F.col("__k") * F.lit(delay_us)
    )
    return staged.withColumn(
        sched_col, F.col("__k") * F.lit(delay_us) + F.max("__base").over(run)
    ).drop("__k", "__base")


def host_schedule_summary(
    scheduled: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts_us",
    sched_col: str = "sched_us",
) -> DataFrame:
    """Per-host audit of a politeness schedule: fetch count, total imposed
    wait, and makespan — all exact BIGINT microseconds.  Groups on the same
    key the schedule window partitioned by, so Catalyst reuses the exchange."""
    return scheduled.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(F.col(sched_col) - F.col(ts_col)).cast("bigint").alias(
            "total_wait_us"
        ),
        (F.max(sched_col) - F.min(ts_col)).cast("bigint").alias("makespan_us"),
    )
