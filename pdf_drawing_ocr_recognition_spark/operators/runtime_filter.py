"""Runtime-filter (dynamic-partition-pruning analogue) joins — T213.

The 100-TB shape: a fact-side snapshot table (10¹²-row crawl corpus)
joined to a SMALL driver-known dim side — the docs matching a benchmark
batch, one day's recrawl list, a curated allowlist.  Spark's own
runtime filters (DPP / InSubquery bloom rewrites) stop at JVM
relations; they cannot reach the engine's Python manifest planner.
This operator closes that: collect the dim side's join keys (bounded by
an explicit cap — the same smallness contract DPP itself assumes), hand
them to :func:`plan_scan` as ONE ``("col", "in", keys)`` conjunct, and
let every manifest prover take a shot at every key — min/max bounds,
hidden-partition tuples (bucket/truncate/identity/days), and per-file
bloom sidecars.  A file survives iff ANY key might be present; on a
table clustered, partitioned, or bloom-indexed on the join key, a
1000-key probe into a 10⁶-file table keeps only the files those keys
can live in — the join's scan cost tracks the DIM side's selectivity,
never the fact table's size.

Pruning stays provable-only (the engine-wide contract): the kept files
are re-filtered row-wise (``isin``), so the result is exactly
``read_snapshot(...).join(dim, key)`` — cost changes, values never.
NULL keys are dropped on collection (an inner join matches NULL to
nothing; SQL ``IN`` three-valued logic agrees).

The cap (default 65,536 distinct keys) is enforced LOUDLY, never by
silent truncation: a dim side too big for an IN-list is not a runtime-
filter workload — use the plain join (AQE picks the strategy) or the
T200 storage-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import read_snapshot


def collect_join_keys(
    dim: DataFrame, key: str, max_keys: int = 65536
) -> list:
    """The dim side's distinct non-null join keys as driver values,
    refusing loudly past *max_keys* (count checked BEFORE collecting —
    an oversized dim never materializes on the driver)."""
    distinct = dim.select(key).where(F.col(key).isNotNull()).distinct()
    n = distinct.count()
    if n > max_keys:
        raise ValueError(
            f"dim side has {n} distinct {key!r} values (cap {max_keys}) "
            f"— not a runtime-filter workload; use the plain join or the "
            f"storage-partitioned join (operators/spj.py)"
        )
    return [r[0] for r in distinct.collect()]


def join_pruned_read(
    spark: SparkSession,
    root: str,
    dim: DataFrame,
    key: str,
    fact_key: str | None = None,
    snapshot_id: int | None = None,
    max_keys: int = 65536,
    extra_filters: list[tuple] | None = None,
) -> DataFrame:
    """The fact table at *root*, manifest-pruned to the files the dim
    side's keys can possibly live in (see module docstring), row-filtered
    to exactly the rows whose *fact_key* is among them.  Compose with the
    actual join:

        facts = join_pruned_read(spark, root, dim, "doc_id")
        result = facts.join(dim, "doc_id")

    — result ≡ ``read_snapshot(...).join(dim, "doc_id")`` with the scan
    bounded by the dim side's selectivity."""
    keys = collect_join_keys(dim, key, max_keys)
    filters = [(fact_key or key, "in", keys)] + list(extra_filters or [])
    return read_snapshot(spark, root, snapshot_id=snapshot_id, filters=filters)


def join_pruned(
    spark: SparkSession,
    root: str,
    dim: DataFrame,
    key: str,
    fact_key: str | None = None,
    snapshot_id: int | None = None,
    max_keys: int = 65536,
) -> DataFrame:
    """``fact ⋈ dim`` with the fact scan manifest-pruned by the dim keys
    — the full DPP-analogue join.  The dim side is broadcast (its
    smallness is already proven by the key cap)."""
    fk = fact_key or key
    facts = join_pruned_read(
        spark, root, dim, key, fact_key, snapshot_id, max_keys
    )
    if fk == key:
        return facts.join(F.broadcast(dim), key)
    return facts.join(F.broadcast(dim), facts[fk] == dim[key])
