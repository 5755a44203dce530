"""CDC-maintained dedup index — T216.

T44's incremental dedup probes a persisted (digest, key) + (band_key,
key) index instead of rescanning the corpus; T210's changelog derives
row-level changes from manifest metadata.  This operator closes the
loop: the dedup index FOLLOWS the corpus table — maintained from the
changelog, never rebuilt — and the index is itself stored as two of the
engine's own snapshot tables, which makes every maintenance step a
native lakehouse operation:

- **inserted docs** hash (digest + MinHash bands, O(changes) work) and
  land as one ``append`` commit per relation;
- **deleted docs** become ONE equality-delete commit on the key column
  — O(deleted keys) cost, NO index file rewritten, reconciliation
  deferred to read-time anti-joins and routine compaction (the T208
  operating model — deletes in a corpus table are retention/PII events,
  and the index absorbs them at metadata cost);
- an **upsert** is both: the eq-delete entry (seq k) removes the old
  index rows, the append (seq k+1) adds the new ones — the strict
  ``seq <`` rule orders them correctly inside one refresh;
- the watermark (``maintained_to`` = the corpus snapshot folded) rides
  the append commit's manifest summary, per relation, so a crash
  between the two relations' commits (or between delete and append)
  replays idempotently: re-running the fold re-issues a by-value
  identical eq-delete (harmless) and the append's watermark lands
  atomically with its rows.

Invariant (pytest-pinned, digest half oracled): the maintained index ≡
``build_dedup_index(read_snapshot(corpus, upto))`` as a multiset, after
ANY commit history.  Cost per refresh: O(changed rows) hashing +
O(deleted keys) metadata — never O(corpus text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.changelog import read_changelog
from ..sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_where_eq,
    read_snapshot,
    snapshot_log,
)
from .dedup import build_dedup_index


def _maintained_to(index_table: str) -> int | None:
    """The corpus snapshot this index relation is folded to — the max
    ``maintained_to`` over its commit log (None: never built)."""
    try:
        log = snapshot_log(index_table)
    except FileNotFoundError:
        return None
    best = None
    for man in log:
        props = man.get("summary", {}).get("properties", {})
        if "maintained_to" in props:
            v = int(props["maintained_to"])
            best = v if best is None or v > best else best
    return best


def _fold_relation(
    spark: SparkSession,
    table: str,
    upto: int,
    inserts: DataFrame,
    del_keys: DataFrame | None,
    key_col: str,
) -> None:
    """One relation's refresh: optional eq-delete of dead keys, then the
    insert delta + watermark as one append commit."""
    if del_keys is not None:
        delete_where_eq(spark, table, del_keys)
    append_snapshot(
        inserts, table, properties={"maintained_to": int(upto)}
    )


def maintain_dedup_index(
    spark: SparkSession,
    corpus_root: str,
    index_root: str,
    upto: int | None = None,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_bands: int = 4,
    rows_per_band: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Bring the dedup index at ``index_root`` (two snapshot tables,
    ``digests/`` and ``bands/``) up to corpus snapshot *upto* (default
    current) and return the (digests, bands) relations — ready to feed
    :func:`operators.dedup.incremental_dedupe`."""
    if upto is None:
        upto = current_snapshot_id(corpus_root)
        if upto is None:
            raise ValueError(f"table at {corpus_root} has no committed snapshot")
    dig_t = f"{index_root}/digests"
    band_t = f"{index_root}/bands"
    for table in (dig_t, band_t):
        base = _maintained_to(table)
        if base is not None and base > upto:
            raise ValueError(
                f"index relation {table} is at corpus snapshot {base}, "
                f"ahead of requested {upto} — indexes never rewind"
            )
        if base == upto:
            continue
        if base is None:
            corpus = read_snapshot(spark, corpus_root, snapshot_id=upto)
            digests, bands = build_dedup_index(
                corpus, text_col, key_col, n_bands, rows_per_band
            )
            _fold_relation(
                spark, table, upto,
                digests if table == dig_t else bands, None, key_col,
            )
            continue
        changes = read_changelog(spark, corpus_root, base, upto)
        inserted = changes.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_snapshot_id"
        )
        deleted = changes.filter(F.col("_change_type") == "delete").drop(
            "_change_type", "_commit_snapshot_id"
        )
        # net the range first: a row version BOTH inserted and deleted
        # inside (base, upto] is not in the final state, and the append
        # (seq k+1) would outrank the delete entry (seq k) — so only the
        # surviving versions may land (multiset exceptAll; the delete
        # side still names every dead key for the entry)
        surviving = inserted.exceptAll(deleted)
        del_keys = deleted.select(key_col).distinct()
        if del_keys.isEmpty():
            del_keys = None
        digests, bands = build_dedup_index(
            surviving, text_col, key_col, n_bands, rows_per_band
        )
        _fold_relation(
            spark, table, upto,
            digests if table == dig_t else bands, del_keys, key_col,
        )
    return read_dedup_index(spark, index_root)


def read_dedup_index(
    spark: SparkSession, index_root: str
) -> tuple[DataFrame, DataFrame]:
    """The maintained (digests, bands) relations."""
    return (
        read_snapshot(spark, f"{index_root}/digests"),
        read_snapshot(spark, f"{index_root}/bands"),
    )
