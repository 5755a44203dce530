"""Metadata tables over the snapshot tables — Iceberg's inspection
surface (``SELECT * FROM tbl.snapshots / tbl.files / tbl.history /
tbl.refs``) as plain DataFrames (T198).

Everything here is derived from manifest JSON alone: no data file is ever
opened, so each call costs one (or a few) metadata reads no matter how
many rows the table holds — the same property that makes Iceberg's
metadata tables usable on 10⁶-file tables.  Row budgets: ``snapshots`` /
``history`` are one row per retained snapshot; ``files`` is one row per
data file of one snapshot; ``refs`` is one row per named ref.  At 10⁶
files the files frame is metadata-scale (~100 MB of strings), which is
exactly how Iceberg sizes it; it is built with createDataFrame and
parallelized, so downstream joins/filters run distributed.

Reference analogue: none — the reference has no table catalog at all;
this completes the north-rule Iceberg input contract's inspection side.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    _schema_meta,
    current_snapshot_id,
    list_refs,
    read_manifest,
    snapshot_log,
)


def metadata_snapshots(spark: SparkSession, root: str) -> DataFrame:
    """One row per retained snapshot (Iceberg's ``snapshots`` table):
    commit timestamp, operation, lineage, and the summary counters —
    plus ``total_data_rows`` (sum of per-file record counts; data-file
    rows, i.e. NOT net of outstanding position-delete masks, exactly as
    Iceberg's ``total-records`` summary reports it)."""
    rows = []
    for man in snapshot_log(root):
        rc = man.get("row_counts", {})
        counted = [f for f in man["files"] if f in rc]
        rows.append(
            (
                man["snapshot_id"],
                man["parent_id"],
                man["operation"],
                float(man["ts"]),
                man["summary"]["added_files"],
                man["summary"]["added_rows"],
                man["summary"]["total_files"],
                sum(rc[f] for f in counted) if counted == man["files"] else None,
                sum(len(v) for v in man.get("delete_files", {}).values()),
                json.dumps(man["summary"].get("properties", {}), sort_keys=True),
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, operation string, "
        "committed_at double, added_files long, added_rows long, "
        "total_files long, total_data_rows long, total_delete_files long, "
        "properties string",
    )


def metadata_files(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """One row per data file of *snapshot_id* (default current) —
    Iceberg's ``files`` table: record count, the file's physical schema
    id, its self-described partition tuple, outstanding position-delete
    files, and the manifest column bounds as a JSON string."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(root)
    if sid is None:
        raise ValueError(f"table at {root} has no committed snapshot")
    man = read_manifest(root, sid)
    _schemas, cur_sid, file_sids, _last = _schema_meta(man)
    rc = man.get("row_counts", {})
    parts = man.get("partitions", {})
    dels = man.get("delete_files", {})
    stats = man.get("stats", {})
    seqs = man.get("seqs", {})
    eq = man.get("eq_deletes", [])
    rows = [
        (
            f,
            rc.get(f),
            file_sids.get(f, cur_sid),
            json.dumps(parts.get(f), sort_keys=True) if parts.get(f) else None,
            len(dels.get(f, ())),
            # Iceberg v2's data_sequence_number (0 = predates sequencing)
            int(seqs.get(f, 0)),
            # equality-delete entries scoped to this file (seq-strict)
            sum(1 for e in eq if int(seqs.get(f, 0)) < int(e["seq"])),
            json.dumps(stats.get(f, {}), sort_keys=True),
        )
        for f in man["files"]
    ]
    return spark.createDataFrame(
        rows,
        "file string, record_count long, schema_id long, partition string, "
        "n_delete_files long, data_sequence_number long, "
        "n_eq_deletes long, bounds string",
    )


def metadata_history(spark: SparkSession, root: str) -> DataFrame:
    """Iceberg's ``history`` table: the commit log with each snapshot's
    ancestry flag — ``is_current_ancestor`` marks the lineage of the
    CURRENT snapshot (False would indicate an abandoned branch after a
    rollback; this table's linear history keeps it all-True until a
    rollback feature exists)."""
    cur = current_snapshot_id(root)
    ancestors = set()
    sid = cur
    while sid:
        man = read_manifest(root, sid)
        ancestors.add(sid)
        sid = man["parent_id"]
    rows = [
        (
            float(man["ts"]),
            man["snapshot_id"],
            man["parent_id"],
            man["snapshot_id"] in ancestors,
        )
        for man in snapshot_log(root)
    ]
    return spark.createDataFrame(
        rows,
        "made_current_at double, snapshot_id long, parent_id long, "
        "is_current_ancestor boolean",
    )


def metadata_refs(spark: SparkSession, root: str) -> DataFrame:
    """Iceberg's ``refs`` table: every named branch/tag and the snapshot
    it points at."""
    rows = [
        (name, ref["type"], ref["snapshot_id"])
        for name, ref in sorted(list_refs(root).items())
    ]
    return spark.createDataFrame(
        rows or [], "name string, type string, snapshot_id long"
    )
