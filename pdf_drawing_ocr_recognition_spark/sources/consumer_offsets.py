"""Consumer-group offsets over the snapshot tables (T199) — the
"Kafka-like tail" of a table: each named consumer remembers the last
snapshot it fully processed and receives ONLY the delta on its next call,
with the checkpoint stored next to the table and advanced atomically.

This is the consumption side of Iceberg's Structured-Streaming source
(which tracks the last-read snapshot in the stream checkpoint), made
explicit for batch-incremental pipelines: the daily job calls
:func:`next_appends`, processes the returned frame, then :func:`ack`s —
at-least-once by construction (a crash between processing and ack replays
the delta).  Exactly-once composes with the T193 snapshot SINK: write the
delta with ``stream_id=<consumer>, batch_id=<to_id>`` and the sink's own
commit-log replay guard dedupes the retry.

Delta semantics mirror upstream:

* an appends-only range streams the added files, projected onto the
  target snapshot's logical schema (field-id resolution — renames/widens
  between consumptions are transparent; alter-schema commits are crossed
  silently, they add no files);
* a replace/overwrite/merge/delete inside the range raises by default —
  the files added by such commits contain REWRITTEN old rows, which a
  tailing consumer must not double-receive;
* ``skip_non_appends=True`` opts into Iceberg's
  ``streaming-skip-overwrite-snapshots``/``streaming-skip-delete-
  snapshots`` behavior: non-append commits are skipped wholesale (their
  rewritten rows are NOT delivered) and only genuine append commits in
  the range stream;
* the FIRST consumption bootstraps with the full table as of the current
  snapshot (deletes/merges applied), which is the correct "everything so
  far" delta at any history shape.

Scale: planning is manifest JSON only; the delta scan reads exactly the
added files.  Offsets are one tiny JSON per consumer, swapped atomically
(os.replace) — safe against concurrent acks of the same consumer (last
writer wins a monotonic race, and :func:`ack` refuses to move backwards).

Reference analogue: none (the reference reprocesses its single input file
per run); cites the resume intent of pdor/pdor_unit.py:parse-once.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .snapshots import (
    current_snapshot_id,
    read_files_projected,
    read_manifest,
    read_snapshot,
)


def _offsets_dir(root: str) -> str:
    return os.path.join(root, "metadata", "consumers")


def _offset_path(root: str, consumer: str) -> str:
    if not consumer or "/" in consumer or consumer.startswith("."):
        raise ValueError(f"bad consumer name {consumer!r}")
    return os.path.join(_offsets_dir(root), f"{consumer}.json")


def consumer_offset(root: str, consumer: str) -> int:
    """The last snapshot id *consumer* acked (0 = never consumed)."""
    try:
        with open(_offset_path(root, consumer)) as f:
            return int(json.load(f)["snapshot_id"])
    except FileNotFoundError:
        return 0


def ack(root: str, consumer: str, to_id: int) -> None:
    """Atomically advance *consumer*'s offset to *to_id*.  Refuses to move
    backwards (a stale retry acking an older delta must not rewind a
    newer consumer position)."""
    cur = consumer_offset(root, consumer)
    if to_id < cur:
        raise ValueError(
            f"consumer {consumer!r} is already at {cur}; refusing to "
            f"rewind to {to_id} (reset by deleting the offset file if "
            f"reprocessing is intended)"
        )
    os.makedirs(_offsets_dir(root), exist_ok=True)
    path = _offset_path(root, consumer)
    tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": to_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def next_appends(
    spark: SparkSession,
    root: str,
    consumer: str,
    skip_non_appends: bool = False,
) -> tuple[int, int, DataFrame] | None:
    """The unprocessed delta for *consumer*: ``(from_id, to_id, df)``, or
    None when caught up.  Does NOT advance the offset — process the frame,
    then :func:`ack(root, consumer, to_id)` (at-least-once)."""
    to_id = current_snapshot_id(root)
    from_id = consumer_offset(root, consumer)
    if to_id is None or to_id <= from_id:
        return None
    if from_id == 0:
        # bootstrap: the full table as of to_id is the correct
        # "everything so far" delta under ANY history shape
        return 0, to_id, read_snapshot(spark, root, to_id)
    man_to = read_manifest(root, to_id)
    prev_files = set(read_manifest(root, from_id)["files"])
    delta_files: list[str] = []
    file_sids: dict[str, int] = {}
    for sid in range(from_id + 1, to_id + 1):
        man = read_manifest(root, sid)
        op = man["operation"]
        added = [f for f in man["files"] if f not in prev_files]
        prev_files = set(man["files"])
        if op == "append":
            delta_files.extend(added)
            file_sids.update(
                {f: v for f, v in man.get("file_schemas", {}).items()
                 if f in set(added)}
            )
        elif op in ("alter-schema", "compute-stats", "delete", "eq-delete"):
            # metadata-only / delete commits add no data rows (a delete's
            # del-*.parquet / eqdel-*.parquet never enters the file list).
            # A delete still needs the opt-in: rows it masked may already
            # have been delivered, and tailing semantics won't retract.
            if op in ("delete", "eq-delete") and not skip_non_appends:
                raise ValueError(
                    f"snapshot {sid} is {op!r} — pass "
                    f"skip_non_appends=True to tail across it"
                )
        elif op == "upsert":
            # an upsert's added files are genuinely NEW row versions, never
            # rewrites of already-delivered rows — deliver them; the
            # retraction of the superseded versions (its equality-delete
            # half) is what the opt-in acknowledges, exactly as for
            # 'delete'/'eq-delete' above.
            if not skip_non_appends:
                raise ValueError(
                    f"snapshot {sid} is 'upsert' — its equality-delete "
                    f"half retracts rows tailing semantics won't; pass "
                    f"skip_non_appends=True to receive its new row "
                    f"versions anyway"
                )
            delta_files.extend(added)
            file_sids.update(
                {f: v for f, v in man.get("file_schemas", {}).items()
                 if f in set(added)}
            )
        elif skip_non_appends:
            continue  # replace/overwrite/merge: rewritten rows, skipped
        else:
            raise ValueError(
                f"snapshot {sid} is {op!r} — its files contain rewritten "
                f"rows a tailing consumer must not double-receive; pass "
                f"skip_non_appends=True to skip such commits wholesale, "
                f"or reset the consumer to reprocess the full table"
            )
    # appended files are read AS RECORDED even if a later compaction in
    # the range replaced them — they stay on disk until expire_snapshots
    # drops the snapshot that references them (as upstream: retention must
    # cover consumer lag); their physical schemas come from the manifest
    # that added them, projection targets to_id's logical schema
    man_read = dict(man_to)
    man_read["file_schemas"] = {
        **file_sids, **man_to.get("file_schemas", {})
    }
    return from_id, to_id, read_files_projected(
        spark, root, man_read, delta_files
    )
