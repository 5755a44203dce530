"""Per-file bloom filters for the snapshot tables (T207) — Iceberg's
Puffin-style secondary statistics, built as a maintenance action.

The gap they close: manifest min/max bounds prune RANGE predicates, but a
point lookup on a high-cardinality hash-distributed column (url, content
digest, id) matches every file's [min, max] — the 10⁶-file table scans
everything to find one row.  A per-file bloom answers "might this file
contain v?" in O(k) bit probes from a small sidecar, with NO false
negatives — so `plan_scan` pruning on ``==`` stays provable-only (a false
positive keeps a file the row-wise re-filter then empties; never wrong
values, only wasted IO at the configured fp rate).

Design (mirrors how the manifest carries column stats):

* ``compute_file_blooms(spark, root, col)`` is an explicit maintenance
  commit (Iceberg's ``compute_table_stats``): one executor task per data
  file still missing a bloom for the column reads ONLY that column,
  hashes each distinct value (md5 → Kirsch-Mitzenmacher double hashing
  over the canonical string form — build and probe share
  ``snapshots._bloom_positions``, so they can never disagree), and writes
  one ``blm-*.bin`` sidecar under data/.  Driver traffic is file names +
  bloom refs.
* Sizing per file from the manifest's ``row_counts`` at the ln2 optimum
  for ``fp_rate`` (~9.6 bits/row at 1%) — a 10⁶-row file costs a ~1.2 MB
  sidecar, loaded lazily and only for files the cheaper min/max /
  partition checks kept.
* The manifest maps ``{file: {field_id: {ref, m, k}}}`` — keyed by FIELD
  ID, so renames never invalidate a bloom; carried by name through
  delete/merge/evolve/rollback commits exactly like column stats; files
  REWRITTEN by compaction drop their blooms (recompute after compaction,
  as Iceberg stats age out).  Sidecars share the expiry/orphan lifecycle
  (``_manifest_all_files`` lists them).
* The commit is metadata-plus-sidecars (operation ``compute-stats``):
  appends-only incremental reads cross it, like ``alter-schema``.

Reference analogue: none; this is the point-lookup half of the
manifest-pruning story (T83/T195 cover ranges and partitions).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

from .snapshots import (
    _bloom_positions,
    _data_dir,
    _schema_meta,
    current_snapshot_id,
    read_manifest,
)


def bloom_file_params(n_rows: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k) at the ln2 optimum for *n_rows* items, byte-aligned."""
    import math

    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    n = max(1, n_rows)
    m = max(64, int(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def compute_file_blooms(
    spark: SparkSession,
    root: str,
    col: str,
    fp_rate: float = 0.01,
) -> int:
    """Build bloom sidecars for every current data file missing one for
    *col*, and commit the manifest mapping (operation ``compute-stats``).
    Returns the parent id unchanged when every file already has one."""
    parent = current_snapshot_id(root)
    if parent is None:
        raise ValueError(f"table at {root} has no committed snapshot")
    man = read_manifest(root, parent)
    schemas, cur_sid, file_sids, _last = _schema_meta(man)
    fid = next(
        (f["id"] for f in schemas[cur_sid] if f["name"] == col), None
    )
    if fid is None:
        raise ValueError(f"no column {col!r} in the current schema")
    existing = man.get("blooms", {})
    rc = man.get("row_counts", {})
    todo = []
    for f in man["files"]:
        if str(fid) in (existing.get(f) or {}):
            continue
        # the file's PHYSICAL name for the field (rename-safe); a file
        # predating the column has nothing to index
        pname = {
            fd["id"]: fd["name"]
            for fd in schemas[file_sids.get(f, cur_sid)]
        }.get(fid)
        if pname is None:
            continue
        m, k = bloom_file_params(rc.get(f, 100_000), fp_rate)
        todo.append((f, pname, m, k))
    if not todo:
        return parent
    data_dir = _data_dir(root)
    n_parts = max(1, min(len(todo), spark.sparkContext.defaultParallelism))
    plan = spark.createDataFrame(
        todo, "file string, col string, m long, k int"
    ).repartition(n_parts, "file")

    def build(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            for fname, pname, m, k in pdf.itertuples(index=False):
                m, k = int(m), int(k)
                tab = pq.read_table(
                    os.path.join(data_dir, fname), columns=[pname]
                )
                vals = pd.unique(
                    tab.column(pname).to_pandas().dropna()
                )
                bits = np.zeros(m // 8, dtype=np.uint8)
                for v in vals:
                    for p in _bloom_positions(v, m, k):
                        bits[p >> 3] |= 1 << (p & 7)
                ref = f"blm-{uuid.uuid4().hex[:12]}.bin"
                tmp = os.path.join(data_dir, f".{ref}.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(bits.tobytes())
                os.replace(tmp, os.path.join(data_dir, ref))
                yield pd.DataFrame(
                    {"data_file": [str(fname)], "ref": [ref],
                     "m": [m], "k": [k]}
                )

    built = plan.mapInPandas(
        build, schema="data_file string, ref string, m long, k int"
    ).collect()  # bounded by the file count, never rows
    merged = {f: dict(per) for f, per in existing.items()}
    for r in built:
        merged.setdefault(r["data_file"], {})[str(fid)] = {
            "ref": r["ref"], "m": int(r["m"]), "k": int(r["k"]),
        }
    from .snapshots import _commit

    return _commit(
        root, parent, man["files"], [], 0, json.dumps(man["schema"]),
        "compute-stats",
        stats=man.get("stats", {}),
        delete_files=man.get("delete_files", {}),
        partition_spec=man.get("partition_spec", []),
        partitions=man.get("partitions", {}),
        schemas=schemas, current_schema_id=cur_sid,
        file_schemas=file_sids, last_field_id=_last,
        row_counts=man.get("row_counts", {}),
        file_sizes=man.get("file_sizes", {}),
        blooms=merged,
        properties={"bloom_column": col, "bloom_files": len(built)},
    )
