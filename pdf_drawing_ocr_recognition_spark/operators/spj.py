"""Storage-partitioned join (T200) — the shuffle-free bucket-local join
over two snapshot tables that share a ``bucket[N]`` hidden-partition spec
on the join key (Iceberg + Spark's storage-partitioned join, SPARK-37375,
re-expressed over the offline table format).

Why it exists: joining two 100-TB tables on a key normally shuffles BOTH
sides (the dominant cost of large fact-fact joins).  When both tables were
WRITTEN bucket-partitioned by that key, co-location already holds on disk:
every key lives in bucket ``crc32(key) % N`` of both tables, so bucket b of
A joins only bucket b of B.  This operator plans (bucket → file list) for
both sides from manifest JSON alone, then runs ONE narrow mapInPandas
stage over the N bucket pairs — zero shuffle of table data; the only
exchange in the plan moves N task-descriptor rows.

Correctness guarantees (pytest-pinned, oracled vs the plain join):

* result ≡ ``read_snapshot(A).join(read_snapshot(B), key, "inner")`` —
  including position-delete masks (applied per file, as read_snapshot
  does) and schema evolution (per-file field-id projection, so renamed/
  widened keys and columns resolve; the bucket slot is found through the
  file's OWN recorded spec);
* SQL null semantics: NULL keys match nothing (pandas would match
  NaN==NaN; the kernel drops null keys before merging);
* both specs must carry the SAME ``bucket[N]`` on the join key, and every
  data file must carry a bucket tuple — otherwise co-location is not
  provable and the operator refuses (fix: ``rewrite_data_files`` under the
  bucketed spec), never silently falls back to a wrong join.

Scale posture: each task holds one bucket of A plus one bucket of B in
memory — the SAME granularity contract as Iceberg SPJ, sized by choosing N
at write time (N ≈ table_bytes / target_task_bytes).  Skewed keys concentrate
in one bucket exactly as they concentrate in one shuffle partition of a
hash join — no worse, and the salting escape hatch (operators/skew.py)
applies upstream at write time.

Reference analogue: none (single-file reference); this is the engine-side
join strategy the north rule's Iceberg tables make possible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..sources.snapshots import (
    _data_dir,
    _deleted_positions,
    _file_projection,
    _parse_transform,
    _schema_meta,
    _struct_of,
    current_snapshot_id,
    read_manifest,
)


def _bucket_plan(
    root: str, man: dict, key: str
) -> tuple[int, dict[int, list[str]]]:
    """(N, bucket → files) for one table, validating that the CURRENT spec
    buckets on *key* and every file self-describes a bucket tuple for the
    key's field id (rename-safe: each file's slot is matched through its
    own physical name for the key)."""
    schemas, cur_sid, file_sids, _ = _schema_meta(man)
    key_id = next(
        (f["id"] for f in schemas[cur_sid] if f["name"] == key), None
    )
    if key_id is None:
        raise ValueError(f"no column {key!r} in the current schema of {root}")
    spec = man.get("partition_spec", [])
    ns = [
        _parse_transform(e["transform"])[1]
        for e in spec
        if _parse_transform(e["transform"])[0] == "bucket"
        and e["source"] == key
    ]
    if not ns:
        raise ValueError(
            f"table {root} is not bucket-partitioned on {key!r} — rewrite "
            f"under partition_spec=[{{'source': {key!r}, 'transform': "
            f"'bucket[N]'}}] to enable storage-partitioned joins"
        )
    n = ns[0]
    partitions = man.get("partitions", {})
    buckets: dict[int, list[str]] = {}
    for f in man["files"]:
        phys_key = {
            fd["id"]: fd["name"]
            for fd in schemas[file_sids.get(f, cur_sid)]
        }.get(key_id)
        part = partitions.get(f) or {}
        slots = [
            v
            for e, v in zip(part.get("spec", ()), part.get("values", ()))
            if e["source"] == phys_key
            and _parse_transform(e["transform"]) == ("bucket", n)
        ]
        if not slots:
            raise ValueError(
                f"file {f} of {root} carries no bucket[{n}] tuple on "
                f"{key!r} — co-location is not provable; compact the table "
                f"under the bucketed spec first (rewrite_data_files)"
            )
        if slots[0] is None:
            # the fanout writer routes NULL keys to their own partition
            # file; an inner join matches them to nothing — skip the file
            continue
        buckets.setdefault(int(slots[0]), []).append(f)
    return n, buckets


def bucket_local_join(
    spark: SparkSession,
    root_a: str,
    root_b: str,
    key: str,
    snapshot_a: int | None = None,
    snapshot_b: int | None = None,
) -> DataFrame:
    """Inner-join two bucket-partitioned snapshot tables on *key* with
    ZERO data shuffle (see module docstring).  Output columns: all of A's,
    then B's minus the key; non-key name collisions raise."""
    sid_a = snapshot_a or current_snapshot_id(root_a)
    sid_b = snapshot_b or current_snapshot_id(root_b)
    if sid_a is None or sid_b is None:
        raise ValueError("both tables need a committed snapshot")
    man_a, man_b = read_manifest(root_a, sid_a), read_manifest(root_b, sid_b)
    n_a, buckets_a = _bucket_plan(root_a, man_a, key)
    n_b, buckets_b = _bucket_plan(root_b, man_b, key)
    if n_a != n_b:
        raise ValueError(
            f"bucket counts differ ({n_a} vs {n_b}) — co-location needs the "
            f"same bucket[N]; rewrite one table under the other's spec"
        )
    fields_a = StructType.fromJson(man_a["schema"]).fields
    fields_b = [
        f
        for f in StructType.fromJson(man_b["schema"]).fields
        if f.name != key
    ]
    dup = {f.name for f in fields_a} & {f.name for f in fields_b}
    if dup:
        raise ValueError(f"non-key column collision: {sorted(dup)}")
    out_schema = StructType(list(fields_a) + list(fields_b))
    names_a = [f.name for f in fields_a]
    names_b = [f.name for f in fields_b]

    def side_task(man, root, buckets, b):
        files = buckets.get(b, [])
        dels = man.get("delete_files", {})
        return json.dumps(
            [
                [f, _file_projection(man, f), dels.get(f, [])]
                for f in files
            ]
        )

    common = sorted(set(buckets_a) & set(buckets_b))  # inner: both sides
    tasks = [
        (
            b,
            _data_dir(root_a),
            side_task(man_a, root_a, buckets_a, b),
            _data_dir(root_b),
            side_task(man_b, root_b, buckets_b, b),
        )
        for b in common
    ]
    if not tasks:
        return spark.createDataFrame([], out_schema)
    n_parts = max(1, min(len(tasks), spark.sparkContext.defaultParallelism))
    plan = spark.createDataFrame(
        tasks,
        "bucket int, dir_a string, side_a string, dir_b string, side_b string",
    ).repartition(n_parts, "bucket")

    def kernel(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        def load_side(data_dir, side_json, names):
            frames = []
            for fname, proj, dfiles in json.loads(side_json):
                phys = [pn for pn, _ln in proj if pn is not None]
                tab = pq.read_table(
                    os.path.join(data_dir, fname), columns=phys
                )
                dead = _deleted_positions(data_dir, dfiles)
                if dead.size:
                    keep = np.ones(tab.num_rows, dtype=bool)
                    keep[dead[dead < tab.num_rows]] = False
                    tab = tab.filter(pa.array(keep))
                raw = tab.to_pandas()
                out = pd.DataFrame(index=raw.index)
                for pn, ln in proj:
                    if ln in names or ln == key:
                        out[ln] = raw[pn] if pn is not None else None
                frames.append(out)
            return pd.concat(frames, ignore_index=True)

        for pdf in batches:
            for _b, dir_a, side_a, dir_b, side_b in pdf.itertuples(
                index=False
            ):
                left = load_side(dir_a, side_a, names_a)
                right = load_side(dir_b, side_b, [key] + names_b)
                # SQL semantics: NULL keys join nothing (pandas merge
                # would happily match NaN == NaN)
                left = left[left[key].notna()]
                right = right[right[key].notna()]
                merged = left.merge(right, on=key, how="inner")
                yield merged[names_a + names_b]

    return plan.mapInPandas(kernel, schema=out_schema)
