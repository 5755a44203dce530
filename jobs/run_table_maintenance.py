"""spark-submit entrypoint for snapshot-table maintenance — the standing
job a lakehouse operator schedules nightly over every Iceberg-style table
(sources/snapshots.py), composing the round-5 table features end to end:

    → retention DELETE (T173): merge-on-read position-delete commit for
      rows matching --delete-where (GDPR/TTL purges: masks land in
      del-*.parquet, data files are NEVER rewritten at delete time)
    → delete-mask compaction (T204, --compact-masks): merge each data
      file's stacked position-delete files into one, touching no data file
    → binpack partial compaction (T202, --small-file-bytes B): rewrite
      ONLY files under B bytes (plus masked files) — O(small files)
      routine maintenance for streaming-append tables, where the z-order
      rewrite below is the O(table) major compaction
    → bloom compute (T207, --bloom-col url): Puffin-style per-file bloom
      sidecars for point-lookup file skipping, one task per missing file
    → z-order compaction (T174, --cluster-by a,b): rewrite into
      --target-files files along the Morton curve, applying + purging all
      outstanding delete masks (Iceberg's major compaction) and making
      manifest min/max pruning effective on EVERY clustered column
    → expire_snapshots --keep-last N: drop old manifests, delete data
      files only they referenced (time travel retention window)
    → remove_orphan_files --orphans-older-than S: reclaim debris of
      writers that died before their manifest commit

Prints one JSON summary line (snapshot ids, files before/after, masks
purged, snapshots expired, orphans removed) — the shape a scheduler
ingests to alert on runaway table growth.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_table_maintenance.py \
        --table /data/tables/pages \
        [--delete-where 'fetch_ts<1700000000'] [--cluster-by doc_id,n_chars] \
        [--target-files 16] [--keep-last 3] [--orphans-older-than 3600] \
        [--master local[8]]

--delete-where takes ANDed conjuncts `col<op>literal` joined by '&'
(ops: == >= > <= <; int literals auto-typed, anything else a string).

Scale posture: the delete plans from manifest bounds and scans only the
filtered columns of candidate files; compaction is a range-partitioned
rewrite (no global sort); expiry/orphan sweeps are metadata-only plus
unlink calls — nothing collects row-sized data to the driver.
"""

from __future__ import annotations

import argparse
import json
import re


def parse_where(spec: str) -> list[tuple]:
    """'a>=5&b==x' → [("a", ">=", 5), ("b", "==", "x")]."""
    out: list[tuple] = []
    for part in spec.split("&"):
        m = re.fullmatch(r"\s*(\w+)\s*(==|>=|<=|>|<)\s*(.+?)\s*", part)
        if not m:
            raise ValueError(f"bad --delete-where conjunct {part!r}")
        col, op, lit = m.groups()
        try:
            val: object = int(lit)
        except ValueError:
            val = lit
        out.append((col, op, val))
    return out


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--table", required=True,
                        help="snapshot-table root (init_table layout)")
    parser.add_argument("--delete-where", default=None,
                        help="ANDed conjuncts col<op>lit joined by '&'")
    parser.add_argument("--compact-masks", action="store_true",
                        help="merge stacked position-delete files (one per "
                        "data file) without touching data files")
    parser.add_argument("--small-file-bytes", type=int, default=None,
                        help="binpack-compact only data files under this "
                        "many bytes (partial compaction)")
    parser.add_argument("--bloom-col", default=None,
                        help="build per-file bloom sidecars for this column "
                        "(point-lookup file skipping)")
    parser.add_argument("--cluster-by", default=None,
                        help="comma-separated numeric columns to z-order by")
    parser.add_argument("--target-files", type=int, default=None,
                        help="compact to this many files (default: skip "
                        "compaction unless --cluster-by is given, then 16)")
    parser.add_argument("--keep-last", type=int, default=None,
                        help="expire all but the newest N snapshots")
    parser.add_argument("--orphans-older-than", type=float, default=None,
                        help="seconds; remove unreferenced data files older "
                        "than this")
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pdf_drawing_ocr_recognition_spark.plans.session import build_session
    from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
        current_snapshot_id,
        delete_from,
        expire_snapshots,
        read_manifest,
        remove_orphan_files,
        rewrite_data_files,
        rewrite_position_deletes,
        rewrite_small_files,
    )

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-table-maintenance", master=args.master)

    summary: dict[str, object] = {"table": args.table}
    sid = current_snapshot_id(args.table)
    if sid is None:
        raise SystemExit(f"no committed snapshot at {args.table}")
    man = read_manifest(args.table, sid)
    summary["snapshot_before"] = sid
    summary["files_before"] = len(man["files"])
    summary["masked_files_before"] = len(man.get("delete_files", {}))

    if args.delete_where:
        sid = delete_from(spark, args.table, parse_where(args.delete_where))
        summary["delete_snapshot"] = sid
        summary["masked_files_after_delete"] = len(
            read_manifest(args.table, sid).get("delete_files", {})
        )

    if args.compact_masks:
        sid = rewrite_position_deletes(spark, args.table)
        summary["mask_compaction_snapshot"] = sid
        summary["masks_after_mask_compaction"] = sum(
            len(v)
            for v in read_manifest(args.table, sid)
            .get("delete_files", {})
            .values()
        )

    if args.small_file_bytes:
        sid = rewrite_small_files(
            spark, args.table, target_bytes=args.small_file_bytes
        )
        man = read_manifest(args.table, sid)
        summary["partial_compaction_snapshot"] = sid
        summary["files_after_partial_compaction"] = len(man["files"])

    cluster_by = (
        [c.strip() for c in args.cluster_by.split(",") if c.strip()]
        if args.cluster_by
        else None
    )
    if cluster_by or args.target_files:
        target = args.target_files or 16
        sid = rewrite_data_files(
            spark, args.table, target_files=target, cluster_by=cluster_by
        )
        man = read_manifest(args.table, sid)
        summary["compaction_snapshot"] = sid
        summary["files_after_compaction"] = len(man["files"])
        summary["masks_after_compaction"] = len(man.get("delete_files", {}))

    if args.bloom_col:
        from pdf_drawing_ocr_recognition_spark.sources.file_blooms import (
            compute_file_blooms,
        )

        sid = compute_file_blooms(spark, args.table, args.bloom_col)
        summary["bloom_snapshot"] = sid
        summary["bloom_files"] = len(
            read_manifest(args.table, sid).get("blooms", {})
        )

    if args.keep_last:
        summary["expiry"] = expire_snapshots(args.table, args.keep_last)
    if args.orphans_older_than is not None:
        summary["orphans_removed"] = remove_orphan_files(
            args.table, older_than_s=args.orphans_older_than
        )

    summary["snapshot_after"] = current_snapshot_id(args.table)
    print("table maintenance complete: " + json.dumps(summary, sort_keys=True))
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
