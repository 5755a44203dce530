"""spark-submit entrypoint for CDC-driven derived-state refresh — the
job a pipeline schedules AFTER each corpus-table commit batch, bringing
every downstream artifact up to the table's current snapshot by folding
the T210 changelog instead of recomputing the corpus:

    → IVM aggregate views (T212, --view NAME:group:aggspec ...): each
      named view folds only the changelog delta (count/sum) plus a
      recompute bounded to the dirty groups (min/max) — O(changes +
      groups), never O(table)
    → dedup index (T216, --dedup-index DIR): the (digest, key) +
      (band_key, key) relations follow the corpus — insert deltas hash
      into append commits, corpus deletions land as one O(keys)
      equality-delete commit, per-relation watermarks make replays
      idempotent

Prints one JSON summary line (snapshot folded to, per-view group
counts, index watermarks) — the shape a scheduler ingests.

    spark-submit --py-files dist/pdor_spark.zip jobs/run_cdc_refresh.py \
        --table /data/tables/docs \
        --view lang_stats:lang:count=n_docs,sum:n_chars=sum_chars \
        --views-dir /data/views \
        [--dedup-index /data/indexes/docs_dedup] \
        [--text-col text] [--key-col doc_id] [--master local[8]]

--view syntax: NAME:GROUPCOLS:AGGSPECS where GROUPCOLS is
comma-separated and AGGSPECS is comma-separated entries of
``count=OUT`` / ``sum:COL=OUT`` / ``min:COL=OUT`` / ``max:COL=OUT``.

Scale posture: every fold is bounded by the delta (changelog rows +
dirty groups + deleted keys); the corpus's text is hashed only for
inserted rows; nothing collects row-sized data to the driver.
"""

from __future__ import annotations

import argparse
import json


def parse_view(spec: str) -> tuple[str, list[str], dict]:
    """'lang_stats:lang:count=n_docs,sum:n_chars=sum_chars' →
    (name, [group cols], aggs dict for maintain_agg)."""
    try:
        name, groups, aggspecs = spec.split(":", 2)
    except ValueError:
        raise ValueError(f"bad --view spec {spec!r}") from None
    aggs: dict = {}
    for entry in aggspecs.split(","):
        lhs, _, out = entry.partition("=")
        if not out:
            raise ValueError(f"bad agg entry {entry!r} in --view {name!r}")
        kind, _, col = lhs.partition(":")
        if kind == "count" and not col:
            aggs[out] = ("count",)
        elif kind in ("sum", "min", "max") and col:
            aggs[out] = (kind, col)
        else:
            raise ValueError(f"bad agg entry {entry!r} in --view {name!r}")
    return name, [g for g in groups.split(",") if g], aggs


def main(argv=None, spark=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--table", required=True,
                        help="corpus snapshot-table root")
    parser.add_argument("--view", action="append", default=[],
                        help="NAME:GROUPCOLS:AGGSPECS (repeatable)")
    parser.add_argument("--views-dir", default=None,
                        help="directory holding the maintained views "
                        "(required with --view)")
    parser.add_argument("--dedup-index", default=None,
                        help="root of the maintained dedup index")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--key-col", default="doc_id")
    parser.add_argument("--rebuild", default="never",
                        choices=["never", "auto"],
                        help="fall back to full recompute when the "
                        "changelog range is expired")
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)
    if args.view and not args.views_dir:
        raise SystemExit("--view requires --views-dir")

    from pdf_drawing_ocr_recognition_spark.operators.cdc_dedup import (
        _maintained_to,
        maintain_dedup_index,
    )
    from pdf_drawing_ocr_recognition_spark.operators.ivm import maintain_agg
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session
    from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
        current_snapshot_id,
    )

    own_session = spark is None
    if own_session:
        spark = build_session(app="pdor-cdc-refresh", master=args.master)

    upto = current_snapshot_id(args.table)
    if upto is None:
        raise SystemExit(f"no committed snapshot at {args.table}")
    summary: dict[str, object] = {"table": args.table, "folded_to": upto}

    views_out = {}
    for spec in args.view:
        name, groups, aggs = parse_view(spec)
        view_dir = f"{args.views_dir}/{name}"
        df = maintain_agg(
            spark, args.table, view_dir, groups, aggs,
            upto=upto, rebuild=args.rebuild,
        )
        views_out[name] = df.count()
    if views_out:
        summary["view_groups"] = views_out

    if args.dedup_index:
        dig, bands = maintain_dedup_index(
            spark, args.table, args.dedup_index, upto=upto,
            text_col=args.text_col, key_col=args.key_col,
        )
        summary["dedup_index"] = {
            "digests_watermark": _maintained_to(f"{args.dedup_index}/digests"),
            "bands_watermark": _maintained_to(f"{args.dedup_index}/bands"),
            "digest_rows": dig.count(),
        }

    print(f"cdc refresh complete: {json.dumps(summary)}")
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
