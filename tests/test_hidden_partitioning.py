"""Hidden partitioning for the snapshot tables (Iceberg partition
transforms): identity / bucket[N] / truncate[W] / days, derived at write
time (the user never materializes a partition column), recorded per file
SELF-DESCRIBED with the spec it was written under, and pruned at plan
time from manifest JSON alone.

Contracts pinned here:
- round-trip: a partitioned write reads back exactly (schema has no
  partition columns — they're hidden);
- pruning is provable-only: bucket prunes on equality only, every
  transform keeps files it can't decide (nulls, type mismatches, files
  written without a spec);
- prune ≡ filter: read_snapshot(filters=...) equals the unpruned
  read + row-wise filter for every transform/op pair;
- spec evolution: appending under a NEW spec never invalidates old
  files' pruning (each file prunes under its own recorded spec);
- merge/compaction carry or rewrite tuples correctly.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    _bucket_py,
    _parse_transform,
    _partition_prunes,
    append_snapshot,
    merge_into,
    overwrite_snapshot,
    plan_scan,
    read_manifest,
    read_snapshot,
    rewrite_data_files,
)

HOSTS = ["a.example", "b.example", "c.example", "d.example"]


def _events(spark, lo, hi, n_hosts=4):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(*[F.lit(h) for h in HOSTS[:n_hosts]]),
            (F.col("id") % n_hosts + 1).cast("int"),
        ).alias("host"),
        (F.col("id") * 10).alias("score"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-"),
                F.lpad((F.col("id") % 9 + 1).cast("string"), 2, "0"),
                F.lit(" 12:00:00"),
            )
        ).alias("fetch_ts"),
    )


def _rows(df):
    return sorted(
        (r["event_id"], r["host"], r["score"], r["fetch_ts"])
        for r in df.collect()
    )


SPEC = [
    {"source": "host", "transform": "bucket[4]"},
    {"source": "fetch_ts", "transform": "days"},
]


class TestWriteAndRoundTrip:
    def test_partitioned_write_reads_back_exactly(self, spark, tmp_path):
        root = str(tmp_path / "t")
        df = _events(spark, 0, 200)
        append_snapshot(df.repartition(4), root, partition_spec=SPEC)
        out = read_snapshot(spark, root)
        # hidden: no partition columns appear in the table schema
        assert out.columns == ["event_id", "host", "score", "fetch_ts"]
        assert _rows(out) == _rows(df)

    def test_manifest_records_spec_and_per_file_tuples(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 200), root, partition_spec=SPEC)
        man = read_manifest(root, 1)
        assert man["partition_spec"] == SPEC
        assert set(man["partitions"]) == set(man["files"])
        for rec in man["partitions"].values():
            assert rec["spec"] == SPEC
            bucket, day = rec["values"]
            assert 0 <= bucket < 4
            assert day.startswith("2024-03-")
        # more than one partition tuple actually fanned out
        tuples = {tuple(r["values"]) for r in man["partitions"].values()}
        assert len(tuples) > 4

    def test_inherit_spec_on_append(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 50), root, partition_spec=SPEC)
        append_snapshot(_events(spark, 50, 100), root)  # no spec passed
        man = read_manifest(root, 2)
        assert man["partition_spec"] == SPEC
        assert set(man["partitions"]) == set(man["files"])


class TestPruning:
    def test_bucket_equality_prunes_other_buckets(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 400), root, partition_spec=SPEC)
        kept, skipped = plan_scan(root, 1, [("host", "==", "a.example")])
        assert skipped  # pruning actually removed files
        want = _bucket_py("a.example", 4)
        man = read_manifest(root, 1)
        for f in kept:
            assert man["partitions"][f]["values"][0] == want

    def test_bucket_prunes_only_on_equality(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 100), root, partition_spec=SPEC)
        kept, skipped = plan_scan(root, 1, [("host", ">=", "a.example")])
        assert skipped == []  # range over a bucket transform can't prune

    def test_days_range_prunes(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 400), root, partition_spec=SPEC)
        cut = datetime.datetime(2024, 3, 7)
        kept, skipped = plan_scan(root, 1, [("fetch_ts", ">=", cut)])
        assert skipped
        man = read_manifest(root, 1)
        for f in kept:
            assert man["partitions"][f]["values"][1] >= "2024-03-07"
        for f in skipped:
            assert man["partitions"][f]["values"][1] < "2024-03-07"

    @pytest.mark.parametrize(
        "filters",
        [
            [("host", "==", "b.example")],
            [("fetch_ts", ">=", datetime.datetime(2024, 3, 6))],
            [("fetch_ts", "<", datetime.datetime(2024, 3, 4))],
            [
                ("host", "==", "c.example"),
                ("fetch_ts", "<=", datetime.datetime(2024, 3, 8, 23)),
            ],
            [("host", "==", "no-such.example")],
        ],
    )
    def test_prune_equals_filter(self, spark, tmp_path, filters):
        root = str(tmp_path / "t")
        df = _events(spark, 0, 300)
        append_snapshot(df.repartition(3), root, partition_spec=SPEC)
        pruned = read_snapshot(spark, root, filters=filters)
        full = read_snapshot(spark, root)
        for col, op, val in filters:
            c = F.col(col)
            full = full.filter(
                {"==": c == val, ">=": c >= val, ">": c > val,
                 "<=": c <= val, "<": c < val}[op]
            )
        assert _rows(pruned) == _rows(full)

    def test_unpartitioned_files_never_partition_pruned(self, spark, tmp_path):
        # mixed table: snapshot 1 has no spec, snapshot 2 evolves into one
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 100).coalesce(1), root)
        append_snapshot(
            _events(spark, 100, 200), root, partition_spec=SPEC
        )
        man = read_manifest(root, 2)
        old = [f for f in man["files"] if f not in man["partitions"]]
        assert old  # the unpartitioned file is still in the table
        kept, _ = plan_scan(root, 2, [("host", "==", "a.example")])
        assert set(old) <= set(kept)  # conservative: kept, stats aside
        # and values stay exact through the mixed scan
        got = read_snapshot(
            spark, root, filters=[("host", "==", "a.example")]
        )
        want = (
            _events(spark, 0, 200).filter(F.col("host") == "a.example")
        )
        assert _rows(got) == _rows(want)


class TestTransforms:
    def test_truncate_int_and_identity(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spec = [
            {"source": "score", "transform": "truncate[1000]"},
            {"source": "host", "transform": "identity"},
        ]
        append_snapshot(_events(spark, 0, 400), root, partition_spec=spec)
        kept, skipped = plan_scan(root, 1, [("score", ">=", 3000)])
        assert skipped
        man = read_manifest(root, 1)
        for f in skipped:
            assert man["partitions"][f]["values"][0] + 999 < 3000
        kept, skipped = plan_scan(root, 1, [("host", "==", "d.example")])
        man = read_manifest(root, 1)
        for f in kept:
            assert man["partitions"][f]["values"][1] == "d.example"
        got = read_snapshot(
            spark, root,
            filters=[("score", ">=", 3000), ("host", "==", "d.example")],
        )
        want = _events(spark, 0, 400).filter(
            (F.col("score") >= 3000) & (F.col("host") == "d.example")
        )
        assert _rows(got) == _rows(want)

    def test_truncate_string_prefix(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spec = [{"source": "host", "transform": "truncate[1]"}]
        append_snapshot(_events(spark, 0, 100), root, partition_spec=spec)
        kept, skipped = plan_scan(root, 1, [("host", "==", "b.example")])
        assert skipped
        man = read_manifest(root, 1)
        assert {man["partitions"][f]["values"][0] for f in kept} == {"b"}

    def test_null_partition_value_is_kept(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spec = [{"source": "host", "transform": "bucket[4]"}]
        df = _events(spark, 0, 40).withColumn(
            "host",
            F.when(F.col("event_id") % 2 == 0, F.col("host")),
        )
        append_snapshot(df, root, partition_spec=spec)
        got = read_snapshot(
            spark, root, filters=[("host", "==", "a.example")]
        )
        want = df.filter(F.col("host") == "a.example")
        assert _rows(got) == _rows(want)
        # the null-tuple file survives every plan (never provably dead)
        man = read_manifest(root, 1)
        nulls = [
            f
            for f, rec in man["partitions"].items()
            if rec["values"][0] is None
        ]
        assert nulls
        kept, _ = plan_scan(root, 1, [("host", "==", "zz.example")])
        assert set(nulls) <= set(kept)

    def test_bucket_twin_matches_writer(self, spark, tmp_path):
        # the planner-side crc32 bucket must equal the writer expression's
        root = str(tmp_path / "t")
        spec = [{"source": "host", "transform": "bucket[16]"}]
        append_snapshot(_events(spark, 0, 200), root, partition_spec=spec)
        man = read_manifest(root, 1)
        seen = {}  # bucket -> hosts found in that file
        for f, rec in man["partitions"].items():
            df = read_snapshot(spark, root, 1).limit(0)  # schema only
        for f, rec in man["partitions"].items():
            b = rec["values"][0]
            import os

            import pyarrow.parquet as pq

            tab = pq.read_table(
                os.path.join(root, "data", f), columns=["host"]
            )
            for h in set(tab.column("host").to_pylist()):
                assert _bucket_py(h, 16) == b

    def test_bad_transform_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="unknown partition transform"):
            _parse_transform("hash[4]")
        with pytest.raises(ValueError, match="width must be"):
            _parse_transform("bucket[0]")
        root = str(tmp_path / "t")
        with pytest.raises(ValueError, match="days partition needs"):
            append_snapshot(
                _events(spark, 0, 10),
                root,
                partition_spec=[{"source": "host", "transform": "days"}],
            )


class TestEvolutionAndMaintenance:
    def test_spec_evolution_keeps_old_files_pruning(self, spark, tmp_path):
        root = str(tmp_path / "t")
        spec1 = [{"source": "host", "transform": "bucket[4]"}]
        spec2 = [{"source": "score", "transform": "truncate[1000]"}]
        append_snapshot(_events(spark, 0, 100), root, partition_spec=spec1)
        append_snapshot(
            _events(spark, 100, 200), root, partition_spec=spec2
        )
        man = read_manifest(root, 2)
        assert man["partition_spec"] == spec2
        specs = {tuple(t["transform"] for t in rec["spec"])
                 for rec in man["partitions"].values()}
        assert specs == {("bucket[4]",), ("truncate[1000]",)}
        # a host filter prunes ONLY the spec1 files; score ONLY spec2
        kept, skipped = plan_scan(root, 2, [("host", "==", "a.example")])
        for f in skipped:
            assert man["partitions"][f]["spec"] == spec1
        # values stay exact across the evolved table
        got = read_snapshot(
            spark, root, filters=[("host", "==", "a.example")]
        )
        want = _events(spark, 0, 200).filter(F.col("host") == "a.example")
        assert _rows(got) == _rows(want)

    def test_merge_into_keeps_untouched_tuples(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 200), root, partition_spec=SPEC)
        src = _events(spark, 0, 10).withColumn(
            "score", F.col("score") + 1_000_000
        )
        merge_into(spark, root, src, "event_id")
        man = read_manifest(root, 2)
        # every file in the merged snapshot still carries a tuple
        assert set(man["partitions"]) == set(man["files"])
        got = read_snapshot(
            spark, root, filters=[("host", "==", "a.example")]
        )
        merged = (
            _events(spark, 0, 200)
            .join(src.select("event_id"), "event_id", "left_anti")
            .unionByName(src)
        )
        want = merged.filter(F.col("host") == "a.example")
        assert _rows(got) == _rows(want)

    def test_compaction_rewrites_under_current_spec(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 100), root, partition_spec=SPEC)
        append_snapshot(_events(spark, 100, 200), root)
        rewrite_data_files(spark, root, target_files=1)
        man = read_manifest(root, 3)
        assert man["operation"] == "replace"
        assert set(man["partitions"]) == set(man["files"])
        got = read_snapshot(
            spark, root, filters=[("host", "==", "b.example")]
        )
        want = _events(spark, 0, 200).filter(F.col("host") == "b.example")
        assert _rows(got) == _rows(want)

    def test_overwrite_inherits_then_evolves(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_events(spark, 0, 50), root, partition_spec=SPEC)
        overwrite_snapshot(_events(spark, 50, 80), root)
        assert read_manifest(root, 2)["partition_spec"] == SPEC
        overwrite_snapshot(
            _events(spark, 80, 90), root,
            partition_spec=[{"source": "host", "transform": "identity"}],
        )
        man = read_manifest(root, 3)
        assert man["partition_spec"] == [
            {"source": "host", "transform": "identity"}
        ]


class TestPrunePredicateUnit:
    # provable-only decisions, transform by transform
    def test_identity(self):
        e = {"source": "x", "transform": "identity"}
        assert _partition_prunes(e, 5, "==", 7)
        assert not _partition_prunes(e, 5, "==", 5)
        assert _partition_prunes(e, 5, ">", 5)
        assert not _partition_prunes(e, 5, ">=", 5)
        assert not _partition_prunes(e, 5, "==", "5")  # type mismatch: keep
        assert not _partition_prunes(e, None, "==", 5)  # null: keep

    def test_truncate_int_covers_bin(self):
        e = {"source": "x", "transform": "truncate[100]"}
        assert not _partition_prunes(e, 300, "==", 399)  # in [300, 399]
        assert _partition_prunes(e, 300, "==", 400)
        assert _partition_prunes(e, 300, "<", 300)
        assert not _partition_prunes(e, 300, "<=", 300)
        assert _partition_prunes(e, 300, ">", 399)
        assert not _partition_prunes(e, 300, ">", 398)

    def test_days_boundaries(self):
        e = {"source": "ts", "transform": "days"}
        d = datetime.datetime
        assert _partition_prunes(e, "2024-03-05", ">=", d(2024, 3, 6))
        assert not _partition_prunes(e, "2024-03-05", ">=", d(2024, 3, 5, 12))
        assert _partition_prunes(e, "2024-03-05", "<=", d(2024, 3, 4, 23))
        assert not _partition_prunes(e, "2024-03-05", "<=", d(2024, 3, 5))
        assert _partition_prunes(e, "2024-03-05", "==", d(2024, 3, 6))
        assert not _partition_prunes(e, "2024-03-05", "==", d(2024, 3, 5, 9))

    def test_bucket_only_equality(self):
        e = {"source": "x", "transform": "bucket[8]"}
        v = "some-host.example"
        b = _bucket_py(v, 8)
        assert not _partition_prunes(e, b, "==", v)
        assert _partition_prunes(e, (b + 1) % 8, "==", v)
        assert not _partition_prunes(e, (b + 1) % 8, ">=", v)
