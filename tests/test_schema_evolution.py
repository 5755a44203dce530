"""T197 schema evolution with field-id column mapping (Iceberg's core
evolution guarantees over the snapshot tables): metadata-only ALTERs,
rename without rewrite, int→long / float→double widening, and the
no-resurrection rule — drop + re-add a column's NAME yields a new field
id, so pre-drop rows read NULL forever.

Reference analogue: none (the reference reads one fixed-schema file per
run, pdor/pdor_unit.py); this pins the north-rule Iceberg input contract.
"""

import json

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    current_snapshot_id,
    delete_from,
    evolve_schema,
    merge_into,
    overwrite_snapshot,
    plan_scan,
    read_appends_between,
    read_manifest,
    read_snapshot,
    rewrite_data_files,
    table_schema,
)


def _base(spark, lo, hi, lang="en"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("int").alias("flag"),
        F.col("id").cast("int").alias("score"),
        F.lit(lang).alias("lang"),
    )


def _evolved_table(spark, root):
    """snap1 append(doc 0..9) → rename lang→language + widen score→long →
    drop flag → re-add flag int + add tokens → snap5 append(doc 10..14)."""
    append_snapshot(_base(spark, 0, 10).repartition(2), root)
    evolve_schema(root, rename={"lang": "language"}, widen={"score": "long"})
    evolve_schema(root, drop=["flag"])
    evolve_schema(root, add=[("flag", "int"), ("tokens", "long")])
    append_snapshot(
        spark.range(10, 15).select(
            F.col("id").alias("doc_id"),
            F.col("id").alias("score"),
            F.lit("de").alias("language"),
            F.lit(7).cast("int").alias("flag"),
            (F.col("id") * 3).alias("tokens"),
        ),
        root,
    )
    return root


class TestEvolveBasics:
    def test_rename_is_metadata_only_and_resolves_old_files(
        self, spark, tmp_path
    ):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 10), root)
        files_before = read_manifest(root, 1)["files"]
        sid = evolve_schema(root, rename={"lang": "language"})
        man = read_manifest(root, sid)
        assert man["operation"] == "alter-schema"
        assert man["files"] == files_before  # no data file touched
        cur = read_snapshot(spark, root)
        assert "language" in cur.columns and "lang" not in cur.columns
        assert {r["language"] for r in cur.collect()} == {"en"}
        # the field kept its id through the rename
        ids = {f["name"]: f["id"] for f in table_schema(root)}
        old_ids = {
            f["name"]: f["id"] for f in table_schema(root, snapshot_id=1)
        }
        assert ids["language"] == old_ids["lang"]

    def test_widen_reads_old_int_files_as_long(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 10), root)
        evolve_schema(root, widen={"score": "long"})
        cur = read_snapshot(spark, root)
        assert dict(cur.dtypes)["score"] == "bigint"
        assert sorted(r["score"] for r in cur.collect()) == list(range(10))
        # writes may still arrive with the NARROW physical type
        append_snapshot(_base(spark, 10, 12), root)
        assert sorted(
            r["score"] for r in read_snapshot(spark, root).collect()
        ) == list(range(12))

    def test_add_column_reads_null_then_values(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        evolve_schema(root, add=[("tokens", "long")])
        vals = {
            r["doc_id"]: r["tokens"]
            for r in read_snapshot(spark, root).collect()
        }
        assert all(v is None for v in vals.values())

    def test_drop_then_readd_never_resurrects(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 10), root)
        evolve_schema(root, drop=["flag"])
        assert "flag" not in read_snapshot(spark, root).columns
        evolve_schema(root, add=[("flag", "int")])
        # the data files still physically CONTAIN the old flag values, but
        # the new field id differs — every pre-drop row must read NULL
        flags = {
            r["doc_id"]: r["flag"]
            for r in read_snapshot(spark, root).collect()
        }
        assert all(v is None for v in flags.values())
        ids = {f["name"]: f["id"] for f in table_schema(root)}
        old = {f["name"]: f["id"] for f in table_schema(root, snapshot_id=1)}
        assert ids["flag"] != old["flag"]

    def test_time_travel_keeps_each_snapshots_schema(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        v1 = read_snapshot(spark, root, 1)
        assert v1.columns == ["doc_id", "flag", "score", "lang"]
        assert {r["flag"] for r in v1.collect()} == {0, 1}
        cur = read_snapshot(spark, root)
        assert cur.columns == ["doc_id", "score", "language", "flag", "tokens"]

    def test_noop_evolution_commits_nothing(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        assert evolve_schema(root) == 1
        assert current_snapshot_id(root) == 1

    def test_validation_errors(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        with pytest.raises(ValueError, match="no column"):
            evolve_schema(root, rename={"nope": "x"})
        with pytest.raises(ValueError, match="already exists"):
            evolve_schema(root, rename={"lang": "score"})
        with pytest.raises(ValueError, match="widen"):
            evolve_schema(root, widen={"lang": "long"})
        with pytest.raises(ValueError, match="widen"):
            evolve_schema(root, widen={"score": "string"})
        with pytest.raises(ValueError, match="already exists"):
            evolve_schema(root, add=[("score", "long")])
        with pytest.raises(ValueError, match="every column"):
            evolve_schema(root, drop=["doc_id", "flag", "score", "lang"])

    def test_incompatible_write_type_rejected(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        bad = spark.range(5, 6).select(
            F.col("id").alias("doc_id"),
            F.lit("oops").alias("flag"),  # int column written as string
            F.col("id").cast("int").alias("score"),
            F.lit("en").alias("lang"),
        )
        with pytest.raises(ValueError, match="incompatible"):
            append_snapshot(bad, root)


class TestEvolvedReadsAcrossOperators:
    def test_full_composition_matches_expected_rows(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        rows = {
            r["doc_id"]: r for r in read_snapshot(spark, root).collect()
        }
        assert rows[3]["language"] == "en" and rows[3]["flag"] is None
        assert rows[3]["score"] == 3 and rows[3]["tokens"] is None
        assert rows[12]["flag"] == 7 and rows[12]["tokens"] == 36

    def test_filter_prunes_through_rename(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        sid = current_snapshot_id(root)
        # 'language' bounds live under the files' write-time name 'lang' —
        # translation through the field id must still prune the en files
        kept, skipped = plan_scan(root, sid, [("language", "==", "de")])
        assert skipped, "rename broke manifest pruning"
        out = read_snapshot(spark, root, filters=[("language", "==", "de")])
        assert sorted(r["doc_id"] for r in out.collect()) == [10, 11, 12, 13, 14]

    def test_files_predating_a_column_prune_dead(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        sid = current_snapshot_id(root)
        kept, skipped = plan_scan(root, sid, [("tokens", ">=", 0)])
        # snap-1's two files predate tokens: NULL satisfies no comparison
        assert len(skipped) >= 2
        out = read_snapshot(spark, root, filters=[("tokens", ">=", 30)])
        assert sorted(r["doc_id"] for r in out.collect()) == [10, 11, 12, 13, 14]

    def test_delete_on_renamed_column_over_old_files(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        delete_from(spark, root, [("language", "==", "en"), ("doc_id", ">=", 8)])
        got = sorted(
            r["doc_id"] for r in read_snapshot(spark, root).collect()
        )
        assert got == [0, 1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 14]
        # masked old files take the Arrow merge-read — it must apply the
        # SAME field-id projection (language/score/flag resolve correctly)
        rows = {
            r["doc_id"]: r for r in read_snapshot(spark, root).collect()
        }
        assert rows[7]["language"] == "en" and rows[7]["flag"] is None

    def test_merge_into_evolved_masked_table(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        delete_from(spark, root, [("doc_id", ">=", 13)])
        src = spark.createDataFrame(
            [(0, 100, "fr", 1, 9), (99, 0, "fr", 0, 0)],
            "doc_id long, score long, language string, flag int, tokens long",
        )
        merge_into(spark, root, src, "doc_id")
        rows = {
            r["doc_id"]: r for r in read_snapshot(spark, root).collect()
        }
        assert rows[0]["language"] == "fr" and rows[99]["score"] == 0
        assert rows[1]["language"] == "en" and rows[1]["flag"] is None
        assert 13 not in rows and 14 not in rows

    def test_compaction_lands_at_logical_schema(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        before = sorted(
            tuple(r) for r in read_snapshot(spark, root).collect()
        )
        sid = rewrite_data_files(spark, root, target_files=1)
        after = sorted(tuple(r) for r in read_snapshot(spark, root).collect())
        assert before == after
        man = read_manifest(root, sid)
        # every rewritten file is physically at the current logical schema
        assert set(man["file_schemas"].values()) == {man["current_schema_id"]}

    def test_incremental_read_crosses_alter_commits(self, spark, tmp_path):
        root = _evolved_table(spark, str(tmp_path / "t"))
        inc = read_appends_between(spark, root, 1, 5)
        assert sorted(r["doc_id"] for r in inc.collect()) == [10, 11, 12, 13, 14]
        assert inc.columns == ["doc_id", "score", "language", "flag", "tokens"]

    def test_overwrite_keeps_ids_for_matching_names(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        evolve_schema(root, rename={"lang": "language"})
        ids = {f["name"]: f["id"] for f in table_schema(root)}
        overwrite_snapshot(
            spark.range(0, 3).select(
                F.col("id").alias("doc_id"),
                F.lit("fr").alias("language"),
            ),
            root,
        )
        ids2 = {f["name"]: f["id"] for f in table_schema(root)}
        assert ids2["doc_id"] == ids["doc_id"]
        assert ids2["language"] == ids["language"]
        assert set(ids2) == {"doc_id", "language"}

    def test_hidden_partition_spec_follows_rename(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(
            _base(spark, 0, 10),
            root,
            partition_spec=[{"source": "lang", "transform": "identity"}],
        )
        append_snapshot(_base(spark, 10, 15, lang="de"), root)
        evolve_schema(root, rename={"lang": "language"})
        # new writes partition under the RENAMED source name
        append_snapshot(
            spark.range(15, 20).select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 2).cast("int").alias("flag"),
                F.col("id").cast("int").alias("score"),
                F.lit("fr").alias("language"),
            ),
            root,
        )
        sid = current_snapshot_id(root)
        # pruning on the new name drops both the old-name-tuple files and
        # the new-name-tuple files that mismatch
        kept, skipped = plan_scan(root, sid, [("language", "==", "fr")])
        assert skipped
        out = read_snapshot(
            spark, root, filters=[("language", "==", "fr")]
        )
        assert sorted(r["doc_id"] for r in out.collect()) == list(range(15, 20))


class TestLegacyManifests:
    def test_pre_field_id_manifest_still_reads(self, spark, tmp_path):
        """A manifest written before field-id support (no schemas key)
        synthesizes positional ids and keeps byte-identical behavior."""
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 6), root)
        # strip the new keys, simulating a round-4 manifest on disk
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            _manifest_path,
        )

        p = _manifest_path(root, 1)
        man = json.load(open(p))
        for k in ("schemas", "current_schema_id", "file_schemas",
                  "last_field_id"):
            man.pop(k)
        json.dump(man, open(p, "w"))
        cur = read_snapshot(spark, root)
        assert sorted(r["doc_id"] for r in cur.collect()) == list(range(6))
        # and the table EVOLVES from the legacy state: ids synthesized 1..n
        evolve_schema(root, rename={"lang": "language"})
        cur = read_snapshot(spark, root)
        assert "language" in cur.columns
        assert {r["language"] for r in cur.collect()} == {"en"}


class TestMergeWhenClauses:
    """T206: Iceberg MERGE WHEN-clause variants + TIMESTAMP AS OF."""

    def _table(self, spark, tmp_path):
        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 10), root)
        src = spark.createDataFrame(
            [(8, 0, 800, "fr"), (9, 0, 900, "fr"),
             (20, 0, 2000, "fr"), (21, 0, 2100, "fr")],
            "doc_id long, flag int, score int, lang string",
        )
        return root, src

    def test_matched_delete_unmatched_insert(self, spark, tmp_path):
        root, src = self._table(spark, tmp_path)
        merge_into(spark, root, src, "doc_id",
                   when_matched="delete", when_not_matched="insert")
        rows = {r["doc_id"]: r["lang"]
                for r in read_snapshot(spark, root).collect()}
        assert sorted(rows) == [0, 1, 2, 3, 4, 5, 6, 7, 20, 21]
        assert rows[20] == "fr" and rows[0] == "en"

    def test_matched_update_unmatched_ignore(self, spark, tmp_path):
        root, src = self._table(spark, tmp_path)
        merge_into(spark, root, src, "doc_id",
                   when_matched="update", when_not_matched="ignore")
        rows = {r["doc_id"]: (r["score"], r["lang"])
                for r in read_snapshot(spark, root).collect()}
        assert sorted(rows) == list(range(10))
        assert rows[8] == (800, "fr") and rows[7] == (7, "en")

    def test_matched_delete_unmatched_ignore(self, spark, tmp_path):
        root, src = self._table(spark, tmp_path)
        merge_into(spark, root, src, "doc_id",
                   when_matched="delete", when_not_matched="ignore")
        assert sorted(
            r["doc_id"] for r in read_snapshot(spark, root).collect()
        ) == list(range(8))

    def test_clause_validation(self, spark, tmp_path):
        root, src = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match="when_matched"):
            merge_into(spark, root, src, "doc_id", when_matched="upsert")
        with pytest.raises(ValueError, match="when_not_matched"):
            merge_into(spark, root, src, "doc_id", when_not_matched="skip")

    def test_timestamp_as_of(self, spark, tmp_path):
        import time as _time

        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_manifest,
        )

        root = str(tmp_path / "t")
        append_snapshot(_base(spark, 0, 5), root)
        append_snapshot(_base(spark, 5, 8), root)
        t1 = read_manifest(root, 1)["ts"]
        t2 = read_manifest(root, 2)["ts"]
        mid = (t1 + t2) / 2
        assert read_snapshot(spark, root, as_of_ts=mid).count() == 5
        assert read_snapshot(
            spark, root, as_of_ts=_time.time()
        ).count() == 8
        with pytest.raises(ValueError, match="no retained snapshot"):
            read_snapshot(spark, root, as_of_ts=t1 - 10)
        with pytest.raises(ValueError, match="at most one"):
            read_snapshot(spark, root, snapshot_id=1, as_of_ts=mid)
