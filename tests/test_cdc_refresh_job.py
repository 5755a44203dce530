"""End-to-end CDC-refresh job (jobs/run_cdc_refresh.py): maintained IVM
views + dedup index brought to the corpus's current snapshot in one run,
summary JSON checked, second run a cheap no-op at the same snapshot."""

import json

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
    append_snapshot,
    delete_where_eq,
)


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
        (F.col("id") * 3).alias("n_chars"),
        F.concat(F.lit("document body number "),
                 F.col("id").cast("string")).alias("text"),
    )


class TestParseView:
    def test_spec(self):
        from jobs.run_cdc_refresh import parse_view

        name, groups, aggs = parse_view(
            "lang_stats:lang:count=n_docs,sum:n_chars=sum_chars,"
            "max:n_chars=max_chars"
        )
        assert name == "lang_stats" and groups == ["lang"]
        assert aggs == {
            "n_docs": ("count",),
            "sum_chars": ("sum", "n_chars"),
            "max_chars": ("max", "n_chars"),
        }
        with pytest.raises(ValueError, match="bad agg entry"):
            parse_view("v:lang:avg:n_chars=a")
        with pytest.raises(ValueError, match="bad --view"):
            parse_view("just_a_name")


class TestCdcRefreshJob:
    def test_full_cycle(self, spark, tmp_path, capsys):
        from jobs.run_cdc_refresh import main

        root = str(tmp_path / "corpus")
        views = str(tmp_path / "views")
        index = str(tmp_path / "index")
        docs = _docs(spark)
        append_snapshot(docs.filter("doc_id < 200"), root)
        argv = [
            "--table", root,
            "--view", "lang_stats:lang:count=n_docs,sum:n_chars=sum_chars",
            "--views-dir", views,
            "--dedup-index", index,
        ]
        assert main(argv, spark=spark) == 0
        out1 = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1].split(
                "cdc refresh complete: "
            )[1]
        )
        assert out1["folded_to"] == 1
        assert out1["view_groups"]["lang_stats"] == 4
        assert out1["dedup_index"]["digests_watermark"] == 1
        assert out1["dedup_index"]["digest_rows"] == 200

        # corpus moves: append + eq-delete, then one refresh folds both
        append_snapshot(docs.filter("doc_id >= 200"), root)
        delete_where_eq(
            spark, root, docs.filter("doc_id % 10 = 3").select("doc_id")
        )
        assert main(argv, spark=spark) == 0
        out2 = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1].split(
                "cdc refresh complete: "
            )[1]
        )
        assert out2["folded_to"] == 3
        assert out2["dedup_index"]["digest_rows"] == 270
        # the maintained view matches a direct aggregate
        from pdf_drawing_ocr_recognition_spark.operators.ivm import read_view
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
        )

        got = {
            r["lang"]: (r["n_docs"], r["sum_chars"])
            for r in read_view(spark, f"{views}/lang_stats").collect()
        }
        exp = {
            r["lang"]: (r["n"], r["s"])
            for r in read_snapshot(spark, root)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").cast("long").alias("s"),
            )
            .collect()
        }
        assert got == exp
