"""Streaming variant: AvailableNow drain must equal the batch pipeline."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS


class TestStreamingExtraction:
    def test_stream_equals_batch(self, spark, pages_small, tmp_path):
        from pdf_drawing_ocr_recognition_spark.operators.extract import extract_pages
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            run_stream_to_parquet,
        )

        out = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "ckpt")
        run_stream_to_parquet(spark, pages_small, PATTERNS, out, ckpt)

        streamed = {
            r["url"]: r["extracted_text"]
            for r in spark.read.parquet(out)
            .filter(F.col("status") == "ok")
            .select("url", "extracted_text")
            .collect()
        }
        pages = spark.read.parquet(pages_small).filter(
            F.col("lang").isin("en", "zh", "de")
        )
        batch = {
            r["url"]: r["extracted_text"]
            for r in extract_pages(pages, PATTERNS)
            .filter(F.col("status") == "ok")
            .select("url", "extracted_text")
            .collect()
        }
        assert streamed == batch
        assert len(streamed) > 100

    def test_windowed_counts_batch_vs_plain_agg(self, spark, sf_dir):
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            windowed_event_counts,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {
            (r["window_start_us"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in windowed_event_counts(ev).collect()
        }
        want = {
            (r["us"], r["event_type"]): (r["n"], r["cents"])
            for r in ev.groupBy(
                F.unix_micros(
                    F.date_trunc("hour", F.col("ts").cast("timestamp"))
                ).alias("us"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            .collect()
        }
        assert got == want
