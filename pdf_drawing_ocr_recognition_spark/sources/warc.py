"""WARC source: crawl segment files → the pages-table schema.

``binaryFile`` scans the ``.warc`` segments partition-parallel (one split
per file — WARC files are not random-access splittable without an index,
which is why production pipelines keep segments at ~1 GB); an Arrow
``mapInPandas`` stage runs the pure-Python record splitter
(``kernel/warc.py``) per file and emits ``PAGES_SCHEMA`` rows.  Downstream,
the extraction pipeline is identical for a parquet corpus, a JSONL drop, a
raw-file directory, or WARC segments — the north-rule source matrix.

Scale posture: the kernel stage is narrow (no shuffle); per-file stats are
surfaced through an ``Observation``-free accumulator-less design — counts
are plain columns on a sidecar query (``warc_scan_stats``) so they aggregate
map-side like any other metric.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.kernel.warc import split_warc_records

_OUT_SCHEMA = (
    "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
)
_STATS_SCHEMA = (
    "path STRING, n_records LONG, n_responses LONG, n_skipped LONG, n_bad LONG"
)


def _split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html")}
        for content in pdf["content"]:
            rows, _ = split_warc_records(bytes(content))
            for r in rows:
                out["url"].append(r["url"])
                out["warc_ts"].append(r["date"])
                out["html"].append(r["html"])
        yield pd.DataFrame(
            {
                "url": out["url"],
                "warc_ts": pd.to_datetime(
                    out["warc_ts"], format="ISO8601", errors="coerce", utc=True
                ).tz_localize(None),
                "html": out["html"],
                "text": "",
                "lang": "",
            }
        )


def read_warc(
    spark: SparkSession, path_glob: str, default_lang: str = ""
) -> DataFrame:
    """Read WARC segments into the pages schema (response records only)."""
    raw = spark.read.format("binaryFile").load(path_glob).select("content")
    pages = raw.mapInPandas(_split_batches, schema=_OUT_SCHEMA)
    if default_lang:
        pages = pages.withColumn("lang", F.lit(default_lang))
    return pages


def _stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            _, stats = split_warc_records(bytes(content))
            rows.append({"path": path, **stats})
        yield pd.DataFrame(
            rows,
            columns=["path", "n_records", "n_responses", "n_skipped", "n_bad"],
        )


def warc_scan_stats(spark: SparkSession, path_glob: str) -> DataFrame:
    """Per-segment ingest audit (records / responses / skipped / bad) — the
    source-health report a crawl ingest emits next to the landed rows."""
    raw = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return raw.mapInPandas(_stats_batches, schema=_STATS_SCHEMA)
