"""Pages-table source (BASELINE.json input_hint schema).

In production this is an Iceberg table (``spark.read.table``) partitioned by
``days(warc_ts)``; in this sandbox it is a directory of parquet parts with the
identical schema, so every relational property (predicate pushdown into the
scan, column pruning of the wide ``html`` column, partition-file splits)
behaves the same.  The reference's analogue is the PDF file path + existence
guard (pdor/pdor_unit.py:97-100) — here existence is the scan itself and the
per-row guard is an ``html IS NOT NULL`` filter the caller applies when wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def read_pages(
    spark: SparkSession,
    path: str,
    langs: tuple[str, ...] | None = None,
    since=None,
    until=None,
) -> DataFrame:
    """Read the pages table with pushable filters.

    lang/time predicates are plain column filters so Catalyst pushes them into
    the parquet scan (visible as PushedFilters in .explain("formatted")).
    """
    df = spark.read.schema(PAGES_SCHEMA).parquet(path)
    if langs:
        df = df.filter(F.col("lang").isin(*langs))
    if since is not None:
        df = df.filter(F.col("warc_ts") >= F.lit(since))
    if until is not None:
        df = df.filter(F.col("warc_ts") < F.lit(until))
    return df


def read_pages_partitioned(
    spark: SparkSession,
    path: str,
    days: tuple[str, ...] | None = None,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Read a ``day=YYYY-MM-DD``-partitioned pages table with partition pruning.

    The ``day`` predicate binds to the Hive partition column, so Catalyst
    prunes whole directories at planning time (``PartitionFilters`` in the
    scan node — asserted by tools/explain_plans.py); the ``lang`` predicate
    is an ordinary pushed data filter.  This is the plain-parquet stand-in
    for Iceberg's ``days(warc_ts)`` hidden partitioning named in SURVEY.md
    §1.2 — on Iceberg the same pruning falls out of a ``warc_ts`` range
    predicate with no explicit ``day`` column.
    """
    df = spark.read.schema(PAGES_SCHEMA + ", day STRING").parquet(path)
    if days:
        df = df.filter(F.col("day").isin(*days))
    if langs:
        df = df.filter(F.col("lang").isin(*langs))
    return df


def read_raw_files(
    spark: SparkSession,
    path_glob: str,
    default_lang: str = "en",
) -> DataFrame:
    """Raw-file source: ``binaryFile`` datasource → the pages-table schema.

    The reference consumes loose files by path (existence-guarded open,
    pdor/pdor_unit.py:97-109); the Spark analogue is the built-in
    ``binaryFile`` format, which scans a directory/glob into
    (path, modificationTime, length, content) with partition-parallel reads
    and pushable path filters.  Rows are mapped onto the input_hint schema —
    ``url`` = file URI, ``warc_ts`` = file mtime, ``html`` = raw bytes — so
    the same extraction pipeline runs unchanged over a parquet corpus or a
    directory of scraped files.

    Caveat (measured): the binaryFile datasource SKIPS zero-length files
    (they yield no scan splits), so empty files never reach the pipeline's
    'empty'-status path — unlike a parquet corpus row with empty ``html``.
    The reference would raise PdorPDFReadError for such a file
    (pdor/pdor_unit.py:104-109); audit missing-file expectations upstream.
    """
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(default_lang).alias("lang"),
    )


def read_pages_jsonl(
    spark: SparkSession,
    path: str,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """JSONL pages source (the WARC-sidecar / CC-index interchange shape):
    one JSON object per line with the input-hint fields, ``html`` carried as
    base64 (JSON cannot hold raw bytes).

    An explicit schema keeps the reader single-pass (no sampling/inference
    job over 100 TB) and makes malformed lines surface as nulls instead of
    schema drift; lang filtering is a pushed data filter like the parquet
    path.  Decodes to the exact ``PAGES_SCHEMA`` shape so every downstream
    operator runs unchanged.
    """
    raw = spark.read.schema(
        "url STRING, warc_ts TIMESTAMP, html_b64 STRING, text STRING, lang STRING"
    ).json(path)
    df = raw.select(
        "url",
        "warc_ts",
        F.unbase64(F.col("html_b64")).alias("html"),
        "text",
        "lang",
    )
    if langs:
        df = df.filter(F.col("lang").isin(*langs))
    return df


def write_pages_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Inverse of ``read_pages_jsonl``: pages rows → JSONL with base64 html."""
    (
        df.select(
            "url",
            "warc_ts",
            F.base64(F.col("html")).alias("html_b64"),
            "text",
            "lang",
        )
        .write.mode(mode)
        .json(path)
    )
