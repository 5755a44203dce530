"""Streaming exact dedup — bounded-state content dedup on the ingest firehose.

The batch operator (``operators/dedup.exact_dedupe``) needs the whole corpus;
on an unbounded stream the seen-set must be BOUNDED or the 100 TB/day ingest
accumulates state forever.  ``dropDuplicatesWithinWatermark`` keys state by
the content digest and evicts each entry once the event-time watermark passes
its event time + delay:

- a duplicate arriving within *delay* of the kept row is dropped;
- a duplicate arriving after eviction is emitted again — the unavoidable
  bounded-state tradeoff, cleaned up by the downstream batch compaction
  (``exact_dedupe`` over the landed output), which is exactly how a
  stream-ingest + batch-compact corpus pipeline splits the work.

Both behaviors are asserted under real multi-batch streaming in
tests/test_streaming.py (one file per micro-batch so the watermark advances
between batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_exact_dedup(
    df: DataFrame,
    time_col: str = "warc_ts",
    text_col: str = "text",
    delay: str = "2 hours",
) -> DataFrame:
    """Drop content duplicates within the watermark window (digest-keyed state)."""
    return (
        df.withColumn("_digest", F.md5(F.encode(F.col(text_col), "utf-8")))
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def run_dedup_stream_to_memory(
    spark: SparkSession,
    docs_path: str,
    query_name: str,
    delay: str = "2 hours",
    schema: str = "url STRING, warc_ts TIMESTAMP, text STRING",
) -> None:
    """Drain a file-source docs stream through the dedup into a memory sink,
    one file per micro-batch (watermark advances between files)."""
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_path)
    )
    q = (
        streaming_exact_dedup(docs, delay=delay)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
