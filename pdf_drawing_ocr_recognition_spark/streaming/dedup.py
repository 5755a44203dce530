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


def streaming_incremental_dedupe(
    docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    append_index: bool = True,
):
    """Continuous corpus-delta dedup: every micro-batch probes the PERSISTED
    (digest, band_key) index (operators/dedup.incremental_dedupe — semi/anti
    joins only, corpus never rescanned), lands its survivors, and folds them
    back into the index — the streaming form of the daily-ingest job
    (jobs/run_incremental_dedup.py).

    State posture at 100 TB/day: unlike ``dropDuplicatesWithinWatermark``
    (bounded state, re-emits after eviction) the index is durable storage,
    not stream state — dedup is exact against ALL history, at the cost of
    one index probe per micro-batch.  The index grows by two small rows per
    accepted doc; the probe is a join against a bucketed/partitioned
    relation, so per-batch work scales with the batch.  foreachBatch gives
    exactly-once landing via the streaming checkpoint: a replayed batch id
    rewrites the same survivors (idempotent overwrite per batch directory);
    a replay can append duplicate index rows, which is harmless to
    correctness (the probes are existence semi-joins) and is compacted away
    by the periodic batch rewrite of the index (distinct over both
    relations) a production deployment schedules anyway.

    Returns the started StreamingQuery (caller awaits termination).
    """
    from ..operators.dedup import append_to_dedup_index, incremental_dedupe

    def land(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        survivors = incremental_dedupe(
            batch,
            spark.read.parquet(f"{index_path}/digests"),
            spark.read.parquet(f"{index_path}/bands"),
            text_col,
            key_col,
        )
        # idempotent per-batch landing dir: a replayed batch overwrites
        survivors.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        if append_index:
            kept = spark.read.parquet(f"{out_path}/batch={batch_id}")
            append_to_dedup_index(kept, index_path, text_col, key_col)

    return (
        docs.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
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
