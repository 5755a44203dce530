"""Per-partition metrics (SURVEY.md M6, A22).

The reference records a single wall-clock ``time_cost`` per document
(pdor/pdor_unit.py:308,321).  At cluster scale the useful unit is the
partition: docs/s, bytes/s and cell-count histograms per Spark partition,
emitted as ordinary rows so they can be written alongside results and
aggregated with the same engine (BASELINE.json north_rule: "per-partition
lineage + metrics").
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

METRICS_SCHEMA = (
    "partition_id INT, n_docs LONG, n_bytes LONG, wall_s DOUBLE, "
    "docs_per_s DOUBLE, bytes_per_s DOUBLE"
)


def cell_count_histogram(extracted: "DataFrame", bucket_width: int = 8) -> "DataFrame":
    """Cell-count histogram over extraction output (M6: written alongside
    results) — bucketed n_cells distribution, one shuffle on tiny keys."""
    from pyspark.sql import functions as F

    return (
        extracted.select(
            (F.floor(F.col("n_cells") / bucket_width) * bucket_width)
            .cast("int")
            .alias("cells_bucket")
        )
        .groupBy("cells_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def partition_metrics(pages: DataFrame) -> DataFrame:
    """One metrics row per input partition: docs/s + bytes/s of a scan pass."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        t0 = time.time()
        n_docs = 0
        n_bytes = 0
        for pdf in it:
            n_docs += len(pdf)
            if "html" in pdf.columns:
                n_bytes += int(pdf["html"].map(lambda b: len(b) if b is not None else 0).sum())
        wall = max(time.time() - t0, 1e-9)
        yield pd.DataFrame(
            [
                {
                    "partition_id": pid,
                    "n_docs": n_docs,
                    "n_bytes": n_bytes,
                    "wall_s": wall,
                    "docs_per_s": n_docs / wall,
                    "bytes_per_s": n_bytes / wall,
                }
            ]
        )

    return pages.mapInPandas(run, METRICS_SCHEMA)
