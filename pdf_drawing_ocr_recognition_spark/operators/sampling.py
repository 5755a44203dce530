"""Fixed-quota per-stratum sampling (T54).

`stratified_sample` (rate-gated) answers "keep X % of each stratum";
corpus mixing just as often needs "keep EXACTLY k documents per stratum"
(fixed per-language quotas, eval-set carving, per-source caps).  The naive
formulation — ``row_number() OVER (PARTITION BY stratum ORDER BY hash)``
— puts each whole stratum into ONE task: with 5 language strata over a
100 TB corpus that is five giant sorts on five executors, a scale-killer.

``quota_sample`` keeps the exact same selection (globally smallest k
hashes per stratum, id tiebreak) with a two-stage plan:

1. **map-side prune**: one Arrow stage keeps a running top-k per stratum
   PER INPUT PARTITION (bounded memory: k × strata rows retained per
   partition regardless of partition size, folded batch by batch);
2. **exact rank on survivors**: ≤ k × strata × n_partitions rows — tiny —
   go through the exact window.

Stage 1 can never evict a true global top-k row (a row in the global
top-k of its stratum is in the top-k of every subset it appears in), so
the result is IDENTICAL to the naive window — which is what the DuckDB
``QUALIFY row_number()`` oracle twin checks.

Ordering is a deterministic salted md5 of the id (portable to the oracle,
rerun-stable, independent of any other hash gate in the pipeline) — or any
caller-supplied order column ("best k by quality per stratum" uses the
same machinery).

No reference analogue (single-document client, no sampling —
pdor/pdor_unit.py); corpus-pipeline scope.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_H = "_qs_h"


def quota_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str,
    order_col: str | None = None,
    salt: str = "quota|",
    rank_col: str = "pick_rank",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per *strata* group, deterministically.

    Selection order: ascending *order_col* if given, else the salted md5 of
    *id_col*; *id_col* ascending breaks ties.  Output adds *rank_col*
    (1-based rank within the stratum).
    """
    if k < 1:
        raise ValueError(f"quota_sample requires k >= 1, got {k}")
    if not strata:
        raise ValueError("quota_sample requires at least one stratum column")
    order = (
        F.col(order_col)
        if order_col is not None
        else F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    work = df.withColumn(_H, order.cast("string"))
    sort_cols = [_H, id_col]

    def _prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            # running per-stratum top-k: memory stays O(k·strata + batch)
            acc = (
                acc.sort_values(sort_cols, kind="mergesort")
                .groupby(strata, sort=False, dropna=False)
                .head(k)
                .reset_index(drop=True)
            )
        if acc is not None and len(acc):
            yield acc

    pruned = work.mapInPandas(_prune, schema=work.schema)
    w = Window.partitionBy(*strata).orderBy(
        F.col(_H).asc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(_H)
    )


def quota_sample_naive(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str,
    order_col: str | None = None,
    salt: str = "quota|",
    rank_col: str = "pick_rank",
) -> DataFrame:
    """The single-window formulation — the small-data twin used in tests to
    prove `quota_sample`'s pruned plan selects identical rows.  Do NOT use
    at scale (one task per stratum)."""
    order = (
        F.col(order_col)
        if order_col is not None
        else F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    work = df.withColumn(_H, order.cast("string"))
    w = Window.partitionBy(*strata).orderBy(F.col(_H).asc(), F.col(id_col).asc())
    return (
        work.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(_H)
    )
