"""Fixed-quota per-stratum sampling (T54).

`stratified_sample` (rate-gated) answers "keep X % of each stratum";
corpus mixing just as often needs "keep EXACTLY k documents per stratum"
(fixed per-language quotas, eval-set carving, per-source caps).

The classic worry about ``row_number() OVER (PARTITION BY stratum ORDER BY
hash) <= k`` is that each whole stratum sorts in ONE task.  On Spark
3.5+/4.x that worry is obsolete: Catalyst rewrites the rank-limit filter
into **WindowGroupLimit**, inserting a *Partial* group-limit BEFORE the
exchange — every map task keeps only its local top-k per stratum, so at
most k·n_partitions rows per stratum ever shuffle, and the *Final*
group-limit + window rank run on that pruned sliver.  The declarative
window IS the scale-safe plan; ``tests/test_sampling.py`` and PLANS.md
assert the ``WindowGroupLimit ... Partial`` sits below the Exchange so a
regression (e.g. an expression shape the rewrite can't match) fails
loudly instead of silently reverting to whole-stratum sorts.

Ordering is a deterministic salted md5 of the id (portable to the DuckDB
``QUALIFY`` oracle twin, rerun-stable, independent of every other hash
gate in the pipeline) — or any caller-supplied order column ("best k by
quality per stratum" uses the same machinery).

No reference analogue (single-document client, no sampling —
pdor/pdor_unit.py); corpus-pipeline scope.
"""

from __future__ import annotations

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
    (1-based rank within the stratum).  The ``rank <= k`` filter must stay
    adjacent to the window for Catalyst's WindowGroupLimit rewrite to fire
    (see module docstring) — which is why this helper owns the filter
    instead of leaving it to the caller.
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
    work = df.withColumn(_H, order)
    w = Window.partitionBy(*strata).orderBy(F.col(_H).asc(), F.col(id_col).asc())
    return (
        work.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(_H)
    )
