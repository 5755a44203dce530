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


def weighted_sample_wor(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "wsw",
    priority_col: str = "priority_e6",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, fixed output size:
    the Efraimidis–Spirakis (2006) exponential race.  Each row draws a
    deterministic uniform u from md5(seed|key) and competes with priority
    u^(1/w); the global top-n priorities are the sample — inclusion odds
    proportional to weight, no sequential draw state.

    Engine-portable determinism: u = (h+1)/(2^52+1) with h the first 13
    md5 hex digits (exact in a double), the log-priority quantizes to
    L = floor(1e6·ln u) (the T58/T73 per-row ln discipline), and the
    comparison key is the IEEE division L/w — integer inputs, correctly
    rounded, hence bit-identical in Spark and DuckDB.  Ties break on key.

    Scale: priorities are a narrow codegen projection and the global top-n
    is TakeOrdered (per-partition heap + single merge of n·P candidates) —
    no full sort, no shuffle of the corpus.  Rows with weight <= 0 or NULL
    never sample (their limit priority is -inf), matching the math.

    Returns (key, weight, L) for the n winners — L exposes the race so
    downstream re-draws can compose (e.g. reservoir merge across days).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit(seed), F.lit("|"), F.col(key_col).cast("string")
                    ),
                    "utf-8",
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**52 + 1))
    scored = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(key_col),
            F.col(weight_col),
            F.floor(F.lit(1e6) * F.log(u)).cast("bigint").alias(priority_col),
        )
        .withColumn(
            "_p", F.col(priority_col) / F.col(weight_col).cast("double")
        )
    )
    return (
        scored.orderBy(F.desc("_p"), F.asc(key_col))
        .limit(n)
        .drop("_p")
    )


def weighted_quota_sample(
    df: DataFrame,
    n_per_stratum: int,
    weight_col: str,
    stratum_cols: tuple[str, ...] = ("lang",),
    key_col: str = "doc_id",
    seed: str = "wq",
    priority_col: str = "priority_e6",
) -> DataFrame:
    """Fixed-size weighted sample PER STRATUM: the Efraimidis–Spirakis race
    of ``weighted_sample_wor`` ranked within each stratum — "keep the k
    highest-priority docs per language, inclusion ∝ weight".  Complements
    ``quota_sample`` (uniform hash order) with weight-proportional odds.

    Scale: the same rank-limit filter Catalyst rewrites into
    WindowGroupLimit (partial group-limit BEFORE the exchange — see the
    module docstring), so at most k·n_partitions rows per stratum shuffle;
    the priority is one codegen projection.  Same engine-portable
    arithmetic as weighted_sample_wor (quantized ln, integer-input IEEE
    ratio), so the per-stratum cuts replay exactly in the DuckDB QUALIFY
    twin.  Rows with NULL/non-positive weight never sample.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    if not stratum_cols:
        raise ValueError("need at least one stratum column")
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(
                        F.lit(seed), F.lit("|"), F.col(key_col).cast("string")
                    ),
                    "utf-8",
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**52 + 1))
    scored = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            *stratum_cols,
            F.col(key_col),
            F.col(weight_col),
            F.floor(F.lit(1e6) * F.log(u)).cast("bigint").alias(priority_col),
        )
        .withColumn(
            "_p", F.col(priority_col) / F.col(weight_col).cast("double")
        )
    )
    w = Window.partitionBy(*stratum_cols).orderBy(
        F.desc("_p"), F.asc(key_col)
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_per_stratum)
        .drop("_p", "_r")
    )


def domain_split(
    df: DataFrame,
    pld_col: str,
    val_buckets: int = 1,
    test_buckets: int = 1,
    n_buckets: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every document of one
    registered domain (*pld_col*, from ``registered_domains``) lands in the
    SAME split — md5 of the domain, first two hex nibbles, bucket %
    *n_buckets*.  Doc-level hash splits (T16) leak: near-duplicate pages of
    one site straddle train and test, so held-out loss is contaminated by
    template memorization.  Domain-level assignment is how public corpora
    (C4, FineWeb ablations) actually cut eval sets.

    Pure codegen projection — no shuffle, no Python; deterministic across
    reruns, engines and cluster sizes (the same leakage-free contract as
    T16, lifted from doc keys to registrant keys).  NULL plds (hosts that
    ARE a public suffix) fall back to bucket 'train' — they carry no
    registrant identity to leak.
    """
    if not 0 < val_buckets + test_buckets < n_buckets:
        raise ValueError("val+test buckets must leave room for train")
    h = F.md5(F.encode(F.col(pld_col), "utf-8"))
    hexd = "0123456789abcdef"
    nib1 = F.position(F.substring(h, 1, 1), F.lit(hexd)) - 1
    nib2 = F.position(F.substring(h, 2, 1), F.lit(hexd)) - 1
    bucket = (nib1 * 16 + nib2) % n_buckets
    split = F.when(F.col(pld_col).isNull(), F.lit("train")).otherwise(
        F.when(bucket < test_buckets, F.lit("test"))
        .when(bucket < test_buckets + val_buckets, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)
