"""Snapshot diff (CDC) between two corpus snapshots.

The daily-crawl primitive the incremental pipeline (T44/T46) sits on top of:
given yesterday's snapshot and today's, classify every key as ``added`` /
``removed`` / ``changed`` / ``unchanged`` by comparing a content digest.
A production crawl runs this to size the re-extraction workload before any
content dedup happens (only ``added`` + ``changed`` rows flow downstream).

Scale posture
-------------
* The content digest is computed **map-side on each snapshot** before the
  join, so the full-outer join carries only ``(key, digest)`` plus whatever
  columns the caller asks to keep — never two copies of the document body.
* The plan is a single sort-merge full-outer join keyed on ``key_col``; with
  both snapshots written bucketed on the key (the layout the incremental
  dedup index T44 already uses) the join needs **zero Exchange** — asserted
  in ``tests/test_cdc.py``.
* No driver-side collect anywhere; the classification is a ``when`` chain
  inside whole-stage codegen.

Reference analogue: the reference engine has no multi-snapshot notion (it
parses one file per run, ``pdor/pdor_unit.py:97-109``); this is the
north-rule daily-ingest generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _digest(cols: Sequence[str]) -> F.Column:
    # NUL-separated concat with an explicit null sentinel so (NULL, "x") and
    # ("x", NULL) hash differently; md5 keeps the join payload at 32 bytes.
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>")) for c in cols]
    return F.md5(F.concat_ws("\x00", *parts))


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key_col: str,
    compare_cols: Sequence[str],
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Full-outer diff of two snapshots on ``key_col``.

    Returns one row per key present in either snapshot with columns:
    ``key_col``, ``change_type`` (added|removed|changed|unchanged), and for
    each requested carry column ``c`` the new-side value when present else
    the old-side value (``removed`` rows carry their last-known values).
    """
    if not compare_cols:
        raise ValueError("compare_cols must name at least one column")
    o = old_df.select(
        F.col(key_col).alias("__k"),
        _digest(compare_cols).alias("__old_digest"),
        *[F.col(c).alias(f"__old_{c}") for c in carry_cols],
    )
    n = new_df.select(
        F.col(key_col).alias("__k"),
        _digest(compare_cols).alias("__new_digest"),
        *[F.col(c).alias(f"__new_{c}") for c in carry_cols],
    )
    joined = o.join(n, "__k", "full_outer")
    change = (
        F.when(F.col("__old_digest").isNull(), F.lit("added"))
        .when(F.col("__new_digest").isNull(), F.lit("removed"))
        .when(F.col("__old_digest") == F.col("__new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = [F.col("__k").alias(key_col), change.alias(CHANGE_COL)]
    out += [
        F.coalesce(F.col(f"__new_{c}"), F.col(f"__old_{c}")).alias(c)
        for c in carry_cols
    ]
    return joined.select(*out)


def snapshot_diff_summary(
    old_df: DataFrame,
    new_df: DataFrame,
    key_col: str,
    compare_cols: Sequence[str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Aggregated diff: row counts per (``group_cols``…, ``change_type``).

    The shape a daily ingest dashboards — partial-aggregated, so only the
    per-group counters cross the final exchange.
    """
    diff = snapshot_diff(old_df, new_df, key_col, compare_cols, carry_cols=group_cols)
    return diff.groupBy(*group_cols, CHANGE_COL).agg(
        F.count(F.lit(1)).alias("n"),
    )


def category_drift(
    df: DataFrame,
    time_col: str,
    cat_col: str,
) -> DataFrame:
    """Day-over-day distribution-drift monitor: the total-variation distance
    TVD(d) = ½ Σ_c |p_d(c) − p_{d−1}(c)| of a categorical column between
    consecutive days — the standing check a crawl pipeline runs to catch
    upstream shifts (a source going dark, a parser regression changing the
    type mix) before they poison training mixes.

    Exact integer arithmetic: with counts n_d(c) and day totals N_d,
    TVD = Σ_c |n_d(c)·N_{d−1} − n_{d−1}(c)·N_d|  /  (2·N_d·N_{d−1}),
    so numerator and denominator are BIGINTs and the only float is the
    final reported ratio.  (At 10^12-row days the cross products overflow
    int64 — quantize counts to parts-per-million shares first; the
    rational form is exact for day volumes up to ~3·10^9.)

    Scale posture: the ONLY corpus-scale stage is the (day, category) count
    — one map-side-combinable hash agg; everything after runs on the
    days×categories dim (dense grid via crossJoin of two distinct dims,
    missing cells coalesced to 0 so appearing/vanishing categories count
    their full mass).  Returns (day, tvd_num, tvd_den, tvd) for every day
    with a previous day.
    """
    base = df.select(
        F.to_date(F.col(time_col)).alias("day"), F.col(cat_col).alias("cat")
    )
    counts = base.groupBy("day", "cat").agg(F.count(F.lit(1)).alias("n"))
    dense = (
        counts.select("day").distinct()
        .crossJoin(counts.select("cat").distinct())
        .join(counts, ["day", "cat"], "left")
        .select("day", "cat", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    tot = dense.groupBy("day").agg(F.sum("n").alias("n_tot"))
    prev = dense.select(
        F.date_add(F.col("day"), 1).alias("day"),
        "cat",
        F.col("n").alias("n_prev"),
    )
    prev_tot = tot.select(
        F.date_add(F.col("day"), 1).alias("day"),
        F.col("n_tot").alias("n_prev_tot"),
    )
    pair = (
        dense.join(prev, ["day", "cat"])
        .join(tot, "day")
        .join(prev_tot, "day")
    )
    return (
        pair.groupBy("day")
        .agg(
            F.sum(
                F.abs(
                    F.col("n") * F.col("n_prev_tot")
                    - F.col("n_prev") * F.col("n_tot")
                )
            )
            .cast("bigint")
            .alias("tvd_num"),
            (F.lit(2) * F.max("n_tot") * F.max("n_prev_tot"))
            .cast("bigint")
            .alias("tvd_den"),
        )
        .select(
            "day",
            "tvd_num",
            "tvd_den",
            F.round(F.col("tvd_num") / F.col("tvd_den"), 6).alias("tvd"),
        )
    )


def recrawl_tiers(
    old_df: DataFrame,
    new_df: DataFrame,
    key_col: str,
    compare_cols: Sequence[str],
    host_col: str,
    daily_ppm: int = 500000,
    weekly_ppm: int = 100000,
) -> DataFrame:
    """Recrawl scheduling from two crawl snapshots — the Cho &
    Garcia-Molina ("Effective page refresh policies", 2003) shape: hosts
    whose pages change often get recrawled often; static archives drop to
    a slow tier.  Crawl budget then follows the tiers (compose with T70's
    waterfilling).

    Per host over the keys present in BOTH snapshots: the changed fraction
    as exact ppm (floor(10^6·changed/common) — integer-input IEEE ops,
    bitwise across engines), plus add/remove churn, mapped to a tier:

        change_ppm ≥ daily_ppm   → 'daily'
        change_ppm ≥ weekly_ppm  → 'weekly'
        change_ppm ≥ 1           → 'monthly'
        no observed change       → 'quarterly'
        no common keys           → 'new' (only churn, no change signal)

    Scale: rides :func:`snapshot_diff` (map-side digests, one full-outer
    join keyed by ``key_col``); the host rollup is a map-side-combinable
    count agg — only per-host counters cross the final exchange.
    """
    diff = snapshot_diff(
        old_df, new_df, key_col, compare_cols, carry_cols=[host_col]
    )
    ct = F.col(CHANGE_COL)
    agg = diff.groupBy(host_col).agg(
        F.sum(F.when(ct.isin("changed", "unchanged"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_common"),
        F.sum(F.when(ct == "changed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_changed"),
        F.sum(F.when(ct == "added", 1).otherwise(0)).cast("bigint").alias("n_added"),
        F.sum(F.when(ct == "removed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )
    change_ppm = F.when(F.col("n_common") == 0, F.lit(-1).cast("bigint")).otherwise(
        F.floor(F.lit(1000000.0) * F.col("n_changed") / F.col("n_common"))
    )
    tier = (
        F.when(F.col("n_common") == 0, F.lit("new"))
        .when(F.col("change_ppm") >= daily_ppm, F.lit("daily"))
        .when(F.col("change_ppm") >= weekly_ppm, F.lit("weekly"))
        .when(F.col("change_ppm") >= 1, F.lit("monthly"))
        .otherwise(F.lit("quarterly"))
    )
    return agg.withColumn("change_ppm", change_ppm).withColumn("tier", tier)


def link_churn(
    prev_edges: DataFrame,
    cur_edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Between-crawl link churn per source host: how much of a host's
    out-link set turned over — the graph-side CDC signal (T55 diffs
    content; this diffs STRUCTURE).  High churn with stable content is a
    link-rotation scheme (sold links, rotating "sponsors"); high churn
    with changed content is a site redesign; near-zero churn feeds the
    same refresh-policy dial as T120 recrawl tiers.

    One full-outer equi-join on the composite (src, dst) key over the two
    DISTINCT edge sets — co-partitioned, no fan-out — then one
    map-side-combinable rollup per host.  churn_ppm =
    floor(10⁶·(added+removed)/union) — exact integers.

    Returns (host, n_added, n_removed, n_stable, churn_ppm).
    """
    def prep(df: DataFrame, flag: str) -> DataFrame:
        return (
            df.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
            .filter(F.col(src_col) != F.col(dst_col))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    joined = prep(prev_edges, "_p").join(
        prep(cur_edges, "_c"), ["s", "d"], "full_outer"
    )
    status = (
        F.when(F.col("_p").isNull(), F.lit("added"))
        .when(F.col("_c").isNull(), F.lit("removed"))
        .otherwise(F.lit("stable"))
    )
    per = joined.select("s", status.alias("st")).groupBy("s").agg(
        F.sum(F.when(F.col("st") == "added", 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("st") == "removed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(F.col("st") == "stable", 1).otherwise(0))
        .cast("bigint")
        .alias("n_stable"),
    )
    return per.select(
        F.col("s").alias("host"),
        "n_added",
        "n_removed",
        "n_stable",
        F.floor(
            F.lit(1000000.0)
            * (F.col("n_added") + F.col("n_removed"))
            / (F.col("n_added") + F.col("n_removed") + F.col("n_stable"))
        ).alias("churn_ppm"),
    )


def scd2_merge(
    history: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "as_of",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge (Kimball): fold one snapshot
    batch (key, attrs, as_of) into a validity-interval history table —
    the structure that answers "what was this host's robots policy when
    this page was fetched?" (point-in-time joins via T18 as-of).  T55
    diffs two snapshots; THIS maintains the full change history.

    Per key: unchanged attrs → open row untouched; changed attrs → open
    row closed at the batch timestamp and a new open row inserted; unseen
    key → new open row.  Keys absent from the batch keep their open row
    (a snapshot asserts values for the keys it contains, nothing else).

    Scale shape: ONE equi-join of the open rows against the batch on the
    key (closed history rows pass through untouched — at 10^12 rows the
    closed majority is never shuffled), unions of projections, no window.
    ``history=None`` starts a fresh dimension.

    Returns the new history: (key, attrs..., valid_from, valid_to) with
    NULL valid_to marking the open row.
    """
    b = batch.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_b_{c}") for c in attr_cols],
        F.col(ts_col).alias("_ts"),
    ).dropDuplicates(["_k"])
    if history is None:
        return b.select(
            F.col("_k").alias(key_col),
            *[F.col(f"_b_{c}").alias(c) for c in attr_cols],
            F.col("_ts").alias(valid_from),
            F.lit(None).cast(b.schema["_ts"].dataType).alias(valid_to),
        )
    closed = history.filter(F.col(valid_to).isNotNull())
    open_rows = history.filter(F.col(valid_to).isNull())
    j = open_rows.join(b, open_rows[key_col] == b["_k"], "full_outer")
    same = F.lit(True)
    for c in attr_cols:
        same = same & (F.col(c).eqNullSafe(F.col(f"_b_{c}")))
    # open row with no batch info, or batch agrees -> keep open row
    keep_open = j.filter(
        F.col("_k").isNull() | (F.col(key_col).isNotNull() & same)
    ).select(*history.columns)
    # batch disagrees -> close the old row at the batch ts
    closes = (
        j.filter(F.col(key_col).isNotNull() & F.col("_k").isNotNull() & ~same)
        .select(
            key_col,
            *attr_cols,
            valid_from,
            F.col("_ts").alias(valid_to),
        )
    )
    # new key, or changed attrs -> insert a fresh open row
    inserts = (
        j.filter(
            F.col("_k").isNotNull() & (F.col(key_col).isNull() | ~same)
        )
        .select(
            F.col("_k").alias(key_col),
            *[F.col(f"_b_{c}").alias(c) for c in attr_cols],
            F.col("_ts").alias(valid_from),
            F.lit(None).cast(b.schema["_ts"].dataType).alias(valid_to),
        )
    )
    return closed.unionByName(keep_open).unionByName(closes).unionByName(
        inserts
    )
