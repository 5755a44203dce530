"""CCNet-style corpus mixing: exact per-group quantile buckets without a
per-row sort.

CCNet splits each language's corpus into head/middle/tail perplexity
tertiles and trains on a bucket mix.  The naive form is ntile(3) OVER
(PARTITION BY lang ORDER BY score) — a full per-language sort of every
document, and language partitions are exactly the skewed kind (English is
half the web).  This module computes the SAME exact buckets from the score
*histogram*: aggregate (group, score) counts (map-side combinable hash agg),
take the cumulative count over each group's DISTINCT score values (a window
over histogram rows, bounded by score cardinality — with round-4 scores that
is ≤ a few million rows regardless of corpus size), derive each score's
bucket from integer cumulative arithmetic, and broadcast the (group, score →
bucket) dim back onto the rows.  No document-sized sort or window anywhere.

Tie semantics: all rows sharing one score value land in one bucket (the
bucket where the value's cumulative count falls) — the standard
threshold-bucketing contract, deterministic under any partitioning, and
exactly reproducible in ANSI SQL (the DuckDB twin).

Reference analogue: none (single-machine reference); generalizes the
north-rule corpus tiering for training-data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 3,
    group_cols: tuple[str, ...] = (),
    labels: tuple[str, ...] | None = None,
    bucket_col: str = "bucket",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Assign each row an exact quantile bucket of ``value_col`` within its
    group, labeled by ``labels`` in ASCENDING value order (default
    ``b1..bN``).  Bucket of a value v with cumulative count c(≤v) out of n
    rows is ``ceil(n_buckets·c/n)`` — pure integer math, identical across
    engines.  Rows with NULL values are dropped (undefined score).

    ``broadcast_dim`` controls the bucket-dim join strategy; disable when
    score cardinality approaches the broadcast limit (the join stays a plain
    equi-join on (group, value) either way).
    """
    if labels is None:
        labels = tuple(f"b{i + 1}" for i in range(n_buckets))
    if len(labels) != n_buckets:
        raise ValueError(f"need exactly {n_buckets} labels, got {len(labels)}")
    gcols = list(group_cols)
    rows = df.filter(F.col(value_col).isNotNull())
    dist = rows.groupBy(*gcols, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w_part = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    w_cum = w_part.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = w_part.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    label_arr = F.array(*[F.lit(x) for x in labels])
    dim = (
        dist.withColumn("__cum_le", F.sum("__c").over(w_cum))
        .withColumn("__n", F.sum("__c").over(w_all))
        .withColumn(
            "__idx",
            F.floor(
                (F.lit(n_buckets) * F.col("__cum_le") + F.col("__n") - 1)
                / F.col("__n")
            ).cast("int"),
        )
        .select(
            *gcols,
            F.col(value_col),
            F.element_at(label_arr, F.col("__idx")).alias(bucket_col),
        )
    )
    if broadcast_dim:
        dim = F.broadcast(dim)
    return rows.join(dim, gcols + [value_col])


def dsir_logweights(
    docs: DataFrame,
    target_col: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — "Data Selection
    for Language Models via Importance Resampling"): score every document by
    how much likelier its hashed unigram features are under the TARGET
    domain's distribution than under the raw corpus distribution,

        log w(d) = Σ_b  c_d[b] · ( ln p_target[b] − ln q_raw[b] )

    with add-one smoothing over B = 16^prefix_len md5-prefix buckets
    (DSIR's hashed n-gram feature space; the hex-prefix bucket is the
    engine-portable form of its hash-mod).  *target_col* is a boolean
    column marking the target-domain docs (e.g. a quality gate or a
    wiki-like source flag).  Per-bucket log-ratios are quantized to
    integers (floor 1e6·ln) so every cross-row aggregate is an exact
    integer sum — deterministic under any partitioning.

    Scale: the token stream reduces map-side to ≤B rows per document; both
    distribution dims are B-row aggregates (two scalars for the totals)
    broadcast back — nothing document-sized ever shuffles twice, and the
    final per-doc sum is one hash agg.  Returns (key, dsir_scaled BIGINT,
    n_tokens BIGINT); resampling = rank/threshold on dsir_scaled.
    """
    n_buckets = 16 ** prefix_len
    toks = docs.select(
        F.col(key_col),
        F.col(target_col).alias("_t"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_w"),
    ).select(
        key_col,
        "_t",
        F.substring(
            F.md5(F.encode(F.col("_w"), "utf-8")), 1, prefix_len
        ).alias("_b"),
    )
    c = toks.groupBy(key_col, "_b").agg(
        F.count(F.lit(1)).alias("_c"), F.max("_t").alias("_t")
    )
    raw = c.groupBy("_b").agg(F.sum("_c").alias("_cq"))
    tgt = c.where(F.col("_t")).groupBy("_b").agg(F.sum("_c").alias("_ct"))
    # zero target-domain docs leaves sum(_ct) null — coalesce to 0 so the
    # add-one smoothing still yields finite ratios instead of silently
    # nulling every log-ratio (and with it every dsir_scaled)
    totals = raw.agg(F.sum("_cq").alias("_tq")).crossJoin(
        tgt.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_tt"))
    )
    dim = (
        raw.join(tgt, "_b", "left")
        .withColumn("_ct", F.coalesce(F.col("_ct"), F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.floor(
                F.lit(1e6)
                * F.log(
                    ((F.col("_ct") + 1) / (F.col("_tt") + n_buckets))
                    / ((F.col("_cq") + 1) / (F.col("_tq") + n_buckets))
                )
            )
            .cast("bigint")
            .alias("_lr"),
        )
    )
    return (
        c.join(F.broadcast(dim), "_b")
        .groupBy(key_col)
        .agg(
            F.sum(F.col("_c") * F.col("_lr")).cast("bigint").alias(
                "dsir_scaled"
            ),
            F.sum("_c").cast("bigint").alias("n_tokens"),
        )
    )


def largest_remainder_quotas(
    weights: DataFrame,
    weight_col: str,
    budget: int,
    key_col: str = "lang",
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment: split an integer *budget*
    across the rows of a small weight dim proportionally to INTEGER
    *weight_col*, exactly — Σ quota ≡ budget, each quota within 1 of its
    real share (no float accumulation anywhere: base = ⌊budget·w/W⌋ and the
    budget−Σbase leftovers go to the largest remainders budget·w mod W,
    key-ordered ties).  The standard deterministic quota rule for sampling
    plans.  *weights* is dimension-sized (languages, sources, hosts-of-
    interest) — every window here is over that dim, never over documents.

    Degenerate inputs fail loudly instead of returning null quotas: an
    all-zero or negative weight raises at execution (in-plan assert_true,
    pruning-proof because it is folded into the `_tw` column the math
    uses).  An EMPTY dim returns an empty frame (the optimizer's
    empty-relation propagation collapses the plan before any assert runs;
    nothing-to-apportion is the documented contract there).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    base = weights.select(key_col, F.col(weight_col).alias("_w"))
    # totals as 1-row broadcast aggregates (never a window over the dim —
    # and exact: `div` is integral division, where a double `/` + floor
    # could misround exactly-divisible long products).  Guarded in-plan:
    # an all-zero / negative / empty weight dim would otherwise null out
    # `div _tw` and silently leave the budget unapportioned, so assert_true
    # raises at execution (matching the eager budget<0 guard, but lazily —
    # the function never forces an action itself).
    # the asserts are folded INTO _tw (assert_true yields null on success)
    # so column pruning can never optimize the guard away
    tot = base.agg(
        F.sum("_w").alias("_tw"), F.min("_w").alias("_minw")
    ).select(
        F.when(
            F.assert_true(
                F.col("_tw") > 0,
                F.lit("largest_remainder_quotas: sum(weight) must be > 0"),
            ).isNull()
            & F.assert_true(
                F.col("_minw") >= 0,
                F.lit("largest_remainder_quotas: negative weight"),
            ).isNull(),
            F.col("_tw"),
        ).alias("_tw")
    )
    dim = (
        base.crossJoin(F.broadcast(tot))
        .withColumn("_base", F.expr(f"({budget} * _w) div _tw"))
        .withColumn("_rem", F.lit(budget) * F.col("_w") % F.col("_tw"))
    )
    left = dim.agg((F.lit(budget) - F.sum("_base")).alias("_left"))
    # the remainder-rank window runs over the DIMENSION (languages/sources
    # of interest — bounded by construction), never over documents
    ranked = (
        dim.crossJoin(F.broadcast(left))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("_rem").desc(), F.col(key_col).asc())
            ),
        )
    )
    return ranked.select(
        key_col,
        F.col("_w").alias(weight_col),
        (
            F.col("_base")
            + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )


def shrunk_group_means(
    df: DataFrame,
    group_col: str,
    value_col: str,
    prior_strength: int = 20,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-group means toward the global mean
    — the small-group noise guard for host/source-level quality priors: a
    host with 3 pages must not earn a trusted quality score from 3 samples.
    The additive-smoothing posterior mean

        shrunk_g = (S_g + k·μ) / (n_g + k),   μ = ΣS / Σn

    pulls low-n groups toward μ with prior strength *k* (≈ "k virtual docs
    at the global mean") and leaves high-n groups at their raw mean.

    *value_col* MUST be integer-quantized by the caller (the q·10⁴ BIGINT
    discipline) so the sums are exact under any partitioning; the only
    floats are the two reported ratios.  Scale: one map-side-combinable
    group agg; the global totals are a 1-row broadcast; output is
    group-dim sized.  Returns (group, n, mean_raw, mean_shrunk), means
    rounded to 4dp.
    """
    if prior_strength < 0:
        raise ValueError(f"prior_strength must be >= 0, got {prior_strength}")
    g = df.groupBy(group_col).agg(
        F.sum(value_col).alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    tot = g.agg(F.sum("_s").alias("_sg"), F.sum("_n").alias("_ng"))
    return g.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.col("_n").cast("bigint").alias("n"),
        F.round(F.col("_s") / F.col("_n"), 4).alias("mean_raw"),
        F.round(
            (F.col("_s") + F.lit(prior_strength) * (F.col("_sg") / F.col("_ng")))
            / (F.col("_n") + F.lit(prior_strength)),
            4,
        ).alias("mean_shrunk"),
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_bins: int = 4,
    seed: str = "42",
) -> DataFrame:
    """Curriculum ordering for training export: bin documents by a [0,1]
    difficulty/quality score into fixed-width bins, then give every
    document a deterministic pseudo-random position WITHIN its bin — the
    easy-to-hard (or hard-to-easy: consume bins in reverse) schedule with
    in-bin decorrelation, without ever materializing a global sort.

    Scale shape: the bin is a pure codegen projection
    (``least(n_bins-1, floor(score·n_bins))`` — fixed thresholds, the way
    production curricula actually bin, NOT ntile, whose global window is a
    single-partition sort); the shuffle position comes from the T43
    range-repartition + per-partition-offset machinery applied WITHIN bin
    (operators/order.py grouped_row_numbers) — a rank window PARTITIONED
    BY bin would funnel each bin through ONE task (2.5·10¹¹ rows per bin
    at 10¹² docs), where the range sort spreads every bin across the
    cluster.  The global curriculum order is the lexicographic
    (bin, pos_in_bin) — never computed as one sequence.  Everything
    replays in ANSI SQL (``curriculum_order`` oracle; value-identical to
    the window form because (md5(seed:id), id) is a total order).

    Returns ``(id_col, score_col, bin, pos_in_bin)``.
    """
    from .order import grouped_row_numbers

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    binned = df.select(
        id_col,
        score_col,
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col(score_col) * F.lit(n_bins)).cast("int"),
        )
        .cast("int")
        .alias("bin"),
        F.md5(
            F.encode(
                F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")),
                "utf-8",
            )
        ).alias("_shuf"),
    )
    numbered = grouped_row_numbers(
        binned, ["bin"], [F.asc("_shuf"), F.asc(id_col)], id_col="_pos"
    )
    return numbered.select(
        id_col,
        score_col,
        "bin",
        F.col("_pos").cast("int").alias("pos_in_bin"),
    )


def per_group_percentiles(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    out_col: str = "pctile",
) -> DataFrame:
    """Cross-group score CALIBRATION: replace a raw quality score with its
    percent-rank WITHIN its group (source, crawl, language) so one group's
    systematically-inflated scorer cannot dominate a global quality gate —
    'keep the top 30%' then means the top 30% of EVERY source, the fair
    cross-source cut (the quantile-normalization step quality-classifier
    pipelines run before thresholding across heterogeneous sources).

    Shape: the T43 range-repartition + offset machinery applied WITHIN
    group (operators/order.py grouped_row_numbers) — sources are exactly
    the skewed key (one host owns 50% of the fixture corpus), so a rank
    window PARTITIONED BY source would push half the corpus through ONE
    task; the range sort spreads a hot source across the cluster instead.
    percent_rank ≡ (row_number−1)/(n_group−1) because (score, id) is a
    total order (rank == row_number, ties impossible), with
    single-row groups pinned to 0.0 (percent_rank's defined value);
    division of identical integers gives the identical IEEE double the
    window form produced.  Replays verbatim in ANSI SQL.

    Returns the input key columns + ``out_col`` = round(percent_rank, 6).
    """
    from .order import grouped_row_numbers

    numbered = grouped_row_numbers(
        df.select(id_col, group_col, score_col),
        [group_col],
        [F.asc(score_col), F.asc(id_col)],
        id_col="_rn",
        total_col="_ng",
    )
    return numbered.select(
        id_col,
        group_col,
        score_col,
        F.round(
            F.when(F.col("_ng") == 1, F.lit(0.0)).otherwise(
                (F.col("_rn") - 1).cast("double") / (F.col("_ng") - 1)
            ),
            6,
        ).alias(out_col),
    )


def token_budget_select(
    df: DataFrame,
    order_cols: list,
    cost_col: str,
    budget: int,
    cum_col: str = "cum_cost",
) -> DataFrame:
    """Greedy budgeted corpus selection (T196): take rows in ``order_cols``
    order (best-first) until the INCLUSIVE running ``cost_col`` total
    exceeds *budget* — the "select the highest-quality B tokens" step every
    training-data pipeline ends with (C4/FineWeb/DCLM pick a token budget,
    not a row count).  Scalable twin of
    ``WHERE SUM(cost) OVER (ORDER BY …) <= budget``: the unpartitioned
    window is ONE task at corpus scale, while this rides
    :func:`operators.order.global_prefix_sums` — range-repartition,
    n_partitions driver scalars, one Arrow cumsum pass — AND prunes every
    partition whose starting offset already meets the budget before that
    pass runs (running totals are monotone, so a 30% budget scans ~30% of
    the sorted corpus, not all of it).

    ``cost_col`` must be integral, non-null, and non-negative;
    ``order_cols`` must total-order (unique tiebreaker).  The boundary row
    that would cross the budget is EXCLUDED (inclusive-sum ≤ budget) —
    deterministic and replayable as plain SQL.
    """
    from pdf_drawing_ocr_recognition_spark.operators.order import (
        global_prefix_sums,
    )

    budget = int(budget)
    run = global_prefix_sums(
        df, order_cols, cost_col, out_col=cum_col, max_total=budget
    )
    return run.filter(F.col(cum_col) <= F.lit(budget))


def otsu_moments(
    df: DataFrame,
    bin_col: str,
    n_bins: int,
) -> DataFrame:
    """Per-threshold class moments for Otsu's method (Otsu 1979) over an
    integer-binned score: for every candidate cut t ∈ [1, n_bins), the
    exact counts and bin-mass sums of the two classes {bin < t} and
    {bin ≥ t}.  This is the CORPUS-TOUCHING stage of auto-thresholding a
    quality signal ("where should the keep/drop cut sit for THIS crawl"
    instead of a hand-tuned constant), and the oracled surface — the
    argmax itself runs driver-side on ≤ n_bins scalar rows
    (``otsu_threshold``), exactly the PCA-eigh/T99 division of labor.

    Scale shape: ONE map-side-combinable hash agg collapses the corpus
    to ≤ n_bins histogram rows; the threshold expansion is an n_bins²
    dim-by-dim product (≤ 4096 rows at the default 64) — nothing
    document-sized crosses the exchange after the histogram.  All
    arithmetic is exact integers.

    Returns (thr_bin, cnt_lo, sum_lo, cnt_hi, sum_hi), one row per
    candidate threshold, zeros for empty classes.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    spark = df.sparkSession
    hist = df.groupBy(F.col(bin_col).cast("bigint").alias("_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    thr = spark.range(1, n_bins).select(F.col("id").alias("thr_bin"))
    lo = F.col("_b") < F.col("thr_bin")
    return (
        thr.crossJoin(F.broadcast(hist))
        .groupBy("thr_bin")
        .agg(
            F.coalesce(F.sum(F.when(lo, F.col("_n"))), F.lit(0))
            .cast("bigint")
            .alias("cnt_lo"),
            F.coalesce(F.sum(F.when(lo, F.col("_n") * F.col("_b"))), F.lit(0))
            .cast("bigint")
            .alias("sum_lo"),
            F.coalesce(F.sum(F.when(~lo, F.col("_n"))), F.lit(0))
            .cast("bigint")
            .alias("cnt_hi"),
            F.coalesce(F.sum(F.when(~lo, F.col("_n") * F.col("_b"))), F.lit(0))
            .cast("bigint")
            .alias("sum_hi"),
        )
    )


def otsu_threshold(moments: DataFrame) -> tuple[int, "object"]:
    """Pick the Otsu cut from an ``otsu_moments`` frame: the threshold
    maximizing the between-class variance

        σ²_B(t) = cnt_lo·cnt_hi·(μ_hi − μ_lo)²
                = (sum_lo·cnt_hi − sum_hi·cnt_lo)² / (cnt_lo·cnt_hi)

    compared EXACTLY in Python bignum rationals (no float ordering —
    candidate objectives can differ in the last ulp and engines would
    disagree); thresholds with an empty class are skipped; ties go to
    the smallest threshold.  Driver transfer is the ≤ n_bins moments
    rows — scalars, never documents.

    Returns (thr_bin, objective) with objective a ``fractions.Fraction``.
    """
    from fractions import Fraction

    best_t, best_obj = None, None
    for r in sorted(moments.collect(), key=lambda r: r["thr_bin"]):
        c0, s0, c1, s1 = r["cnt_lo"], r["sum_lo"], r["cnt_hi"], r["sum_hi"]
        if c0 == 0 or c1 == 0:
            continue
        num = s0 * c1 - s1 * c0
        obj = Fraction(num * num, c0 * c1)
        if best_obj is None or obj > best_obj:
            best_t, best_obj = r["thr_bin"], obj
    if best_t is None:
        raise ValueError("otsu_threshold needs at least two occupied bins")
    return int(best_t), best_obj
