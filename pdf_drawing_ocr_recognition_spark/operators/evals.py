"""Classifier-evaluation operators (T205): exact distributed ROC-AUC and
the reliability (calibration) table for a quality/toxicity/lang classifier
scored over the corpus.

Why exact + integer: evaluation numbers gate release decisions, so they
must be bit-reproducible across runs and cluster layouts.  AUC is the
Mann-Whitney U statistic; with an INTEGER score column both its numerator
and denominator are exact integers (ties handled by midranks), so the
result is an exact rational — no float accumulation order to disagree
about.  Real-valued scores quantize first (callers pick the resolution;
1e-3 quantization moves AUC by < 1e-3 on any distribution).

Scale shape (the 10¹²-row story):

1. ``groupBy(score)`` → per-score (total, positives) histogram — ONE
   map-side-combinable shuffle keyed by score; output cardinality is the
   number of DISTINCT scores, independent of row count.
2. an inclusive prefix sum of totals in score order — T196's
   ``global_prefix_sums`` primitive (range-repartition + n_partitions
   driver scalars + one Arrow cumsum), NOT a single-task
   ``SUM() OVER (ORDER BY score)`` window, so a 10⁹-distinct-score
   histogram still distributes.
3. a single-row final aggregation of the per-score contributions.

No window operator anywhere (plan-asserted), no per-row Python, driver
traffic bounded by the prefix-sum scalars.

Midrank identity used (all integers): for a score s with ``cnt`` rows of
which ``pos`` are positive, and ``cum`` the inclusive running total of
rows up to s ascending, every row at s has midrank
``(2·(cum − cnt) + cnt + 1) / 2``; summing doubled midranks over positives
gives ``2·R⁺ = Σ pos·(2·cum − cnt + 1)``, and
``AUC = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻)``.

Reference analogue: none (the reference has no classifier); this is the
evaluation side of T87/T109's quality scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """One row: ``(n_pos, n_neg, auc_num, auc_den)`` — the exact rational
    ROC-AUC of integer *score_col* against 0/1 *label_col*, midrank tie
    handling (= scikit-learn's ``roc_auc_score`` on the same data).
    ``auc_num / auc_den`` is the value; both are exact BIGINTs, so equality
    is hashable.  Raises (driver-side, cheap) when a class is absent —
    AUC is undefined, and silently returning 0/0 would poison a release
    gate downstream."""
    from .order import global_prefix_sums

    from pyspark.sql.types import IntegerType, LongType, ShortType

    if not isinstance(
        df.schema[score_col].dataType, (LongType, IntegerType, ShortType)
    ):
        raise ValueError(
            f"exact_auc needs an integral score column (quantize floats "
            f"first), got {df.schema[score_col].dataType.simpleString()}"
        )
    hist = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.count("*").cast("long").alias("_cnt"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
    )
    cum = global_prefix_sums(
        hist,
        [F.col("_s")],
        "_cnt",
        out_col="_cum",
        n_partitions=n_partitions,
    )
    out = cum.agg(
        F.sum("_pos").alias("n_pos"),
        (F.sum("_cnt") - F.sum("_pos")).alias("n_neg"),
        F.sum(
            F.col("_pos") * (2 * F.col("_cum") - F.col("_cnt") + F.lit(1))
        ).alias("_two_rpos"),
    ).select(
        "n_pos",
        "n_neg",
        (
            F.col("_two_rpos") - F.col("n_pos") * (F.col("n_pos") + 1)
        ).alias("auc_num"),
        (2 * F.col("n_pos") * F.col("n_neg")).alias("auc_den"),
    )
    row = out.collect()[0]  # 1 row — the eval RESULT, not a data pass
    if not row["n_pos"] or not row["n_neg"]:
        raise ValueError(
            f"AUC undefined: n_pos={row['n_pos']}, n_neg={row['n_neg']} "
            f"(one class is absent)"
        )
    return df.sparkSession.createDataFrame(
        [row], "n_pos long, n_neg long, auc_num long, auc_den long"
    )


def reliability_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bin_width: int,
) -> DataFrame:
    """Calibration bins for an integer score: per ``score div bin_width``
    bin, ``(n, n_pos, sum_score)`` — all exact integers (the caller derives
    accuracy = n_pos/n and mean confidence = sum_score/n at whatever float
    precision it reports; ECE is one driver-side fold over ≤ n_bins rows).
    One map-combinable aggregation, no window."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    return (
        df.groupBy(
            (
                F.floor(F.col(score_col) / F.lit(bin_width)).cast("long")
            ).alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.sum(F.col(score_col).cast("long")).alias("sum_score"),
        )
        .orderBy("bin")
    )
