"""Gopher-style quality-filter funnel with per-rule drop attribution.

A production webtext pipeline (Gopher §A1.1, C4, RefinedWeb, FineWeb) applies
an ORDERED list of document-quality rules and reports, for audit, how many
documents each rule dropped — where "dropped by rule i" means the document
survived rules 1..i-1 and failed rule i (first-fail attribution).  The audit
funnel is what lets a corpus engineer see that e.g. 40% of a crawl dies at
the stopword gate before touching the expensive dedup stages.

Scale posture
-------------
ONE scan of the corpus: every rule is a pure whole-stage-codegen Column
predicate evaluated per row; the first-failing-rule label is a single chained
CASE, so attribution costs no extra passes.  The aggregate is a map-side
partial count over at most ``len(rules)+1`` labels, and the funnel arithmetic
(n_in at rule i = total minus drops before i) runs on that ``len(rules)``-row
frame with a cumulative-sum window — driver never sees per-document data.
At 100 TB this is scan-bound, shuffle-free except the tiny label rollup.

Reference analogue: the reference gates strings one predicate at a time with
no accounting (pdor/pdor_llm.py error-prefix checks); this generalizes the
gate chain into the audited corpus-hygiene funnel the north rule's
extraction tier needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KEEP_LABEL = "keep"


def first_fail_label(rules: list[tuple[str, Column]]) -> Column:
    """Name of the first rule whose predicate is false; ``keep`` if none.

    Rules are (name, predicate-that-must-hold) in funnel order.  Built as a
    single chained CASE so Catalyst evaluates it in one codegen stage and
    short-circuits at the first failure, exactly like the funnel semantics.
    """
    if not rules:
        raise ValueError("first_fail_label needs at least one rule")
    expr = None
    for name, pred in rules:
        branch = F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        expr = branch if expr is None else expr.when(
            ~F.coalesce(pred, F.lit(False)), F.lit(name)
        )
    return expr.otherwise(F.lit(KEEP_LABEL))


def filter_funnel(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Audit funnel: one row per rule with ``(rule_idx, rule, n_in,
    n_dropped, n_out)`` where ``n_in`` is the count of documents reaching
    the rule (survivors of all earlier rules), ``n_dropped`` the count whose
    FIRST failure is this rule, and ``n_out = n_in - n_dropped``.

    The final rule's ``n_out`` is the kept-document count.  Attribution and
    counting happen in one distributed pass; the funnel recurrence runs on
    the ``len(rules)``-row aggregate via a cumulative window (a frame this
    small is driver-scale by construction — it is NOT a data-sized window).
    """
    spark = df.sparkSession
    labeled = df.select(first_fail_label(rules).alias("__rule"))
    counts = labeled.groupBy("__rule").agg(F.count(F.lit(1)).alias("n"))

    dim = spark.createDataFrame(
        [(i + 1, name) for i, (name, _) in enumerate(rules)],
        "rule_idx int, rule string",
    )
    # total = kept + all drops; recover it from the same tiny aggregate so
    # the corpus is scanned exactly once.
    total = counts.agg(F.sum("n").alias("__total"))
    per_rule = (
        dim.join(counts, dim.rule == counts.__rule, "left")
        .crossJoin(F.broadcast(total))
        .select(
            "rule_idx",
            "rule",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_dropped"),
            "__total",
        )
    )
    w = (
        Window.orderBy("rule_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_rule.withColumn(
            "n_in",
            (F.col("__total") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0))
             ).cast("bigint"),
        )
        .select(
            "rule_idx",
            "rule",
            F.col("n_in"),
            F.col("n_dropped").cast("bigint").alias("n_dropped"),
            (F.col("n_in") - F.col("n_dropped")).cast("bigint").alias("n_out"),
        )
        .orderBy("rule_idx")
    )


def webtext_rules(
    t: Column,
    min_words: int = 15,
    max_words: int = 95,
    mwl_lo: float = 2.0,
    mwl_hi: float = 12.0,
    max_punct: float = 0.1,
    max_digit: float = 0.1,
    min_stopword: float = 0.02,
) -> list[tuple[str, Column]]:
    """The standard Gopher-style webtext rule chain in funnel order — the
    ONE definition shared by the audited query (`quality_funnel`), the
    corpus datasheet keep flag, and the daily-ingest job's hygiene stage.
    Every ratio is an exact-integer division so engine twins compare
    bit-identical doubles."""
    from pdf_drawing_ocr_recognition_spark.functions.text import (
        punct_ratio,
        stopword_ratio,
        word_count,
    )

    wc = word_count(t)
    mwl = F.length(F.regexp_replace(t, r"\s", "")) / wc
    digit = F.regexp_count(t, F.lit("[0-9]+")) / wc
    return [
        ("min_words", wc >= min_words),
        ("max_words", wc <= max_words),
        ("mean_word_len", (mwl >= mwl_lo) & (mwl <= mwl_hi)),
        ("punct_ratio", punct_ratio(t) <= max_punct),
        ("digit_frac", digit <= max_digit),
        ("stopword_floor", stopword_ratio(t) >= min_stopword),
    ]


def apply_funnel(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Survivor stream: documents passing EVERY rule (the funnel's kept set),
    as one conjunctive filter — fully pushdown-eligible."""
    pred = None
    for _, p in rules:
        pred = p if pred is None else pred & p
    return df.filter(pred)
