"""End-to-end training-corpus preparation — the composition as a library op.

One declarative plan: target-language filter → quality gate → exact dedup
(min-key per md5 digest) → LSH near-dedup survivors → optional stratified
mixing → leakage-free hash split.  Every stage is the independently-oracled
operator; Catalyst fuses the filters into the scan, and the only shuffles
are digest, band-key, and the final audit group-bys.  The driver-gate twin
is ``__spark_entry__.q_training_prep`` (DuckDB oracle `training_prep`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score
from .dedup import exact_dedupe, near_dedupe

SPLIT_SALT = ""       # split gate hashes the bare key
MIX_SALT = "mix|"     # mixing gate uses an independent salt → no leakage

_HEX = "0123456789abcdef"


def _md5_bucket(key_col, salt: str, mod: int):
    """First two hex nibbles of md5(salt || key) → bucket in [0, mod)."""
    h = F.md5(F.encode(F.concat(F.lit(salt), key_col.cast("string")), "utf-8"))
    nib1 = F.position(F.substring(h, 1, 1), F.lit(_HEX)) - 1
    nib2 = F.position(F.substring(h, 2, 1), F.lit(_HEX)) - 1
    return (nib1 * 16 + nib2) % mod


def split_of(key_col):
    """Deterministic 80/10/10 train/val/test split column (hash, not random)."""
    bucket = _md5_bucket(key_col, SPLIT_SALT, 10)
    return (
        F.when(bucket == 0, F.lit("test"))
        .when(bucket == 1, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def mix_gate(key_col, lang_col, rates: dict[str, int]):
    """True iff the row survives the per-stratum keep rate (percent)."""
    rate = F.lit(0)
    for lang, r in rates.items():
        rate = F.when(lang_col == lang, F.lit(int(r))).otherwise(rate)
    return _md5_bucket(key_col, MIX_SALT, 100) < rate


def prepare_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en", "zh", "de"),
    min_quality: float = 0.5,
    mix_rates: dict[str, int] | None = None,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """documents → prepared rows with a ``split`` column attached.

    ``mix_rates`` (lang → keep-percent) applies the stratified mixing gate
    after dedup; None keeps every survivor.
    """
    passed = docs.filter(F.col("lang").isin(*langs)).filter(
        quality_score(F.col(text_col)) >= min_quality
    )
    survivors = near_dedupe(
        exact_dedupe(passed, text_col=text_col, key_col=key_col),
        text_col=text_col,
        key_col=key_col,
    )
    if mix_rates:
        survivors = survivors.filter(
            mix_gate(F.col(key_col), F.col("lang"), mix_rates)
        )
    return survivors.withColumn("split", split_of(F.col(key_col)))


def prep_audit(prepared: DataFrame) -> DataFrame:
    """Per-(split, lang) doc counts + total chars — the release audit table."""
    return prepared.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document NOVELTY against a reference shingle set — the scoring
    complement of T30's binary decontamination drop: every document gets
    ``novelty_ppm = scale · (1 − |shingles ∩ reference| / |shingles|)`` as
    an exact integer (DIV — no float), where shingles are distinct n-word
    windows.  Used both to GRADE freshness (memorization risk, snapshot
    overlap) and as a soft decontamination signal where a hard drop is too
    blunt.

    Shape: the reference shingle set is distinct-ed and BROADCAST (for
    reference sets beyond broadcast size, prefilter with the T51 bloom and
    keep the exact join as confirm — same plan discipline as
    ``bloom_decontamination``); the corpus explodes once, left-joins
    map-side, and one per-doc hash agg counts total vs matched distinct
    shingles.  Documents shorter than *n* words have no shingles and are
    dropped (no denominator — documented).

    Returns ``(id_col, n_shingles, n_seen, novelty_ppm)``.
    """
    from ..functions.dedup import word_shingles

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    ref = reference.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("_sh")
    ).distinct()
    corp = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_sh")
    ).distinct()
    marked = corp.join(
        F.broadcast(ref.withColumn("_hit", F.lit(1))), "_sh", "left"
    )
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_seen"),
    )
    return agg.select(
        id_col,
        "n_shingles",
        "n_seen",
        F.expr(
            f"CAST(({scale} * (n_shingles - n_seen)) DIV n_shingles AS BIGINT)"
        ).alias("novelty_ppm"),
    )


def stitch_continuations(
    docs: DataFrame,
    k: int = 8,
    key_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Paginated-article reassembly edges: page B CONTINUES page A when
    A's last *k* words equal B's first *k* words — the multi-page
    article/forum-thread pattern ("page 2 of 5" with a repeated lede or
    carried-over sentence).  Training pipelines stitch these before
    chunking so the model sees whole articles, not arbitrary page cuts;
    the recovered (prev, next) edges chain through T45's component
    machinery when full reassembly is wanted.

    Scale shape: two codegen projections derive the head/tail k-word
    keys, then ONE equi-join on the key — the same digest-join shape as
    exact dedup, never all-pairs; docs shorter than k words carry no
    key.  Pass *group_col* (e.g. host) to require continuations within
    a group and cut boilerplate-tail collisions.

    Returns (prev_doc, next_doc, overlap_key) — self-pairs excluded.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    base_cols = [F.col(key_col), words.alias("_w")]
    if group_col is not None:
        base_cols.append(F.col(group_col).alias("_g"))
    base = docs.select(*base_cols).filter(F.size("_w") >= k)
    tails = base.select(
        F.col(key_col).alias("prev_doc"),
        F.array_join(F.slice("_w", -k, k), " ").alias("overlap_key"),
        *([F.col("_g")] if group_col is not None else []),
    )
    heads = base.select(
        F.col(key_col).alias("next_doc"),
        F.array_join(F.slice("_w", 1, k), " ").alias("overlap_key"),
        *([F.col("_g")] if group_col is not None else []),
    )
    join_on = ["overlap_key"] + (["_g"] if group_col is not None else [])
    return (
        tails.join(heads, join_on)
        .filter(F.col("prev_doc") != F.col("next_doc"))
        .select("prev_doc", "next_doc", "overlap_key")
    )


def duplication_rate(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """T180 corpus duplication-rate audit — the metric dataset papers
    REPORT where the dedup family REMOVES (Lee et al. 2022 §5, RefinedWeb
    tab. 2): per source, the fraction of n-gram *occurrences* lying inside
    a gram that appears ≥ 2 times corpus-wide, ``dup_ppm = scale ·
    n_dup_grams / n_grams`` as an exact integer (DIV — no float).  High
    dup_ppm marks the sources worth sending through T71/T45 first, and
    the post-dedup re-run is the pipeline's before/after receipt.

    Shape: the corpus explodes ONCE into n-gram occurrences; one shuffle
    on the composite (source, gram) key builds map-side-combined
    occurrence counts; gram totals then derive from a SECOND aggregate
    over those partials (rows bounded by distinct grams × sources — the
    token stream is never re-shuffled); the duplicated verdict is a
    gram-dim ⋈ gram-dim join.  Within-source AND cross-source repeats
    both count (the total is corpus-wide by construction).

    Returns ``(source_col, n_grams, n_dup_grams, dup_ppm)``; documents
    shorter than *n* words contribute no grams (no denominator).
    """
    from ..functions.dedup import word_shingles

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    grams = docs.select(
        F.col(source_col).alias("_src"),
        F.explode(word_shingles(F.col(text_col), n)).alias("_sh"),
    )
    per_sg = grams.groupBy("_src", "_sh").agg(F.count(F.lit(1)).alias("_c"))
    totals = per_sg.groupBy("_sh").agg(F.sum("_c").alias("_tot"))
    agg = (
        per_sg.join(totals, "_sh")
        .groupBy("_src")
        .agg(
            F.sum("_c").cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("_tot") >= 2, F.col("_c")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_dup_grams"),
        )
    )
    return agg.select(
        F.col("_src").alias(source_col),
        "n_grams",
        "n_dup_grams",
        F.expr(
            f"CAST(({scale} * n_dup_grams) DIV n_grams AS BIGINT)"
        ).alias("dup_ppm"),
    )
