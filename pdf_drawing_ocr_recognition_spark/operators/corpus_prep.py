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
