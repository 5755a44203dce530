"""Encoding-anomaly signals: mojibake, replacement chars, control chars.

Web crawls are full of double-encoded UTF-8 ("Ã©" where "é" was meant,
"â€™" for a right quote), U+FFFD replacement characters from lossy decodes,
and stray C0 control bytes — all strong low-quality indicators that corpus
pipelines (CCNet, RefinedWeb) filter or down-weight on.

Everything here is a pure JVM Column expression with an exact DuckDB twin:
mojibake signatures are counted with the length/replace trick over a FIXED
literal set (both engines count codepoints, so the arithmetic is identical),
control characters via an explicit-range regexp class — no Unicode property
classes, whose semantics differ across regex engines.

Reference analogue: none (the reference trusts its local files); this is
north-rule crawl-hygiene generalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the classic UTF-8-read-as-Latin-1/cp1252 signatures (two-char and
# three-char sequences that are vanishingly rare in intentional text)
MOJIBAKE_MARKERS: tuple[str, ...] = (
    "Ã©", "Ã¨", "Ã«", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Ã§",
    "â€™", "â€œ", "â€\x9d", "â€“", "â€”", "Â·", "Â«", "Â»",
)

REPLACEMENT_CHAR = "�"

# C0 controls except tab/newline/carriage-return
_CTRL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def _literal_count(col: Column, marker: str) -> Column:
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def mojibake_count(col: Column) -> Column:
    """Occurrences of any marker in MOJIBAKE_MARKERS (non-overlapping)."""
    total = None
    for m in MOJIBAKE_MARKERS:
        c = _literal_count(col, m)
        total = c if total is None else total + c
    return total


def replacement_char_count(col: Column) -> Column:
    return _literal_count(col, REPLACEMENT_CHAR)


def control_char_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(_CTRL_CLASS))


def encoding_anomaly_score(col: Column) -> Column:
    """[0, ~1] per-char anomaly density: mojibake weighted double (each
    signature implies a whole garbled word), rounded for cross-engine
    float parity."""
    n = F.length(col)
    raw = (
        mojibake_count(col) * 2
        + replacement_char_count(col)
        + control_char_count(col)
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(raw / n, 6))


def mojibake_markers_sql_counts(text_expr: str = "text") -> str:
    """DuckDB twin of mojibake_count over ``text_expr`` (shared source of
    truth for the oracle SQL)."""
    terms = []
    for m in MOJIBAKE_MARKERS:
        lit = m.replace("'", "''")
        terms.append(
            f"((length({text_expr}) - length(replace({text_expr}, '{lit}', '')))"
            f" // {len(m)})"
        )
    return "(" + " + ".join(terms) + ")"


def with_mojibake_repair(
    df,
    text_col: str = "text",
    out_col: str = "repaired",
    rounds_col: str = "rounds",
):
    """Append ``(repaired, rounds)`` columns applying the
    kernel/mojibake.py repair (peel UTF-8-as-legacy-codepage layers,
    fixed cp1252→latin-1 attempt order, ≤3 rounds) in ONE narrow
    Arrow-batched ``mapInPandas`` stage — the REPAIR companion to this
    module's detection counters; no shuffle, no per-row Python UDF.
    NULL text passes through as (NULL, 0)."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from ..kernel.mojibake import repair_mojibake

    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, StringType()), StructField(rounds_col, IntegerType())]
    )

    def run(batches):
        for pdf in batches:
            out_t, out_r = [], []
            for t in pdf[text_col]:
                if t is None:
                    out_t.append(None)
                    out_r.append(0)
                else:
                    fixed, n = repair_mojibake(t)
                    out_t.append(fixed)
                    out_r.append(n)
            pdf[out_col] = out_t
            pdf[rounds_col] = out_r
            yield pdf

    return df.mapInPandas(run, schema)
