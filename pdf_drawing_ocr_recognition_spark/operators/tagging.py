"""Keyword-taxonomy tagging: label documents with topics from a controlled
vocabulary — the broadcast-dictionary classifier every corpus release runs
for domain mixing (news/code/legal/... shares in the datasheet).

The FlashText/dictionary-tagger shape made engine-shaped: the taxonomy is
a (term → topic) dim table, tiny next to the corpus, so tagging is

    tokenize (codegen split)  →  explode  →  BROADCAST hash join on term
    →  per-(doc, topic) count

— the corpus never shuffles by token; the only exchange is the final
(doc, topic)-keyed hash agg, map-side combinable, output bounded by
docs × topics.  Terms are matched as whole lowercase tokens (single-token
terms by contract — phrase terms would need an n-gram explode, quadratic
in phrase length, and are out of scope here).  A term may map to several
topics (multi-label); the dim is distinct-ed so accidental duplicate
(term, topic) rows cannot double-count.

All counting is exact integers over deterministic tokenization, so the
whole operator replays in ANSI SQL (``taxonomy_tags`` oracle).

Reference analogue: none; Table-D training-data-pipeline operator
(SURVEY §2) — corpus composition/datasheet machinery like T67/T82.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tag_documents", "topic_profile"]


def tag_documents(
    docs: DataFrame,
    taxonomy: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
    topic_col: str = "topic",
) -> DataFrame:
    """Tag each document with every taxonomy topic whose terms appear in
    its lowercase whitespace tokens.  Returns ``(id_col, topic, n_hits)``
    with one row per (document, matched topic); n_hits counts matched
    TOKEN OCCURRENCES (a term appearing 3× counts 3)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_tok"),
    )
    dim = taxonomy.select(
        F.lower(F.col(term_col)).alias("_tok"), F.col(topic_col).alias("topic")
    ).distinct()
    return (
        toks.join(F.broadcast(dim), "_tok")
        .groupBy(id_col, "topic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def topic_profile(
    tagged: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Roll per-document tags up to the release-card profile: documents
    tagged and total hits per topic (optionally per *group_col*, e.g.
    language or source).  Joins back to *docs* only when grouping needs a
    document attribute."""
    keys = ["topic"]
    src = tagged
    if group_col is not None:
        src = tagged.join(docs.select(id_col, group_col), id_col)
        keys = [group_col, "topic"]
    return src.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_hits").cast("bigint").alias("n_hits"),
    )
