"""Sparse lexical retrieval over the corpus — BM25 top-k.

The retrieval shape a training-data pipeline runs for contamination
analysis, hard-negative mining, and query-targeted corpus slicing:
score every document against a small query-term set with BM25
(Robertson/Sparck-Jones probabilistic weighting) and keep the top-k
per query.  Complements the dense stack (operators/similarity.py):
BM25 is the standard lexical baseline next to the embedding ANN paths.

Scale posture: the query-term list is tiny and BROADCAST — the corpus
token stream is semi-joined against it map-side, so the tf aggregation
only ever sees postings for query terms (at 10^12 docs this is the
difference between aggregating every token and aggregating a few
postings lists).  Document frequencies aggregate from those postings
with map-side partials; corpus scalars (N, avgdl) are one full-scan
aggregate broadcast back as a single row.  Per-term contributions are
quantized to integers (floor 1e6) before the per-(query, doc) sum so
the cross-row aggregation is exact under any partitioning — the same
determinism discipline as the bigram-LM scorer.  Top-k per query is a
bounded window (WindowGroupLimit prunes map-side on Spark 3.5+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 top-*top_k* docs per query.

    *query_terms* is a small (query_id, term) frame — broadcast.  Terms are
    matched against lowercased whitespace tokens.  idf is the standard
    Robertson-Sparck-Jones form ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (Lucene's non-negative variant); each (query, term, doc) contribution
    is quantized to ``floor(1e6 * idf * tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)))``
    so the per-(query, doc) sum is an exact integer aggregate.

    Duplicate (query_id, term) rows in *query_terms* are deliberately NOT
    deduplicated: a term listed n times contributes n× its score — i.e.
    duplicate rows act as query-term-frequency weighting, the standard
    qtf extension of BM25.  Pass a distinct frame for unweighted queries.
    (The DuckDB oracle twin mirrors this contract.)

    Returns (query_id, <key_col>, bm25_scaled BIGINT, rank INT) with
    rank 1..top_k per query (score desc, key asc tie-break).
    """
    toks = docs.select(
        F.col(key_col),
        F.size(F.split(F.col(text_col), " ")).alias("_dl"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    # map-side prune: only query-term postings survive the scan stage
    postings = toks.join(
        F.broadcast(query_terms.select("term").distinct()), "term", "left_semi"
    )
    tf = postings.groupBy("term", key_col, "_dl").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    df_dim = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("_toks"),
    ).select("_n", (F.col("_toks") / F.col("_n")).alias("_avgdl"))
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tf_norm = (F.col("_tf") * (k1 + 1.0)) / (
        F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(df_dim), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            key_col,
            F.floor(F.lit(1e6) * idf * tf_norm).cast("bigint").alias("_q"),
        )
    )
    scored = contrib.groupBy("query_id", key_col).agg(
        F.sum("_q").cast("bigint").alias("bm25_scaled")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_scaled").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", key_col, "bm25_scaled", "rank")
    )


def write_postings_index(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Persist the inverted index ONCE: (term, key, tf, dl) postings as a
    Hive-bucketed table keyed by term, plus a 1-row ``<table>_stats`` side
    table (corpus doc count + token total).  The write-once/probe-many
    contract of a search index (the T38 ANN-index pattern applied to text):
    every later ``bm25_topk_indexed`` probe scans pre-hashed term buckets
    and aggregates/joins on term with ZERO postings-side Exchange — at
    10^12 docs the tokenize+tf pass runs once, never per query batch.
    Document frequencies are NOT materialized: a probed term's df is just
    its postings-row count, already in the probed slice.
    """
    from .skew import write_bucketed

    toks = docs.select(
        F.col(key_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    postings = toks.groupBy("term", key_col, "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    write_bucketed(postings, table, n_buckets, "term")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
    )
    stats.write.mode("overwrite").saveAsTable(f"{table}_stats")


def bm25_topk_indexed(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: DataFrame,
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 top-k over a persisted postings index (``spark.table`` of
    ``write_postings_index``) — result-identical to ``bm25_topk`` on the
    same corpus (pytest-asserted), zero postings-side Exchange: the
    broadcast term semi-join and the df aggregation both run on the
    index's own term bucketing.  Only matched postings (query-term-sized,
    never corpus-sized) flow into the per-(query, doc) sum.
    """
    p = postings.join(
        F.broadcast(query_terms.select("term").distinct()), "term", "left_semi"
    )
    df_dim = p.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    st = stats.select(
        F.col("n_docs").alias("_n"),
        (F.col("n_tokens") / F.col("n_docs")).alias("_avgdl"),
    )
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
    )
    contrib = (
        p.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(df_dim), "term")
        .crossJoin(F.broadcast(st))
        .select(
            "query_id",
            key_col,
            F.floor(F.lit(1e6) * idf * tf_norm).cast("bigint").alias("_q"),
        )
    )
    scored = contrib.groupBy("query_id", key_col).agg(
        F.sum("_q").cast("bigint").alias("bm25_scaled")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_scaled").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", key_col, "bm25_scaled", "rank")
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over a positional token stream — the
    positional-inverted-index query every lexical engine pairs with BM25
    (and the shape decontamination uses to find verbatim benchmark
    sentences, not just bag-of-ngram overlap).

    *phrases* is a small (query_id, phrase) frame — broadcast.  A phrase
    of m whitespace tokens matches at document position p iff token i sits
    at p+i for every offset i < m (positions from the same ``posexplode``
    stream an index would persist).  Returns one row per (query_id, key)
    with ≥1 match: (query_id, <key>, n_matches, first_pos).

    Scale shape: the corpus token stream is joined against the BROADCAST
    phrase-term dim, so only postings of query terms ever leave the scan
    stage (the BM25 map-side-prune discipline); the one data shuffle is
    keyed (query, doc, candidate_start) and is bounded by those postings,
    never the corpus.  The full-match test is count(distinct offset) == m
    — an exact integer aggregate, immune to partitioning; repeated terms
    inside a phrase ('scan scan') are handled by the offset algebra, not
    string games.
    """
    toks = docs.select(
        F.col(key_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "term"),
    )
    return _phrase_match(toks, phrases, key_col)


def _phrase_match(toks: DataFrame, phrases: DataFrame, key_col: str) -> DataFrame:
    """Shared offset-algebra core of phrase_search / phrase_search_indexed
    over a (term, <key>, pos) token stream."""
    pterms = phrases.select(
        "query_id",
        F.posexplode(F.split(F.lower(F.col("phrase")), " ")).alias("i", "term"),
    )
    plen = pterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("_m"))
    cand = (
        toks.join(F.broadcast(pterms), "term")
        .select(
            "query_id",
            key_col,
            (F.col("pos") - F.col("i")).alias("_start"),
            "i",
        )
        .filter(F.col("_start") >= 0)
    )
    starts = cand.groupBy("query_id", key_col, "_start").agg(
        F.count_distinct("i").alias("_hit")
    )
    full = starts.join(F.broadcast(plen), "query_id").filter(
        F.col("_hit") == F.col("_m")
    )
    return full.groupBy("query_id", key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("_start").cast("bigint").alias("first_pos"),
    )


def write_positions_index(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Persist the POSITIONAL inverted index once: (term, key, pos) rows
    as a Hive-bucketed table keyed by term — ``write_postings_index``'s
    tf-index with positions kept, the layout that upgrades the index from
    bag-of-words (T72/T79) to phrase/proximity queries (T116).  Write-once
    / probe-many: at 10^12 docs the tokenize pass runs once; every later
    ``phrase_search_indexed`` probe scans pre-hashed term buckets — no
    re-tokenization, no corpus-side explode, ever again.
    """
    from .skew import write_bucketed

    toks = docs.select(
        F.col(key_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "term"),
    )
    write_bucketed(toks.select("term", key_col, "pos"), table, n_buckets, "term")


def phrase_search_indexed(
    postings: DataFrame,
    phrases: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over a persisted positional index
    (``spark.table`` of ``write_positions_index``) — result-identical to
    ``phrase_search`` on the same corpus (pytest-asserted) with the
    tokenize/explode stage gone from the probe plan (plan-asserted: no
    Generate).  The broadcast phrase-term join prunes the bucketed scan
    map-side, so only matched postings (query-term-sized, never
    corpus-sized) flow into the start-aligned aggregate.
    """
    toks = postings.join(
        F.broadcast(
            phrases.select(
                F.explode(F.split(F.lower(F.col("phrase")), " ")).alias("term")
            ).distinct()
        ),
        "term",
        "left_semi",
    )
    return _phrase_match(toks, phrases, key_col)
