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
