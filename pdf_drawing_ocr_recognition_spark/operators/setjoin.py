"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin family).

The EXACT complement to the MinHash-LSH stack (operators/dedup.py T3):
LSH is probabilistic — its S-curve misses some true near-dups (measured
by T155) — while prefix filtering returns EVERY pair with Jaccard ≥ t and
nothing else, with no all-pairs blowup.  Public algorithm: Chaudhuri,
Ganti & Kaushik's SSJoin primitive (ICDE'06), Bayardo, Ma & Srikant's
AllPairs (WWW'07), Xiao et al.'s PPJoin (WWW'08).

The pruning principle: order every record's tokens by a single GLOBAL
rarity order (ascending document frequency, ties by token).  If
J(x, y) ≥ t then |x∩y| ≥ ceil(t·|x|), so by pigeonhole x's PREFIX of
length |x| − ceil(t·|x|) + 1 contains at least one shared token — and
symmetrically for y (any pair passing the length filter t·|y| ≤ |x| has
ceil(t·|y|)-sized overlap too).  Indexing ONLY prefixes therefore loses
no true pair, and prefixes are the RAREST tokens, so posting lists stay
short exactly where a full inverted index explodes (stopwords sort last
and almost never enter a prefix).

Scale shape at 10^12 docs: the token-frequency dim is vocabulary-bounded;
the only fan-out shuffle carries (prefix_token, key, set_size) — a few
rare tokens per document; candidate pairs form in-array per posting list
(the T3 one-shuffle combination discipline) with an explicit cap;
verification joins token ARRAYS for candidate pairs only.  Every count
is integer; the threshold test is the cross-multiplied integer predicate
10^6·|x∩y| ≥ t_ppm·|x∪y| — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def token_sets(
    docs: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(key, toks): the distinct lowercased whitespace tokens of each doc
    (empty tokens from leading/trailing whitespace dropped).  The shared
    tokenization contract with the DuckDB twin."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
        )
    )
    return docs.select(F.col(key_col).alias("key"), toks.alias("toks"))


def _ceil_ppm(n: F.Column, t_ppm: int) -> F.Column:
    """ceil(t·n) for t = t_ppm/10^6, exact: the numerator stays far under
    2^53 so the double division is exact to within 1e-10 of the rational
    quotient, whose non-integer values are ≥ 1e-6 from any integer."""
    return F.floor((n * F.lit(t_ppm) + 999_999) / F.lit(1_000_000.0)).cast(
        "long"
    )


def ppjoin_pairs(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 800_000,
    max_posting: int = 10_000,
) -> DataFrame:
    """ALL pairs (key_a < key_b) with token-set Jaccard ≥ threshold_ppm —
    exact, never sampled, never all-pairs.

    Returns (key_a, key_b, n_inter, n_union, jaccard_ppm), every column
    an exact integer.  Posting lists longer than *max_posting* are
    dropped (a prefix token shared by that many records means the
    threshold admits a clique of that size — raise the threshold instead
    of materializing it); the cap is a documented contract, not a silent
    truncation, and exactness holds whenever no list exceeds it.
    """
    sets = token_sets(docs, key_col, text_col).withColumn("n", F.size("toks"))
    sets = sets.filter(F.col("n") > 0)

    # global rarity order: ascending df, ties by token (vocabulary-bounded)
    df_dim = (
        sets.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    # per-record prefix: the (n - ceil(t*n) + 1) rarest tokens
    ordered = (
        sets.select("key", "n", F.explode("toks").alias("tok"))
        .join(df_dim, "tok")
        .groupBy("key", "n")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("ord")
        )
    )
    prefix_len = (F.col("n") - _ceil_ppm(F.col("n"), threshold_ppm) + 1).cast(
        "int"
    )
    prefixes = ordered.select(
        "key",
        "n",
        F.explode(
            F.transform(
                F.slice(F.col("ord"), 1, prefix_len), lambda s: s["tok"]
            )
        ).alias("tok"),
    )

    # candidate pairs in-array per posting list, with the length filter
    # t*max(n) <= min(n) applied inside the expansion
    postings = prefixes.groupBy("tok").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("key"), F.col("n")))
        ).alias("ids")
    )
    postings = postings.filter(
        (F.size("ids") >= 2) & (F.size("ids") <= max_posting)
    )
    pairs = (
        postings.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x, i: F.filter(
                            F.transform(
                                F.slice(
                                    F.col("ids"),
                                    i + 2,
                                    F.greatest(
                                        F.size(F.col("ids")) - i - 1, F.lit(0)
                                    ),
                                ),
                                lambda y: F.struct(
                                    x["key"].alias("key_a"),
                                    y["key"].alias("key_b"),
                                    x["n"].alias("na"),
                                    y["n"].alias("nb"),
                                ),
                            ),
                            lambda p: (
                                _ceil_ppm(
                                    F.greatest(p["na"], p["nb"]), threshold_ppm
                                )
                                <= F.least(p["na"], p["nb"])
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.key_a", "p.key_b")
        .distinct()
    )

    # exact verification on candidates only
    a = sets.select(F.col("key").alias("key_a"), F.col("toks").alias("ta"))
    b = sets.select(F.col("key").alias("key_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size("ta") + F.size("tb") - inter
    return (
        pairs.join(a, "key_a")
        .join(b, "key_b")
        .select(
            "key_a",
            "key_b",
            inter.cast("bigint").alias("n_inter"),
            union.cast("bigint").alias("n_union"),
            # the repo-wide exact-ppm discipline: both engines evaluate the
            # IDENTICAL IEEE double expression, so floor() is bit-portable
            F.floor(F.lit(1_000_000.0) * inter / union).alias("jaccard_ppm"),
        )
        .filter(
            F.lit(1_000_000) * F.col("n_inter")
            >= F.lit(threshold_ppm) * F.col("n_union")
        )
    )
