"""Domain blocklist / allowlist filtering (crawl-pipeline URL hygiene).

A crawl pipeline drops documents whose host falls under any blocklisted
domain *suffix* (``tracker.net`` blocks ``cdn.a.tracker.net`` but not
``nottracker.net``) before content ever reaches extraction — the standard
UT1/adult-blocklist stage every webtext corpus (CCNet, RefinedWeb, FineWeb)
runs first.

Scale posture
-------------
Suffix matching is re-expressed as **equi-joins on host-ancestor keys**: the
ancestor of depth ``d`` is ``substring_index(host, '.', -d)`` (the last ``d``
labels) — pure whole-stage codegen, no HOF, no regex scan of the blocklist.
One *broadcast* left join per depth (hosts have ≤ ~6 labels) plus one on the
full host marks matches entirely **map-side: zero shuffle Exchange on the
corpus side** (plan-asserted in ``tests/test_filtering.py``).  Contrast the
naive ``host LIKE '%.'||suffix`` cross scan, which is O(|corpus|·|rules|)
and unindexable.  For blocklists too large to broadcast raw, the T51 pattern
applies unchanged: broadcast a Bloom filter over the suffix set as the
map-side prune and confirm survivors with one exact join.

Reference analogue: none (the reference parses local files); this is the
north-rule crawl-ingest generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LABELS_DEFAULT = 6


def host_ancestor(host_col: F.Column, depth: int) -> F.Column:
    """Last ``depth`` dot-separated labels of a host (codegen-safe)."""
    return F.substring_index(host_col, ".", -depth)


def mark_blocked_hosts(
    df: DataFrame,
    host_col: str,
    blocklist_df: DataFrame,
    suffix_col: str = "suffix",
    max_labels: int = MAX_LABELS_DEFAULT,
    flag_col: str = "is_blocked",
) -> DataFrame:
    """Add ``flag_col``: true iff the lowercased host equals, or is a
    subdomain of, any blocklist suffix.  Zero shuffle on ``df``'s side."""
    bl = blocklist_df.select(
        F.lower(F.col(suffix_col)).alias("__bl_suffix")
    ).distinct()
    cur = df.withColumn("__host_lc", F.lower(F.col(host_col))).withColumn(
        "__n_labels", F.size(F.split(F.col("__host_lc"), r"\."))
    )
    hit_cols: list[str] = []
    # depth-d ancestor joins; a null key never equi-matches, so hosts shorter
    # than d are naturally skipped.  The d == n_labels case doubles as the
    # exact full-host match for hosts within max_labels …
    for d in range(1, max_labels + 1):
        key, hit = f"__anc_{d}", f"__hit_{d}"
        cur = cur.withColumn(
            key,
            F.when(
                F.col("__n_labels") >= d, host_ancestor(F.col("__host_lc"), d)
            ),
        )
        dim = bl.select(
            F.col("__bl_suffix").alias(key), F.lit(True).alias(hit)
        )
        cur = cur.join(F.broadcast(dim), key, "left").drop(key)
        hit_cols.append(hit)
    # … and one join on the raw host covers exact matches deeper than
    # max_labels (suffix rules deeper than max_labels are out of contract).
    full_dim = bl.select(
        F.col("__bl_suffix").alias("__host_lc"), F.lit(True).alias("__hit_full")
    )
    cur = cur.join(F.broadcast(full_dim), "__host_lc", "left")
    hit_cols.append("__hit_full")
    blocked = F.coalesce(*[F.col(h) for h in hit_cols], F.lit(False))
    return cur.withColumn(flag_col, blocked).drop(
        "__host_lc", "__n_labels", *hit_cols
    )


def domain_block_filter(
    df: DataFrame,
    host_col: str,
    blocklist_df: DataFrame,
    suffix_col: str = "suffix",
    mode: str = "block",
    max_labels: int = MAX_LABELS_DEFAULT,
) -> DataFrame:
    """Keep rows NOT under any listed domain (``mode='block'``) or ONLY rows
    under a listed domain (``mode='allow'``)."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    marked = mark_blocked_hosts(
        df, host_col, blocklist_df, suffix_col, max_labels, flag_col="__blocked"
    )
    keep = ~F.col("__blocked") if mode == "block" else F.col("__blocked")
    return marked.filter(keep).drop("__blocked")


def url_template_farms(
    fetches: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
    min_pages: int = 2,
) -> DataFrame:
    """URL-template farm detection: group fetches by (host, structural URL
    template) and measure how much DISTINCT content each template actually
    serves.  A template with many pages and few distinct bodies is a page
    generator (calendar spam, session-id mirrors, faceted-search explosions)
    — the crawl-frontier analogue of content dedup, caught BEFORE fetching
    more of the farm (Common Crawl / frontier "URL pattern dedup").

    Emits (host, template, n_pages, n_distinct_texts, dup_ratio_ppm) for
    templates with ≥ *min_pages* pages; dup_ratio_ppm =
    floor(1e6·(n_pages − n_distinct)/n_pages) — exact integer arithmetic
    (one integer-input IEEE mult+div, bitwise across engines).

    Scale: content is reduced to an md5 digest in the scan projection, so
    the ONE hash aggregate shuffles (host, template, digest-partials) —
    map-side combine bounds the exchange by the template universe (URL
    grammar × hosts, tiny), never the corpus; the distinct count is
    Spark's standard two-phase partial-distinct, also template-bounded.
    """
    from ..functions.urls import url_host, url_template

    u = F.col(url_col)
    grouped = (
        fetches.select(
            url_host(u).alias("host"),
            url_template(u).alias("template"),
            F.md5(F.encode(F.col(content_col), "utf-8")).alias("_fp"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.count_distinct("_fp").cast("bigint").alias("n_distinct_texts"),
        )
        .filter(F.col("n_pages") >= min_pages)
    )
    return grouped.select(
        "host",
        "template",
        "n_pages",
        "n_distinct_texts",
        F.floor(
            F.lit(1000000.0)
            * (F.col("n_pages") - F.col("n_distinct_texts"))
            / F.col("n_pages")
        ).alias("dup_ratio_ppm"),
    )


def registered_domains(
    df: DataFrame,
    host_col: str,
    psl_df: DataFrame,
    suffix_col: str = "suffix",
    max_labels: int = MAX_LABELS_DEFAULT,
    pld_col: str = "pld",
) -> DataFrame:
    """Add ``pld_col``: the registered (pay-level) domain of each host —
    the LONGEST matching public suffix from *psl_df* plus one label.  The
    grouping key every host-level statistic in a web pipeline actually
    wants (blog.a.co.uk and shop.a.co.uk are ONE registrant; per-host
    stats over them double-count).

    Semantics (the public-suffix-list algorithm, exact-rule subset —
    wildcard/exception rules out of contract, documented): longest suffix
    match wins; a host that IS a public suffix has no registrable domain
    (NULL); a host matching no rule falls back to its last two labels
    (PSL's implicit ``*`` rule).

    Same scale shape as :func:`mark_blocked_hosts`: one BROADCAST
    equi-join per ancestor depth — pure codegen keys, zero shuffle on the
    corpus side, never a regex scan of the rule list.
    """
    psl = psl_df.select(F.lower(F.col(suffix_col)).alias("__ps")).distinct()
    cur = df.withColumn("__host_lc", F.lower(F.col(host_col))).withColumn(
        "__n_labels", F.size(F.split(F.col("__host_lc"), r"\."))
    )
    depth_hits: list[tuple[int, str]] = []
    for d in range(1, max_labels + 1):
        key, hit = f"__anc_{d}", f"__psl_{d}"
        cur = cur.withColumn(
            key,
            F.when(
                F.col("__n_labels") >= d, host_ancestor(F.col("__host_lc"), d)
            ),
        )
        dim = psl.select(F.col("__ps").alias(key), F.lit(d).alias(hit))
        cur = cur.join(F.broadcast(dim), key, "left").drop(key)
        depth_hits.append((d, hit))
    cur = cur.withColumn(
        "__psl_m",
        F.greatest(*[F.coalesce(F.col(h), F.lit(0)) for _, h in depth_hits]),
    )
    pld = (
        F.when(F.col("__psl_m") == 0,
               F.when(F.col("__n_labels") >= 2,
                      F.substring_index(F.col("__host_lc"), ".", -2))
               .otherwise(F.col("__host_lc")))
        .when(F.col("__psl_m") >= F.col("__n_labels"),
              F.lit(None).cast("string"))
        .otherwise(
            # data-dependent label count → SQL form (pyspark's
            # substring_index only takes a literal count)
            F.expr("substring_index(__host_lc, '.', -(__psl_m + 1))")
        )
    )
    out = cur.withColumn(pld_col, pld)
    drop = ["__host_lc", "__n_labels", "__psl_m"] + [h for _, h in depth_hits]
    return out.drop(*drop)


def language_mixture(
    df: DataFrame,
    host_col: str,
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host language-mixture audit: Gini impurity of the host's
    language distribution as exact floor-ppm — the machine-translation-
    farm signal (a site serving the same templates in 14 languages is MT
    boilerplate, not 14 communities; CCNet/FineWeb curation downweights
    such hosts).  Gini = 1 − Σ(n_l/n)² computed as integer arithmetic
    inside one double expression — n ≤ 10⁸ per host keeps n²·10⁶ < 2⁵³,
    so the ppm is exact and engine-identical.

    Two stacked map-side-combinable aggregates: (host, lang) counts, then
    the host rollup — exchanges carry language rows per host (≤ |langs|),
    never documents.  Returns (host, n_docs, n_langs, lang_gini_ppm).
    """
    per_lang = df.groupBy(
        F.col(host_col).alias("host"), F.col(lang_col).alias("_l")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    return per_lang.groupBy("host").agg(
        F.sum("_c").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.floor(
            F.lit(1000000.0)
            * (F.sum("_c") * F.sum("_c") - F.sum(F.col("_c") * F.col("_c")))
            / (F.sum("_c") * F.sum("_c"))
        ).alias("lang_gini_ppm"),
    )
