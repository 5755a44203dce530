"""Web-graph operators: link harvesting, host graph, PageRank (T49/T50).

The crawl-analytics companion to main-content extraction: harvest the
outgoing links of every page (Arrow-batched ``mapInPandas`` over the pure
``kernel.links`` kernel — no per-row Python), collapse them to a weighted
host-level graph, and rank hosts with a fixed-iteration damped power method
(Page et al., "The PageRank citation ranking", 1998; the MapReduce
formulation follows Malewicz et al.'s Pregel superstep shape expressed as
join + aggregate per iteration).

Scale posture (10^12 pages):
- ``extract_page_links`` is embarrassingly parallel — one narrow stage, no
  shuffle; output rows ≈ 40-80 links/page, so the link table is ~50× the
  page count but each row is tiny.
- ``host_link_graph`` is one hash aggregation on (src_host, dst_host); the
  map-side partial combine collapses the per-page duplication before the
  shuffle, so the exchange carries at most |hosts|² rows (in practice the
  power-law edge list, ~10⁹ rows at web scale).
- ``pagerank`` keeps everything distributed: the normalized edge list is
  computed once and persisted (production: a bucketed table on src, the
  T38 pattern, so per-iteration joins shuffle only the rank side), each
  iteration is join → hash-agg → left-join, dangling mass is a 1-row
  aggregate cross-joined back (never a driver collect of the rank vector),
  and per-iteration ``localCheckpoint`` keeps lineage flat.  Only the node
  count crosses the driver, once.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.links import extract_links
from .skew import host_of

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("dst_url", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ]
)


def extract_page_links(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → one row per outgoing link (url, dst_url, anchor).

    Arrow-batched; the parquet scan is pruned to (url, html) only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (
                    html.decode("utf-8", "replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                for link in extract_links(text, url):
                    rows.append((url, link["href"], link["anchor"]))
            yield pd.DataFrame(rows, columns=["url", "dst_url", "anchor"])

    return pages.select("url", "html").mapInPandas(run, LINKS_SCHEMA)


def host_link_graph(links: DataFrame) -> DataFrame:
    """links(url, dst_url) → weighted host-level edges (src_host, dst_host, weight).

    One hash aggregation; map-side partial combine makes the shuffle carry
    per-(task, edge) partials, not per-link rows.
    """
    return (
        links.select(
            host_of(F.col("url")).alias("src_host"),
            host_of(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "weight",
    damping: float = 0.85,
    n_iters: int = 3,
    flatten_lineage: bool = True,
) -> DataFrame:
    """(node, rank) after *n_iters* damped power-method iterations.

    rank_{t+1}(v) = (1-d)/n + d * ( Σ_{u→v} rank_t(u)·w(u,v)/out(u)
                                    + dangling_mass_t / n )

    Fully distributed: the transition matrix (edge list normalized by
    out-weight) is built once and persisted; each iteration is one shuffle
    join + one hash aggregation.  Dangling mass (rank parked on nodes with
    no out-edges) is a single-row aggregate broadcast back into the update —
    the rank vector itself never crosses the driver.  ``localCheckpoint``
    per iteration flattens lineage (production: reliable ``checkpoint()``
    if executor loss must be survivable mid-run); ``flatten_lineage=False``
    keeps the full iteration lineage in one plan (plan inspection / tiny
    graphs only — lineage depth grows with ``n_iters``).
    """
    if n_iters < 1:
        raise ValueError(f"pagerank requires n_iters >= 1, got {n_iters}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # the one driver scalar (node-universe size)
    # host-dim sized; pinned so the per-iteration dangling-mass aggregate
    # reads it back instead of re-running the corpus scan every round
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w")).localCheckpoint()
    # transition edges, normalized once and reused by every iteration
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    trans.count()  # materialize before iterating

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iters):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
        )
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dangling))
            .join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if flatten_lineage:
            ranks = ranks.localCheckpoint()
    trans.unpersist()
    return ranks


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "weight",
    damping: float = 0.85,
    n_iters: int = 3,
    flatten_lineage: bool = True,
) -> DataFrame:
    """Seed-personalized PageRank — TrustRank (Gyöngyi, Garcia-Molina &
    Pedersen, VLDB 2004): the standard spam-demotion prior for web corpora.

    Identical power method to :func:`pagerank` except the teleport
    distribution is concentrated on a curated SEED set instead of uniform:

        trust_{t+1}(v) = (1-d)·tele(v) + d·( Σ_{u→v} trust_t(u)·w/out(u)
                                             + dangling_mass_t·tele(v) )

    where tele(v) = 1/|S| for seed nodes and 0 otherwise — so trust can
    only flow OUT of the seed set along links, and hosts unreachable from
    any seed end at exactly 0.0 (spam islands get no mass no matter how
    densely they interlink).  ``seeds`` is a one-column DataFrame of node
    ids; only seeds present in the edge universe carry teleport mass (the
    normalizer is |S ∩ nodes|).

    Scale shape is pagerank's: the teleport column rides the node dim,
    each iteration is one shuffle join + hash agg, dangling mass is a
    1-row broadcast, and the only driver scalar is the seed count.
    """
    if n_iters < 1:
        raise ValueError(f"trustrank requires n_iters >= 1, got {n_iters}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(seed_nodes.select("node", F.lit(True).alias("is_seed")), "node", "left")
        .localCheckpoint()
    )
    s = nodes.filter(F.col("is_seed")).count()  # the one driver scalar
    if s == 0:
        raise ValueError("trustrank: no seed intersects the edge universe")
    tele_nodes = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(1.0) / s).otherwise(F.lit(0.0)).alias("tele"),
    ).localCheckpoint()
    # host-dim sized; pinned so the per-iteration dangling-mass aggregate
    # reads it back instead of re-running the corpus scan every round
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w")).localCheckpoint()
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    trans.count()

    ranks = tele_nodes.select("node", F.col("tele").alias("rank"))
    for _ in range(n_iters):
        contribs = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
        )
        dangling = (
            ranks.join(out_w, ranks["node"] == out_w["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            tele_nodes.crossJoin(F.broadcast(dangling))
            .join(contribs, tele_nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") * F.col("tele")
                    )
                ).alias("rank"),
            )
        )
        if flatten_lineage:
            ranks = ranks.localCheckpoint()
    trans.unpersist()
    return ranks.join(
        tele_nodes.select("node", (F.col("tele") > 0).alias("is_seed")), "node"
    ).select("node", "rank", "is_seed")


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    max_hops: int = 4,
    flatten_lineage: bool = True,
) -> DataFrame:
    """Collapse HTTP redirect chains to their final targets — the fetch-log
    normalization that runs before URL dedup (T48/T125): every alias URL
    maps to the URL whose content was actually served, so a chain of moved
    pages counts as ONE page, not ``len(chain)``.

    *redirects* is the redirect edge list (one out-edge per source; if a
    crawl observed several, the lexicographic minimum target wins —
    deterministic, engine-portable).  Returns one row per source URL:
    (url, final_url, n_hops, resolved) where ``resolved`` is False for
    chains still pointing at another redirect after *max_hops* (loops and
    over-long chains — flagged, never spun on; a self-redirect is the
    1-hop unresolved case).

    Scale: each hop is ONE equi-join keyed by the current target against
    the redirect dim — *max_hops* joins total, never an unbounded loop
    (HTTP clients cap redirects the same way; browsers stop around 20).
    The redirect dim is usually tiny next to the corpus — broadcast it by
    wrapping: ``resolve_redirects(F.broadcast(edges))`` is NOT needed;
    Spark's AQE will pick broadcast when the dim is small.  Lineage is
    flattened per hop (``localCheckpoint``) unless disabled for plan
    inspection.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = (
        redirects.groupBy(F.col(src).alias("_s"))
        .agg(F.min(F.col(dst)).alias("_d"))
    )
    mapping = e.select(
        F.col("_s").alias("url"),
        F.col("_d").alias("final_url"),
        F.lit(1).alias("n_hops"),
    )
    for _ in range(max_hops - 1):
        step = e.select(F.col("_s").alias("_fs"), F.col("_d").alias("_fd"))
        mapping = (
            mapping.join(step, mapping["final_url"] == step["_fs"], "left")
            .select(
                "url",
                F.coalesce(F.col("_fd"), F.col("final_url")).alias("final_url"),
                (
                    F.col("n_hops")
                    + F.when(F.col("_fd").isNotNull(), 1).otherwise(0)
                ).alias("n_hops"),
            )
        )
        if flatten_lineage:
            mapping = mapping.localCheckpoint()
    probe = e.select(F.col("_s").alias("_fs"), F.lit(True).alias("_still"))
    return (
        mapping.join(probe, mapping["final_url"] == probe["_fs"], "left")
        .select(
            "url",
            "final_url",
            F.col("n_hops").cast("int").alias("n_hops"),
            (~F.coalesce(F.col("_still"), F.lit(False))).alias("resolved"),
        )
    )


def cocitation_pairs(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    min_jaccard_ppm: int = 500000,
    max_fanout: int = 200,
) -> DataFrame:
    """Co-citation similarity between link targets (Small 1973, applied to
    the web graph by Dean & Henzinger, WWW 1999): two hosts are related —
    or, in curation, two SPAM hosts belong to one farm — when the same
    sources link to both.  Jaccard over DISTINCT in-linking host sets,
    exact integer ppm.  Content-blind by design: a farm that rewrites its
    text past every content dedup still shares its backlink ring, so this
    catches what T122 mirrors / T119 URL farms cannot.

    Scale shape (the T3/T122 discipline): distinct (src, dst) edges → per-
    SOURCE out-link lists capped at ``max_fanout`` (a directory page
    linking thousands of hosts asserts no pairwise affinity and would
    fan out quadratically) → unordered target pairs IN-ARRAY → one
    pair-count agg; in-degree sizes join back as broadcast dims.

    Returns (host_a, host_b, n_cociting, n_in_a, n_in_b, jaccard_ppm).
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).distinct()
    indeg = e.groupBy("_d").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    lists = e.groupBy("_s").agg(F.sort_array(F.collect_set("_d")).alias("ds"))
    pairs = (
        lists.filter(F.size("ds").between(2, max_fanout))
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ds"),
                                i + 2,
                                F.greatest(
                                    F.size(F.col("ds")) - i - 1, F.lit(0)
                                ),
                            ),
                            lambda y: F.struct(
                                x.alias("host_a"), y.alias("host_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy("p.host_a", "p.host_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cociting"))
    )
    out = (
        pairs.join(
            F.broadcast(
                indeg.select(F.col("_d").alias("host_a"), F.col("_n").alias("n_in_a"))
            ),
            "host_a",
        )
        .join(
            F.broadcast(
                indeg.select(F.col("_d").alias("host_b"), F.col("_n").alias("n_in_b"))
            ),
            "host_b",
        )
        .withColumn(
            "jaccard_ppm",
            F.floor(
                F.lit(1000000.0)
                * F.col("n_cociting")
                / (F.col("n_in_a") + F.col("n_in_b") - F.col("n_cociting"))
            ),
        )
        .filter(F.col("jaccard_ppm") >= min_jaccard_ppm)
    )
    return out.select(
        "host_a", "host_b", "n_cociting", "n_in_a", "n_in_b", "jaccard_ppm"
    )


def link_reciprocity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host link reciprocity: of a host's distinct out-neighbors, what
    fraction link BACK — the link-exchange-scheme signal (reciprocal-link
    rings are the oldest ranking manipulation; organic web reciprocity is
    low, so hosts near 10⁶ ppm with non-trivial out-degree are trading
    links).  Complements T139 co-citation (shared backlinks) with the
    direct-trade pattern, and feeds T114 TrustRank seed selection
    (high-reciprocity hosts make bad seeds).

    Scale shape: distinct edges (self-loops dropped), ONE left-semi
    equi-join of the edge set against its own reversal on the composite
    (src, dst) key — a co-partitioned shuffle join, no fan-out — then two
    map-side-combinable counts.  Exact integer ppm.

    Returns (host, n_out, n_reciprocal, reciprocity_ppm).
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col(src_col) != F.col(dst_col))
        .distinct()
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = e.join(rev, ["s", "d"], "left_semi")
    out_deg = e.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_out")
    )
    rec_deg = recip.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reciprocal")
    )
    return (
        out_deg.join(rec_deg, "host", "left")
        .select(
            "host",
            "n_out",
            F.coalesce("n_reciprocal", F.lit(0)).cast("bigint").alias(
                "n_reciprocal"
            ),
            F.floor(
                F.lit(1000000.0)
                * F.coalesce("n_reciprocal", F.lit(0))
                / F.col("n_out")
            ).alias("reciprocity_ppm"),
        )
    )


def hits_scores(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    n_iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg, JACM 1999) in EXACT integer
    arithmetic: the mutual-reinforcement pair PageRank doesn't give you —
    directories/aggregators score as hubs, canonical sources as
    authorities; corpus curation reads authority as an originality prior
    and hubness as a boilerplate-aggregator prior (complements T50/T114).

    Engine-exact quantization: instead of float L2 normalization, every
    half-step renormalizes by the maximum via ``floor(x·scale / max(x))``
    (L∞ at ppm resolution) — sums are integer, division order is fixed,
    so two engines and any partition order produce identical bits; the
    ranking HITS converges on is preserved (normalization choice never
    reorders scores within an iteration).  Values stay ≤ scale·max_degree
    per half-step — no overflow below degree 9·10¹² at ppm scale.

    Scale shape: distinct edges, one shuffle join + hash agg per
    half-step, the max as a 1-row broadcast; n_iters is small and fixed
    (2–3 rounds give the head of the ranking; HITS at web scale is always
    run few-step).  Returns (host, authority_ppm, hub_ppm).
    """
    if n_iters < 1:
        raise ValueError(f"hits_scores requires n_iters >= 1, got {n_iters}")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.select("node", F.lit(scale).cast("bigint").alias("x"))

    def _norm(df: DataFrame) -> DataFrame:
        # integer DIV, never float division — bit-identical across engines
        mx = df.agg(F.max("x").alias("mx"))
        return df.crossJoin(F.broadcast(mx)).select(
            "node",
            F.when(
                F.col("mx") > 0,
                F.expr(f"CAST((x * {scale}) DIV mx AS BIGINT)"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("x"),
        )

    a = None
    for _ in range(n_iters):
        a = _norm(
            nodes.join(
                e.join(h, e["s"] == h["node"])
                .groupBy("d")
                .agg(F.sum("x").alias("inx")),
                nodes["node"] == F.col("d"),
                "left",
            ).select("node", F.coalesce("inx", F.lit(0)).alias("x"))
        )
        h = _norm(
            nodes.join(
                e.join(a, e["d"] == a["node"])
                .groupBy("s")
                .agg(F.sum("x").alias("outx")),
                nodes["node"] == F.col("s"),
                "left",
            ).select("node", F.coalesce("outx", F.lit(0)).alias("x"))
        )
    return (
        a.withColumnRenamed("x", "authority_ppm")
        .join(h.withColumnRenamed("x", "hub_ppm"), "node")
        .withColumnRenamed("node", "host")
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "weight",
    n_rounds: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation over the host graph (Zhu &
    Ghahramani 2002 / Raghavan et al. 2007, hard-clamped synchronous
    variant): a handful of curated host labels (topic, spam/ham,
    language community) spread along real extracted links — the
    cheap-supervision complement to T50 PageRank (importance) and T114
    TrustRank (trust), labeling hosts no classifier ever saw text from.

    Per round, every node adopts the label with the LARGEST incoming
    edge-weight mass among its in-neighbors' current labels; seed nodes
    are clamped and never change; unreached nodes carry no row.  The
    argmax is the repo's deterministic min-struct discipline —
    ``min(struct(-mass, label))`` = greatest mass, ties to the
    lexicographically smallest label — so every engine replays the same
    winner (ties are load-bearing in the oracle).  All arithmetic is
    integer (edge weights are link counts).

    Scale shape: per round ONE equi-join of the edge list against the
    current label frontier plus ONE map-side-combinable hash agg —
    work scales with |labeled frontier|'s out-edges, never |graph|; the
    rounds are a fixed small constant (label propagation converges in a
    few hops or not at all).  ``seeds`` stays dimension-sized and is
    broadcast-eligible.

    Returns (host, label, is_seed) — one row per host labeled after
    *n_rounds*.
    """
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    ).filter(F.col("_s") != F.col("_d"))
    seed_rows = seeds.select(
        F.col("node").alias("host"), F.col("label").alias("label")
    )
    labels = seed_rows
    for _ in range(n_rounds):
        picked = (
            e.join(labels.withColumnRenamed("host", "_s"), "_s")
            .groupBy(F.col("_d").alias("host"), "label")
            .agg(F.sum("_w").alias("_mass"))
            .groupBy("host")
            .agg(
                F.min(F.struct((-F.col("_mass")).alias("_neg"), F.col("label")))
                .alias("_win")
            )
            .select("host", F.col("_win.label").alias("label"))
        )
        labels = seed_rows.unionByName(
            picked.join(seed_rows.select("host"), "host", "left_anti")
        )
    return labels.join(
        seed_rows.select("host", F.lit(1).alias("is_seed")), "host", "left"
    ).select(
        "host", "label", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed")
    )
