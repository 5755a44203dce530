"""Dump formatted physical plans for the headline queries → PLANS.md.

Run after plan-affecting changes; the assertions encode the plan properties
the engine promises (pushdown, pruning, broadcast, no per-row Python):

- pages scan: lang filter in PushedFilters, ReadSchema without `text`;
- broadcast_pattern_join: BroadcastHashJoin (no sort-merge for a 20-row dim);
- anti_join_resume: BroadcastHashJoin LeftAnti;
- pricing_summary: partial aggregation (HashAggregate x2) + WholeStageCodegen;
- minhash_lsh_pairs: exchanges isolating the digest stage.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    import __spark_entry__ as em
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS, write_corpus
    from pdf_drawing_ocr_recognition_spark.plans.pipeline import extraction_pipeline
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    sf = "/root/testdata/sf0.001"
    spark = build_session(app="plans", master="local[4]", shuffle_partitions=4)

    import os
    import tempfile

    pages_dir = tempfile.mkdtemp(prefix="plans_pages_")
    write_corpus(pages_dir, 300, files=2)

    sections = []
    checks = []

    def grab(title: str, df, *must_contain: str):
        plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append((title, plan))
        for needle in must_contain:
            ok = needle in plan
            checks.append((title, needle, ok))

    ext = extraction_pipeline(spark, pages_dir, PATTERNS)
    grab("extraction_pipeline", ext, "PushedFilters", "lang")
    scan_line = [l for l in sections[-1][1].split("\n") if "ReadSchema" in l]
    text_pruned = all("text" not in l.split("ReadSchema")[-1] for l in scan_line)
    checks.append(("extraction_pipeline", "html-only ReadSchema (text pruned)", text_pruned))

    # day=-partitioned layout: the day predicate must prune directories at
    # planning time (PartitionFilters), not filter rows after the scan
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import (
        write_corpus_partitioned,
    )
    from pdf_drawing_ocr_recognition_spark.sources.pages import read_pages_partitioned

    part_dir = tempfile.mkdtemp(prefix="plans_pages_part_")
    write_corpus_partitioned(part_dir, 300, files=2)
    grab(
        "partitioned_day_scan",
        read_pages_partitioned(spark, part_dir, days=("2025-01-03",)),
        "PartitionFilters: [isnotnull(day",
        "day#",
    )

    grab("broadcast_pattern_join", em.q_broadcast_pattern_join(spark, sf), "BroadcastHashJoin")
    grab("anti_join_resume", em.q_anti_join_resume(spark, sf), "BroadcastHashJoin", "LeftAnti")
    # partial_sum below the exchange = map-side combine (codegen markers only
    # appear in final AQE plans post-execution, so assert the agg shape)
    grab("pricing_summary", em.q_pricing_summary(spark, sf), "HashAggregate", "partial_sum")
    # round-3 Arrow shingle kernel: signatures computed in MapInPandas, and
    # the old per-key window sort of every token is gone from the plan
    grab("minhash_lsh_pairs", em.q_minhash_lsh_pairs(spark, sf), "Exchange", "MapInPandas")
    mh_plan = sections[-1][1]
    checks.append(
        ("minhash_lsh_pairs", "no token window sort (Arrow kernel)",
         "Window" not in mh_plan)
    )
    # incremental corpus-delta dedup: every corpus interaction is a
    # semi/anti index probe — no inner join of batch x corpus anywhere
    grab("incremental_dedup", em.q_incremental_dedup(spark, sf), "LeftSemi", "LeftAnti")
    # paragraph dedup: the first-occurrence agg must have a map-side partial
    # (partial_min below the digest exchange) so hot paragraphs send one
    # partial per map task, and the keep-flag join stays a plain equi-join
    grab("paragraph_dedup", em.q_paragraph_dedup(spark, sf), "partial_min")
    pd_plan = sections[-1][1]
    checks.append(
        ("paragraph_dedup", "no cartesian/nested-loop pairing",
         "NestedLoopJoin" not in pd_plan and "CartesianProduct" not in pd_plan)
    )
    # URL dedup: best-fetch-per-page via max_by with map-side partials (the
    # struct tie-break ordering keeps the buffer out of the hash-agg fast
    # path — SortAggregate — but partial_max_by below the exchange is what
    # bounds the shuffle to one row per (task, page)); never a window
    grab("url_dedup", em.q_url_dedup(spark, sf), "partial_max_by")
    ud_plan = sections[-1][1]
    checks.append(("url_dedup", "no window sort", "Window" not in ud_plan))
    grab("first_success_window", em.q_first_success_window(spark, sf), "Window")
    # Arrow scorer: corpus is mapInPandas-scored against driver-collected
    # queries (no join at all), partial top-k map-side, final window tiny
    grab("cosine_topk", em.q_cosine_topk(spark, sf), "MapInPandas")
    cos_plan = sections[-1][1]
    checks.append(
        ("cosine_topk", "no per-pair join (scores in Arrow kernel)",
         "NestedLoopJoin" not in cos_plan)
    )
    # end-to-end corpus-prep composition: lang+quality filters must reach the
    # scan (pushed/fused, no separate Filter-over-everything stage), dedup
    # joins stay semi/anti (never inner+distinct), one plan end to end
    grab("training_prep", em.q_training_prep(spark, sf), "LeftSemi", "LeftAnti")
    tp_plan = sections[-1][1]
    checks.append(
        ("training_prep", "lang filter pushed to scan",
         "PushedFilters: [" in tp_plan and "lang" in tp_plan.split("PushedFilters:")[1][:200])
    )
    grab("semi_join_priority", em.q_semi_join_priority(spark, sf), "LeftSemi")
    sj_plan = sections[-1][1]
    checks.append(
        ("semi_join_priority", "no distinct (semi join dedups by construction)",
         "Distinct" not in sj_plan)
    )
    # decontamination: benchmark shingle set broadcast against the corpus
    # explode — never a shuffle of the big exploded side for the join itself
    grab("decontamination", em.q_decontamination(spark, sf), "BroadcastHashJoin")
    # PII scrubbing: pure regexp projection — whole-stage codegen, no
    # Python/Arrow stage anywhere in the plan
    # "*(1)" = whole-stage-codegen stage marker in executedPlan.toString()
    grab("pii_scrub", em.q_pii_scrub(spark, sf), "*(1) Project")
    pii_plan = sections[-1][1]
    checks.append(
        ("pii_scrub", "no Python stage (regexp stays JVM-side)",
         "InPandas" not in pii_plan and "ArrowEvalPython" not in pii_plan)
    )
    # IVF argmax must be an aggregate (max_by), not a sort-based window
    ivf_plan_df = em.q_ivf_assign_counts(spark, sf)
    grab("ivf_assign_counts", ivf_plan_df, "max_by", "BroadcastNestedLoopJoin")
    ivf_plan = sections[-1][1]
    checks.append(("ivf_assign_counts", "no Window (argmax is an agg)", "Window" not in ivf_plan))
    grab("pivot_event_matrix", em.q_pivot_event_matrix(spark, sf), "HashAggregate", "partial_pivotfirst")
    # link harvesting → host graph: ONE narrow Arrow stage feeds a single
    # map-side-combined hash agg — exactly one Exchange in the whole plan
    grab("host_link_graph", em.q_host_link_graph(spark, sf), "MapInPandas", "partial_count")
    hlg_plan = sections[-1][1]
    checks.append(
        ("host_link_graph", "single exchange (edge agg only)",
         hlg_plan.count("Exchange") == 1)
    )
    # PageRank iteration: contributions via hash agg (never a window), the
    # dangling-mass scalar broadcast back (BroadcastNestedLoopJoin of a
    # 1-row aggregate), rank vector never collected
    from pdf_drawing_ocr_recognition_spark.operators.links import (
        extract_page_links,
        host_link_graph,
        pagerank,
    )

    lp_pages, _ = em._link_pages(spark, sf)
    pr_df = pagerank(
        host_link_graph(extract_page_links(lp_pages)), flatten_lineage=False
    )
    grab("host_pagerank", pr_df, "HashAggregate", "BroadcastNestedLoopJoin")
    pr_plan = sections[-1][1]
    checks.append(("host_pagerank", "no window sort", "Window" not in pr_plan))
    # bloom decontamination: the Arrow bitmap probe (ArrowEvalPython) must sit
    # BELOW the exact confirm BroadcastHashJoin — the join consumes the pruned
    # slice, never the full shingle stream
    grab(
        "bloom_decontamination",
        em.q_bloom_decontamination(spark, sf),
        "ArrowEvalPython",
        "BroadcastHashJoin",
    )
    bd_plan = sections[-1][1]
    checks.append(
        ("bloom_decontamination", "probe below confirm join",
         -1 < bd_plan.find("BroadcastHashJoin") < bd_plan.find("ArrowEvalPython"))
    )
    # normalized dedup: the whole normalize chain is pure Column codegen —
    # no Python stage of any kind in the plan (multi-distinct agg plans as
    # SortAggregate with map-side partials)
    grab("normalized_dedup", em.q_normalized_dedup(spark, sf), "SortAggregate", "partial_")
    nd_plan = sections[-1][1]
    checks.append(
        ("normalized_dedup", "no Python stage (codegen only)",
         all(s not in nd_plan for s in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython")))
    )
    # quota sample: Catalyst's WindowGroupLimit rewrite fires, with the
    # map-side Partial group limit below the Exchange — at most k rows per
    # stratum per input partition shuffle
    grab("quota_sample", em.q_quota_sample(spark, sf), "WindowGroupLimit")
    qs_plan = sections[-1][1]
    checks.append(
        ("quota_sample", "map-side Partial group limit below Exchange",
         -1 < qs_plan.find("Final") < qs_plan.find("Exchange") < qs_plan.find("Partial"))
    )
    # graph-prior corpus prioritization: the 23-host rank side broadcasts
    grab(
        "rank_prioritized_docs",
        em.q_rank_prioritized_docs(spark, sf),
        "BroadcastHashJoin",
    )

    # snapshot diff (T55): ONE full-outer join with map-side digests
    grab("snapshot_diff", em.q_snapshot_diff(spark, sf), "FullOuter")
    sd_plan = sections[-1][1]
    checks.append(
        ("snapshot_diff", "single join (one FullOuter, no residual joins)",
         sd_plan.count("Join") == sd_plan.count("FullOuter"))
    )

    # blocklist filter (T56): every suffix-depth join broadcasts — the corpus
    # side is marked entirely map-side, never shuffled
    grab("blocklist_filter", em.q_blocklist_filter(spark, sf), "BroadcastHashJoin")
    bl_plan = sections[-1][1]
    checks.append(
        ("blocklist_filter", "7 broadcast joins, zero sort-merge/shuffled-hash",
         bl_plan.count("BroadcastHashJoin") == 7
         and "SortMergeJoin" not in bl_plan
         and "ShuffledHashJoin" not in bl_plan)
    )

    # tf-idf top terms (T57): the per-doc top-3 window gets the map-side
    # WindowGroupLimit rewrite (never a whole-doc-group sort spill)
    grab("tfidf_top_terms", em.q_tfidf_top_terms(spark, sf), "WindowGroupLimit")

    # bigram LM scores (T58): the vocabulary-sized prefix dim broadcasts;
    # the bigram confirm join shuffles (too big to broadcast at web scale)
    grab("bigram_lm_scores", em.q_bigram_lm_scores(spark, sf), "BroadcastHashJoin")

    # quality funnel (T62): attribution label + rollup are pure codegen with
    # a map-side partial count — no Python stage anywhere in the scan pass
    grab("quality_funnel", em.q_quality_funnel(spark, sf), "partial_count")
    qf_plan = sections[-1][1]
    checks.append(
        ("quality_funnel", "no Python stage (one codegen scan)",
         all(s not in qf_plan for s in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython")))
    )
    # robots filter (T63): rules broadcast onto the page stream; the REP
    # winner is a hash-agg argmax — never a window, never a nested loop
    grab("robots_filter", em.q_robots_filter(spark, sf), "BroadcastHashJoin", "max_by")
    rf_plan = sections[-1][1]
    checks.append(
        ("robots_filter", "no window / nested-loop",
         "Window" not in rf_plan and "NestedLoopJoin" not in rf_plan)
    )
    # politeness schedule (T64): the host window's hash partitioning is
    # reused by the per-host audit agg — exactly one Exchange end to end
    grab("politeness_schedule", em.q_politeness_schedule(spark, sf), "Window")
    ps_plan = sections[-1][1]
    checks.append(
        ("politeness_schedule", "single exchange (window partitioning reused)",
         ps_plan.count("Exchange") == 1)
    )
    # perplexity buckets (T65): the bucket dim (cumulative window over the
    # score HISTOGRAM) broadcasts back onto the scored rows — never a
    # sort-merge join of documents against buckets
    grab(
        "perplexity_buckets",
        em.q_perplexity_buckets(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )

    # BM25 top-k (T72): query terms semi-join the token stream as a
    # broadcast (map-side posting prune); every dim join broadcasts; the
    # per-query top-10 gets the WindowGroupLimit map-side rewrite
    grab(
        "bm25_topk",
        em.q_bm25_topk(spark, sf),
        "BroadcastHashJoin",
        "LeftSemi",
        "WindowGroupLimit",
    )
    bm_plan = sections[-1][1]
    checks.append(
        ("bm25_topk", "no sort-merge join (all dims broadcast)",
         "SortMergeJoin" not in bm_plan)
    )

    # exact-substring dedup (T71): window digests are whole-stage-codegen
    # lead() projections (a HOF transform would be CodegenFallback — the
    # 9x-after-mapInPandas cliff, measured in-bench), the rebuild is ONE
    # Arrow stage, and nothing joins pairwise
    grab(
        "exact_substring_dedup",
        em.q_exact_substring_dedup(spark, sf),
        "MapInPandas",
        "Window",
    )
    es_plan = sections[-1][1]
    checks.append(
        ("exact_substring_dedup", "one Arrow stage, no HOF digests, no pairwise join",
         es_plan.count("MapInPandas") == 1
         and "transform(" not in es_plan
         and "CartesianProduct" not in es_plan)
    )

    # DSIR weights (T73): both distribution dims + the log-ratio dim are
    # broadcast (≤256 rows); the document-sized stream shuffles only for
    # its own aggregations, never in a sort-merge join
    grab("dsir_weights", em.q_dsir_weights(spark, sf), "BroadcastHashJoin")
    dw_plan = sections[-1][1]
    checks.append(
        ("dsir_weights", "no sort-merge join / no Python stage",
         "SortMergeJoin" not in dw_plan
         and all(s not in dw_plan for s in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython")))
    )

    # contamination report (T74): the benchmark shingle set broadcasts into
    # BOTH probe joins (corpus-stream prune + match marking)
    grab(
        "contamination_report",
        em.q_contamination_report(spark, sf),
        "BroadcastHashJoin",
        "LeftSemi",
    )
    cr_plan = sections[-1][1]
    checks.append(
        ("contamination_report", "no sort-merge join (benchmark set broadcast)",
         "SortMergeJoin" not in cr_plan)
    )

    # round 4: skewed dim join — the salted variant shuffles on (key, salt)
    grab("skew_join_salted", em.q_skew_join_salted(spark, sf), "_salt")
    sj_plan = sections[-1][1]
    checks.append(
        ("skew_join_salted", "no Python stage (salting is pure codegen)",
         all(s not in sj_plan for s in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython")))
    )

    # round 4: AQE skew-split on the 50%-one-key join (post-execution plan;
    # sandbox-scale thresholds — production keeps defaults)
    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.operators.skew import (
        SKEW_JOIN_TUNING,
        restore_confs,
        set_confs,
    )

    prev = set_confs(spark, SKEW_JOIN_TUNING)
    try:
        left = spark.range(0, 50_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("heavy.example.com"))
            .otherwise(
                F.concat(
                    F.lit("h"),
                    (F.col("id") % 997).cast("string"),
                    F.lit(".example.com"),
                )
            )
            .alias("host"),
        )
        dim = spark.createDataFrame(
            [(h, len(h)) for h in
             ["heavy.example.com"] + [f"h{i}.example.com" for i in range(997)]],
            "host string, prio int",
        )
        aqe_df = left.join(dim, "host").agg(
            F.count(F.lit(1)).alias("c"), F.sum("prio").alias("s")
        )
        aqe_df.collect()  # AQE plans are final only after execution
        grab("skew_join_aqe (executed)", aqe_df, "skew=true", "skewed")
    finally:
        restore_confs(spark, prev)

    # round 4: snapshot time travel — the historical read is a plain pruned
    # parquet scan of the manifest-listed immutable files (text never read)
    grab("snapshot_timetravel", em.q_snapshot_timetravel(spark, sf))
    st_scan = [
        l for l in sections[-1][1].split("\n") if "ReadSchema" in l
    ]
    checks.append(
        ("snapshot_timetravel", "text pruned from ReadSchema",
         bool(st_scan)
         and all("text" not in l.split("ReadSchema")[-1] for l in st_scan))
    )

    # round 4: distributed bloom bitmap — bit_or folds as a map-side-partial
    # hash aggregate (never a per-position driver collect)
    from pdf_drawing_ocr_recognition_spark.operators.bloom import (
        bloom_bitmap_chunks,
    )

    vals = spark.range(0, 5000).select(F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"))
    grab(
        "bloom_bitmap_chunks",
        bloom_bitmap_chunks(vals, "v", 1 << 20, 7),
        "partial_bit_or",
        "bit_or",
        "FlatMapGroupsInPandas",
    )

    # round 4 (cont.): new Table-D operators
    # cms sketch build: map-side partial sum (shuffle bounded by d*w cells)
    grab(
        "cms_heavy_hitters",
        em.q_cms_heavy_hitters(spark, sf),
        "partial_sum",
        "BroadcastHashJoin",  # probe joins the broadcast sketch dim
        "TakeOrderedAndProject",  # top-20, never a global sort
    )
    # hll registers: map-side partial max hash agg (exchange carries <= m
    # rows per group), rho is pure codegen — no Python stage anywhere
    grab(
        "hll_distinct_words",
        em.q_hll_distinct_words(spark, sf),
        "partial_max",
        "HashAggregate",
    )
    hll_plan = sections[-1][1]
    checks.append(
        (
            "hll_distinct_words",
            "no Python eval in sketch build (codegen rho)",
            "BatchEvalPython" not in hll_plan and "MapInPandas" not in hll_plan,
        )
    )
    # pca gram: one Arrow pass emitting scalar moment rows, map-side
    # partial sum — the exchange never carries an embedding
    grab(
        "pca_gram",
        em.q_pca_gram(spark, sf),
        "MapInPandas",
        "partial_sum",
    )
    pca_plan = sections[-1][1]
    checks.append(
        (
            "pca_gram",
            "single Arrow stage (no join/window in the moment pass)",
            "Join" not in pca_plan and "Window" not in pca_plan,
        )
    )
    # taxonomy tagging: the term dim broadcasts, counts combine map-side
    grab(
        "taxonomy_tags",
        em.q_taxonomy_tags(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    # ngram novelty: reference shingles broadcast, never shuffled
    grab(
        "ngram_novelty",
        em.q_ngram_novelty(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    # rendezvous shards: constant explode + map-side-combinable max agg,
    # no window anywhere
    grab(
        "rendezvous_shards",
        em.q_rendezvous_shards(spark, sf),
        "partial_max",
    )
    checks.append(
        (
            "rendezvous_shards",
            "no window (argmax as hash agg)",
            "Window" not in sections[-1][1],
        )
    )
    # curriculum (round 5): binning is a projection; the in-bin position is
    # the T43 range-repartition + offset machinery — NO Window operator at
    # all (a per-bin rank window funneled each bin through one task), and
    # the sort is a range-partitioned within-partition sort.
    grab(
        "curriculum_order",
        em.q_curriculum_order(spark, sf),
        "MapInPandas",
    )
    cur_plan = sections[-1][1]
    checks.append(
        (
            "curriculum_order",
            "no per-group Window (T43 offsets instead)",
            "Window" not in cur_plan,
        )
    )
    # per-group percent ranks (round 5): same machinery applied within
    # source — the skewed key must not serialize into one window task
    grab(
        "score_calibration",
        em.q_score_calibration(spark, sf),
        "MapInPandas",
    )
    sc_plan = sections[-1][1]
    checks.append(
        (
            "score_calibration",
            "no per-group Window (T43 offsets instead)",
            "Window" not in sc_plan,
        )
    )
    # token-budget selection (round 5): the running-total is the
    # global_prefix_sums machinery (range repartition + Arrow cumsum) —
    # NO unpartitioned Window (one task at corpus scale); budget-dead
    # range partitions are pruned before the cumsum pass.
    grab(
        "token_budget_select",
        em.q_token_budget_select(spark, sf),
        "MapInPandas",
    )
    tb_plan = sections[-1][1]
    checks.append(
        (
            "token_budget_select",
            "no unpartitioned Window (prefix-sum offsets instead)",
            "Window" not in tb_plan,
        )
    )
    # classifier inference: broadcast 256-row weight dim, partial agg
    grab(
        "quality_classifier_scores",
        em.q_quality_classifier_scores(spark, sf),
        "BroadcastHashJoin",
        "partial_sum",
    )
    # weighted sampling: global top-n via per-partition heaps, no Exchange
    # from a full orderBy
    grab(
        "weighted_sample",
        em.q_weighted_sample(spark, sf),
        "TakeOrderedAndProject",
    )
    ws_plan = sections[-1][1]
    checks.append(
        ("weighted_sample", "no full-sort Exchange (rangepartitioning absent)",
         "rangepartitioning" not in ws_plan)
    )
    # semantic dedup: centroid dim broadcast into the argmax assignment;
    # within-list pair scoring as ONE Arrow group stage (not a pair join)
    grab(
        "semantic_dedup_survivors",
        em.q_semantic_dedup_survivors(spark, sf),
        "BroadcastNestedLoopJoin",  # corpus x K centroid dim (K=16 rows)
        "max_by",  # argmax as hash agg, not a window sort
        "FlatMapGroupsInPandas",  # per-list pair scorer (list x dim Arrow in)
    )
    # sq8: byte-store probe = one Arrow stage over codes x broadcast queries,
    # shortlist via WindowGroupLimit
    grab(
        "sq8_ann_topk",
        em.q_sq8_ann_topk(spark, sf),
        "MapInPandas",
        "WindowGroupLimit",
        "BroadcastNestedLoopJoin",
    )
    # bpe pair stage: word-freq map-side combine + vocab-dim pair agg
    grab(
        "bpe_pair_counts",
        em.q_bpe_pair_counts(spark, sf),
        "partial_count",  # word frequencies combine before the shuffle
        "TakeOrderedAndProject",
    )
    # stupid backoff: unigram dim broadcast; trigram dim shuffle-joins
    grab(
        "stupid_backoff_scores",
        em.q_stupid_backoff_scores(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    # weighted per-stratum quota: the same WindowGroupLimit partial-below-
    # exchange rewrite quota_sample plan-asserts
    grab(
        "weighted_quota_sample",
        em.q_weighted_quota_sample(spark, sf),
        "WindowGroupLimit",
    )
    # curation composition keeps the sample's TakeOrdered at the end
    grab(
        "curation_pipeline",
        em.q_curation_pipeline(spark, sf),
        "TakeOrderedAndProject",
        "BroadcastHashJoin",
    )
    # hard negatives: argmax-as-agg on both sides, no window sort
    grab(
        "hard_negatives",
        em.q_hard_negatives(spark, sf),
        "min_by",
        "BroadcastNestedLoopJoin",
    )

    # T114 trustrank: dangling mass folded back as a 1-row broadcast dim.
    # The driver query localCheckpoints per iteration (flattened lineage),
    # so assert on an un-flattened build where the iteration plan is visible.
    from pdf_drawing_ocr_recognition_spark.operators.links import trustrank

    _tr_edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2), ("c", "a", 1)],
        ["src_host", "dst_host", "weight"],
    )
    _tr_seeds = spark.createDataFrame([("a",)], ["node"])
    grab(
        "host_trustrank (iteration body)",
        trustrank(_tr_edges, _tr_seeds, n_iters=1, flatten_lineage=False),
        "BroadcastNestedLoopJoin",
    )
    # T115 char signals: both hash aggs combine map-side
    grab("char_diversity", em.q_char_diversity(spark, sf), "partial_count")
    # T116 phrase search: phrase-term dim broadcast prunes the token stream;
    # full-match test is a count-distinct agg, no corpus-side window sort
    grab(
        "phrase_search",
        em.q_phrase_search(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    ps_plan = sections[-1][1]
    checks.append(("phrase_search", "no window sort", "Window" not in ps_plan))
    # T117 dhash: one narrow Arrow stage; band join confirms via bit_count
    grab(
        "image_dhash_pairs",
        em.q_image_dhash_pairs(spark, sf),
        "MapInPandas",
        "bit_count",
    )
    # T118 qhist: the corpus-touching stage is ONE map-side-combinable count
    # agg; the quantile window runs on the sketch AFTER the bin-bounded
    # exchange (bin(_v) marks the codegen bit-length projection)
    grab(
        "length_quantiles",
        em.q_length_quantiles(spark, sf),
        "partial_count",
        "bin(",
    )
    # T119 url farms: content digested in the scan projection, one hash agg
    # with partial distinct; template universe bounds the exchange
    grab(
        "url_template_farms",
        em.q_url_template_farms(spark, sf),
        "HashAggregate",
        "md5",
    )
    # T113 vocab growth: register max-agg combines map-side, fan-out <= 5x
    grab("vocab_growth", em.q_vocab_growth(spark, sf), "partial_max")
    # T122 mirrors: digest computed in the scan projection; host-size dims
    # broadcast; pair expansion is in-array (no digest self-join)
    grab(
        "host_mirrors",
        em.q_host_mirrors(spark, sf),
        "md5",
        "BroadcastHashJoin",
    )
    # T120 recrawl tiers: ONE keyed join (digests, not bodies) + counter agg
    grab(
        "recrawl_tiers",
        em.q_recrawl_tiers(spark, sf),
        "FullOuter",
        "partial_sum",
    )
    # T121 good-turing: both aggs combine map-side; r+1 lookup is a dim join
    grab("good_turing", em.q_good_turing(spark, sf), "partial_count")
    gt_plan = sections[-1][1]
    checks.append(("good_turing", "no window sort", "Window" not in gt_plan))
    # T124 metadata / T127 sitemaps / T128 hreflang: one narrow Arrow stage
    grab("page_metadata", em.q_page_metadata(spark, sf), "MapInPandas")
    pm_plan = sections[-1][1]
    checks.append(
        ("page_metadata", "no shuffle (narrow)", "Exchange" not in pm_plan)
    )
    grab("sitemap_harvest", em.q_sitemap_harvest(spark, sf), "MapInPandas")
    # T125/T128: the rollups after the Arrow stage are map-side-combinable
    grab("canonical_dedup", em.q_canonical_dedup(spark, sf), "partial_count")
    grab(
        "hreflang_clusters",
        em.q_hreflang_clusters(spark, sf),
        "partial_min",
        "MapInPandas",
    )

    # T134: one Arrow eval for the NFC kernel; the only exchange is the
    # hash-agg on the canonical form (partial combine first)
    grab(
        "unicode_nfc_dedup",
        em.q_unicode_nfc_dedup(spark, sf),
        "ArrowEvalPython",
        "partial_count",
    )
    nfc_plan = sections[-1][1]
    # count(DISTINCT raw_text) plans as the standard two-phase distinct
    # aggregate: (nfc,raw) partial -> exchange -> (nfc) final; both levels
    # carry map-side partial combines, so the two exchanges move group
    # rows, never documents.
    checks.append(
        (
            "unicode_nfc_dedup",
            "two-phase distinct agg (exactly 2 exchanges)",
            nfc_plan.count("Exchange") == 2,
        )
    )

    # T135: PSL ancestor joins stay broadcast (no corpus-side shuffle);
    # the only hash exchanges are the two-phase distinct agg at the end
    grab("domain_split", em.q_domain_split(spark, sf), "BroadcastHashJoin")
    ds_plan = sections[-1][1]
    checks.append(
        (
            "domain_split",
            "corpus shuffles only in the final distinct agg",
            ds_plan.count("Exchange hashpartitioning(split") == 2,
        )
    )
    checks.append(
        (
            "domain_split",
            "no sort-merge join for the PSL dim",
            "SortMergeJoin" not in ds_plan,
        )
    )

    # T136: pair expansion is in-array (no shingle-table self-join);
    # size dims come back as broadcasts
    grab(
        "containment_pairs",
        em.q_containment_pairs(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    cp_plan = sections[-1][1]
    checks.append(
        (
            "containment_pairs",
            "no sort-merge self-join",
            "SortMergeJoin" not in cp_plan,
        )
    )

    # T137: one map-side-combinable agg, one exchange carrying shard rows
    grab(
        "shard_manifest",
        em.q_shard_manifest(spark, sf),
        "partial_count",
        "partial_bit_xor",
    )
    sm_plan = sections[-1][1]
    checks.append(
        (
            "shard_manifest",
            "single shard-keyed exchange",
            sm_plan.count("Exchange hashpartitioning") == 1,
        )
    )

    # T138: the bigram-type scalar comes back as a broadcast nested loop
    # (1-row dim), word counts are map-side combined
    grab(
        "kn_continuation",
        em.q_kn_continuation(spark, sf),
        "partial_count",
        "BroadcastNestedLoopJoin",
    )

    # T139: in-array pair expansion (no edge-table self-join); in-degree
    # dims broadcast
    grab(
        "cocitation_farms",
        em.q_cocitation_farms(spark, sf),
        "BroadcastHashJoin",
    )
    cc_plan = sections[-1][1]
    checks.append(
        (
            "cocitation_farms",
            "no sort-merge self-join",
            "SortMergeJoin" not in cc_plan,
        )
    )

    # T140: encoding runs once on the distinct word DIM (MapInPandas after
    # a distinct), counts join back as a broadcast — never per-occurrence
    grab(
        "bpe_encode",
        em.q_bpe_encode(spark, sf),
        "MapInPandas",
        "BroadcastHashJoin",
    )

    # T141: encode dim is MapInPandas over a distinct; corpus join broadcast
    grab(
        "tokenizer_fertility",
        em.q_tokenizer_fertility(spark, sf),
        "MapInPandas",
        "BroadcastHashJoin",
        "partial_count",
    )
    # T142: regex counters stay codegen; PSL joins broadcast; one rollup
    grab(
        "pii_by_domain",
        em.q_pii_by_domain(spark, sf),
        "BroadcastHashJoin",
        "partial_count",
    )
    # T143: two stacked map-combinable aggs, shuffle carries (host,lang)
    grab(
        "host_lang_mixture",
        em.q_host_lang_mixture(spark, sf),
        "partial_count",
        "partial_sum",
    )
    hl_plan = sections[-1][1]
    checks.append(
        (
            "host_lang_mixture",
            "no per-row Python",
            "ArrowEvalPython" not in hl_plan and "BatchEvalPython" not in hl_plan,
        )
    )

    # T145: thresholds dim joins as a broadcast nested loop (theta join on
    # a 5-row dim), rollups map-side combined
    grab(
        "dedup_threshold_sweep",
        em.q_dedup_threshold_sweep(spark, sf),
        "BroadcastNestedLoopJoin",
        "partial_count",
    )
    # T146: one digest-keyed agg with min_by partials, no window/self-join
    grab(
        "first_seen_attribution",
        em.q_first_seen_attribution(spark, sf),
        "partial_min_by",
    )
    fs_plan = sections[-1][1]
    checks.append(
        (
            "first_seen_attribution",
            "no window",
            "WindowExec" not in fs_plan and "RunningWindow" not in fs_plan,
        )
    )

    # T147: reciprocity check is a composite-key LEFT-SEMI equi-join of
    # the edge set against its reversal — never a fan-out
    grab(
        "link_reciprocity",
        em.q_link_reciprocity(spark, sf),
        "LeftSemi",
        "partial_count",
    )
    # T148: each HITS half-step max is a 1-row broadcast (nested loop)
    grab(
        "hits_scores",
        em.q_hits_scores(spark, sf),
        "BroadcastNestedLoopJoin",
        "partial_max",
    )

    # T149/T150: composite-key full-outer joins over distinct sets, then
    # map-combined rollups — no fan-out joins, no per-row Python
    grab("link_churn", em.q_link_churn(spark, sf), "FullOuter", "partial_sum")
    grab(
        "sitemap_coverage",
        em.q_sitemap_coverage(spark, sf),
        "FullOuter",
        "partial_sum",
    )

    # T151: each merge joins OPEN rows only (closed history passes through
    # union-side, never re-shuffled); no window anywhere in the merge
    grab("scd2_history", em.q_scd2_history(spark, sf), "FullOuter", "Union")
    scd_plan = sections[-1][1]
    checks.append(
        (
            "scd2_history",
            "merge is window-free",
            "WindowExec" not in scd_plan and "RunningWindow" not in scd_plan,
        )
    )

    # T152: both rankings ride the Arrow scorer (MapInPandas), overlap is
    # an equi-join
    grab(
        "matryoshka_recall",
        em.q_matryoshka_recall(spark, sf),
        "MapInPandas",
        "partial_count",
    )
    # T153: interval lookup joins on the host equi-key (range as filter)
    grab("policy_at_fetch", em.q_policy_at_fetch(spark, sf), "partial_count")
    # T155: planted-twin truth is an all-pairs join ON THE SAMPLE ONLY
    # (O(sample^2) by construction); thresholds ride a broadcast
    grab(
        "lsh_recall_eval",
        em.q_lsh_recall_eval(spark, sf),
        "BroadcastNestedLoopJoin",
        "partial_count",
    )
    # T156: one bounded per-actor window + map-combined agg, no Python
    grab("bot_regularity", em.q_bot_regularity(spark, sf), "partial_sum")
    br_plan = sections[-1][1]
    checks.append(
        (
            "bot_regularity",
            "no per-row Python",
            "ArrowEvalPython" not in br_plan
            and "BatchEvalPython" not in br_plan,
        )
    )

    # T157: cell extraction is ONE narrow Arrow stage — no shuffle at all;
    # the shape rollup map-side-combines
    grab("html_table_cells", em.q_html_table_cells(spark, sf), "MapInPandas")
    tc_plan = sections[-1][1]
    checks.append(
        ("html_table_cells", "no Exchange", "Exchange" not in tc_plan)
    )
    grab("table_shapes", em.q_table_shapes(spark, sf), "partial_count")

    # T158: exact similarity join must NEVER be an all-pairs product —
    # candidates come from the in-array posting-list expansion
    grab("ppjoin_pairs", em.q_ppjoin_pairs(spark, sf), "partial_count")
    pp_plan = sections[-1][1]
    checks.append(
        (
            "ppjoin_pairs",
            "no cartesian / nested-loop join",
            "CartesianProduct" not in pp_plan
            and "BroadcastNestedLoopJoin" not in pp_plan,
        )
    )

    # T159: seeds dim broadcast into the frontier join; min-struct argmax
    # map-side-combines
    grab(
        "label_propagation",
        em.q_label_propagation(spark, sf),
        "BroadcastHashJoin",
        "partial_min",
    )
    lp_plan = sections[-1][1]
    checks.append(
        ("label_propagation", "no cartesian", "CartesianProduct" not in lp_plan)
    )

    # T160: the verify is codegen levenshtein on candidate joins, never an
    # all-pairs product
    grab(
        "edit_verified_pairs",
        em.q_edit_verified_pairs(spark, sf),
        "levenshtein",
    )
    ev_plan = sections[-1][1]
    checks.append(
        (
            "edit_verified_pairs",
            "no cartesian / nested-loop join",
            "CartesianProduct" not in ev_plan
            and "BroadcastNestedLoopJoin" not in ev_plan,
        )
    )

    # T161: sketch is ONE map-combinable min agg; matrix joins the dim
    grab(
        "source_vocab_overlap",
        em.q_source_vocab_overlap(spark, sf),
        "partial_min",
        "partial_count",
    )

    # T162: one digest-keyed agg, no Python anywhere
    grab("bow_dedup", em.q_bow_dedup(spark, sf), "partial_count")
    bd_plan = sections[-1][1]
    checks.append(
        (
            "bow_dedup",
            "no per-row Python",
            "ArrowEvalPython" not in bd_plan and "BatchEvalPython" not in bd_plan,
        )
    )

    # T163: benchmark rides as a driver dim — ONE narrow Arrow stage,
    # NO shuffle and NO pair join at all
    grab(
        "semantic_decontamination",
        em.q_semantic_decontamination(spark, sf),
        "MapInPandas",
    )
    sd_plan = sections[-1][1]
    checks.append(
        ("semantic_decontamination", "no Exchange", "Exchange" not in sd_plan)
    )
    checks.append(
        (
            "semantic_decontamination",
            "no join at all",
            "Join" not in sd_plan and "CartesianProduct" not in sd_plan,
        )
    )

    # T164: extraction is ONE narrow Arrow stage; density rollup
    # map-side-combines then broadcast-joins the page frame
    grab("code_blocks", em.q_code_blocks(spark, sf), "MapInPandas")
    cb_plan = sections[-1][1]
    checks.append(("code_blocks", "no Exchange", "Exchange" not in cb_plan))
    grab(
        "code_density",
        em.q_code_density(spark, sf),
        "partial_sum",
        "BroadcastHashJoin",
    )

    # T165: corpus collapses to the histogram BEFORE the threshold
    # expansion; the nested-loop join is the 63x64 dim-by-dim product
    grab("otsu_moments", em.q_otsu_moments(spark, sf), "partial_count", "partial_sum")
    om_plan = sections[-1][1]
    checks.append(
        (
            "otsu_moments",
            "no per-row Python",
            "ArrowEvalPython" not in om_plan and "BatchEvalPython" not in om_plan,
        )
    )

    # T166: repair is ONE narrow Arrow stage — zero shuffle
    grab("mojibake_repair", em.q_mojibake_repair(spark, sf), "MapInPandas")
    mr_plan = sections[-1][1]
    checks.append(("mojibake_repair", "no Exchange", "Exchange" not in mr_plan))

    # T167: tail->head key equi-join, never all-pairs
    grab("stitch_continuations", em.q_stitch_continuations(spark, sf))
    st_plan = sections[-1][1]
    checks.append(
        (
            "stitch_continuations",
            "no cartesian / nested-loop join",
            "CartesianProduct" not in st_plan
            and "BroadcastNestedLoopJoin" not in st_plan,
        )
    )

    # T168: events collapse to (actor, hour) counts map-side BEFORE the window
    grab("rate_bursts", em.q_rate_bursts(spark, sf), "partial_count", "Window")

    # T169/T175: extraction is one narrow Arrow stage each; profile rollup
    # map-side-combines
    grab("heading_outline", em.q_heading_outline(spark, sf), "MapInPandas")
    ho_plan = sections[-1][1]
    checks.append(("heading_outline", "no Exchange", "Exchange" not in ho_plan))
    grab("heading_profile", em.q_heading_profile(spark, sf), "partial_min", "partial_count")
    grab("section_chunks", em.q_section_chunks(spark, sf), "MapInPandas")
    sc_plan = sections[-1][1]
    checks.append(("section_chunks", "no Exchange", "Exchange" not in sc_plan))

    # T171: the top slice must be TakeOrderedAndProject — never a global
    # sort of the bigram vocabulary; the rank window runs on <=1025 rows
    grab("zipf_curve", em.q_zipf_curve(spark, sf), "TakeOrderedAndProject")

    # T177: pure codegen projection — zero shuffle, zero Python
    grab("url_shape", em.q_url_shape(spark, sf))
    us_plan = sections[-1][1]
    checks.append(("url_shape", "no Exchange", "Exchange" not in us_plan))
    checks.append(
        (
            "url_shape",
            "no Python at all",
            "MapInPandas" not in us_plan
            and "ArrowEvalPython" not in us_plan
            and "BatchEvalPython" not in us_plan,
        )
    )

    # T185: word-dim distincts + left-anti join; never a row-level join
    grab("vocab_drift", em.q_vocab_drift(spark, sf), "partial_count")
    vd_plan = sections[-1][1]
    checks.append(
        (
            "vocab_drift",
            "no cartesian / nested-loop join",
            "CartesianProduct" not in vd_plan
            and "BroadcastNestedLoopJoin" not in vd_plan,
        )
    )

    # T194: list extraction is ONE narrow Arrow stage — zero shuffle
    grab("list_items", em.q_list_items(spark, sf), "MapInPandas")
    li_plan = sections[-1][1]
    checks.append(("list_items", "no Exchange", "Exchange" not in li_plan))

    # T179: the serialization pass is ONE narrow Arrow stage — zero shuffle
    grab("markdown_render", em.q_markdown_render(spark, sf), "MapInPandas")
    md_plan = sections[-1][1]
    checks.append(("markdown_render", "no Exchange", "Exchange" not in md_plan))

    # T181: render + digest agg — no joins, no window
    grab(
        "markup_invariant_dedup",
        em.q_markup_invariant_dedup(spark, sf),
        "MapInPandas",
        "partial_count",
    )

    # T183/T186: harvesting is one narrow Arrow stage; the gates fuse as
    # codegen predicates on top (no extra shuffle, no extra Python)
    grab("image_text_pairs", em.q_image_text_pairs(spark, sf), "MapInPandas")
    it_plan = sections[-1][1]
    checks.append(("image_text_pairs", "no Exchange", "Exchange" not in it_plan))
    grab("image_pair_filters", em.q_image_pair_filters(spark, sf), "MapInPandas")
    ip_plan = sections[-1][1]
    checks.append(
        ("image_pair_filters", "no Exchange", "Exchange" not in ip_plan)
    )
    checks.append(
        (
            "image_pair_filters",
            "exactly one Python stage (gates fused)",
            ip_plan.count("MapInPandas") == 1,
        )
    )

    # T188: srcset resolution rides the same narrow harvest stage
    grab("srcset_resolution", em.q_srcset_resolution(spark, sf), "MapInPandas")
    sr_plan = sections[-1][1]
    checks.append(("srcset_resolution", "no Exchange", "Exchange" not in sr_plan))

    # T189: one narrow Arrow stage + one broadcast join to the labels
    grab(
        "declared_lang_mismatch",
        em.q_declared_lang_mismatch(spark, sf),
        "MapInPandas",
        "BroadcastHashJoin",
    )

    # T190: six extractor rollups join on url — no cartesian anywhere
    grab(
        "page_profile",
        em.q_page_profile(spark, sf),
        "MapInPandas",
        "partial_count",
    )
    pp2_plan = sections[-1][1]
    checks.append(
        (
            "page_profile",
            "no cartesian / nested-loop join",
            "CartesianProduct" not in pp2_plan
            and "BroadcastNestedLoopJoin" not in pp2_plan,
        )
    )

    # T174: the Morton key is ONE codegen projection — no UDF, no window;
    # the audit is a partial-agg rollup over it
    grab(
        "zorder_pruning_audit",
        em.q_zorder_pruning_audit(spark, sf),
        "partial_min",
        "partial_count",
    )
    zp_plan = sections[-1][1]
    checks.append(
        (
            "zorder_pruning_audit",
            "z key stays codegen (no Python eval, no Window)",
            "BatchEvalPython" not in zp_plan
            and "ArrowEvalPython" not in zp_plan
            and "Window" not in zp_plan,
        )
    )

    # T176: three script counts are ONE codegen projection — no exchange
    grab("script_mix", em.q_script_mix(spark, sf))
    sm_plan = sections[-1][1]
    checks.append(("script_mix", "no Exchange", "Exchange" not in sm_plan))
    checks.append(
        (
            "script_mix",
            "no Python eval (JVM regex only)",
            "BatchEvalPython" not in sm_plan
            and "ArrowEvalPython" not in sm_plan,
        )
    )

    # T180: occurrence counts are map-side-combined partial aggs; the
    # token stream shuffles once on the composite key
    grab(
        "duplication_rate",
        em.q_duplication_rate(spark, sf),
        "partial_count",
    )

    # T173: the MOR read unions the vectorized parquet scan (clean files)
    # with the Arrow merge-read (masked files) — both branches present
    grab(
        "snapshot_mor_delete",
        em.q_snapshot_mor_delete(spark, sf),
        "MapInPandas",
        "Scan parquet",
        "Union",
    )

    # T184: byte-window digests are ONE narrow codegen stage — explode of
    # sequence + byte substring + md5 fuse (Generate), with NO per-doc
    # window/sort anywhere in the plan (the token form T71 needs lead());
    # the only Python stage is the Arrow rebuild
    grab(
        "exact_substring_bytes",
        em.q_exact_substring_bytes(spark, sf),
        "Generate explode",
        "MapInPandas",
    )
    esb_plan = sections[-1][1]
    checks.append(
        ("exact_substring_bytes", "no Window operator", "Window" not in esb_plan)
    )
    checks.append(
        (
            "exact_substring_bytes",
            "single Python stage (digests stay JVM-side)",
            esb_plan.count("MapInPandas") == 1
            and "BatchEvalPython" not in esb_plan,
        )
    )

    # T200 storage-partitioned join: the executed plan must contain NO join
    # operator and NO FileScan — table data enters through the per-bucket
    # Arrow kernel; the only exchange moves the N task-descriptor rows
    grab("bucket_local_join", em.q_bucket_local_join(spark, sf), "MapInPandas")
    spj_plan = sections[-1][1]
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "FileScan"):
        checks.append(("bucket_local_join", f"no {op}", op not in spj_plan))

    # T197 schema evolution: the evolved-table read projects per file group
    # with PLAIN column refs / casts — no Python stage, no window, and the
    # scan stays a vectorized parquet scan (ColumnarToRow under codegen)
    grab(
        "schema_evolution_scan",
        em.q_schema_evolution_scan(spark, sf),
        "Scan parquet",
    )
    evo_plan = sections[-1][1]
    checks.append(
        ("schema_evolution_scan", "no Python stage",
         "MapInPandas" not in evo_plan and "BatchEvalPython" not in evo_plan)
    )
    checks.append(
        ("schema_evolution_scan", "no Window operator", "Window" not in evo_plan)
    )

    # T208 equality deletes: the read-time cost is a BROADCAST null-safe
    # LEFT ANTI join — never a shuffle/sort of the data side — and files
    # newer than every entry keep the plain vectorized scan (the Union's
    # other branch)
    grab(
        "eq_delete_upsert",
        em.q_eq_delete_upsert(spark, sf),
        "BroadcastHashJoin",
        "LeftAnti",
        "Union",
    )
    eqd_plan = sections[-1][1]
    checks.append(
        ("eq_delete_upsert", "no SortMergeJoin (anti stays broadcast)",
         "SortMergeJoin" not in eqd_plan)
    )
    checks.append(
        ("eq_delete_upsert", "no Python stage (pure scans + anti-joins)",
         "MapInPandas" not in eqd_plan and "BatchEvalPython" not in eqd_plan)
    )

    # T211 DataSource read: the scan IS the registered Python source
    # (Catalyst BatchScan over pdor_snapshot), nothing else added —
    # filters reach pushFilters (pruning happens in OUR planner, invisible
    # here) and the scan carries no join/window/exchange of its own
    grab(
        "datasource_scan",
        em.q_datasource_scan(spark, sf),
        "BatchScan pdor_snapshot",
    )
    ds_plan = sections[-1][1]
    checks.append(
        ("datasource_scan", "no Window operator", "Window" not in ds_plan)
    )
    checks.append(
        ("datasource_scan", "no join in a pure table scan",
         "Join" not in ds_plan)
    )

    # T213 runtime-filter join: the dim side is broadcast (its smallness
    # is proven by the key cap), the fact side is the pruned DataFrame —
    # never a SortMergeJoin, no Window
    grab(
        "runtime_filter_join",
        em.q_runtime_filter_join(spark, sf),
        "BroadcastHashJoin",
    )
    rf_plan = sections[-1][1]
    checks.append(
        ("runtime_filter_join", "no SortMergeJoin",
         "SortMergeJoin" not in rf_plan)
    )

    # T212 IVM fold: the maintained view must never need a Window — the
    # merge is joins + hash aggregates only (count/sum fold + dirty-group
    # recompute); assert on the UNPUBLISHED fold plan via a direct agg of
    # the view read (the published parquet read is trivially clean)
    grab(
        "ivm_lang_stats",
        em.q_ivm_lang_stats(spark, sf),
        "Scan parquet",
    )
    ivm_plan = sections[-1][1]
    checks.append(
        ("ivm_lang_stats", "no Window operator", "Window" not in ivm_plan)
    )

    # T219 planner-forced runtime-filter join: the executed plan must be
    # a broadcast join over the pruned fact read — never a sort-merge
    grab(
        "auto_join_plan",
        em.q_auto_join_plan(spark, sf),
        "BroadcastHashJoin",
    )
    aj_plan = sections[-1][1]
    checks.append(
        ("auto_join_plan", "no SortMergeJoin", "SortMergeJoin" not in aj_plan)
    )

    lines = ["# PLANS.md — physical-plan assertions for the headline queries", ""]
    lines.append("| query | property | holds |")
    lines.append("|---|---|---|")
    for title, needle, ok in checks:
        lines.append(f"| {title} | `{needle}` | {'✅' if ok else '❌'} |")
    lines.append("")
    for title, plan in sections:
        lines.append(f"## {title}\n\n```\n{plan[:4000]}\n```\n")
    with open("PLANS.md", "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    bad = [c for c in checks if not c[2]]
    print(f"PLANS.md written; {len(checks)} checks, {len(bad)} failed: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
