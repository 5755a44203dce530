"""Benchmark runner — one JSON line for the driver (BENCH_r{N}.json).

Headline: extraction throughput (docs/s) over the synthesized pages corpus
(BASELINE.json metric) at local[$SPARK_GRAFT_CPUS], plus wall-clock for the
representative driver-table queries.  The pages corpus is generated once and
cached under fixtures_data/ (generation excluded from timing).

    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)
    BENCH_PAGES_ROWS    (default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "ivf_topk",
    "winnow_fingerprints",
    "hash_split",
    "shipping_priority",
    "repetition_signals",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
    "host_skew_counts",
    "first_success_window",
    "merge_collect_ordered",
    "window_tumbling_events",
    "broadcast_pattern_join",
    "rollup_doc_metrics",
    "quality_funnel",
    "exact_substring_dedup",
    "dsir_weights",
    # round 4 (cont.): new Table-D operators
    "cms_heavy_hitters",
    "quality_classifier_scores",
    "semantic_dedup_survivors",
    "weighted_sample",
    "bpe_pair_counts",
    "sq8_ann_topk",
    "stupid_backoff_scores",
    "weighted_quota_sample",
    # round 4 (cont. 3): sketches / linear algebra / curation ordering
    "hll_distinct_words",
    "pca_gram",
    "soft_dedup_weights",
    "taxonomy_tags",
    "curriculum_order",
    "dedup_cascade",
    # round 4 (cont. 4): retrieval / perceptual / sketch / frontier ops
    "phrase_search",
    "length_quantiles",
    "image_dhash_pairs",
    "url_template_farms",
    "char_diversity",
    "host_trustrank",
    # round 4 (cont. 4b): head-metadata / frontier composition ops
    "page_metadata",
    "host_mirrors",
    "recrawl_tiers",
    "sitemap_harvest",
    # round 4 (cont. 5): unicode / split / containment / tokenizer audits
    "unicode_nfc_dedup",
    "domain_split",
    "containment_pairs",
    "shard_manifest",
    "kn_continuation",
    "cocitation_farms",
    "tokenizer_fertility",
    "host_lang_mixture",
    "dedup_threshold_sweep",
    "first_seen_attribution",
    "link_reciprocity",
    "hits_scores",
    "link_churn",
    "sitemap_coverage",
    "scd2_history",
    "matryoshka_recall",
    "policy_at_fetch",
    "lsh_recall_eval",
    "bot_regularity",
    "html_table_cells",
    "table_shapes",
    "ppjoin_pairs",
    # round 4 (cont. 7): graph labels / cascade verify / sketches / code
    "label_propagation",
    "edit_verified_pairs",
    "source_vocab_overlap",
    "bow_dedup",
    "semantic_decontamination",
    "code_blocks",
    "code_density",
    "otsu_moments",
    # round 4 (cont. 8): repair / stitching / structure / frontier signals
    "mojibake_repair",
    "stitch_continuations",
    "rate_bursts",
    "heading_outline",
    "heading_profile",
    "section_chunks",
    "zipf_curve",
    "url_shape",
    "vocab_drift",
    "list_items",
    "centroid_drift",
    "markdown_render",
    "markup_invariant_dedup",
    "image_text_pairs",
    "image_pair_filters",
    "srcset_resolution",
    "declared_lang_mismatch",
    "page_profile",
    "title_body_coverage",
    # round 5 (closing): lakehouse layout + script + duplication signals
    "zorder_pruning_audit",
    "script_mix",
    "duplication_rate",
    # round 5 (cont.): byte-granular ExactSubstr (exact Lee et al. semantics)
    "exact_substring_bytes",
    # round 5 (3rd sitting): field-id schema evolution + shuffle-free SPJ
    # (warm number = the evolved-table / bucket-local-join READ; the /tmp
    # table builds are cold-run cost only, cached across samples)
    "schema_evolution_scan",
    "bucket_local_join",
    # round 5 (5th sitting): DataSource read, IVM fold, runtime-filter join
    # (warm number = the format READ / view read / pruned join; table
    # builds are cold-run cost only, cached across samples)
    "datasource_scan",
    "ivm_lang_stats",
    "runtime_filter_join",
    "auto_join_plan",
]


def ensure_corpus(n_rows: int) -> str:
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import write_corpus

    # v3: quad (left/right box) pattern rows added to the generator
    path = os.path.join("fixtures_data", f"pages_bench_v3_{n_rows}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        write_corpus(path, n_rows, files=32)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 60k pages: large enough that worker spin-up (~4-6s) stops dominating
    # the docs/s headline (scaling runs use 160k; see BENCH/BASELINE.md)
    n_pages = int(os.environ.get("BENCH_PAGES_ROWS", "60000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    corpus = ensure_corpus(n_pages)

    import __spark_entry__ as entrymod
    from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS
    from pdf_drawing_ocr_recognition_spark.plans.pipeline import extraction_pipeline
    from pdf_drawing_ocr_recognition_spark.plans.session import build_session

    spark = build_session(
        app="pdor-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # warm the JVM/Python workers so the headline number measures the job
    spark.range(1000).select("id").count()

    timings: dict[str, float] = {}

    # one untimed execution spawns the 32 Python workers + compiles the scan
    # (~4-6s of pure cold start that would otherwise dominate the headline;
    # warm local[32] throughput is the number comparable to the scaling runs)
    extraction_pipeline(spark, corpus, PATTERNS).count()
    # best of 2 timed runs: this VM suffers transient multi-second stalls
    # that inflate a single sample 4-6x (measured: identical code, totals of
    # 12.2s vs 83.7s minutes apart); min-of-2 rejects a stall landing on one
    # sample while leaving steady-state numbers untouched
    t_extract, n_docs = None, 0
    for _ in range(2):
        t0 = time.time()
        n_docs = extraction_pipeline(spark, corpus, PATTERNS).count()
        dt = time.time() - t0
        t_extract = dt if t_extract is None else min(t_extract, dt)
    timings["extraction_pipeline"] = round(t_extract, 3)
    docs_per_s = n_docs / t_extract

    qmap = entrymod.queries()
    # untimed warmup at sf0.001: compiles every plan's codegen classes and
    # warms the JIT on the same generated code, so the timed sf0.1 pass
    # measures execution, not cold compilation (which varies 2-3x on this
    # host — see BENCH/BASELINE.md methodology)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in BENCH_QUERIES:
        qmap[name](spark, warm_dir).count()
    # `queries` is the WARM number (best-of-2 after the sf0.001 plan warmup)
    # and is the round-over-round comparable column; `queries_first_run` is
    # the cold first timed sample, labeled so a 2-4x first-execution penalty
    # or a transient host stall never reads as a plan regression.
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.time()
            qmap[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        cold[name] = round(runs[0], 3)

    # --- skewed-join evidence (VERDICT r3 item 3) ---------------------------
    # The pages corpus has one host owning ~50% of rows (fixture reality).
    # Time the same dim join three ways — AQE skew-split, salted, and an
    # unskewed twin (same row counts/dim cardinality, uniform keys) — all as
    # forced shuffle joins (broadcast off; a 50-row dim would otherwise
    # broadcast and there'd be no shuffle to skew).  Reported separately
    # from `queries` so the headline total stays round-comparable.
    from pyspark.sql import functions as F

    from pdf_drawing_ocr_recognition_spark.operators.skew import (
        SKEW_JOIN_TUNING,
        host_of,
        restore_confs,
        salted_dim_join,
        set_confs,
    )

    pages = spark.read.parquet(corpus).select(
        "url", host_of(F.col("url")).alias("host")
    )
    import tempfile

    def _materialize_dim(df, name):
        # a bare parquet scan under the join: OptimizeSkewedJoin cannot
        # match through an aggregate between shuffle stage and join
        path = os.path.join(tempfile.gettempdir(), f"pdor_bench_{name}")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    dim = _materialize_dim(
        pages.select("host").distinct().withColumn("prio", F.length("host")),
        "hostdim",
    )
    uni = pages.withColumn(
        "host",
        F.concat(F.lit("u"), F.pmod(F.xxhash64("url"), F.lit(50)).cast("string")),
    )
    uni_dim = _materialize_dim(
        uni.select("host").distinct().withColumn("prio", F.length("host")),
        "unidim",
    )

    def _agg(j):
        return j.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.length("url") + F.col("prio")).alias("s"),
        )

    def _best2(fn):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    prev_bc = set_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"})
    t_salted = _best2(
        lambda: _agg(salted_dim_join(pages, dim, "host", "url")).collect()
    )
    t_unskew = _best2(lambda: _agg(uni.join(uni_dim, "host")).collect())
    prev_aqe = set_confs(spark, SKEW_JOIN_TUNING)
    # rebuild the plan per run (like the other variants): collect() on a
    # reused DataFrame would re-serve its already-materialized AQE shuffle
    # stages and time ~nothing
    t_aqe = _best2(lambda: _agg(pages.join(dim, "host")).collect())
    aqe_df = _agg(pages.join(dim, "host"))
    aqe_df.collect()
    skew_marked = (
        "skew=true" in aqe_df._jdf.queryExecution().executedPlan().toString()
    )
    restore_confs(spark, prev_aqe)
    restore_confs(spark, prev_bc)
    skew_join = {
        "aqe": t_aqe,
        "salted": t_salted,
        "unskewed_twin": t_unskew,
        "aqe_skew_split_in_plan": skew_marked,
        "aqe_over_unskewed": round(t_aqe / t_unskew, 2),
        "salted_over_unskewed": round(t_salted / t_unskew, 2),
    }

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_bench_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first_run": cold,
        "timing": "queries=warm best-of-2 after sf0.001 warmup; "
        "queries_first_run=cold first sample (compare rounds on "
        "the warm column)",
        "sf": sf,
        "extraction_docs_per_s": round(docs_per_s, 1),
        "extraction_docs": n_docs,
        "pages_rows": n_pages,
        "cpus": cpus,
        "skew_join": skew_join,
    }
    line = json.dumps(payload)
    print(line)
    # the driver truncates stdout at 2000 chars (BENCH_r04's per-query tail
    # was lost); the full record always lands on disk as well —
    # override with --out <path> or BENCH_OUT
    out_path = os.environ.get("BENCH_OUT", "BENCH/last_run.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
