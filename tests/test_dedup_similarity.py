"""End-to-end dedup and similarity-search operator tests."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """documents plus injected exact + near duplicates."""
    import hashlib

    def words(i: int, n: int = 14) -> str:
        # distinct pseudo-vocabulary per doc so base docs are NOT near-dups
        return " ".join(
            hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6] for j in range(n)
        )

    base = [(i, f"doc {i} item begins {words(i)} item ends") for i in range(40)]
    dups = [(100 + i, base[i][1]) for i in range(10)]  # exact dups of 0..9
    near = [
        (200 + i, base[i][1] + " trailing extra") for i in range(5)
    ]  # near dups of 0..4 (one appended fragment, shingle sets ~88% shared)
    return spark.createDataFrame(base + dups + near, "doc_id LONG, text STRING")


class TestExactDedupe:
    def test_keeps_min_representative(self, docs_with_dups):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import exact_dedupe

        kept = exact_dedupe(docs_with_dups)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert len(ids) == 45  # 40 uniques + 5 near (not byte-equal)
        assert all(100 + i not in ids for i in range(10))
        assert all(i in ids for i in range(40))


class TestNearDedupe:
    def test_minhash_catches_near_dups(self, docs_with_dups):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import near_dupe_pairs

        pairs = near_dupe_pairs(docs_with_dups, min_jaccard=0.5).collect()
        found = {(r["key_a"], r["key_b"]) for r in pairs}
        # each near-dup (200+i) should pair with its source i (or its exact dup)
        hits = sum(1 for i in range(5) if any(a == i and b == 200 + i for a, b in found))
        assert hits >= 3, found

    def test_near_dedupe_removes_losers_keeps_minima(self, docs_with_dups):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import near_dedupe

        kept = near_dedupe(docs_with_dups, min_jaccard=0.5)
        ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
        assert all(i in ids for i in range(5))  # cluster minima survive
        assert not any(100 + i in ids for i in range(5))  # exact dups gone

    def test_bucket_cap_reported_not_silent(self, docs_with_dups):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import near_dupe_pairs

        # cap of 1 disables every bucket → zero pairs (behavior is explicit)
        pairs = near_dupe_pairs(docs_with_dups, max_bucket=1)
        assert pairs.count() == 0

    def test_bucket_expansion_bounded_per_row(self, spark):
        """Round-5 scale fix: a bucket just under the cap must expand via
        posexplode-then-slice (per-row arrays ≤ bucket size), never the
        k²/2-struct in-array pair build — and the boundary semantics hold:
        a bucket AT the cap pairs fully, one over is dropped."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import near_dupe_pairs

        # 40 byte-identical docs: every LSH band puts all 40 in one bucket
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)],
            "doc_id LONG, text STRING",
        )
        at_cap = near_dupe_pairs(docs, max_bucket=40)
        assert at_cap.count() == 40 * 39 // 2
        # the optimized plan must not build pair structs in-array (flatten
        # of nested transform was the unbounded-row construct)
        plan = at_cap._jdf.queryExecution().optimizedPlan().toString()
        assert "flatten(" not in plan and "posexplode" in plan
        assert near_dupe_pairs(docs, max_bucket=39).count() == 0


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_brute_force_self_excluded_and_ranked(self, emb):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            brute_force_topk,
        )

        q = emb.filter(F.col("vec_id") < 3)
        res = brute_force_topk(emb, q, k=5).collect()
        by_q = {}
        for r in res:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rows in by_q.items():
            assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
            scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert scores == sorted(scores, reverse=True)
            assert all(r["neighbor_id"] != qid for r in rows)

    def test_ann_recall_vs_brute_force(self, emb):
        import __spark_entry__ as em
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            ann_topk,
            brute_force_topk,
        )

        q = emb.filter(F.col("vec_id") < 10)
        exact = brute_force_topk(emb, q, k=10).collect()
        approx = ann_topk(emb, q, em.PLANES, k=10, probes=2).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
            for qid in exact_sets
        ]
        mean_recall = sum(recalls) / len(recalls)
        # 4 planes + 2-probe over 16 buckets: moderate recall, way less work
        assert mean_recall >= 0.5, recalls

    def test_ann_scores_match_exact_for_shared_neighbors(self, emb):
        import __spark_entry__ as em
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            ann_topk,
            brute_force_topk,
        )

        q = emb.filter(F.col("vec_id") < 3)
        exact = {
            (r["query_id"], r["neighbor_id"]): r["score"]
            for r in brute_force_topk(emb, q, k=10).collect()
        }
        for r in ann_topk(emb, q, em.PLANES, k=10, probes=2).collect():
            key = (r["query_id"], r["neighbor_id"])
            if key in exact:
                assert r["score"] == exact[key]


class TestIVF:
    """IVF (inverted-list) ANN: deterministic centroid assignment + nprobe dial."""

    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    @pytest.fixture(scope="class")
    def cents(self, emb):
        return emb.filter(F.col("vec_id") < 16)

    def test_assignment_total_and_deterministic(self, emb, cents):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import ivf_assign

        n = emb.count()
        a = ivf_assign(emb, cents)
        rows = a.groupBy("centroid_id").count().collect()
        assert sum(r["count"] for r in rows) == n  # every vector lands in one list
        assert all(0 <= r["centroid_id"] < 16 for r in rows)
        # re-running yields the identical assignment (argmax tie-break fixed)
        first = {r["vec_id"]: r["centroid_id"] for r in a.select("vec_id", "centroid_id").collect()}
        second = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb, cents).select("vec_id", "centroid_id").collect()}
        assert first == second

    def test_full_probe_equals_brute_force(self, emb, cents):
        """nprobe = K (all lists) must reproduce the exact answer — the IVF
        recall dial's boundary condition."""
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        q = emb.filter(F.col("vec_id") < 4)
        exact = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"])
            for r in brute_force_topk(emb, q, k=8).collect()
        )
        full = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["score"])
            for r in ivf_topk(emb, q, cents, k=8, nprobe=16).collect()
        )
        assert full == exact

    def test_nprobe_recall_monotone(self, emb, cents):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        q = emb.filter(F.col("vec_id") < 8)
        exact_sets = {}
        for r in brute_force_topk(emb, q, k=10).collect():
            exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        def recall(nprobe):
            got = {}
            for r in ivf_topk(emb, q, cents, k=10, nprobe=nprobe).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            per_q = [
                len(exact_sets[qid] & got.get(qid, set())) / len(exact_sets[qid])
                for qid in exact_sets
            ]
            return sum(per_q) / len(per_q)

        r4, r16 = recall(4), recall(16)
        assert r16 == 1.0  # full probe is exhaustive
        assert r4 <= r16 + 1e-9
        assert r4 >= 0.2  # 4/16 lists of random centroids: nontrivial recall

    def test_lloyd_refinement_reassigns_all_vectors(self, emb, cents):
        """One relational Lloyd step: every vector stays assigned (totals
        conserved) and the refined lists actually move (first-K seed
        centroids are far from the list means for random data)."""
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            ivf_refine_once,
        )

        n = emb.count()
        rows = ivf_refine_once(emb, cents, dim=64).collect()
        assert sum(r["n_initial"] for r in rows) == n
        assert sum(r["n_refined"] for r in rows) == n
        assert any(r["n_initial"] != r["n_refined"] for r in rows)


class TestArrowScorers:
    """The Arrow/NumPy scorers must be BITWISE twins of the Column folds."""

    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_seq_dot_np_is_bitwise_sequential_fold(self):
        import numpy as np

        from pdf_drawing_ocr_recognition_spark.functions.vectors import (
            seq_dot_np,
            seq_norm_np,
        )

        rng = np.random.default_rng(42)
        a = rng.standard_normal((50, 64)).astype(np.float32).astype(np.float64)
        b = rng.standard_normal((50, 64)).astype(np.float32).astype(np.float64)
        d = seq_dot_np(a, b)
        n = seq_norm_np(a)
        for i in range(50):
            acc = 0.0
            for v in a[i] * b[i]:
                acc = acc + v
            assert d[i] == acc  # bitwise, not approx
            acc2 = 0.0
            for v in a[i] * a[i]:
                acc2 = acc2 + v
            import math

            assert n[i] == math.sqrt(acc2)  # IEEE sqrt, not libm pow(x, .5)

    def test_arrow_topk_bitwise_matches_codegen_topk(self, emb):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            brute_force_topk,
            brute_force_topk_arrow,
        )

        q = emb.filter(F.col("vec_id") < 5)
        a = sorted(
            tuple(r) for r in brute_force_topk_arrow(emb, q, k=10).collect()
        )
        b = sorted(
            tuple(r) for r in brute_force_topk(emb, q, k=10, dim=64).collect()
        )
        assert a == b  # exact float equality: same fold bits, same rounding


class TestMinhashShortDocs:
    def test_driver_corpora_have_no_sub_trigram_docs(self, spark, sf_dir):
        """minhash_signatures drops docs with <3 words (no shingles) while the
        fold path gives them a NULL sig — the docstring's claim that no driver
        corpus contains such a doc, asserted here."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_short = docs.filter(
            F.size(F.split(F.lower(F.col("text")), " ")) < 3
        ).count()
        assert n_short == 0

    def test_exploded_signature_equals_fold_signature(self, spark):
        from pdf_drawing_ocr_recognition_spark.functions.dedup import (
            minhash_sig_fold,
            word_shingles,
        )
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            minhash_signatures,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "one two three"),
                (3, "the quick brown fox jumps over the lazy dog"),
                (4, "ab"),  # <3 words: absent from exploded, NULL in fold
            ],
            "doc_id LONG, text STRING",
        )
        exploded = {
            r["doc_id"]: tuple(r["sig"])
            for r in minhash_signatures(docs).collect()
        }
        fold = {
            r["doc_id"]: (tuple(r["sig"]) if r["sig"] is not None else None)
            for r in docs.select(
                "doc_id", minhash_sig_fold(word_shingles(F.col("text"))).alias("sig")
            ).collect()
        }
        assert 4 not in exploded and fold[4] is None
        for k in (1, 2, 3):
            assert exploded[k] == fold[k], k


class TestPlaneSizing:
    def test_sizing_rule_tracks_corpus(self):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            expected_bucket_occupancy,
            planes_for_corpus,
        )

        # 10^9 vectors / 1000-target → ~20 planes, and the chosen plane count
        # actually achieves the target occupancy
        for n in (10**6, 10**9, 10**12):
            p = planes_for_corpus(n, 1000)
            assert expected_bucket_occupancy(n, p) <= 1000
            assert expected_bucket_occupancy(n, p - 1) > 1000 or p == 1
        assert planes_for_corpus(10**9, 1000) == 20

    def test_under_planed_call_fails_loudly(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            embedding_near_dupe_pairs,
        )

        df = spark.range(1).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        )
        planes = [[1.0, 0.0], [0.0, 1.0]]  # 4 buckets
        with pytest.raises(ValueError, match="planes"):
            embedding_near_dupe_pairs(df, planes, n_vectors=10**9)
        # adequate planing passes the guard (plan builds fine)
        embedding_near_dupe_pairs(df, planes, n_vectors=1000).schema


class TestPersistedAnnIndex:
    def test_indexed_probe_matches_fresh_and_skips_corpus_shuffle(self, spark, sf_dir):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            ann_topk,
            ann_topk_indexed,
            bucketize,
            write_ann_index,
        )

        PLANES = [
            [(1.0 if i == j else 0.0) for i in range(64)] for j in range(4)
        ]
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        q = emb.filter(F.col("vec_id") < 3)
        try:
            write_ann_index(emb, PLANES, "ann_idx")
            indexed = spark.table("ann_idx")
            a = sorted(map(tuple, ann_topk(emb, q, PLANES, k=5, probes=1).collect()))
            b = sorted(
                map(tuple, ann_topk_indexed(indexed, q, PLANES, k=5, probes=1).collect())
            )
            assert a == b and len(a) > 0

            # corpus side must NOT shuffle: candidate join has exactly the
            # probe-side Exchange, none between the bucketed scan and the join
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                probes_df = bucketize(q, PLANES).select(
                    F.col("vec_id").alias("query_id"), "bucket"
                )
                cand = indexed.join(probes_df, "bucket")
                plan = cand._jdf.queryExecution().executedPlan().toString()
                assert plan.count("Exchange") == 1, plan
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS ann_idx")


class TestApproxPercentiles:
    def test_sketch_bounds_error_vs_exact(self, spark, sf_dir):
        """GK sketch (mergeable, constant memory) lands within rank-error of
        the exact single-reducer percentile — the documented scale path."""
        import __spark_entry__ as em

        exact = {r["lang"]: r for r in em.q_percentile_chars(spark, sf_dir).collect()}
        approx = {
            r["lang"]: r
            for r in em.q_approx_percentile_chars(spark, sf_dir).collect()
        }
        assert set(exact) == set(approx)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        values = {
            lang: sorted(
                r["n_chars"]
                for r in docs.filter(F.col("lang") == lang)
                .select("n_chars")
                .collect()
            )
            for lang in exact
        }
        for lang in exact:
            assert approx[lang]["p100"] == exact[lang]["p100"]
            vals, n = values[lang], len(values[lang])
            for p, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
                v = approx[lang][p]
                # GK guarantee is on RANK, not value: the sketch returns an
                # actual element whose empirical rank is within eps (=1e-4
                # at accuracy=10000) + one position of the target quantile
                assert v in vals, (lang, p, v)
                lo = sum(1 for x in vals if x < v) / n
                hi = sum(1 for x in vals if x <= v) / n
                tol = 1e-4 + 1.5 / n
                assert lo - tol <= q <= hi + tol, (lang, p, v, lo, hi, n)


class TestApproxDistinct:
    def test_hll_within_rsd_of_exact(self, spark, sf_dir):
        """HLL++ at rsd=2%: per-lang distinct-word estimate within 3*rsd of
        the exact count (the sketch's own error model) — the constant-memory
        cardinality audit for 100 TB corpora."""
        import __spark_entry__ as em

        rows = em.q_approx_distinct_words(spark, sf_dir).collect()
        assert rows
        for r in rows:
            exact = r["exact_distinct_words"]
            approx = r["approx_distinct_words"]
            assert exact > 0
            assert abs(approx - exact) <= max(5, 0.06 * exact), (
                r["lang"], approx, exact
            )


class TestIterativeLloyd:
    def test_multi_iter_refine_invariants_and_determinism(self, spark, sf_dir):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import ivf_refine

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        cents = emb.filter(F.col("vec_id") < 8)
        assigned, stats = ivf_refine(emb, cents, n_iters=3)
        n = emb.count()
        # every iteration assigns every vector exactly once
        assert [s["n_vectors"] for s in stats] == [n, n, n]
        assert stats[0]["n_moved"] == n  # first iteration: everything "moves"
        # the final assignment covers all vectors across <= 8 lists
        counts = assigned.groupBy("centroid_id").count().collect()
        assert sum(r["count"] for r in counts) == n
        assert all(0 <= r["centroid_id"] < 8 for r in counts)
        # fixed iteration count + rounded means → rerun is identical
        _a2, stats2 = ivf_refine(emb, cents, n_iters=3)
        assert [s["n_moved"] for s in stats] == [s["n_moved"] for s in stats2]
        # refinement settles: later iterations move fewer vectors than iter 0
        assert stats[2]["n_moved"] < n


class TestIncrementalDedup:
    """T44 — corpus-delta dedup against a persisted index (VERDICT r2 #1)."""

    def test_incremental_equals_full_rerun_on_union(
        self, spark, docs_with_dups, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            incremental_dedupe,
            near_dupe_pairs,
            write_dedup_index,
        )

        corpus = docs_with_dups.filter(F.col("doc_id") < 100)
        batch = docs_with_dups.filter(F.col("doc_id") >= 100)
        base = str(tmp_path / "idx")
        write_dedup_index(corpus, base)
        surv = incremental_dedupe(
            batch,
            spark.read.parquet(f"{base}/digests"),
            spark.read.parquet(f"{base}/bands"),
        )
        got = sorted(r["doc_id"] for r in surv.select("doc_id").collect())

        # full-rerun twin: batch doc survives iff no smaller-keyed doc in the
        # UNION shares a band key (LSH candidate loser) or a text digest
        pair_losers = {
            r["key_b"]
            for r in near_dupe_pairs(docs_with_dups).select("key_b").collect()
        }
        import collections

        by_digest = collections.defaultdict(list)
        for r in docs_with_dups.select("doc_id", "text").collect():
            by_digest[r["text"]].append(r["doc_id"])
        digest_losers = {
            d for ids in by_digest.values() for d in sorted(ids)[1:]
        }
        batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
        expected = sorted(batch_ids - pair_losers - digest_losers)
        assert got == expected
        # all exact dups of corpus docs are gone
        assert all(100 + i not in got for i in range(10))

    def test_append_folds_batch_into_index(self, spark, docs_with_dups, tmp_path):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            append_to_dedup_index,
            incremental_dedupe,
            write_dedup_index,
        )

        corpus = docs_with_dups.filter(F.col("doc_id") < 100)
        day1 = spark.createDataFrame(
            [(500, "fresh day one document with wholly novel content words")],
            "doc_id LONG, text STRING",
        )
        base = str(tmp_path / "idx2")
        write_dedup_index(corpus, base)

        def idx():
            return (
                spark.read.parquet(f"{base}/digests"),
                spark.read.parquet(f"{base}/bands"),
            )

        s1 = incremental_dedupe(day1, *idx())
        assert s1.count() == 1
        append_to_dedup_index(s1, base)
        # day 2 re-submits the same text (new key) → dropped via the index
        day2 = spark.createDataFrame(
            [(600, "fresh day one document with wholly novel content words"),
             (601, "a genuinely different second day document entirely")],
            "doc_id LONG, text STRING",
        )
        s2 = sorted(r["doc_id"] for r in incremental_dedupe(day2, *idx()).collect())
        assert s2 == [601]

    def test_bucketed_index_probe_has_no_index_side_exchange(
        self, spark, docs_with_dups
    ):
        """The write-once/probe-many contract: with the band index stored
        Hive-bucketed on band_key, the probe semi-join shuffles ONLY the
        batch side (index-side scan feeds the join with zero Exchange)."""
        from pdf_drawing_ocr_recognition_spark.functions.dedup import lsh_band_keys
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            build_dedup_index,
            minhash_signatures,
        )
        from pdf_drawing_ocr_recognition_spark.operators.skew import write_bucketed

        corpus = docs_with_dups.filter(F.col("doc_id") < 100)
        batch = docs_with_dups.filter(F.col("doc_id") >= 100)
        _, bands = build_dedup_index(corpus)
        try:
            write_bucketed(bands, "incr_bands_idx", 8, "band_key")
            idx = spark.table("incr_bands_idx")
            sigs = minhash_signatures(batch)
            banded = sigs.select(
                "doc_id",
                F.explode(lsh_band_keys(F.col("sig"), 4, 4)).alias("band_key"),
            )
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                probe = banded.join(idx.select("band_key"), "band_key", "left_semi")
                plan = probe._jdf.queryExecution().executedPlan().toString()
                # every Exchange hashes the probe (batch) side, never the scan
                # of the bucketed index table
                import re

                for frag in re.findall(r"Exchange [^\n]*", plan):
                    assert "incr_bands_idx" not in frag, plan
                assert "incr_bands_idx" in plan  # the index scan is in the plan
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS incr_bands_idx")


class TestConnectedComponents:
    """T45 — transitive near-dedup closure (VERDICT r2 #3)."""

    def test_chain_and_isolated_pair_components(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(1, 3), (2, 3), (7, 8), (10, 11), (11, 12), (12, 13), (13, 14)],
            "key_a LONG, key_b LONG",
        )
        comp = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert comp == {
            1: 1, 2: 1, 3: 1,          # V shape: two minima joined via 3
            7: 7, 8: 7,                # isolated pair
            10: 10, 11: 10, 12: 10, 13: 10, 14: 10,  # 5-node path
        }

    def test_convergence_error_is_loud(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            connected_components,
        )

        pairs = spark.createDataFrame([(1, 2), (2, 3)], "key_a LONG, key_b LONG")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="converge"):
            connected_components(pairs, max_iters=0)

    def test_transitive_collapses_chain_single_pass_does_not(self, spark):
        """A(1)~C(3), B(2)~C(3), A≁B: single-pass near_dedupe keeps {1, 2}
        (two 'minima' linked through the dropped 3); dedupe_transitive keeps
        only the true cluster representative {1} in ONE call."""
        import hashlib

        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            dedupe_transitive,
            near_dedupe,
            near_dupe_pairs,
        )

        words = [
            hashlib.md5(f"cc|{j}".encode()).hexdigest()[:6] for j in range(38)
        ]
        a = " ".join(words[:30])            # 28 shingles
        c = " ".join(words[:34])            # J(a,c) = 28/32 = 0.875
        b = " ".join(words[:38])            # J(c,b) = 32/36 ≈ 0.889; J(a,b) ≈ 0.778
        docs = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id LONG, text STRING"
        )
        pairs = {
            (r["key_a"], r["key_b"])
            for r in near_dupe_pairs(docs, min_jaccard=0.8).select(
                "key_a", "key_b"
            ).collect()
        }
        assert pairs == {(1, 3), (2, 3)}, pairs  # the V topology, no (1,2)
        single = sorted(
            r["doc_id"] for r in near_dedupe(docs, min_jaccard=0.8).collect()
        )
        transitive = sorted(
            r["doc_id"]
            for r in dedupe_transitive(docs, min_jaccard=0.8).collect()
        )
        assert single == [1, 2]       # the single-pass blind spot
        assert transitive == [1]      # closure collapses the chain


class TestArrowMinhashKernel:
    def test_arrow_kernel_equals_exploded_codegen_path(self, spark, docs_with_dups):
        """The Arrow shingle kernel (default) is value-identical to the
        exploded+window codegen formulation on every doc, including Unicode
        text (md5 hex, hex-window lexicographic minima, split/lower)."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_exploded,
        )

        extra = spark.createDataFrame(
            [(900, "Füß ÜBER straße Füß ÜBER wörter MIXED Case tokens")],
            "doc_id LONG, text STRING",
        )
        docs = docs_with_dups.union(extra)
        arrow = {
            r["doc_id"]: tuple(r["sig"])
            for r in minhash_signatures(docs).collect()
        }
        exploded = {
            r["doc_id"]: tuple(r["sig"])
            for r in minhash_signatures_exploded(docs).collect()
        }
        assert arrow == exploded and len(arrow) == 56

    def test_kernel_plan_has_no_exchange_on_well_partitioned_input(
        self, spark, docs_with_dups
    ):
        """With input partitions >= parallelism (the 100-TB scan shape) the
        signature kernel is a pure narrow stage; only under-partitioned
        small inputs get the one spreading repartition."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            minhash_signatures,
        )

        par = spark.sparkContext.defaultParallelism
        wide = docs_with_dups.repartition(par * 2)
        plan = (
            minhash_signatures(wide)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the input's own repartition is upstream of the analyzed plan; the
        # kernel itself must not add an Exchange beyond it
        assert plan.count("Exchange") <= 1, plan
        narrow = docs_with_dups.coalesce(1)
        plan2 = (
            minhash_signatures(narrow)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan2  # under-partitioned input gets spread


class TestPersistedIvfIndex:
    def test_indexed_probe_matches_fresh_and_skips_assignment(self, spark, sf_dir):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            ivf_topk,
            ivf_topk_indexed,
            write_ivf_index,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        cents = emb.filter(F.col("vec_id") < 16)
        q = emb.filter(F.col("vec_id") < 5)
        try:
            write_ivf_index(emb, cents, "ivf_idx", n_files=16)
            indexed = spark.table("ivf_idx")
            fresh = sorted(
                map(tuple, ivf_topk(emb, q, cents, k=10, nprobe=4).collect())
            )
            probed = sorted(
                map(
                    tuple,
                    ivf_topk_indexed(indexed, q, cents, k=10, nprobe=4).collect(),
                )
            )
            assert fresh == probed and len(fresh) == 50
            # the probe plan never shuffles the corpus: every Exchange hashes
            # the (tiny) query/probe side, not the bucketed index scan
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                plan = (
                    ivf_topk_indexed(indexed, q, cents, k=10, nprobe=4)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                import re

                for frag in re.findall(r"Exchange [^\n]*", plan):
                    assert "ivf_idx" not in frag, plan
                assert "ivf_idx" in plan
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS ivf_idx")


class TestClusterRepresentatives:
    def test_prefer_column_beats_min_key(self, spark):
        """With prefer_col the cluster keeps its best-quality member, not the
        minimum key (V topology 1~3, 2~3 where doc 3 is the longest)."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            component_representatives,
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(1, 3), (2, 3), (7, 8)], "key_a LONG, key_b LONG"
        )
        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (7, 5), (8, 5)],
            "doc_id LONG, n_chars LONG",
        )
        comp = connected_components(pairs)
        reps = {
            r["component"]: r["doc_id"]
            for r in component_representatives(comp, docs).collect()
        }
        # component 1: docs 2 and 3 tie on n_chars=30 → min key 2 wins;
        # component 7: 7 and 8 tie → 7
        assert reps == {1: 2, 7: 7}


class TestParagraphDedupe:
    """T47: corpus-wide first-occurrence paragraph dedup + reassembly."""

    @pytest.fixture(scope="class")
    def para_docs(self, spark):
        rows = [
            (1, "alpha one\n\nshared boiler plate\n\nbeta two"),
            (2, "shared boiler plate\n\ngamma three"),  # para 0 dups doc 1
            (3, "shared boiler plate"),  # entire doc is the duplicate
            (4, ""),  # empty doc
            (5, "delta four\n\n\n\nepsilon five"),  # empty middle para
        ]
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def _result(self, spark, para_docs):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            paragraph_dedupe,
        )

        out = paragraph_dedupe(para_docs)
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_first_occurrence_policy(self, spark, para_docs):
        got = self._result(spark, para_docs)
        # doc 1 is the first occurrence of the shared paragraph: intact
        assert got[1]["text"] == "alpha one\n\nshared boiler plate\n\nbeta two"
        assert got[1]["n_paras_dropped"] == 0
        # doc 2 loses the duplicate, keeps its own paragraph in order
        assert got[2]["text"] == "gamma three"
        assert (got[2]["n_paras_kept"], got[2]["n_paras_dropped"]) == (1, 1)

    def test_all_dropped_doc_keeps_empty_row(self, spark, para_docs):
        got = self._result(spark, para_docs)
        assert set(got) == {1, 2, 3, 4, 5}  # every input doc has a row
        assert got[3]["text"] == ""
        assert (got[3]["n_paras_kept"], got[3]["n_paras_dropped"]) == (0, 1)

    def test_short_paragraphs_never_deduped(self, spark, para_docs):
        got = self._result(spark, para_docs)
        # empty paragraphs (doc 4's only para; doc 5's middle) always kept
        assert got[4]["text"] == ""
        assert got[4]["n_paras_dropped"] == 0
        assert got[5]["text"] == "delta four\n\n\n\nepsilon five"
        assert got[5]["n_paras_dropped"] == 0

    def test_order_preserved_under_repartition(self, spark, para_docs):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            paragraph_dedupe,
        )

        shuffled = para_docs.repartition(7)
        got = {
            r["doc_id"]: r["text"]
            for r in paragraph_dedupe(shuffled).collect()
        }
        assert got[1] == "alpha one\n\nshared boiler plate\n\nbeta two"
        assert got[5] == "delta four\n\n\n\nepsilon five"


class TestUrlDedupe:
    """T48: canonical-URL dedup — the pre-content crawl dedup stage."""

    CASES = [
        # (raw, canonical)
        ("https://WWW.Example.COM:443/a/b/?utm_source=x&q=1#frag",
         "https://www.example.com/a/b?q=1"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
        ("https://example.com/a?utm_campaign=c&fbclid=z&gclid=y&ref=r",
         "https://example.com/a"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com:8080/a", "https://example.com:8080/a"),
        ("https://example.com/a?refresh=1",  # 'ref' must not match 'refresh'
         "https://example.com/a?refresh=1"),
    ]

    def test_canonicalize_rules(self, spark):
        from pdf_drawing_ocr_recognition_spark.functions.urls import (
            canonicalize_url,
        )

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(self.CASES)],
            "i LONG, url STRING",
        )
        got = {
            r["i"]: r["c"]
            for r in df.select(
                "i", canonicalize_url(F.col("url")).alias("c")
            ).collect()
        }
        for i, (raw, want) in enumerate(self.CASES):
            assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"

    def test_keep_policy_best_fetch(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            url_dedupe,
        )

        rows = [
            (1, 100, "https://a.com/x?utm_source=s"),
            (2, 300, "https://A.COM/x/"),  # same page, best fetch
            (3, 300, "https://a.com/x"),  # tie on n_chars -> min doc_id wins
            (4, 50, "https://a.com/y"),  # different page
        ]
        out = url_dedupe(
            spark.createDataFrame(rows, "doc_id LONG, n_chars LONG, url STRING")
        )
        got = {r["canonical_url"]: r.asDict() for r in out.collect()}
        assert set(got) == {"https://a.com/x", "https://a.com/y"}
        x = got["https://a.com/x"]
        assert (x["keeper_doc_id"], x["n_versions"], x["best_n_chars"]) == (
            2, 3, 300)
        assert got["https://a.com/y"]["keeper_doc_id"] == 4


class TestExactSubstringDedupe:
    """T71: ExactSubstr-style duplicated token-window removal."""

    @pytest.fixture(scope="class")
    def sub_docs(self, spark):
        rows = [
            (1, "a b c d e f"),          # shares window "b c d" with doc 2
            (2, "x b c d y z"),
            (3, "p q r"),                 # unique: intact
            (4, "m n"),                   # shorter than k: no windows
            (5, ""),                      # empty doc
            (6, "u v w u v w u v w"),     # within-doc repetition
        ]
        return spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def _result(self, docs):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            exact_substring_dedupe,
        )

        out = exact_substring_dedupe(docs, k=3, min_count=2)
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_duplicated_window_removed_from_every_doc(self, sub_docs):
        got = self._result(sub_docs)
        # unlike paragraph_dedupe there is no first-occurrence keep:
        # the shared "b c d" span vanishes from BOTH documents
        assert got[1]["text"] == "a e f"
        assert (got[1]["n_tokens_kept"], got[1]["n_tokens_dropped"]) == (3, 3)
        assert got[2]["text"] == "x y z"
        assert (got[2]["n_tokens_kept"], got[2]["n_tokens_dropped"]) == (3, 3)

    def test_unique_short_and_empty_docs_intact(self, sub_docs):
        got = self._result(sub_docs)
        assert set(got) == {1, 2, 3, 4, 5, 6}
        assert got[3]["text"] == "p q r"
        assert got[4]["text"] == "m n"
        assert got[4]["n_tokens_dropped"] == 0
        assert got[5]["text"] == ""
        assert got[5]["n_tokens_dropped"] == 0

    def test_within_doc_repetition_fully_covered(self, sub_docs):
        # "u v w" (and its rotations) repeat inside doc 6 alone — min_count
        # counts total corpus occurrences, so the whole doc is covered
        got = self._result(sub_docs)
        assert got[6]["text"] == ""
        assert (got[6]["n_tokens_kept"], got[6]["n_tokens_dropped"]) == (0, 9)

    def test_stable_under_repartition(self, sub_docs):
        got = self._result(sub_docs.repartition(5))
        assert got[1]["text"] == "a e f"
        assert got[6]["text"] == ""


class TestSoftDedupWeights:
    """T100: duplicate-aware reweighting over the component graph."""

    def _run(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            soft_dedup_weights,
        )

        docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        # chain {0,1,2} (transitive), pair {3,4}; 5,6,7 singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
        )
        return {
            r["doc_id"]: (r["component"], r["cluster_size"], r["weight_ppm"])
            for r in soft_dedup_weights(docs, pairs, "doc_id").collect()
        }

    def test_hand_graph_weights(self, spark):
        got = self._run(spark)
        assert got[0] == (0, 3, 333333) and got[1] == (0, 3, 333333)
        assert got[2] == (0, 3, 333333)
        assert got[3] == (3, 2, 500000) and got[4] == (3, 2, 500000)
        for s in (5, 6, 7):
            assert got[s] == (s, 1, 1000000)

    def test_mass_conservation_bound(self, spark):
        """Each cluster's total weight is <= 1 doc of mass and within one
        floor-rounding ppm per member of exactly 1."""
        got = self._run(spark)
        by_comp = {}
        for comp, size, w in got.values():
            by_comp.setdefault(comp, []).append((size, w))
        for comp, members in by_comp.items():
            size = members[0][0]
            total = sum(w for _, w in members)
            assert total <= 1_000_000
            assert total > 1_000_000 - size  # floor loses < 1 ppm per member

    def test_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            soft_dedup_weights,
        )

        docs = spark.createDataFrame([(1,)], "doc_id long")
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        with pytest.raises(ValueError):
            soft_dedup_weights(docs, pairs, "doc_id", weight_scale=0)


class TestGroupCentroidCosines:
    """T101: semantic-redundancy matrix between group centroids."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "g string, v array<float>")

    def test_known_geometry(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            group_centroid_cosines,
        )

        d = 4
        ex = [1.0, 0.0, 0.0, 0.0]
        ey = [0.0, 1.0, 0.0, 0.0]
        rows = (
            [("a", ex)] * 3                      # centroid along x
            + [("b", ey)] * 2                    # centroid along y -> cos 0
            + [("c", [2 * x for x in ex])] * 2   # same direction as a -> cos 1
        )
        out = {
            (r["group_a"], r["group_b"]): (r["n_a"], r["n_b"], r["cos_centroid"])
            for r in group_centroid_cosines(self._df(spark, rows), "v", "g", d).collect()
        }
        assert out[("a", "b")] == (3, 2, 0.0)
        assert out[("a", "c")] == (3, 2, 1.0)
        assert out[("b", "c")] == (2, 2, 0.0)

    def test_opposite_and_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            group_centroid_cosines,
        )

        rows = [("a", [1.0, 1.0]), ("b", [-0.5, -0.5]), ("b", [-1.0, -1.0])]
        df = self._df(spark, rows)
        r1 = sorted(map(tuple, group_centroid_cosines(df, "v", "g", 2).collect()))
        r2 = sorted(
            map(
                tuple,
                group_centroid_cosines(df.repartition(5), "v", "g", 2).collect(),
            )
        )
        assert r1 == r2
        assert r1[0][4] == -1.0  # anti-aligned centroids

    def test_zero_centroid_null_and_validation(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            group_centroid_cosines,
        )

        rows = [("a", [1.0, 0.0]), ("z", [1.0, -1.0]), ("z", [-1.0, 1.0])]
        out = {
            (r["group_a"], r["group_b"]): r["cos_centroid"]
            for r in group_centroid_cosines(self._df(spark, rows), "v", "g", 2).collect()
        }
        assert out[("a", "z")] is None  # 0/0 surfaced, not hidden
        with pytest.raises(ValueError):
            group_centroid_cosines(self._df(spark, rows), "v", "g", 0)


class TestMutualTop1Alignment:
    """T102: bitext-style forward/backward top-1 agreement + margin."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_mutual_agreement_geometry(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            mutual_top1_alignment,
        )

        left = self._df(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
        right = self._df(
            spark, [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [0.8, 0.2])]
        )
        out = {
            r["src_id"]: (r["tgt_id"], r["cos"], r["margin"])
            for r in mutual_top1_alignment(left, right).collect()
        }
        # 0<->10 and 1<->11 are mutual; 12 points at 0 but 0 prefers 10
        assert set(out) == {0, 1}
        assert out[0][0] == 10 and out[1][0] == 11
        assert out[0][1] > 0.99 and out[0][2] > 0
        assert all(12 != v[0] for v in out.values())

    def test_hub_is_killed(self, spark):
        """A right-side hub that is top-1 for BOTH lefts can satisfy
        backward agreement for only one of them — the other pair dies
        (the one-directional-mining failure this operator exists to fix)."""
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            mutual_top1_alignment,
        )

        left = self._df(spark, [(0, [1.0, 0.2]), (1, [1.0, 0.3])])
        right = self._df(spark, [(10, [1.0, 0.25])])  # hub for both
        out = mutual_top1_alignment(left, right).collect()
        assert len(out) == 1
        [r] = out
        assert r["margin"] is None  # single right row: no top-2
        # backward top-1 of the hub is the closer left (0.25 ~ 0.2 vs 0.3):
        assert r["src_id"] in (0, 1) and r["tgt_id"] == 10

    def test_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            mutual_top1_alignment,
        )

        import random

        rng = random.Random(3)
        left = self._df(
            spark, [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
        )
        right = self._df(
            spark,
            [(100 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)],
        )
        a = sorted(map(tuple, mutual_top1_alignment(left, right).collect()))
        b = sorted(
            map(
                tuple,
                mutual_top1_alignment(left.repartition(7), right.repartition(3)).collect(),
            )
        )
        assert a == b and len(a) >= 1


class TestDedupCascade:
    """T110: three-stage cascade with first-drop attribution."""

    def test_each_stage_attributes(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            dedup_cascade,
        )

        base = " ".join(f"w{i} w{i+1} common phrase token" for i in range(12))
        near = base + " trailing extra"  # only tail shingles differ
        rows = [
            (0, base),               # keeper of the exact cluster
            (1, base),               # exact dup of 0
            (2, base.upper()),       # casefolded-normalized dup of 0
            (3, near),               # LSH near-dup of 0
            (4, "entirely different content " * 8),  # kept
        ]
        got = {
            r["doc_id"]: r["stage"]
            for r in dedup_cascade(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        assert got[0] == "kept"
        assert got[1] == "exact"
        assert got[2] == "normalized"
        assert got[3] == "near"
        assert got[4] == "kept"

    def test_cheapest_first_attribution_priority(self, spark):
        """A doc that is BOTH an exact dup and a near-dup of something
        reports 'exact' — the first stage that touched it."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            dedup_cascade,
        )

        t = "alpha beta gamma delta epsilon zeta eta theta " * 6
        rows = [(0, t), (1, t), (2, t)]
        got = {
            r["doc_id"]: r["stage"]
            for r in dedup_cascade(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        assert got[0] == "kept" and got[1] == "exact" and got[2] == "exact"

    def test_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            dedup_cascade,
        )

        rows = [(i, f"doc {i % 4} body " * 10) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, dedup_cascade(df).collect()))
        b = sorted(map(tuple, dedup_cascade(df.repartition(9)).collect()))
        assert a == b
        # exactly 4 keepers (one per distinct body), everything else exact
        from collections import Counter

        c = Counter(s for _, s in a)
        assert c["kept"] == 4 and c["exact"] == 36


class TestHostMirrorPairs:
    def _run(self, spark, rows, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            host_mirror_pairs,
        )

        df = spark.createDataFrame(rows, ["host", "text"])
        return {
            (r["host_a"], r["host_b"]): (
                r["n_common"], r["n_a"], r["n_b"], r["jaccard_ppm"]
            )
            for r in host_mirror_pairs(df, **kw).collect()
        }

    def test_full_and_partial_mirror_exact_jaccard(self, spark):
        rows = (
            [("a.com", f"doc {i}") for i in range(4)]
            + [("b.com", f"doc {i}") for i in range(4)]      # full mirror
            + [("c.com", f"doc {i}") for i in range(2)]      # half mirror
            + [("c.com", "only on c")]
            + [("d.com", "unrelated")]
        )
        got = self._run(spark, rows, min_jaccard_ppm=100000)
        assert got[("a.com", "b.com")] == (4, 4, 4, 1000000)
        # |A∩C|=2, |A∪C|=5 → floor(1e6*2/5)=400000; symmetric for b
        assert got[("a.com", "c.com")] == (2, 4, 3, 400000)
        assert got[("b.com", "c.com")] == (2, 4, 3, 400000)
        assert not any("d.com" in k for k in got)

    def test_duplicate_fetches_collapse_to_content_sets(self, spark):
        rows = [("a.com", "x")] * 5 + [("b.com", "x")]  # refetches don't inflate
        got = self._run(spark, rows, min_jaccard_ppm=1)
        assert got == {("a.com", "b.com"): (1, 1, 1, 1000000)}

    def test_boilerplate_digest_cap_suppresses_fanout(self, spark):
        # one digest shared by 6 hosts: with cap 5 it must produce NO pairs
        rows = [(f"h{i}.com", "same footer") for i in range(6)]
        got = self._run(spark, rows, min_jaccard_ppm=1, max_hosts_per_digest=5)
        assert got == {}
        got2 = self._run(spark, rows, min_jaccard_ppm=1, max_hosts_per_digest=6)
        assert len(got2) == 15  # 6 choose 2 once allowed


class TestSimhashWide:
    def _hash(self, spark, rows, **kw):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            simhash_wide,
        )

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {r["doc_id"]: r["simhash"] for r in simhash_wide(df, **kw).collect()}

    @staticmethod
    def _py_simhash(text, n_bits=56):
        import hashlib

        counters = [0] * n_bits
        for w in text.lower().split(" "):
            h = int(hashlib.md5(w.encode()).hexdigest()[: n_bits // 4], 16)
            for b in range(n_bits):
                counters[b] += 1 if (h >> (n_bits - 1 - b)) & 1 else -1
        out = 0
        for b in range(n_bits):
            out |= (1 if counters[b] > 0 else 0) << (n_bits - 1 - b)
        return out

    def test_matches_python_twin_and_order_invariance(self, spark):
        rows = [(1, "the quick brown fox"), (2, "fox brown quick the"),
                (3, "completely different words here")]
        got = self._hash(spark, rows)
        for i, t in rows:
            assert got[i] == self._py_simhash(t), i
        assert got[1] == got[2]  # bag-of-words: order-free
        assert got[1] != got[3]

    def test_small_edit_small_distance(self, spark):
        base = " ".join(f"w{i}" for i in range(60))
        edited = base.replace("w30", "xx")
        got = self._hash(spark, [(1, base), (2, edited)])
        d = bin(got[1] ^ got[2]).count("1")
        assert 0 < d <= 12  # one token of sixty flips few sign bits

    def test_validation(self, spark):
        import pytest as _pytest

        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            simhash_wide,
        )

        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            simhash_wide(df, n_bits=57)
        with _pytest.raises(ValueError):
            simhash_wide(df, n_bits=64)

    def test_feeds_hamming_index_with_text(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            simhash_wide,
        )
        from pdf_drawing_ocr_recognition_spark.operators.multimodal import (
            hamming_near_dupe_pairs,
        )

        base = " ".join(f"w{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, base), (2, base), (3, "entirely other tokens " * 10)],
            ["doc_id", "text"],
        )
        pairs = hamming_near_dupe_pairs(
            simhash_wide(df), n_bits=56, max_distance=3, hash_col="simhash"
        ).collect()
        assert [(p["key_a"], p["key_b"], p["hamming"]) for p in pairs] == [
            (1, 2, 0)
        ]


# ---------------------------------------------------------------------------
# T136 — asymmetric containment pairs (operators/dedup.py:containment_pairs)
# ---------------------------------------------------------------------------


class TestContainmentPairs:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_engulfed_quote_is_full_containment(self, spark):
        """A 6-word excerpt quoted verbatim inside a 40-word page: containment
        of the excerpt is exactly 10^6 ppm even though symmetric Jaccard is
        tiny (4 shared shingles / 38+4-4)."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            containment_pairs,
        )

        page = " ".join(f"t{i}" for i in range(40))
        quote = " ".join(f"t{i}" for i in range(10, 16))
        out = containment_pairs(
            self._mk(spark, [(1, page), (2, quote)]), min_containment_ppm=900000
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["n_common"] == 4 and r["n_b"] == 4 and r["n_a"] == 38
        assert r["cont_ba_ppm"] == 1000000  # quote fully inside page
        assert r["cont_ab_ppm"] == 105263  # page barely inside quote
        # and the symmetric jaccard would have missed it:
        assert r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"]) < 0.2

    def test_disjoint_docs_produce_no_pairs(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            containment_pairs,
        )

        rows = [(1, "a b c d e f"), (2, "x y z w v u")]
        assert containment_pairs(self._mk(spark, rows)).count() == 0

    def test_boilerplate_shingle_cap(self, spark):
        """A shingle shared by more docs than the cap creates no pairs —
        the quadratic-fan-out guard."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            containment_pairs,
        )

        rows = [(i, f"u{i} click here now v{i}") for i in range(8)]
        df = self._mk(spark, rows)
        assert containment_pairs(df, max_docs_per_shingle=4).count() == 0
        # same corpus, cap lifted: all 28 unordered pairs appear
        lifted = containment_pairs(
            df, max_docs_per_shingle=50, min_containment_ppm=1
        )
        assert lifted.count() == 28

    def test_threshold_filters_weak_overlap(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            containment_pairs,
        )

        # 12-word docs sharing a 4-word run: 2 shared shingles / 10 = 20%
        a = " ".join(f"a{i}" for i in range(8)) + " s0 s1 s2 s3"
        b = "s0 s1 s2 s3 " + " ".join(f"b{i}" for i in range(8))
        df = self._mk(spark, [(1, a), (2, b)])
        assert containment_pairs(df, min_containment_ppm=500000).count() == 0
        weak = containment_pairs(df, min_containment_ppm=100000).collect()
        assert len(weak) == 1 and weak[0]["cont_ab_ppm"] == 200000


class TestFirstSeenAttribution:
    """T146 — first-published provenance (first_seen_attribution)."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, host string, fetch_ts long"
        )

    def test_earliest_host_wins_and_spread_counted(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            first_seen_attribution,
        )

        rows = [
            (1, "the article", "origin.com", 100),
            (2, "the article", "scraper-a.com", 200),
            (3, "the article", "scraper-b.com", 300),
            (4, "unique piece", "solo.com", 50),
        ]
        out = first_seen_attribution(self._mk(spark, rows)).collect()
        assert len(out) == 1  # unique content carries no provenance
        r = out[0]
        assert r["first_host"] == "origin.com" and r["first_ts"] == 100
        assert r["n_copies"] == 3 and r["n_hosts"] == 3

    def test_ts_tie_breaks_on_key_deterministically(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            first_seen_attribution,
        )

        rows = [
            (7, "same", "late-key.com", 100),
            (3, "same", "early-key.com", 100),
        ]
        [r] = first_seen_attribution(self._mk(spark, rows)).collect()
        assert r["first_host"] == "early-key.com"

    def test_partition_invariance(self, spark):
        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            first_seen_attribution,
        )

        rows = [
            (i, f"t{i % 6}", f"h{i % 4}", 1000 + (i * 13) % 8)
            for i in range(48)
        ]
        df = self._mk(spark, rows)
        a = sorted(map(tuple, first_seen_attribution(df).collect()))
        b = sorted(
            map(tuple, first_seen_attribution(df.repartition(7)).collect())
        )
        assert a == b


def test_dedup_threshold_sweep_is_monotone(spark):
    """T145 — the operating curve must be non-increasing in the threshold
    (structural property of a sweep over one scored pair set)."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as em

    rows = {
        r["threshold_ppm"]: r
        for r in em.q_dedup_threshold_sweep(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ts = sorted(rows)
    assert ts, "sweep empty at sf0.001"
    for lo, hi in zip(ts, ts[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
        assert rows[lo]["n_docs_flagged"] >= rows[hi]["n_docs_flagged"]
    for t in ts:
        # flagged docs can never exceed 2 per pair nor be fewer than
        # the docs of one pair
        assert 2 <= rows[t]["n_docs_flagged"] <= 2 * rows[t]["n_pairs"]


def test_lsh_recall_eval_structure(spark):
    """T155 — planted-twin recall eval: every threshold row has positives,
    recall is a valid ppm, monotone non-increasing in found-fraction terms
    is NOT asserted (the S-curve isn't monotone in threshold), but the
    planted pairs guarantee n_true >= twins at the lowest threshold."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as em

    rows = {r["threshold_ppm"]: r
            for r in em.q_lsh_recall_eval(spark, "/root/testdata/sf0.001").collect()}
    assert rows, "no thresholds produced positives"
    for t, r in rows.items():
        assert 1 <= r["n_found"] <= r["n_true"]
        assert 0 <= r["recall_ppm"] <= 1000000
    # n_true shrinks as the threshold rises
    ts = sorted(rows)
    for lo, hi in zip(ts, ts[1:]):
        assert rows[lo]["n_true"] >= rows[hi]["n_true"]
