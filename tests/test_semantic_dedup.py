"""SemDeDup (operators/similarity.py:semantic_dedup): survivor invariants."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.similarity import (
    _scored_cosine,
    _with_pair_scores,
    ivf_assign,
    semantic_dedup,
)

EPS = 0.3


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def cents(emb):
    return emb.filter(F.col("vec_id") < 8)


def test_no_eps_pair_survives_whole(spark, emb, cents):
    """Every within-cluster pair at cos >= eps loses exactly one member:
    among survivors of the SAME cluster no pair reaches eps."""
    surv = semantic_dedup(emb, cents, eps=EPS, metric_round=4, dim=64)
    sv = surv.join(emb, "vec_id").select("vec_id", "centroid_id", "embedding")
    a = sv.select(
        "centroid_id",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = sv.select(
        "centroid_id",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    cand = a.join(b, "centroid_id").filter(F.col("id_a") < F.col("id_b"))
    pairs = _with_pair_scores(cand, "va", "vb", "_d", "_na", "_nb").select(
        F.round(_scored_cosine(F.col("_d"), F.col("_na"), F.col("_nb")), 4).alias(
            "cos"
        )
    )
    assert pairs.filter(F.col("cos") >= EPS).count() == 0


def test_exact_copy_drops_the_closer_one(spark, emb, cents):
    """Inject an exact copy of vector 100 as vec_id 9000: cos = 1 >= eps in
    the same cluster, equal affinity, so the higher id (the copy) dies."""
    copy = (
        emb.filter(F.col("vec_id") == 100)
        .select(F.lit(9000).cast("long").alias("vec_id"), "embedding", "label")
    )
    surv = semantic_dedup(emb.unionByName(copy), cents, eps=EPS, dim=64)
    ids = {r["vec_id"] for r in surv.select("vec_id").collect()}
    assert 9000 not in ids  # affinity tie -> lower id survives
    # 100 itself survives unless it lost some OTHER pair; assert the pairing
    # dropped at least the copy and never both twins
    assert (100 in ids) or (9000 not in ids)


def test_survivors_subset_and_assignment_carried(spark, emb, cents):
    surv = semantic_dedup(emb, cents, eps=EPS, dim=64)
    n_all = emb.count()
    n_surv = surv.count()
    assert 0 < n_surv < n_all  # at eps=0.3 on this corpus some pairs exist
    # carried (centroid_id, affinity) match a fresh ivf_assign
    fresh = ivf_assign(emb, cents, metric_round=4, dim=64).select(
        "vec_id", "centroid_id", "affinity"
    )
    assert surv.exceptAll(fresh).count() == 0


def test_partition_invariance(spark, emb, cents):
    s1 = semantic_dedup(emb, cents, eps=EPS, dim=64)
    s2 = semantic_dedup(emb.repartition(13), cents, eps=EPS, dim=64)
    assert s1.exceptAll(s2).count() == 0
    assert s2.exceptAll(s1).count() == 0


def test_occupancy_guard_and_validation(spark, emb, cents):
    with pytest.raises(ValueError, match="expected list occupancy"):
        semantic_dedup(
            emb, cents, eps=EPS, dim=64, n_vectors=10_000_000,
            max_expected_list=10_000,
        )
    with pytest.raises(ValueError, match="eps"):
        semantic_dedup(emb, cents, eps=0.0, dim=64)


class TestContrastivePairs:
    def test_pos_neg_labels_and_hardness(self, spark, emb, cents):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            contrastive_pairs,
        )

        anchors = emb.filter(F.col("vec_id") < 12)
        out = contrastive_pairs(emb, cents, anchors, dim=64)
        rows = out.collect()
        assert 0 < len(rows) <= 12
        labels = {r["vec_id"]: r["label"] for r in emb.select(
            "vec_id", "label").collect()}
        for r in rows:
            assert labels[r["pos_id"]] == r["label"]
            assert labels[r["neg_id"]] != r["label"]
            assert r["pos_id"] != r["anchor_id"]
            assert r["neg_id"] != r["anchor_id"]

    def test_partition_invariance(self, spark, emb, cents):
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            contrastive_pairs,
        )

        anchors = emb.filter(F.col("vec_id") < 8)
        a = contrastive_pairs(emb, cents, anchors, dim=64)
        b = contrastive_pairs(emb.repartition(9), cents, anchors, dim=64)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_positive_is_truly_nearest_same_label(self, spark, emb, cents):
        """Brute-check one anchor against its own list: no same-label
        candidate in the list beats the chosen positive's cosine."""
        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            _scored_cosine,
            _with_pair_scores,
            contrastive_pairs,
            ivf_assign,
        )

        anchors = emb.filter(F.col("vec_id") < 3)
        out = {r["anchor_id"]: r for r in contrastive_pairs(
            emb, cents, anchors, dim=64).collect()}
        assigned = ivf_assign(emb, cents, dim=64, metric_round=4).join(
            emb.select("vec_id", "label"), "vec_id"
        )
        for aid, row in out.items():
            cell = assigned.filter(F.col("vec_id") == aid).collect()[0]
            av, alabel, acid = cell["embedding"], cell["label"], cell["centroid_id"]
            cands = assigned.filter(
                (F.col("centroid_id") == acid)
                & (F.col("label") == alabel)
                & (F.col("vec_id") != aid)
            ).select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("vc"),
                F.lit(av).alias("va"),
            )
            best = (
                _with_pair_scores(cands, "va", "vc", "_d", "_na", "_nb")
                .select(F.round(_scored_cosine(
                    F.col("_d"), F.col("_na"), F.col("_nb")), 4).alias("cos"))
                .agg(F.max("cos"))
                .collect()[0][0]
            )
            assert row["pos_cos"] == best


class TestMatryoshkaRecall:
    """T152 — prefix-truncation recall audit shape."""

    def _recall(self, spark, rows, d, k=3):
        from pyspark.sql import functions as F

        from pdf_drawing_ocr_recognition_spark.operators.similarity import (
            brute_force_topk_arrow,
        )

        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        q = emb.filter(F.col("vec_id") == 0)
        full = brute_force_topk_arrow(emb, q, k=k, round_to=4).select(
            "query_id", "neighbor_id"
        )
        tr = emb.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        t = brute_force_topk_arrow(
            tr, tr.filter(F.col("vec_id") == 0), k=k, round_to=4
        ).select("query_id", "neighbor_id")
        return full.join(t, ["query_id", "neighbor_id"]).count()

    def test_information_in_prefix_gives_full_recall(self, spark):
        # all signal in dims 1-2; tail is constant -> truncation loses nothing
        rows = [
            (0, [1.0, 0.0] + [0.5] * 4),
            (1, [0.9, 0.1] + [0.5] * 4),
            (2, [0.1, 0.9] + [0.5] * 4),
            (3, [-1.0, 0.0] + [0.5] * 4),
            (4, [0.8, 0.2] + [0.5] * 4),
        ]
        assert self._recall(spark, rows, d=2) == 3

    def test_information_in_tail_breaks_prefix_recall(self, spark):
        # prefix identical for all: truncated ranking is pure tiebreak order,
        # while full ranking is driven by the tail
        rows = [
            (0, [1.0, 1.0, 0.9, -0.3, 0.2, 0.0]),
            (1, [1.0, 1.0, 0.9, -0.3, 0.19, 0.0]),
            (2, [1.0, 1.0, -0.9, 0.3, -0.2, 0.0]),
            (3, [1.0, 1.0, -0.9, 0.3, -0.19, 0.0]),
            (4, [1.0, 1.0, 0.89, -0.3, 0.2, 0.0]),
        ]
        # full top-3 of 0: {1, 4, ...} similar tails; truncated: ids {1,2,3}
        # by tiebreak — overlap strictly below k
        assert self._recall(spark, rows, d=2) < 3
