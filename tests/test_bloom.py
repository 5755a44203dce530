"""Bloom prefilter (T51): no false negatives, bounded fp-rate, exact-join
equivalence of bloom_semi_join, and the prefilter's place in the plan."""

import math

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.operators.bloom import (
    _CHUNK_BYTES,
    _bit_positions,
    bloom_bitmap_chunks,
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_semi_join,
)


def _strings(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


class TestParams:
    def test_sizing_matches_formula(self):
        m, k = bloom_params(10_000, 0.01)
        expect_m = -10_000 * math.log(0.01) / math.log(2) ** 2
        assert abs(m - expect_m) <= 8  # rounded up to a byte boundary
        assert 6 <= k <= 8  # optimum ~6.9

    def test_m_monotone_in_n(self):
        assert bloom_params(10**6, 0.01)[0] > bloom_params(10**3, 0.01)[0]

    def test_validation(self):
        with pytest.raises(ValueError):
            bloom_params(0, 0.01)
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)


class TestBuildProbe:
    def test_no_false_negatives(self, spark):
        members = [f"shingle number {i} of the corpus" for i in range(500)]
        df = _strings(spark, members)
        m, k = bloom_params(len(members), 0.01)
        bloom = bloom_build(df, "v", m, k)
        probed = bloom_might_contain(df, "v", bloom, m, k).collect()
        assert all(r["maybe"] for r in probed)  # bloom law: never a false negative

    def test_fp_rate_near_target(self, spark):
        members = [f"member {i}" for i in range(1_000)]
        non_members = [f"outsider {i}" for i in range(4_000)]
        m, k = bloom_params(len(members), 0.01)
        bloom = bloom_build(_strings(spark, members), "v", m, k)
        probed = bloom_might_contain(
            _strings(spark, non_members), "v", bloom, m, k
        ).collect()
        fp = sum(r["maybe"] for r in probed) / len(non_members)
        assert fp < 0.05  # target 0.01; loose deterministic bound

    def test_undersized_bloom_warns(self, spark):
        df = _strings(spark, [f"x{i}" for i in range(400)])
        with pytest.warns(UserWarning, match="under-sized"):
            bloom_build(df, "v", 64, 4)

    def test_validation(self, spark):
        df = _strings(spark, ["a"])
        with pytest.raises(ValueError):
            bloom_build(df, "v", 100, 4)  # not a multiple of 8
        with pytest.raises(ValueError):
            bloom_build(df, "v", 64, 0)
        with pytest.raises(ValueError):
            bloom_might_contain(df, "v", b"\x00" * 8, 128, 4)  # size mismatch

    def test_bitmap_matches_position_replay(self, spark):
        # the distributed bit_or/word-pack path must produce the exact bitmap
        # a naive per-position build would (same xxhash64 positions)
        import numpy as np
        from pyspark.sql import functions as F  # noqa: F811

        df = _strings(spark, [f"value {i}" for i in range(300)])
        m, k = 2048, 5
        got = np.frombuffer(bloom_build(df, "v", m, k), dtype=np.uint8)
        positions = np.array(
            [
                r[0]
                for r in df.select(
                    F.explode(F.array(*_bit_positions(F.col("v"), m, k))).alias("p")
                ).collect()
            ],
            dtype=np.int64,
        )
        want = np.zeros(m // 8, dtype=np.uint8)
        np.bitwise_or.at(
            want, positions >> 3, np.uint8(1) << (positions & 7).astype(np.uint8)
        )
        assert got.tobytes() == want.tobytes()

    def test_driver_transfer_is_packed_bytes_not_rows(self, spark):
        # the 100-TB guarantee: what the driver collects is ceil(m / 2^20)
        # fixed-size binary chunks — O(m/8) BYTES — never per-set-bit rows.
        m, k = 4 * _CHUNK_BYTES * 8, 7  # 4 chunks worth of bit-space
        df = _strings(spark, [f"item {i}" for i in range(5_000)])
        rows = bloom_bitmap_chunks(df, "v", m, k).collect()
        n_chunks_max = -(-m // (8 * _CHUNK_BYTES))
        assert 1 <= len(rows) <= n_chunks_max  # rows scale with m, not with 5k*7 bits
        assert all(len(r["bitmap"]) == _CHUNK_BYTES for r in rows)
        assert sum(len(r["bitmap"]) for r in rows) <= m // 8


class TestSemiJoin:
    def test_equals_exact_semi_join(self, spark):
        probe = _strings(spark, [f"k{i}" for i in range(2_000)])
        filt = _strings(spark, [f"k{i}" for i in range(0, 2_000, 7)] + ["absent"])
        got = sorted(r["v"] for r in bloom_semi_join(probe, filt, "v").collect())
        want = sorted(
            r["v"] for r in probe.join(filt, "v", "left_semi").collect()
        )
        assert got == want

    def test_plan_has_arrow_prefilter_before_join(self, spark):
        probe = _strings(spark, [f"k{i}" for i in range(100)])
        filt = _strings(spark, ["k3", "k7"])
        out = bloom_semi_join(probe, filt, "v", n_items=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the Arrow bitmap probe must sit BELOW the exact confirm join:
        # the join's input is the pruned slice, not the full probe side
        assert "ArrowEvalPython" in plan
        join_at = plan.find("BroadcastHashJoin")
        arrow_at = plan.find("ArrowEvalPython")
        assert -1 < join_at < arrow_at  # deeper in the tree = printed later


class TestQueryEquivalence:
    def test_bloom_decontamination_equals_plain(self, spark, sf_dir):
        import __spark_entry__ as e

        plain = {
            (r["doc_id"], r["n_shared"])
            for r in e.q_decontamination(spark, sf_dir).collect()
        }
        bloomed = {
            (r["doc_id"], r["n_shared"])
            for r in e.q_bloom_decontamination(spark, sf_dir).collect()
        }
        assert bloomed == plain
