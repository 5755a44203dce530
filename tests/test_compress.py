"""T60 compression-ratio signal: kernel-twin parity, signal direction,
edge cases."""

from pdf_drawing_ocr_recognition_spark.functions.compress import (
    compression_ratio,
    compression_ratio_py,
)

PROSE = (
    "the quick brown fox jumps over a lazy dog while seventeen jazzy "
    "wizards vex bold chunks of quartz glyphs formed anew each clause"
)
SPAM = "buy now " * 40


class TestCompressionRatio:
    def test_kernel_twin_direction_and_edges(self):
        r_prose = compression_ratio_py(PROSE)
        r_spam = compression_ratio_py(SPAM)
        assert 0 < r_spam < r_prose <= 1.2  # tiny texts can exceed 1.0
        assert compression_ratio_py("") == 0.0
        # deterministic across calls (pinned level)
        assert compression_ratio_py(PROSE) == r_prose

    def test_spark_column_matches_python_twin(self, spark):
        rows = [(0, PROSE), (1, SPAM), (2, ""), (3, None)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        got = {
            r["doc_id"]: r["r"]
            for r in df.select(
                "doc_id", compression_ratio("text").alias("r")
            ).collect()
        }
        assert got == {
            0: compression_ratio_py(PROSE),
            1: compression_ratio_py(SPAM),
            2: 0.0,
            3: 0.0,  # nulls scored as empty, never NaN-poisoned
        }
