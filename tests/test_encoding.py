"""Encoding-anomaly signal functions (mojibake / U+FFFD / control chars)."""

from pyspark.sql import functions as F


def _one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0]["v"]


def test_mojibake_count_hits_signatures_only(spark):
    from pdf_drawing_ocr_recognition_spark.functions.encoding import (
        mojibake_count,
    )

    assert _one(spark, "cafÃ© dÃ©jÃ  vu â€œquoteâ€“", mojibake_count) == 4
    assert _one(spark, "clean café déjà vu “quote”", mojibake_count) == 0
    assert _one(spark, "", mojibake_count) == 0


def test_replacement_and_control_counts(spark):
    from pdf_drawing_ocr_recognition_spark.functions.encoding import (
        control_char_count,
        replacement_char_count,
    )

    assert _one(spark, "a�b��", replacement_char_count) == 3
    assert _one(spark, "tab\tand\nnewline\rok", control_char_count) == 0
    assert _one(spark, "bad\x07bell\x00nul\x1funit", control_char_count) == 3


def test_anomaly_score_formula(spark):
    from pdf_drawing_ocr_recognition_spark.functions.encoding import (
        encoding_anomaly_score,
    )

    # 1 mojibake (Ã©, weight 2) + 1 replacement in a 10-char string -> 0.3
    s = "Ã©ab�cdefg"
    assert len(s) == 10
    assert _one(spark, s, encoding_anomaly_score) == 0.3
    assert _one(spark, "perfectly clean text", encoding_anomaly_score) == 0.0


def test_sql_twin_agrees(spark):
    import duckdb

    from pdf_drawing_ocr_recognition_spark.functions.encoding import (
        mojibake_count,
        mojibake_markers_sql_counts,
    )

    samples = ["cafÃ© dÃ©jÃ ", "â€œxâ€\x9d Â« Â»", "clean", "Ã©Ã©Ã©"]
    got_spark = [
        _one(spark, s, mojibake_count) for s in samples
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {mojibake_markers_sql_counts('?::VARCHAR')}".replace(
                "?::VARCHAR", "$1"
            ),
            [s],
        ).fetchone()[0]
        for s in samples
    ]
    assert got_spark == got_duck
