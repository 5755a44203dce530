"""Sessionization: built-in session_window vs custom stateful operator.

The stateful variant runs as a real multi-batch stream (maxFilesPerTrigger=1
over several parquet files), so sessions spanning micro-batch boundaries
genuinely exercise the state store.  Its closed sessions must equal the batch
session_window result minus each user's final (still-open) session.
"""

import os

import pytest
from pyspark.sql import functions as F

GAP = "12 hours"
GAP_US = 12 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 4 time-ordered files (ascending mtimes) so the file
    stream source delivers micro-batches in event-time order — the arrival
    model the stateful operator assumes (production uses watermarks)."""
    import time

    import duckdb

    path = str(tmp_path_factory.mktemp("ev") / "events")
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()
    for k in range(4):
        lo, hi = 1 + 8 * k, 8 * (k + 1)
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/events.parquet' "
            f"WHERE dayofmonth(ts) BETWEEN {lo} AND {hi} ORDER BY ts) "
            f"TO '{path}/b{k:02d}.parquet' (FORMAT PARQUET)"
        )
        mtime = time.time() - 400 + k * 100
        os.utime(f"{path}/b{k:02d}.parquet", (mtime, mtime))
    return path


def batch_sessions(spark, events_dir):
    from pdf_drawing_ocr_recognition_spark.streaming.sessionize import session_windows

    ev = spark.read.parquet(events_dir)
    return {
        (r["user_id"], r["session_start_us"]): (r["n_events"], r["value_cents"])
        for r in session_windows(ev, GAP).collect()
    }


class TestSessionWindows:
    def test_builtin_sessions_cover_all_events(self, spark, events_dir):
        sessions = batch_sessions(spark, events_dir)
        total = sum(n for n, _ in sessions.values())
        assert total == spark.read.parquet(events_dir).count()
        assert any(n > 1 for n, _ in sessions.values())
        assert len(sessions) > 20

    def test_stateful_stream_matches_batch_closed_sessions(
        self, spark, events_dir, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.streaming.sessionize import (
            sessionize_stateful,
        )

        schema = spark.read.parquet(events_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
        out = str(tmp_path / "sessions_out")
        q = (
            sessionize_stateful(stream, GAP_US)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            (r["user_id"], r["session_start_us"]): (r["n_events"], r["value_cents"])
            for r in spark.read.parquet(out).collect()
        }
        full = batch_sessions(spark, events_dir)
        # drop each user's final (open) session from the batch reference
        last_start = {}
        for (uid, start) in full:
            last_start[uid] = max(last_start.get(uid, 0), start)
        closed_ref = {
            k: v for k, v in full.items() if k[1] != last_start[k[0]]
        }
        assert streamed == closed_ref
        assert len(streamed) > 10
