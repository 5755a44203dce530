"""Streaming variant: AvailableNow drain must equal the batch pipeline."""

import pytest
from pyspark.sql import functions as F

from pdf_drawing_ocr_recognition_spark.fixtures.gen_pages import PATTERNS


class TestStreamingExtraction:
    def test_stream_equals_batch(self, spark, pages_small, tmp_path):
        from pdf_drawing_ocr_recognition_spark.operators.extract import extract_pages
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            run_stream_to_parquet,
        )

        out = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "ckpt")
        run_stream_to_parquet(spark, pages_small, PATTERNS, out, ckpt)

        streamed = {
            r["url"]: r["extracted_text"]
            for r in spark.read.parquet(out)
            .filter(F.col("status") == "ok")
            .select("url", "extracted_text")
            .collect()
        }
        pages = spark.read.parquet(pages_small).filter(
            F.col("lang").isin("en", "zh", "de")
        )
        batch = {
            r["url"]: r["extracted_text"]
            for r in extract_pages(pages, PATTERNS)
            .filter(F.col("status") == "ok")
            .select("url", "extracted_text")
            .collect()
        }
        assert streamed == batch
        assert len(streamed) > 100

    def test_windowed_counts_batch_vs_plain_agg(self, spark, sf_dir):
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            windowed_event_counts,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {
            (r["window_start_us"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in windowed_event_counts(ev).collect()
        }
        want = {
            (r["us"], r["event_type"]): (r["n"], r["cents"])
            for r in ev.groupBy(
                F.unix_micros(
                    F.date_trunc("hour", F.col("ts").cast("timestamp"))
                ).alias("us"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            .collect()
        }
        assert got == want


class TestWatermarkLateData:
    def test_late_rows_dropped_and_open_windows_held(self, spark, tmp_path):
        """Real streaming watermark semantics: one file per micro-batch, so
        the watermark advances between files — a row arriving after its
        window passed the watermark is DROPPED, and windows newer than the
        final watermark stay in state (never emitted in append mode)."""
        import os
        from datetime import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            run_windowed_stream_to_memory,
        )

        d = str(tmp_path / "ev_stream")
        os.makedirs(d)

        def write(name, rows, mtime):
            ids, tss, users, types, vals = zip(*rows)
            pq.write_table(
                pa.table(
                    {
                        "event_id": pa.array(ids, pa.int64()),
                        "ts": pa.array(tss, pa.timestamp("us")),
                        "user_id": pa.array(users, pa.int64()),
                        "event_type": pa.array(types, pa.string()),
                        "value": pa.array(vals, pa.float64()),
                    }
                ),
                f"{d}/{name}",
            )
            os.utime(f"{d}/{name}", (mtime, mtime))

        t = lambda hh, mm: datetime(2025, 6, 1, hh, mm)
        # Late-row filtering uses the watermark of the PREVIOUS micro-batch
        # (one batch of grace; SPARK-40925 watermark propagation), eviction
        # the current one — so the late row must arrive two batches after
        # the rows that advanced the watermark past its window.
        # file1: two rows in W00 ([00:00,01:00)) + one at 05:00
        #        → watermark after batch0 = 05:00 - 2h = 03:00 (> W00 end)
        write("f1.parquet", [
            (1, t(0, 30), 1, "click", 1.0),
            (2, t(0, 40), 1, "click", 1.0),
            (3, t(5, 0), 1, "click", 1.0),
        ], 1_000_000)
        # file2: advances watermark to 07:00 (batch1 runs with 03:00)
        write("f2.parquet", [(4, t(9, 0), 1, "click", 1.0)], 1_000_010)
        # file3: LATE row for W00 — batch2's late filter is batch1's
        # watermark (03:00) > W00 end → DROPPED; plus one more 09:xx row
        write("f3.parquet", [
            (5, t(0, 45), 1, "click", 1.0),
            (6, t(9, 30), 1, "click", 1.0),
        ], 1_000_020)

        run_windowed_stream_to_memory(spark, d, "wm_sink")
        out = {
            (r["window_start_us"], r["event_type"]): r["n_events"]
            for r in spark.sql("SELECT * FROM wm_sink").collect()
        }
        import calendar

        us = lambda hh: calendar.timegm(datetime(2025, 6, 1, hh).timetuple()) * 1_000_000
        assert out[(us(0), "click")] == 2, out  # late row 5 NOT counted
        assert out[(us(5), "click")] == 1  # finalized once watermark passed 06:00
        assert (us(9), "click") not in out  # open window held in state


class TestStreamingDedup:
    def test_within_watermark_dropped_after_eviction_reemitted(self, spark, tmp_path):
        """Bounded-state streaming dedup contract, under real micro-batches:
        a duplicate within the watermark delay is DROPPED; once the watermark
        evicts the digest's state, a later duplicate re-emits (the tradeoff
        the downstream batch compaction cleans up)."""
        import os
        from datetime import datetime

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            run_dedup_stream_to_memory,
        )

        d = str(tmp_path / "docs_stream")
        os.makedirs(d)

        def write(name, rows, mtime):
            urls, tss, texts = zip(*rows)
            pq.write_table(
                pa.table(
                    {
                        "url": pa.array(urls, pa.string()),
                        "warc_ts": pa.array(tss, pa.timestamp("us")),
                        "text": pa.array(texts, pa.string()),
                    }
                ),
                f"{d}/{name}",
            )
            os.utime(f"{d}/{name}", (mtime, mtime))

        t = lambda hh, mm=0: datetime(2025, 6, 1, hh, mm)
        # batch0: A, B seed the digest state; watermark stays early
        write("f1.parquet", [
            ("u/a1", t(0, 30), "content A"),
            ("u/b1", t(0, 40), "content B"),
        ], 1_000_000)
        # batch1: duplicate of A arrives 50 min later — WITHIN the 2h delay
        # of the kept row → dropped; the 12:00 row advances the watermark to
        # 10:00, which evicts A's and B's digest state at batch end
        write("f2.parquet", [
            ("u/a2", t(1, 20), "content A"),
            ("u/e1", t(12, 0), "content E"),
        ], 1_000_010)
        # batch2: filler keeps the stream moving (eviction certain by now)
        write("f3.parquet", [("u/f1", t(12, 10), "content F")], 1_000_020)
        # batch3: duplicate of B AFTER eviction → re-emitted (bounded state)
        write("f4.parquet", [("u/b2", t(12, 30), "content B")], 1_000_030)

        run_dedup_stream_to_memory(spark, d, "dedup_sink")
        urls = sorted(
            r["url"] for r in spark.sql("SELECT url FROM dedup_sink").collect()
        )
        assert "u/a2" not in urls           # in-watermark duplicate dropped
        assert "u/b2" in urls               # post-eviction duplicate re-emits
        assert {"u/a1", "u/b1", "u/e1", "u/f1"} <= set(urls)

    def test_batch_compaction_cleans_streaming_residue(self, spark, tmp_path):
        """Stream-ingest + batch-compact: exact_dedupe over the landed stream
        output removes the post-eviction re-emits, one keeper per digest."""
        from pdf_drawing_ocr_recognition_spark.operators.dedup import exact_dedupe

        landed = spark.createDataFrame(
            [("u/a1", "content A"), ("u/b1", "content B"), ("u/b2", "content B")],
            "url STRING, text STRING",
        )
        kept = sorted(
            r["url"] for r in exact_dedupe(landed, key_col="url").collect()
        )
        assert kept == ["u/a1", "u/b1"]


class TestStreamManifestLanding:
    def test_stream_lands_atomically_and_rerun_is_idempotent(
        self, spark, pages_small, tmp_path
    ):
        """foreachBatch + atomic batch commit: streamed output equals the
        batch pipeline; re-draining the same input into the same output dir
        (fresh checkpoint → same deterministic batch ids) overwrites in
        place — row count and content unchanged, no duplicates."""
        from pdf_drawing_ocr_recognition_spark.operators.extract import extract_pages
        from pdf_drawing_ocr_recognition_spark.operators.manifest import read_manifest
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            run_stream_with_manifest,
        )

        out = str(tmp_path / "landed")
        run_stream_with_manifest(
            spark, pages_small, PATTERNS, out, str(tmp_path / "ckpt1")
        )
        landed = spark.read.option("basePath", out).parquet(f"{out}/batch=*")
        first = {
            r["url"]: r["extracted_text"]
            for r in landed.select("url", "extracted_text").collect()
        }
        pages = spark.read.parquet(pages_small).filter(
            F.col("lang").isin("en", "zh", "de")
        )
        batch = {
            r["url"]: r["extracted_text"]
            for r in extract_pages(pages, PATTERNS)
            .select("url", "extracted_text")
            .collect()
        }
        assert first == batch
        m = read_manifest(spark, out)
        assert m.count() >= 1
        assert m.agg(F.sum("n_rows")).collect()[0][0] == len(first)

        # replay: same input, same out dir, fresh checkpoint → idempotent
        run_stream_with_manifest(
            spark, pages_small, PATTERNS, out, str(tmp_path / "ckpt2")
        )
        again = {
            r["url"]: r["extracted_text"]
            for r in spark.read.option("basePath", out)
            .parquet(f"{out}/batch=*")
            .select("url", "extracted_text")
            .collect()
        }
        assert again == first


class TestStreamStreamJoin:
    def test_streaming_attribution_equals_batch_join(self, spark, sf_dir, tmp_path):
        """Stream-stream inner join under AvailableNow equals the batch join
        over the same events — and only in-window clicks attribute."""
        from pdf_drawing_ocr_recognition_spark.streaming.stream_extract import (
            purchase_attribution_join,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        want = sorted(
            map(
                tuple,
                purchase_attribution_join(
                    ev.filter(F.col("event_type") == "purchase"),
                    ev.filter(F.col("event_type") == "click"),
                ).collect(),
            )
        )
        assert want, "no attributed purchases in fixture"

        schema = (
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE"
        )
        src = str(tmp_path / "ev")
        ev.select(*[c.strip().split()[0] for c in schema.split(",")]).write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        joined = purchase_attribution_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("attrib_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            map(tuple, spark.sql("SELECT * FROM attrib_sink").collect())
        )
        assert got == want
        # every attributed click is within the window, on the correct user
        for _pid, _uid, _cid, p_us, c_us in got:
            assert 0 <= p_us - c_us <= 2 * 3600 * 1_000_000


class TestStreamingIncrementalDedup:
    def test_micro_batches_dedupe_against_index_and_each_other(
        self, spark, tmp_path
    ):
        """Three one-file micro-batches through the persisted-index probe:
        batch docs duplicating the bootstrap corpus are dropped, a later
        micro-batch duplicating an earlier batch's survivor is dropped
        (index append between batches), novel docs land."""
        import hashlib

        from pdf_drawing_ocr_recognition_spark.operators.dedup import (
            write_dedup_index,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            streaming_incremental_dedupe,
        )

        def txt(tag, n=14):
            return " ".join(
                hashlib.md5(f"{tag}|{j}".encode()).hexdigest()[:6]
                for j in range(n)
            )

        corpus = spark.createDataFrame(
            [(i, txt(f"c{i}")) for i in range(10)], "doc_id LONG, text STRING"
        )
        idx = str(tmp_path / "sidx")
        write_dedup_index(corpus, idx)

        stream_dir = str(tmp_path / "sdocs")
        # file 0: one corpus dup + one novel; file 1: novel; file 2: dup of
        # file 1's survivor + novel
        batches = [
            [(100, txt("c3")), (101, txt("n1"))],
            [(102, txt("n2"))],
            [(103, txt("n2")), (104, txt("n3"))],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(
                1
            ).write.parquet(f"{stream_dir}/f{i}")

        docs = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/f*")
        )
        out = str(tmp_path / "sout")
        q = streaming_incremental_dedupe(
            docs, idx, out, str(tmp_path / "sckpt")
        )
        q.awaitTermination()

        landed = sorted(
            r["doc_id"] for r in spark.read.parquet(f"{out}/batch=*").collect()
        )
        assert landed == [101, 102, 104]
        # the index grew by exactly the survivors' digests
        digests = spark.read.parquet(f"{idx}/digests")
        assert digests.count() == 10 + 3


class TestStreamingSketchFold:
    def test_folded_sketch_equals_batch_sketch(self, spark, tmp_path):
        """Three one-file micro-batches folded via cms_merge: the persisted
        sketch is cell-identical to one batch build over the union, and the
        stored table never exceeds d*16^p rows (T86 streaming citizenship)."""
        import hashlib

        from pyspark.sql import functions as F

        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            cms_build,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            streaming_sketch_fold,
        )

        def txt(tag, n=30):
            return " ".join(
                hashlib.md5(f"{tag}|{j}".encode()).hexdigest()[:4]
                for j in range(n)
            )

        stream_dir = str(tmp_path / "skdocs")
        batches = [
            [(i, txt(f"b0_{i}")) for i in range(5)],
            [(10 + i, txt(f"b1_{i}")) for i in range(5)],
            [(20 + i, txt(f"b0_{i}")) for i in range(5)],  # repeats batch 0
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, "doc_id LONG, text STRING").coalesce(
                1
            ).write.parquet(f"{stream_dir}/f{i}")

        docs = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/f*")
        )
        sketch_path = str(tmp_path / "sketch")
        q = streaming_sketch_fold(
            docs, sketch_path, str(tmp_path / "skckpt"), depth=4, prefix_len=2
        )
        q.awaitTermination()

        stored = spark.read.parquet(sketch_path)
        allrows = [r for b in batches for r in b]
        toks = (
            spark.createDataFrame(allrows, "doc_id LONG, text STRING")
            .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        )
        whole = cms_build(toks, "w", 4, 2)
        assert stored.count() <= 4 * 16**2
        assert stored.exceptAll(whole).count() == 0
        assert whole.exceptAll(stored).count() == 0


class TestStreamingHllFold:
    def test_multibatch_equals_whole_and_bounded(self, spark, tmp_path):
        """T105: after 3 micro-batches (one repeating batch 0's text) the
        persisted registers are register-identical to a single batch build
        over the union, and the table stays <= groups * m rows."""
        import hashlib

        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            hll_build,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            streaming_hll_fold,
        )

        def txt(tag, n=30):
            return " ".join(
                hashlib.md5(f"{tag}|{j}".encode()).hexdigest()[:4]
                for j in range(n)
            )

        stream_dir = str(tmp_path / "hlldocs")
        batches = [
            [(i, txt(f"b0_{i}"), "en" if i % 2 else "de") for i in range(5)],
            [(10 + i, txt(f"b1_{i}"), "en") for i in range(5)],
            [(20 + i, txt(f"b0_{i}"), "en" if i % 2 else "de") for i in range(5)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "doc_id LONG, text STRING, lang STRING"
            ).coalesce(1).write.parquet(f"{stream_dir}/f{i}")

        docs = (
            spark.readStream.schema("doc_id LONG, text STRING, lang STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/f*")
        )
        reg_path = str(tmp_path / "hllregs")
        q = streaming_hll_fold(
            docs, reg_path, str(tmp_path / "hllckpt"), group_col="lang"
        )
        q.awaitTermination()

        stored = spark.read.parquet(reg_path)
        allrows = [r for b in batches for r in b]
        toks = spark.createDataFrame(
            allrows, "doc_id LONG, text STRING, lang STRING"
        ).select("lang", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        whole = hll_build(toks, "w", ("lang",), 2)
        assert stored.count() <= 2 * 16**2
        assert stored.exceptAll(whole).count() == 0
        assert whole.exceptAll(stored).count() == 0


class TestStreamingQhistFold:
    def test_multi_batch_fold_equals_whole_build(self, spark, tmp_path):
        """Three micro-batches folded via qhist_merge: the persisted
        histogram is row-identical to a single batch build over the union,
        and the table stays sketch-sized."""
        from pdf_drawing_ocr_recognition_spark.operators.sketches import (
            qhist_build,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            streaming_qhist_fold,
        )

        stream_dir = str(tmp_path / "qhdocs")
        batches = [
            [(i, ("en" if i % 2 else "de"), (i * 211) % 4000) for i in range(40)],
            [(100 + i, "en", (i * 97) % 12000) for i in range(30)],
            [(200 + i, ("en" if i % 3 else "de"), (i * 211) % 4000)
             for i in range(40)],
        ]
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "doc_id LONG, lang STRING, n_chars LONG"
            ).coalesce(1).write.parquet(f"{stream_dir}/f{i}")

        docs = (
            spark.readStream.schema("doc_id LONG, lang STRING, n_chars LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/f*")
        )
        hist_path = str(tmp_path / "qhist")
        q = streaming_qhist_fold(
            docs, hist_path, str(tmp_path / "qhckpt"), group_col="lang"
        )
        q.awaitTermination()

        stored = spark.read.parquet(hist_path)
        allrows = [r for b in batches for r in b]
        whole = qhist_build(
            spark.createDataFrame(allrows, "doc_id LONG, lang STRING, n_chars LONG"),
            "n_chars",
            ("lang",),
        )
        assert stored.count() <= 2 * 64 * 8
        assert stored.exceptAll(whole).count() == 0
        assert whole.exceptAll(stored).count() == 0


class TestStreamingScd2Fold:
    def test_multibatch_history_equals_batch_fold(self, spark, tmp_path):
        """T154: after 3 snapshot micro-batches the persisted SCD2 history
        equals the direct batch fold over the same snapshots in order, and
        stream state stays empty (history is storage, not state)."""
        from pdf_drawing_ocr_recognition_spark.operators.cdc import scd2_merge
        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            streaming_scd2_fold,
        )

        def snap(day):
            rows = []
            for k in range(6):
                pol = f"pol{(k + day) % 3}" if k % 2 == 0 else f"pol{k % 3}"
                rows.append((f"h{k}", pol, day))
            return rows

        stream_dir = str(tmp_path / "snaps")
        for d in (1, 2, 3):
            spark.createDataFrame(
                snap(d), "host string, policy string, as_of long"
            ).coalesce(1).write.parquet(f"{stream_dir}/f{d}")

        snaps = (
            spark.readStream.schema("host string, policy string, as_of long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/f*")
        )
        hist_path = str(tmp_path / "hist")
        q = streaming_scd2_fold(
            snaps, hist_path, str(tmp_path / "ckpt"), "host", ["policy"]
        )
        q.awaitTermination()

        stored = sorted(map(tuple, spark.read.parquet(hist_path).collect()))
        direct = None
        for d in (1, 2, 3):
            b = spark.createDataFrame(
                snap(d), "host string, policy string, as_of long"
            )
            direct = scd2_merge(direct, b, "host", ["policy"])
        want = sorted(map(tuple, direct.collect()))
        assert stored == want
        # even hosts changed each day (3 intervals), odd hosts never (1)
        assert len(stored) == 3 * 3 + 3 * 1

    def test_crash_safe_swap_leaves_previous_history(self, spark, tmp_path):
        """The temp-write + rename discipline: a fold that dies before the
        swap leaves the previous history intact and readable."""
        import os

        from pdf_drawing_ocr_recognition_spark.operators.cdc import scd2_merge

        hist_path = str(tmp_path / "hist")
        b1 = spark.createDataFrame(
            [("h", "allow", 1)], "host string, policy string, as_of long"
        )
        scd2_merge(None, b1, "host", ["policy"]).write.parquet(hist_path)
        # simulate a crash mid-fold: tmp written, swap never happened
        b2 = spark.createDataFrame(
            [("h", "deny", 2)], "host string, policy string, as_of long"
        )
        prev = spark.read.parquet(hist_path)
        scd2_merge(prev, b2, "host", ["policy"]).write.mode(
            "overwrite"
        ).parquet(hist_path + "_tmp")
        assert os.path.exists(hist_path + "_tmp")
        rows = spark.read.parquet(hist_path).collect()  # old history readable
        assert len(rows) == 1 and rows[0]["valid_to"] is None

    def test_swap_interrupted_between_renames_recovers(self, spark, tmp_path):
        """Round-5 fix for the swap itself: a crash BETWEEN the two
        renames (live gone, backup holding the committed table) must not
        lose the table — the next read rolls the backup in, and a
        subsequent publish proceeds normally."""
        import os

        from pdf_drawing_ocr_recognition_spark.streaming.dedup import (
            _read_folded,
            _swap_in,
        )

        live = str(tmp_path / "counts")
        spark.createDataFrame(
            [("a", 1, 2)], "actor string, hour_num long, n_events long"
        ).write.parquet(live)
        # simulate: _swap_in crashed after renaming live aside
        os.rename(live, live + "_bak")
        assert not os.path.exists(live)
        got = _read_folded(spark, live)  # rolls the backup in
        assert got is not None and got.count() == 1
        assert os.path.exists(live) and not os.path.exists(live + "_bak")
        # a publish after recovery swaps cleanly and drops the backup
        tmp = live + "_tmp"
        spark.createDataFrame(
            [("a", 1, 5)], "actor string, hour_num long, n_events long"
        ).write.parquet(tmp)
        _swap_in(tmp, live)
        assert spark.read.parquet(live).collect()[0]["n_events"] == 5
        assert not os.path.exists(live + "_bak") and not os.path.exists(tmp)


class TestSnapshotStreamingSink:
    """T193: exactly-once streaming appends into the snapshot table — one
    snapshot per micro-batch, batch ids in the manifest summary, replays
    skipped, concurrent streams scoped by stream_id."""

    def test_stream_appends_equal_batch_and_commit_per_batch(
        self, spark, tmp_path
    ):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
            snapshot_log,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_sink,
        )

        src = str(tmp_path / "src")
        root = str(tmp_path / "table")
        df = spark.range(100).selectExpr(
            "id AS doc_id", "concat('d', id) AS text"
        )
        # several input files -> maxFilesPerTrigger=1 forces multi-batch
        df.repartition(4).write.parquet(src)
        q = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(snapshot_sink(root, stream_id="s1"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r["doc_id"] for r in read_snapshot(spark, root).collect())
        assert got == list(range(100))
        log = snapshot_log(root)
        assert len(log) >= 2, "expected one snapshot per micro-batch"
        ids = [
            m["summary"]["properties"]["streaming_batch_id"] for m in log
        ]
        assert ids == sorted(ids)

    def test_replayed_batch_id_is_skipped(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            current_snapshot_id,
            read_snapshot,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_append_batch,
        )

        root = str(tmp_path / "table")
        b0 = spark.range(10).selectExpr("id AS doc_id")
        sid = snapshot_append_batch(b0, 0, root, "s1")
        assert sid == 1
        # crash between table commit and checkpoint commit -> replay
        assert snapshot_append_batch(b0, 0, root, "s1") is None
        assert current_snapshot_id(root) == 1
        assert read_snapshot(spark, root).count() == 10
        # a DIFFERENT stream's batch 0 is not a replay
        b1 = spark.range(10, 20).selectExpr("id AS doc_id")
        assert snapshot_append_batch(b1, 0, root, "s2") == 2
        assert read_snapshot(spark, root).count() == 20


class TestSnapshotUpsertSink:
    """T203: exactly-once CDC upsert stream into the snapshot table — one
    MERGE per micro-batch, in-batch last-wins by order_col (deterministic
    total order), in-manifest replay guard shared with the append sink."""

    def test_stream_upserts_equal_batch_merge(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
            snapshot_log,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_sink,
        )

        src = str(tmp_path / "src")
        root = str(tmp_path / "table")
        # 4 files -> 4 micro-batches; doc_id 0..19 written TWICE with
        # increasing versions: the final table must hold the latest only
        df = spark.range(40).selectExpr(
            "id % 20 AS doc_id",
            "id AS version",
            "concat('v', id) AS text",
        )
        df.orderBy("version").coalesce(1).write.parquet(src)
        q = (
            spark.readStream.schema("doc_id LONG, version LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                snapshot_upsert_sink(root, "doc_id", order_col="version")
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            r["doc_id"]: (r["version"], r["text"])
            for r in read_snapshot(spark, root).collect()
        }
        assert len(rows) == 20
        assert rows == {i: (i + 20, f"v{i + 20}") for i in range(20)}
        ops = [m["operation"] for m in snapshot_log(root)]
        assert ops[0] == "append" and all(o == "merge" for o in ops[1:])

    def test_replay_and_duplicate_key_guards(self, spark, tmp_path):
        import pytest

        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            current_snapshot_id,
            read_snapshot,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_batch,
        )

        root = str(tmp_path / "table")
        b0 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        assert snapshot_upsert_batch(b0, 0, root, "doc_id") == 1
        # crash between table commit and checkpoint commit -> replay skipped
        assert snapshot_upsert_batch(b0, 0, root, "doc_id") is None
        assert current_snapshot_id(root) == 1
        b1 = spark.createDataFrame(
            [(2, "B"), (3, "c")], "doc_id long, text string"
        )
        assert snapshot_upsert_batch(b1, 1, root, "doc_id") == 2
        rows = {
            r["doc_id"]: r["text"]
            for r in read_snapshot(spark, root).collect()
        }
        assert rows == {1: "a", 2: "B", 3: "c"}
        # duplicate keys without order_col fail loudly, commit nothing
        dup = spark.createDataFrame(
            [(5, "x"), (5, "y")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="duplicate"):
            snapshot_upsert_batch(dup, 2, root, "doc_id")
        assert current_snapshot_id(root) == 2

    def test_order_col_ties_break_deterministically(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_snapshot,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_batch,
        )

        root = str(tmp_path / "table")
        tied = spark.createDataFrame(
            [(1, 7, "aa"), (1, 7, "zz"), (1, 3, "newer-looking-but-older")],
            "doc_id long, version long, text string",
        )
        snapshot_upsert_batch(tied, 0, root, "doc_id", order_col="version")
        row = read_snapshot(spark, root).collect()[0]
        # total order (version, text): the tie at version 7 resolves to the
        # lexicographically larger text, bit-stable across retries
        assert (row["version"], row["text"]) == (7, "zz")


class TestSnapshotUpsertEqSink:
    """T209: the merge-on-read CDC upsert stream — one equality-delete +
    append commit per micro-batch (upsert_eq), O(batch) write cost at any
    table size; same replay guard and last-wins reduction as the COW sink."""

    def test_stream_equals_cow_sink_and_never_rewrites(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            read_manifest,
            read_snapshot,
            snapshot_log,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_eq_sink,
        )

        src = str(tmp_path / "src")
        root = str(tmp_path / "table")
        df = spark.range(40).selectExpr(
            "id % 20 AS doc_id",
            "id AS version",
            "concat('v', id) AS text",
        )
        df.orderBy("version").coalesce(1).write.parquet(src)
        q = (
            spark.readStream.schema("doc_id LONG, version LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                snapshot_upsert_eq_sink(root, "doc_id", order_col="version")
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {
            r["doc_id"]: (r["version"], r["text"])
            for r in read_snapshot(spark, root).collect()
        }
        # identical final content to the COW sink's test
        assert rows == {i: (i + 20, f"v{i + 20}") for i in range(20)}
        log = snapshot_log(root)
        ops = [m["operation"] for m in log]
        assert ops[0] == "append" and all(o == "upsert" for o in ops[1:])
        # THE scale property: no batch ever rewrote an existing data file —
        # every snapshot's file list is a superset of its parent's
        for prev, cur in zip(log, log[1:]):
            assert set(prev["files"]) <= set(cur["files"])

    def test_replay_guard(self, spark, tmp_path):
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            current_snapshot_id,
            read_snapshot,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_eq_batch,
        )

        root = str(tmp_path / "table")
        b0 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        assert snapshot_upsert_eq_batch(b0, 0, root, "doc_id") == 1
        assert snapshot_upsert_eq_batch(b0, 0, root, "doc_id") is None
        assert current_snapshot_id(root) == 1
        b1 = spark.createDataFrame(
            [(2, "B"), (3, "c")], "doc_id long, text string"
        )
        assert snapshot_upsert_eq_batch(b1, 1, root, "doc_id") == 2
        rows = {
            r["doc_id"]: r["text"]
            for r in read_snapshot(spark, root).collect()
        }
        assert rows == {1: "a", 2: "B", 3: "c"}

    def test_compaction_reconciles_sink_output(self, spark, tmp_path):
        # the operating model: stream upserts accumulate entries; the
        # nightly compaction re-sequences, purges them, and preserves rows
        from pdf_drawing_ocr_recognition_spark.sources.snapshots import (
            current_snapshot_id,
            read_manifest,
            read_snapshot,
            rewrite_data_files,
        )
        from pdf_drawing_ocr_recognition_spark.streaming.snapshot_sink import (
            snapshot_upsert_eq_batch,
        )

        root = str(tmp_path / "table")
        for b in range(3):
            batch = spark.createDataFrame(
                [(k, f"b{b}k{k}") for k in range(b, b + 3)],
                "doc_id long, text string",
            )
            snapshot_upsert_eq_batch(batch, b, root, "doc_id")
        before = sorted(
            map(tuple, read_snapshot(spark, root).collect())
        )
        man = read_manifest(root, current_snapshot_id(root))
        assert len(man["eq_deletes"]) == 2  # batches 1 and 2 each left one
        sid = rewrite_data_files(spark, root, target_files=1)
        assert read_manifest(root, sid)["eq_deletes"] == []
        assert sorted(
            map(tuple, read_snapshot(spark, root).collect())
        ) == before
