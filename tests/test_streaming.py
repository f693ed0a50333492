"""Streaming extensions: incremental chunker picks up only new files;
accumulated stats match batch; watermarked window agg matches batch."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
from dataset_dedupe_estimator_spark.streaming.incremental import (
    incremental_stats,
    run_incremental_chunker,
    windowed_event_counts,
)

RNG = np.random.default_rng(23)


def _blob(n):
    return RNG.integers(0, 256, n, dtype=np.uint8).tobytes()


def test_streamed_estimate_equals_batch(spark, tmp_path):
    """The streamed chunk table must aggregate to exactly the batch
    chunker's totals (same files, same params)."""
    import glob

    from dataset_dedupe_estimator_spark.operators.chunker import chunk_files
    from dataset_dedupe_estimator_spark.plans.estimate import chunk_stats
    from dataset_dedupe_estimator_spark.queries.streaming_gate import (
        cdc_streaming_estimate,
    )

    sf = "/root/testdata/sf0.001"
    streamed = cdc_streaming_estimate(spark, sf).collect()[0]
    batch = chunk_stats(
        chunk_files(spark, sorted(glob.glob(f"{sf}/*.parquet")))
    ).collect()[0]
    assert streamed.total_len == batch.total_len
    assert streamed.unique_chunks == batch.unique_chunks
    assert streamed.chunk_bytes == batch.chunk_bytes


def test_incremental_chunker(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "a.bin").write_bytes(_blob(400_000))
    (in_dir / "b.bin").write_bytes(_blob(300_000))

    chunk_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    run_incremental_chunker(spark, str(in_dir), chunk_dir, ckpt, "*.bin")
    first = spark.read.parquet(chunk_dir)
    batch = chunk_files(spark, [str(in_dir / "a.bin"), str(in_dir / "b.bin")])
    assert first.count() == batch.count()
    # identical chunk content as the batch pipeline, keyed by (path, seq)
    s = {(r.path.split("/")[-1], r.seq, r.hash, r.size) for r in first.collect()}
    b = {(r.path.split("/")[-1], r.seq, r.hash, r.size) for r in batch.collect()}
    assert s == b

    # second pass with a NEW file: only the new file's chunks are appended
    (in_dir / "c.bin").write_bytes(_blob(200_000))
    run_incremental_chunker(spark, str(in_dir), chunk_dir, ckpt, "*.bin")
    second = spark.read.parquet(chunk_dir)
    assert second.count() > first.count()
    new_paths = {r.path.split("/")[-1] for r in second.collect()}
    assert new_paths == {"a.bin", "b.bin", "c.bin"}
    # no reprocessing: a.bin chunk rows appear exactly once
    per_file = dict(
        second.groupBy("path").count().select(
            F.element_at(F.split("path", "/"), -1).alias("f"), "count"
        ).collect()
    )
    batch_a = chunk_files(spark, [str(in_dir / "a.bin")]).count()
    assert per_file["a.bin"] == batch_a

    stats = incremental_stats(spark, chunk_dir).collect()[0]
    assert stats.total_len == 900_000


def test_streaming_dedup(spark, tmp_path):
    from dataset_dedupe_estimator_spark.streaming.incremental import streaming_dedup

    src = tmp_path / "dups"
    rows = [
        (1, "2026-01-01 10:00:00", "doc-a"),
        (1, "2026-01-01 10:00:00", "doc-a"),  # exact duplicate
        (2, "2026-01-01 10:05:00", "doc-b"),
        (1, "2026-01-01 10:20:00", "doc-a"),  # re-delivery, different ts →
        #   dropped too: dedup is key-only within the watermark horizon
    ]
    df = spark.createDataFrame(rows, "doc_key long, ts_s string, payload string").select(
        "doc_key", F.col("ts_s").cast("timestamp").alias("ts"), "payload"
    )
    df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        streaming_dedup(stream, ["doc_key"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT doc_key, ts FROM dedup_out ORDER BY ts").collect()
    assert sorted(r.doc_key for r in out) == [1, 2]  # one row per key


def test_windowed_event_counts(spark, tmp_path):
    src = tmp_path / "events"
    rows = [
        ("2026-01-01 10:05:00", "click", 1.0),
        ("2026-01-01 10:55:00", "click", 2.0),
        ("2026-01-01 11:05:00", "view", 3.0),
        ("2026-01-01 11:45:00", "click", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[("2026-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2026-01-01 11:00:00", "view")] == (1, 3.0)
    assert got[("2026-01-01 11:00:00", "click")] == (1, 4.0)


def test_stream_stream_join_equals_batch(spark):
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.queries.streaming_gate import (
        ATTRIB_WINDOW_MIN,
        _instant_ts,
        streaming_view_click_join,
    )

    sf = "/root/testdata/sf0.001"
    got = streaming_view_click_join(spark, sf).collect()
    ev = _instant_ts(spark.read.parquet(f"{sf}/events.parquet"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    want = (
        v.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")),
        )
        .select("view_id", "click_id")
        .collect()
    )
    assert {(r.view_id, r.click_id) for r in got} == {(r.view_id, r.click_id) for r in want}
    assert all(0 <= r.delay_s <= ATTRIB_WINDOW_MIN * 60 for r in got)


def test_watermark_drops_what_late_audit_flags(spark, tmp_path):
    """Coherence between the batch disorder audit (events_late_arrivals:
    high-water-mark lag > 300s) and real streaming behavior: the event
    the audit flags as late is exactly what a 300s withWatermark drops
    when it arrives after the watermark has advanced. (availableNow
    plans every batch up front with a frozen watermark, so the test
    drives progression with processAllAvailable between file writes.)"""
    src = tmp_path / "ev"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long, event_type string").select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # arrival 1 advances the watermark to 11:54; arrival 2's event_id=3
    # is 114 minutes behind the stream head -> late by both definitions
    write("b1", [(1, "2026-01-01 10:00:00", 7, "view"), (2, "2026-01-01 11:59:00", 7, "view")])
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "300 seconds")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_coherence")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    write("b2", [(3, "2026-01-01 10:05:00", 7, "view"), (4, "2026-01-01 12:00:00", 7, "view")])
    q.processAllAvailable()
    q.stop()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    emitted = {
        str(r[0]): r[1]
        for r in spark.sql(
            "SELECT window.start, count FROM late_coherence"
        ).collect()
    }

    # the batch audit over the same rows (arrival order = event_id)
    from pyspark.sql.window import Window

    all_rows = spark.read.option("recursiveFileLookup", "true").parquet(str(src))
    by_arrival = Window.partitionBy("user_id").orderBy("event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    hwm = F.max(ts_us).over(by_arrival.rowsBetween(Window.unboundedPreceding, -1))
    flagged = {
        r.event_id
        for r in all_rows.withColumn("late", (hwm - ts_us) > 300 * 1_000_000)
        .filter("late")
        .collect()
    }
    assert flagged == {3}
    assert dropped == 1  # the same single event the audit flags
    assert emitted.get("2026-01-01 10:00:00") == 1  # late row excluded
