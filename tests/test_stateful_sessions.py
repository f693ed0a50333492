"""applyInPandasWithState sessionizer: state persists across micro-batches
(separate checkpointed runs); sessions close only when a gap-exceeding
event arrives."""

from pyspark.sql import functions as F


def _write_batch(spark, src, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double, event_id long"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value", "event_id"
    )
    df.write.mode("append").parquet(str(src))
    return df.schema


def _run_pass(spark, src, schema, ckpt, out_dir):
    from dataset_dedupe_estimator_spark.streaming.sessions import stateful_sessionize

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stateful_sessionize(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(str(out_dir)).collect()
    except Exception:
        return []


def test_stateful_sessionize_across_batches(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"

    # batch 1: two close events for user 7 -> session stays OPEN (no output)
    schema = _write_batch(
        spark,
        src,
        [(7, "2026-01-01 10:00:00", 1.0, 1), (7, "2026-01-01 10:10:00", 2.0, 2)],
    )
    out1 = _run_pass(spark, src, schema, ckpt, tmp_path / "out")
    assert out1 == []

    # batch 2: a gap-exceeding event closes the session carried in state
    _write_batch(spark, src, [(7, "2026-01-01 12:00:00", 5.0, 3)])
    out2 = _run_pass(spark, src, schema, ckpt, tmp_path / "out")
    assert len(out2) == 1
    r = out2[0]
    assert r.user_id == 7
    assert r.n_events == 2
    assert r.value_cents == 300
    # session spanned 10:00 -> 10:10 UTC
    assert r.session_end_us - r.session_start_us == 10 * 60 * 1_000_000


def test_sessionize_across_arrow_chunks(spark, tmp_path):
    """A group split into multiple Arrow chunks (maxRecordsPerBatch=2) in
    non-timestamp order must still sessionize on the globally sorted
    stream — per-chunk sorting would fabricate session gaps."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        src, ckpt = tmp_path / "src", tmp_path / "ckpt"
        # written ts-descending: chunk 1 holds the LATEST events
        rows = [
            (3, "2026-01-01 13:00:00", 6.0, 6),  # second session (gap > 30m)
            (3, "2026-01-01 10:40:00", 5.0, 5),
            (3, "2026-01-01 10:30:00", 4.0, 4),
            (3, "2026-01-01 10:20:00", 3.0, 3),
            (3, "2026-01-01 10:10:00", 2.0, 2),
            (3, "2026-01-01 10:00:00", 1.0, 1),
        ]
        schema = _write_batch(spark, src, rows)
        out = _run_pass(spark, src, schema, ckpt, tmp_path / "out")
        # the first session (5 events, 10:00-10:40) closes when 13:00 arrives
        assert len(out) == 1
        r = out[0]
        assert r.n_events == 5
        assert r.value_cents == 1500
        assert r.session_end_us - r.session_start_us == 40 * 60 * 1_000_000
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_idle_timeout_flushes_open_session(spark, tmp_path):
    """ProcessingTimeTimeout branch: a quiescent user's open session is
    flushed without a later event. Needs a continuous trigger — Spark never
    terminates an availableNow query while processing-time timeouts are
    registered (documented in stateful_sessionize) — so the query is
    stopped once the flush lands."""
    import time

    from dataset_dedupe_estimator_spark.streaming.sessions import stateful_sessionize

    src = tmp_path / "src"
    schema = _write_batch(spark, src, [(9, "2026-01-01 10:00:00", 1.5, 1)])
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stateful_sessionize(stream, gap_minutes=30, idle_timeout_minutes=0.02)
        .writeStream.format("memory")
        .queryName("idle_flush_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline and not rows:
            rows = spark.sql("SELECT * FROM idle_flush_out").collect()
            time.sleep(1)
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0].user_id == 9 and rows[0].n_events == 1
    assert rows[0].value_cents == 150
