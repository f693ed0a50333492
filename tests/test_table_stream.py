"""Versioned table as a Structured Streaming SOURCE (r7, Spark 4
Python DataSource API): offsets are commit versions; each micro-batch
is the commits in (start, end], one input partition per data file;
exactly-once across restarts from the checkpointed offset alone;
rewriting commits stop the stream unless ignoreChanges (the Delta
streaming-source contract)."""

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt
from dataset_dedupe_estimator_spark.sources.table_stream import (
    VersionedTableStreamSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(VersionedTableStreamSource)
    return spark


def _drain(spark, root, ckpt, out, **opts):
    r = spark.readStream.format("versioned_table")
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load(str(root))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "availableNow drain did not finish"


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 10).alias("v"))


def test_appends_stream_exactly_once_across_restarts(
    registered, tmp_path
):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    vt.append(root, _mk(spark, 0, 10), num_files=2)
    _drain(spark, root, ckpt, out)
    assert sorted(r.id for r in spark.read.parquet(str(out)).collect()) == list(
        range(10)
    )
    # two more commits land; a NEW query resumes from the checkpoint
    # and emits exactly the unseen commits — no dupes, no gaps
    vt.append(root, _mk(spark, 10, 15), num_files=1)
    vt.append(root, _mk(spark, 15, 18), num_files=1)
    _drain(spark, root, ckpt, out)
    got = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert got == list(range(18))
    # nothing new: a third drain emits nothing
    _drain(spark, root, ckpt, out)
    assert spark.read.parquet(str(out)).count() == 18


def test_schema_is_self_describing(registered, tmp_path):
    spark = registered
    root = tmp_path / "t"
    vt.append(root, _mk(spark, 0, 5), num_files=1)
    sdf = spark.readStream.format("versioned_table").load(str(root))
    assert sdf.schema.simpleString() == "struct<id:bigint,v:bigint>"


def test_starting_version_skips_earlier_commits(registered, tmp_path):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    vt.append(root, _mk(spark, 0, 10), num_files=1)   # v0
    vt.append(root, _mk(spark, 10, 15), num_files=1)  # v1
    _drain(spark, root, ckpt, out, startingVersion="1")
    got = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert got == list(range(10, 15))


def test_rewrite_commit_stops_stream_by_default(registered, tmp_path):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    vt.append(root, _mk(spark, 0, 10), num_files=1)
    _drain(spark, root, ckpt, out)
    vt.upsert_pruned(
        spark, root,
        spark.createDataFrame([(3, -1)], "id long, v long"), ["id"],
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="upsert"):
        _drain(spark, root, ckpt, out)
    # ignoreChanges resumes, re-delivering the rewritten directory
    _drain(spark, root, ckpt, out, ignoreChanges="true")
    rows = {(r.id, r.v) for r in spark.read.parquet(str(out)).collect()}
    assert (3, -1) in rows and (3, 30) in rows  # old batch + re-delivery
    # every live row is present at its latest value among duplicates
    assert {i for i, _ in rows} == set(range(10))


def test_dirless_delete_emits_nothing(registered, tmp_path):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    vt.append(root, _mk(spark, 0, 10), num_files=1, stats_columns=["id"])
    vt.append(root, _mk(spark, 10, 20), num_files=1)
    # wipes EVERY row of the touched file: commits dir=None
    vt.delete_where_pruned(spark, root, [("id", "<", 10)])
    _drain(spark, root, ckpt, out, ignoreChanges="true")
    got = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert got == list(range(20))  # both appends, nothing for the delete


def test_partitioned_table_reconstructs_partition_columns(
    registered, tmp_path
):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    vt.append(root, df, partition_by=["p"])
    sdf = spark.readStream.format("versioned_table").load(str(root))
    assert dict(sdf.dtypes)["p"] == "bigint"
    _drain(spark, root, ckpt, out)
    got = spark.read.parquet(str(out))
    assert got.count() == 12
    assert sorted(
        tuple(r) for r in got.filter("id in (4, 5)").select("id", "p").collect()
    ) == [(4, 1), (5, 2)]


def test_widened_schema_backfills_null_for_old_commits(
    registered, tmp_path
):
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    vt.append(root, spark.range(0, 5).select("id"), num_files=1)
    vt.append(
        root,
        spark.range(5, 8).select("id", F.lit("x").alias("tag")),
        num_files=1, allow_new_columns=True,
    )
    sdf = spark.readStream.format("versioned_table").load(str(root))
    assert sdf.schema.simpleString() == "struct<id:bigint,tag:string>"
    _drain(spark, root, ckpt, out)
    got = spark.read.parquet(str(out))
    assert got.filter("tag IS NULL").count() == 5
    assert got.filter("tag = 'x'").count() == 3


def test_stream_matches_batch_read(registered, tmp_path):
    """The drained stream over an append-only table is row-identical
    to the batch snapshot read."""
    spark = registered
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    for lo in range(0, 40, 10):
        vt.append(root, _mk(spark, lo, lo + 10), num_files=2)
    _drain(spark, root, ckpt, out)
    want = sorted(tuple(r) for r in vt.read_version(spark, root).collect())
    got = sorted(tuple(r) for r in spark.read.parquet(str(out)).collect())
    assert got == want


def test_missing_root_and_empty_table_rejected(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="no committed versions"):
        spark.readStream.format("versioned_table").load(
            str(tmp_path / "nope")
        ).schema


def test_cli_table_tail(capsys, registered, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    spark = registered
    src = str(tmp_path / "src.parquet")
    _mk(spark, 0, 10).repartition(2).write.parquet(src)
    root = str(tmp_path / "vt")
    assert main(["table", "append", root, src]) == 0
    capsys.readouterr()
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    assert main(["table", "tail", root, "--out", out, "--checkpoint", ckpt]) == 0
    assert "sink now holds 10 rows" in capsys.readouterr().out
    # second commit, same checkpoint: exactly the delta
    src2 = str(tmp_path / "src2.parquet")
    _mk(spark, 10, 13).write.parquet(src2)
    assert main(["table", "append", root, src2]) == 0
    capsys.readouterr()
    assert main(["table", "tail", root, "--out", out, "--checkpoint", ckpt]) == 0
    assert "sink now holds 13 rows" in capsys.readouterr().out
    assert main(["table", "tail", root]) == 2  # missing --out/--checkpoint


# -- r9: maxFilesPerTrigger rate limiting -------------------------------------


def test_max_files_per_trigger_offset_stepping(registered, spark, tmp_path):
    """Unit-drive the reader's offset protocol: bounded monotone steps,
    whole commits only, >=1 commit per step, property commits free."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamReader,
    )

    root = tmp_path / "tbl"
    for i in range(5):
        vt.append(root, _mk(spark, i * 10, i * 10 + 10), num_files=2)
    vt.rename_column(root, "v", "val")            # v5: 0 files
    vt.append(
        root,
        _mk(spark, 100, 140).withColumnRenamed("v", "val").repartition(4),
    )                                             # v6: 4 files

    rd = VersionedTableStreamReader(None, {"path": str(root),
                                           "maxfilespertrigger": "4"})
    assert rd.initialOffset() == {"version": -1}
    # 2 files per commit, cap 4 -> two commits per step
    assert rd.latestOffset() == {"version": 1}
    assert rd.latestOffset() == {"version": 3}
    # v4 (2 files) + v5 (property, 0 files); v6 alone would overflow
    assert rd.latestOffset() == {"version": 5}
    # v6 admitted alone even though it exactly hits the cap
    assert rd.latestOffset() == {"version": 6}
    # caught up: offset is stable
    assert rd.latestOffset() == {"version": 6}

    # restart mid-catchup, engine replays (1, 3] first: hwm resyncs and
    # the next step continues from the replayed end, never regressing
    rd2 = VersionedTableStreamReader(None, {"path": str(root),
                                            "maxfilespertrigger": "4"})
    rd2.partitions({"version": 1}, {"version": 3})
    assert rd2.latestOffset() == {"version": 5}

    # a fresh reader's FIRST planning call is already bounded (the
    # engine calls latestOffset before initialOffset on fresh streams;
    # restarts resync via the replayed partitions() call first)
    rd3 = VersionedTableStreamReader(None, {"path": str(root),
                                            "maxfilespertrigger": "4"})
    assert rd3.latestOffset() == {"version": 1}

    # a single commit larger than the cap still drains (>=1 commit)
    rd4 = VersionedTableStreamReader(None, {"path": str(root),
                                            "maxfilespertrigger": "1"})
    rd4.initialOffset()
    got = []
    for _ in range(7):
        got.append(rd4.latestOffset()["version"])
    assert got == [0, 1, 2, 3, 4, 5, 6]  # one 2-file commit per step


def test_max_files_per_trigger_end_to_end(registered, spark, tmp_path):
    """Rows delivered under rate limiting == rows in the table, across
    several bounded micro-batches."""
    root = tmp_path / "tbl"
    for i in range(4):
        vt.append(root, _mk(spark, i * 10, i * 10 + 10), num_files=2)
    batches = []

    def sink(df, epoch_id):
        batches.append(df.count())

    q = (
        spark.readStream.format("versioned_table")
        .option("maxFilesPerTrigger", "2")
        .load(str(root))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _t
    deadline = _t.time() + 120
    while sum(batches) < 40 and _t.time() < deadline:
        _t.sleep(0.5)
    q.stop()
    assert sum(batches) == 40
    # the cap held: one 2-file commit (10 rows) per micro-batch
    assert all(b <= 10 for b in batches if b)
    assert len([b for b in batches if b]) == 4


def test_max_files_per_trigger_restart_no_dupes(registered, spark, tmp_path):
    """Restarting a rate-limited stream from its checkpoint delivers
    exactly the unseen commits — the resynced high-water mark can
    neither regress nor skip."""
    import time as _t

    root, ck = tmp_path / "tbl", tmp_path / "ck"
    for i in range(3):
        vt.append(root, _mk(spark, i * 10, i * 10 + 10), num_files=2)
    seen = []

    def sink(df, eid):
        seen.extend(r.id for r in df.collect())

    def run(expect_total):
        q = (
            spark.readStream.format("versioned_table")
            .option("maxFilesPerTrigger", "2")
            .load(str(root))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ck))
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = _t.time() + 120
        while len(seen) < expect_total and _t.time() < deadline:
            _t.sleep(0.5)
        q.stop()

    run(30)
    assert sorted(seen) == list(range(30))
    for i in range(3, 5):
        vt.append(root, _mk(spark, i * 10, i * 10 + 10), num_files=2)
    run(50)
    assert sorted(seen) == list(range(50))  # no dupes, no gaps


def test_starting_timestamp_option(registered, tmp_path):
    """startingTimestamp (the Delta option): commits at or after the
    timestamp stream; earlier history is skipped; a future timestamp
    tails only new commits."""
    spark = registered
    root = tmp_path / "t"
    vt.append(root, _mk(spark, 0, 10), num_files=1)   # v0
    vt.append(root, _mk(spark, 10, 15), num_files=1)  # v1
    hist = vt.history(root)
    _drain(spark, root, tmp_path / "ck1", tmp_path / "o1",
           startingTimestamp=str(hist[1]["ts"]))
    got = sorted(r.id for r in spark.read.parquet(
        str(tmp_path / "o1")).collect())
    assert got == list(range(10, 15))
    # future timestamp: nothing yet; a new commit streams
    _drain(spark, root, tmp_path / "ck2", tmp_path / "o2",
           startingTimestamp=str(hist[-1]["ts"] + 3600))
    import os
    files = [f for f in os.listdir(tmp_path / "o2")
             if f.endswith(".parquet")]
    total = (spark.read.parquet(str(tmp_path / "o2")).count()
             if files else 0)
    assert total == 0
    vt.append(root, _mk(spark, 15, 18), num_files=1)
    _drain(spark, root, tmp_path / "ck2", tmp_path / "o2",
           startingTimestamp=str(hist[-1]["ts"] + 3600))
    got = sorted(r.id for r in spark.read.parquet(
        str(tmp_path / "o2")).collect())
    assert got == list(range(15, 18))
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamReader,
    )

    with pytest.raises(ValueError, match="not both"):
        VersionedTableStreamReader(
            None,
            {"path": str(root), "startingversion": "1",
             "startingtimestamp": "2026-01-01"},
        )


def test_drain_available_now_bounded_multibatch(registered, tmp_path):
    spark = registered
    """r13 (verdict #5): the AvailableNow fallback pinned as an API
    seam + the repo-side bounded backfill. A maxFilesPerTrigger-capped
    source under a SINGLE availableNow run stops after one slice;
    drain_available_now loops passes over one checkpoint until the
    offset parks — every commit delivered exactly once, in bounded
    microbatches (the 100 TB backfill shape the missing
    SupportsTriggerAvailableNow hook would otherwise provide)."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        drain_available_now,
    )

    root = tmp_path / "t"
    for i in range(4):
        vt.append(
            root, spark.range(i * 10, i * 10 + 10).toDF("id"), num_files=2
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def start():
        return (
            spark.readStream.format("versioned_table")
            .option("maxFilesPerTrigger", "2")
            .load(str(root))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    # a single capped run really does stop after one bounded slice
    q = start()
    q.awaitTermination()
    first = spark.read.parquet(out).count()
    assert first == 10  # one 2-file commit, not the whole table
    rep = drain_available_now(start)
    assert rep["rows"] == 30  # the three remaining commits
    assert rep["passes"] >= 3  # bounded slices, not one giant batch
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(40))


def test_max_bytes_per_trigger_offset_stepping(registered, spark, tmp_path):
    """r13: the byte-budget twin of maxFilesPerTrigger — whole commits
    admitted until the byte budget would overflow, always >=1 commit,
    both caps compose (either one stops the slice)."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamReader,
    )

    root = tmp_path / "tbl"
    for i in range(4):
        vt.append(root, _mk(spark, i * 10, i * 10 + 10), num_files=1)
    sizes = [
        sum(
            f.stat().st_size
            for f in (root / "data" / f"c{v:08d}").rglob("*.parquet")
        )
        for v in range(4)
    ]
    # budget = exactly two commits' bytes -> two commits per step
    rd = VersionedTableStreamReader(
        None,
        {"path": str(root), "maxbytespertrigger": str(sizes[0] + sizes[1])},
    )
    rd.initialOffset()
    assert rd.latestOffset() == {"version": 1}
    # remaining commits drain in bounded monotone steps to the head
    # (commit byte sizes vary slightly, so 1 or 2 commits per step)
    steps = [rd.latestOffset()["version"] for _ in range(3)]
    assert steps == sorted(steps) and steps[-1] == 3
    # budget smaller than any commit: one commit per step (>=1 rule)
    rd2 = VersionedTableStreamReader(
        None, {"path": str(root), "maxbytespertrigger": "1"}
    )
    rd2.initialOffset()
    got = [rd2.latestOffset()["version"] for _ in range(4)]
    assert got == [0, 1, 2, 3]
    # composition: file cap 10 (loose) + tiny byte cap -> byte cap wins
    rd3 = VersionedTableStreamReader(
        None,
        {
            "path": str(root),
            "maxfilespertrigger": "10",
            "maxbytespertrigger": "1",
        },
    )
    rd3.initialOffset()
    assert rd3.latestOffset() == {"version": 0}
    # composition the other way: byte cap loose, file cap 1 wins
    rd4 = VersionedTableStreamReader(
        None,
        {
            "path": str(root),
            "maxfilespertrigger": "1",
            "maxbytespertrigger": str(10 * sum(sizes)),
        },
    )
    rd4.initialOffset()
    assert rd4.latestOffset() == {"version": 0}
