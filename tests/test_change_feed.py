"""At-rest change data feed (r7, the Delta CDF shape): tables with
``change_feed=True`` record per-commit change-data files for
deletes/upserts — ``read_change_feed`` (batch) and the streaming
source's ``readChangeFeed`` mode serve row-level changes at O(changed
rows), matching the diff-based ``changes_between`` exactly."""

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt
from dataset_dedupe_estimator_spark.sources.table_stream import (
    VersionedTableStreamSource,
)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 10).alias("v"))


def _feed(spark, root, lo=-1, hi=None):
    return sorted(
        (r.id, r.v, r._change, r._commit_version)
        for r in vt.read_change_feed(spark, root, lo, hi).collect()
    )


@pytest.fixture()
def cf_table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1,
              stats_columns=["id"], change_feed=True)
    return root


def test_delete_and_upsert_change_data(spark, cf_table):
    vt.delete_where_pruned(spark, cf_table, [("id", "between", (3, 5))])
    vt.upsert_pruned(
        spark, cf_table,
        spark.createDataFrame([(7, -1), (100, -2)], "id long, v long"),
        ["id"],
    )
    want = sorted(
        [(i, i * 10, "insert", 0) for i in range(10)]
        + [(i, i * 10, "delete", 1) for i in (3, 4, 5)]
        + [(7, 70, "delete", 2), (7, -1, "insert", 2), (100, -2, "insert", 2)]
    )
    assert _feed(spark, cf_table) == want
    # version-bounded slices
    assert _feed(spark, cf_table, 0, 1) == [
        (i, i * 10, "delete", 1) for i in (3, 4, 5)
    ]


def test_cdf_matches_diff_based_changes_between(spark, cf_table):
    vt.delete_where_pruned(spark, cf_table, [("id", "<", 3)])
    vt.upsert_pruned(
        spark, cf_table,
        spark.createDataFrame([(8, -8), (200, -200)], "id long, v long"),
        ["id"],
    )
    cdf = sorted(
        (r.id, r.v, r._change)
        for r in vt.read_change_feed(spark, cf_table, 0).collect()
    )
    diff = sorted(
        (r.id, r.v, r._change)
        for r in vt.changes_between(spark, cf_table, 0).collect()
        for _ in range(r._n)
    )
    assert cdf == diff


def test_zero_survivor_delete_records_all_rows(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1,
              stats_columns=["id"], change_feed=True)
    vt.append(root, _mk(spark, 10, 20), num_files=1)
    vt.delete_where_pruned(spark, root, [("id", "<", 10)])  # dir=None
    assert vt.history(root)[-1]["dir"] is None
    got = _feed(spark, root, 1)
    assert got == [(i, i * 10, "delete", 2) for i in range(10)]


def test_feed_not_enabled_raises_on_rewrite(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1, stats_columns=["id"])
    vt.delete_where_pruned(spark, root, [("id", "<", 3)])
    with pytest.raises(ValueError, match="no change data"):
        vt.read_change_feed(spark, root, -1)
    # appends alone are still servable
    assert _feed(spark, root, -1, 0) == [
        (i, i * 10, "insert", 0) for i in range(10)
    ]


def test_enable_mid_history(spark, tmp_path):
    """Enable-only: pre-enable appends serve as inserts; a pre-enable
    delete poisons only ranges that include it."""
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 5), num_files=1, stats_columns=["id"])
    vt.append(root, _mk(spark, 5, 10), num_files=1, change_feed=True)
    vt.delete_where_pruned(spark, root, [("id", "==", 7)])
    got = _feed(spark, root)
    assert (7, 70, "delete", 2) in got and len(got) == 11


def test_compact_contributes_nothing(spark, cf_table):
    vt.append(cf_table, _mk(spark, 10, 15), num_files=1)
    before = _feed(spark, cf_table)
    st = vt.compact_small(spark, cf_table)
    assert st["committed"]
    assert _feed(spark, cf_table) == before


def test_streaming_cdf_matches_batch(spark, cf_table, tmp_path):
    spark.dataSource.register(VersionedTableStreamSource)
    vt.delete_where_pruned(spark, cf_table, [("id", "between", (3, 5))])
    vt.upsert_pruned(
        spark, cf_table,
        spark.createDataFrame([(7, -1)], "id long, v long"), ["id"],
    )
    ckpt, out = tmp_path / "ck", tmp_path / "out"
    q = (
        spark.readStream.format("versioned_table")
        .option("readChangeFeed", "true")
        .load(str(cf_table))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.id, r.v, r._change, r._commit_version)
        for r in spark.read.parquet(str(out)).collect()
    )
    assert got == _feed(spark, cf_table)
    # incremental: one more delete, same checkpoint — only the delta
    vt.delete_where_pruned(spark, cf_table, [("id", "==", 9)])
    q = (
        spark.readStream.format("versioned_table")
        .option("readChangeFeed", "true")
        .load(str(cf_table))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got2 = sorted(
        (r.id, r.v, r._change, r._commit_version)
        for r in spark.read.parquet(str(out)).collect()
    )
    assert got2 == sorted(got + [(9, 90, "delete", 3)])


def test_streaming_cdf_without_change_data_errors(spark, tmp_path):
    spark.dataSource.register(VersionedTableStreamSource)
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1, stats_columns=["id"])
    vt.delete_where_pruned(spark, root, [("id", "<", 3)])
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (
        spark.readStream.format("versioned_table")
        .option("readChangeFeed", "true")
        .load(str(root))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="no change data"):
        q.awaitTermination(180)


def test_vacuum_retires_old_and_orphan_cdf(spark, cf_table):
    vt.delete_where_pruned(spark, cf_table, [("id", "==", 1)])  # v1 + cdf
    (cf_table / "_cdf" / "c00000099").mkdir(parents=True)  # crash orphan
    vt.optimize(spark, cf_table, num_files=1)  # v2 supersedes
    removed = vt.vacuum(cf_table, keep_versions=1)
    assert "_cdf/c00000001" in removed and "_cdf/c00000099" in removed


def test_partitioned_table_change_data(spark, tmp_path):
    root = tmp_path / "tbl"
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    vt.append(root, df, partition_by=["p"], stats_columns=["id"],
              change_feed=True)
    vt.upsert_pruned(
        spark, root,
        spark.createDataFrame([(4, 1, -4)], "id long, p long, v long"),
        ["id"],
    )
    feed = vt.read_change_feed(spark, root, 0).collect()
    assert sorted((r.id, r.p, r.v, r._change) for r in feed) == [
        (4, 1, -4, "insert"), (4, 1, 8, "delete"),
    ]


def test_optimize_is_data_change_false(spark, cf_table, tmp_path):
    """optimize is row-preserving: streams and the change feed skip it
    (Delta OPTIMIZE contract) while snapshot reads see the new layout."""
    spark.dataSource.register(VersionedTableStreamSource)
    ckpt, out = tmp_path / "ck", tmp_path / "out"

    def drain():
        q = (
            spark.readStream.format("versioned_table").load(str(cf_table))
            .writeStream.format("parquet").option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    drain()
    assert spark.read.parquet(str(out)).count() == 10
    before = _feed(spark, cf_table)
    vt.optimize(spark, cf_table, num_files=1)
    vt.append(cf_table, _mk(spark, 10, 12), num_files=1)
    drain()  # no error at the optimize, only the append emitted
    assert spark.read.parquet(str(out)).count() == 12
    assert len(_feed(spark, cf_table)) == len(before) + 2
    assert vt.history(cf_table)[-2]["data_change"] is False


def test_cli_ingest_merge_mode(capsys, spark, tmp_path):
    """'de table ingest --keys' applies each microbatch as a zone-map-
    bounded MERGE (CDC apply): later batches replace rows by key."""
    import os

    from dataset_dedupe_estimator_spark.cli import main

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    _mk(spark, 0, 10).coalesce(1).write.parquet(str(inbox / "b0.parquet"))
    assert main([
        "table", "ingest", root, str(inbox), "--checkpoint", ckpt,
        "--keys", "id", "--stats-columns", "id",
    ]) == 0
    capsys.readouterr()
    # second drop: keys 7..9 replaced with negatives, 10..11 insert
    spark.createDataFrame(
        [(i, -i) for i in range(7, 12)], "id long, v long"
    ).coalesce(1).write.parquet(str(inbox / "b1.parquet"))
    assert main([
        "table", "ingest", root, str(inbox), "--checkpoint", ckpt,
        "--keys", "id",
    ]) == 0
    capsys.readouterr()
    got = {
        (r.id, r.v) for r in vt.read_version(spark, root).collect()
    }
    want = {(i, i * 10) for i in range(7)} | {(i, -i) for i in range(7, 12)}
    assert got == want
    assert vt.history(root)[-1]["action"] == "upsert"
    # checkpoint-wipe replay is a no-op (batch tags dedupe)
    import shutil as _sh

    _sh.rmtree(ckpt)
    assert main([
        "table", "ingest", root, str(inbox), "--checkpoint", ckpt,
        "--keys", "id",
    ]) == 0
    assert {
        (r.id, r.v) for r in vt.read_version(spark, root).collect()
    } == want
