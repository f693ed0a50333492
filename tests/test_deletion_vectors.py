"""Deletion vectors (sources/versioned.py::delete_where_dv — the Delta
DV / Iceberg position-delete merge-on-read shape): a delete commits an
O(deleted rows) sidecar of (encoded file suffix, row position) pairs;
every reader — snapshots, pruned reads, merges, compaction folds —
anti-joins it, and the next rewrite of a file physically drops its
rows. Zero data files rewritten at delete time."""

import hashlib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _rows(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


def _md5s(root):
    return {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(root, "data").rglob("*.parquet"))
    }


def _snap(spark, root, version=None):
    return sorted(
        (r.k, r.v) for r in vt.read_version(spark, root, version).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(20)]), num_files=4,
              stats_columns=["k"], change_feed=True)
    vt.append(root, _rows(spark, [(i, 1) for i in range(20, 40)]), num_files=4)
    return root


def test_dv_delete_hides_rows_and_rewrites_nothing(spark, table):
    before = _md5s(table)
    st = vt.delete_where_dv(spark, table, [("k", "between", (5, 8))])
    assert st["committed"] and st["deleted_rows"] == 4
    assert st["rewritten_files"] == 0
    assert _md5s(table) == before  # not one data byte moved
    got = _snap(spark, table)
    assert [k for k, _ in got] == [i for i in range(40) if not 5 <= i <= 8]
    # time travel still sees them
    assert (5, 0) in _snap(spark, table, 1)
    # pruned read path applies the DV too
    rw = vt.read_where(spark, table, [("k", "between", (0, 10))])
    assert sorted(r.k for r in rw.collect()) == [0, 1, 2, 3, 4, 9, 10]


def test_dv_deletes_accumulate_and_never_rematch(spark, table):
    vt.delete_where_dv(spark, table, [("k", "<", 3)])
    st2 = vt.delete_where_dv(spark, table, [("k", "<", 5)])
    assert st2["deleted_rows"] == 2  # 0..2 already gone: only 3, 4
    assert [k for k, _ in _snap(spark, table)] == list(range(5, 40))
    # a predicate matching only already-deleted rows commits nothing
    st3 = vt.delete_where_dv(spark, table, [("k", "==", 1)])
    assert st3["committed"] is False
    assert len(vt.history(table)) == 4


@pytest.mark.slow
def test_dv_rows_never_resurrect_through_maintenance(spark, table):
    vt.delete_where_dv(spark, table, [("k", "in", [2, 7, 30])])
    # merge rewrites files: DV'd rows must not come back
    vt.upsert_pruned(spark, table, _rows(spark, [(7, 99)]), ["k"])
    got = dict(_snap(spark, table))
    assert got[7] == 99 and 2 not in got and 30 not in got
    # compaction folds: DV'd rows physically gone afterwards
    st = vt.compact_small(spark, table)
    assert st["committed"]
    got2 = _snap(spark, table)
    assert dict(got2).get(2) is None and 30 not in dict(got2)
    assert got2 == sorted(set(_snap(spark, table)))  # no duplicates
    # physically: no surviving live file holds k=2 anymore
    live = vt.live_dirs(table)
    masks = vt._live_masks(
        vt._resolve(Path(table), vt._committed_entries(Path(table)), None)[2]
    )
    files = vt._surviving_files(live, masks)
    raw = spark.read.parquet(*files).filter(F.col("k").isin(2, 30))
    assert raw.count() == 0


def test_dv_change_feed_and_diff_agree(spark, table):
    vt.delete_where_dv(spark, table, [("k", "==", 11)])
    v = vt.history(table)[-1]["version"]
    feed = sorted(
        (r.k, r.v, r._change)
        for r in vt.read_change_feed(spark, table, v - 1, v).collect()
    )
    assert feed == [(11, 0, "delete")]
    diff = sorted(
        (r.k, r.v, r._change)
        for r in vt.changes_between(spark, table, v - 1, v).collect()
    )
    assert diff == [(11, 0, "delete")]


def test_dv_with_restore_and_overwrite_resets(spark, table):
    vt.delete_where_dv(spark, table, [("k", "==", 3)])       # v2
    vt.delete_where_dv(spark, table, [("k", "==", 4)])       # v3
    vt.restore(spark, table, 2)                              # v4: only k=3 DV
    got = [k for k, _ in _snap(spark, table)]
    assert 3 not in got and 4 in got
    # an overwrite retires every DV
    vt.overwrite(table, _rows(spark, [(3, 9)]), num_files=1)  # v5
    assert _snap(spark, table) == [(3, 9)]
    # and old versions still read with their own DV sets
    assert 3 not in [k for k, _ in _snap(spark, table, 3)]
    assert 4 not in [k for k, _ in _snap(spark, table, 3)]


def test_dv_through_checkpoint_fold(spark, table, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    vt.delete_where_dv(spark, table, [("k", "between", (0, 2))])
    vt.append(table, _rows(spark, [(50, 5)]), num_files=1)
    assert list((table / "_vlog").glob("ckpt-v*.parquet"))
    with_ck = _snap(spark, table)
    assert all(k >= 3 for k, _ in with_ck) and (50, 5) in with_ck
    for ck in (table / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    assert _snap(spark, table) == with_ck


def test_dv_vacuum_keeps_referenced_sidecars(spark, table):
    vt.delete_where_dv(spark, table, [("k", "==", 6)])
    dv_dirs = sorted((table / "_dv").iterdir())
    assert len(dv_dirs) == 1
    removed = vt.vacuum(table)
    assert (table / "_dv" / dv_dirs[0].name).is_dir()  # still referenced
    vt.optimize(spark, table, num_files=1)  # overwrite: DV retired
    removed = vt.vacuum(table)
    assert any(r.startswith("_dv/") for r in removed)
    assert not any((table / "_dv").iterdir())
    assert 6 not in [k for k, _ in _snap(spark, table)]


def test_dv_positions_stable_across_split_reads(spark, tmp_path):
    """row_index must identify the same physical row no matter how the
    file is split across tasks: delete with big read-partitions, verify
    with tiny ones."""
    root = tmp_path / "tbl"
    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    vt.append(root, df, num_files=1, stats_columns=["k"])
    vt.delete_where_dv(spark, root, [("k", "between", (1000, 1004))])
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        got = vt.read_version(spark, root).filter(
            F.col("k").between(990, 1010)
        )
        ks = sorted(r.k for r in got.collect())
        assert ks == list(range(990, 1000)) + list(range(1005, 1011))
        assert vt.read_version(spark, root).count() == 200_000 - 5
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_dv_on_partitioned_table_with_escapable_values(spark, tmp_path):
    root = tmp_path / "pt"
    df = spark.createDataFrame(
        [(1, "North America"), (2, "a+b"), (3, "50% off"), (4, "a+b")],
        "k long, region string",
    )
    vt.append(root, df, num_files=1, partition_by=["region"])
    vt.delete_where_dv(spark, root, [("k", "==", 2)])
    got = sorted(
        (r.k, r.region) for r in vt.read_version(spark, root).collect()
    )
    assert got == [(1, "North America"), (3, "50% off"), (4, "a+b")]


def test_cli_delete_where_dv(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    root = str(tmp_path / "vt")
    src = str(tmp_path / "src.parquet")
    _rows(spark, [(i, 0) for i in range(10)]).coalesce(1).write.parquet(src)
    assert main(["table", "append", root, src, "--stats-columns", "k"]) == 0
    assert main([
        "table", "delete-where", root, "--where", "k:between:2,4", "--dv",
    ]) == 0
    out = capsys.readouterr().out
    assert "deletion vector" in out and "0 files rewritten" in out
    assert sorted(
        r.k for r in vt.read_version(spark, root).collect()
    ) == [0, 1, 5, 6, 7, 8, 9]


def test_reserved_column_names_refused(spark, tmp_path):
    df = spark.range(3).selectExpr("id as k", "id as _dv_rid")
    with pytest.raises(ValueError, match="reserved"):
        vt.append(tmp_path / "t", df)
    df2 = spark.range(3).selectExpr("id as k", "id as _change")
    with pytest.raises(ValueError, match="reserved"):
        vt.overwrite(tmp_path / "t2", df2)


def test_dv_predicate_on_widened_column(spark, tmp_path):
    """A DV delete whose predicate names a column older files LACK must
    treat those rows as NULL (no match) instead of failing, and the
    declarations must keep riding the entry chain."""
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(5)]), num_files=1,
              stats_columns=["k"], bloom_columns=["k"], bloom_bits=4096)
    wide = spark.createDataFrame(
        [(10, 1, 7), (11, 1, 8)], "k: long, v: long, w: long"
    )
    vt.append(root, wide, num_files=1, allow_new_columns=True)
    st = vt.delete_where_dv(spark, root, [("w", "==", 7)])
    assert st["committed"] and st["deleted_rows"] == 1
    got = sorted(k for k, _ in _snap(spark, root))
    assert got == [0, 1, 2, 3, 4, 11]
    # stats/bloom declarations survived the dir-less DV entry
    vt.append(root, spark.createDataFrame(
        [(20, 2, None)], "k: long, v: long, w: long"), num_files=1)
    e = vt.history(root)[-1]
    assert e.get("stats") and e.get("blooms_file")


def test_describe_detail(capsys, spark, table):
    vt.delete_where_dv(spark, table, [("k", "==", 1)])
    d = vt.describe_detail(table)
    assert d["version"] == 2 and d["num_commits"] == 3
    assert d["num_files"] == 8 and d["num_masked_files"] == 0
    assert d["dv_count"] == 1 and d["dv_rows"] == 1
    assert d["stats_columns"] == ["k"] and d["change_feed"] is True
    assert d["checkpoint_version"] is None  # cadence 20 not reached
    # masked accounting after a pruned delete
    vt.delete_where_pruned(spark, table, [("k", "==", 30)])
    d2 = vt.describe_detail(table)
    # 1 original masked, 1 survivor file added: live count stays 8
    assert d2["num_masked_files"] == 1 and d2["num_files"] == 8
    # historical detail reads the raw log
    d0 = vt.describe_detail(table, version=0)
    assert d0["num_files"] == 4 and d0["dv_count"] == 0
    from dataset_dedupe_estimator_spark.cli import main

    assert main(["table", "detail", str(table)]) == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert out["version"] == 3 and out["dv_rows"] == 1


@pytest.mark.slow
def test_stream_restore_emission_skips_dv_hidden_rows(spark, table, tmp_path):
    """ADVICE r8: the ignoreChanges restore re-delivery must equal the
    restored LIVE set — rows hidden by a deletion vector reinstated at
    the restored version must not stream out (the batch reader
    anti-joins them; the stream now excludes them by row position)."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    vt.delete_where_dv(spark, table, [("k", "between", (5, 8))])   # v2
    vt.append(table, _rows(spark, [(50, 5)]), num_files=1)         # v3
    vt.restore(spark, table, 2)                                    # v4
    spark.dataSource.register(VersionedTableStreamSource)
    sink = tmp_path / "sink"
    (
        spark.readStream.format("versioned_table")
        .option("ignoreChanges", "true")
        .option("startingVersion", 4)  # only the restore emission
        .load(str(table))
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        (r.k, r.v) for r in spark.read.parquet(str(sink)).collect()
    )
    assert got == _snap(spark, table, 4)  # == restored live set
    assert not any(5 <= k <= 8 for k, _ in got)
