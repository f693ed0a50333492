"""RESTORE — rollback-as-a-commit (sources/versioned.py::restore, the
Delta RESTORE shape): the target version's live set becomes current
again by reference (zero data bytes), history above the target stays
time-travelable, masks reset to the target's, the schema never
narrows, streams treat it as a rewrite, and the change feed carries
the inverse of everything since the target."""

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _rows(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


@pytest.fixture()
def table(spark, tmp_path):
    """v0: 0..9, v1: +10..19, v2: delete 3..5, v3: upsert k=7,25."""
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(10)]), num_files=2,
              stats_columns=["k"], change_feed=True)
    vt.append(root, _rows(spark, [(i, 1) for i in range(10, 20)]), num_files=2)
    vt.delete_where_pruned(spark, root, [("k", "between", (3, 5))])
    vt.upsert_pruned(spark, root, _rows(spark, [(7, 99), (25, 99)]), ["k"])
    return root


def _snap(spark, root, version=None):
    return sorted(
        (r.k, r.v) for r in vt.read_version(spark, root, version).collect()
    )


def test_restore_is_exact_and_history_survives(spark, table):
    want_v1 = _snap(spark, table, 1)
    st = vt.restore(spark, table, 1)
    assert st["committed"] and st["version"] == 4
    # current == v1 exactly, INCLUDING the undone delete's rows
    assert _snap(spark, table) == want_v1
    assert (3, 0) in _snap(spark, table)  # deleted row resurrected
    # the bad commits stay auditable above the target
    assert (7, 99) in _snap(spark, table, 3)
    assert (3, 0) not in _snap(spark, table, 2)
    # the table moves forward after the rollback
    vt.append(table, _rows(spark, [(50, 5)]), num_files=1)
    assert _snap(spark, table) == sorted(want_v1 + [(50, 5)])


def test_restore_resets_masks_not_accumulates(spark, table):
    """A delete between target and restore must not reach restored
    files; a delete AFTER the restore must apply normally."""
    vt.restore(spark, table, 1)
    assert (4, 0) in _snap(spark, table)
    vt.delete_where_pruned(spark, table, [("k", "==", 4)])
    got = _snap(spark, table)
    assert (4, 0) not in got and (3, 0) in got


def test_restore_zero_data_bytes_and_pruning_still_works(spark, table):
    import hashlib
    from pathlib import Path

    data = table / "data"
    before = {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(data).rglob("*.parquet"))
    }
    vt.restore(spark, table, 1)
    after = {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(data).rglob("*.parquet"))
    }
    assert before == after  # rollback moved no data bytes
    # zone maps still prune through the restore entry
    rep = vt.zone_map_prune(table, [("k", "==", 3)])
    assert rep["kept_files"] < rep["total_files"]
    got = vt.read_where(spark, table, [("k", "==", 3)])
    assert [(r.k, r.v) for r in got.collect()] == [(3, 0)]


def test_restore_cdf_is_the_inverse(spark, table):
    vt.restore(spark, table, 1)
    feed = vt.read_change_feed(spark, table, 3, 4)
    got = sorted((r.k, r.v, r._change) for r in feed.collect())
    # inverse of delete(3..5) + upsert(7->99, insert 25)
    assert got == sorted([
        (3, 0, "insert"), (4, 0, "insert"), (5, 0, "insert"),
        (7, 99, "delete"), (7, 0, "insert"), (25, 99, "delete"),
    ])
    # and the at-rest feed equals the snapshot diff across the restore
    diff = sorted(
        (r.k, r.v, r._change)
        for r in vt.changes_between(spark, table, 3, 4).collect()
    )
    assert diff == got


def test_restore_to_vacuumed_version_refuses(spark, table):
    vt.optimize(spark, table, num_files=1)
    vt.vacuum(table)
    with pytest.raises(vt.VersionNotFoundError, match="vacuumed"):
        vt.restore(spark, table, 1)


def test_restore_noop_and_schema_never_narrows(spark, table):
    assert vt.restore(spark, table, 3)["committed"] is False
    wide = spark.createDataFrame([(40, 3, "x")], "k: long, v: long, tag: string")
    vt.append(table, wide, num_files=1, allow_new_columns=True)
    vt.restore(spark, table, 1)
    df = vt.read_version(spark, table)
    assert df.columns == ["k", "v", "tag"]  # latest schema kept
    assert df.filter(F.col("tag").isNotNull()).count() == 0  # backfilled


def test_restore_through_checkpoint_fold(spark, table, monkeypatch):
    """A checkpoint written ON TOP of a restore must fold to the same
    state (live set + reset masks) the raw log resolves."""
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)  # checkpoint every commit
    vt.restore(spark, table, 1)
    vt.append(table, _rows(spark, [(60, 6)]), num_files=1)
    assert list((table / "_vlog").glob("ckpt-v*.parquet"))
    with_ck = _snap(spark, table)
    for ck in (table / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    assert _snap(spark, table) == with_ck
    assert (3, 0) in with_ck and (60, 6) in with_ck


def test_restore_stream_semantics(spark, table, tmp_path):
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    vt.restore(spark, table, 1)
    # default: the stream refuses the rewrite with a clear error
    sink = tmp_path / "sink"
    q = (
        spark.readStream.format("versioned_table").load(str(table))
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="restore"):
        q.awaitTermination()
    # ignoreChanges: re-delivers the restored live set
    sink2 = tmp_path / "sink2"
    (
        spark.readStream.format("versioned_table")
        .option("ignoreChanges", "true")
        .load(str(table))
        .writeStream.format("parquet")
        .option("path", str(sink2))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        (r.k, r.v) for r in spark.read.parquet(str(sink2)).collect()
    )
    # appends v0+v1 + delete survivors + upsert dir + restored live set
    snap1 = _snap(spark, table, 1)
    for row in snap1:
        assert row in got


def test_cli_table_restore(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    root = str(tmp_path / "vt")
    src = str(tmp_path / "src.parquet")
    _rows(spark, [(i, 0) for i in range(5)]).coalesce(1).write.parquet(src)
    assert main(["table", "append", root, src]) == 0
    src2 = str(tmp_path / "src2.parquet")
    _rows(spark, [(9, 9)]).coalesce(1).write.parquet(src2)
    assert main(["table", "overwrite", root, src2]) == 0
    assert main(["table", "restore", root, "--version", "0"]) == 0
    out = capsys.readouterr().out
    assert "restored to v0" in out and "zero data" in out
    assert sorted(r.k for r in vt.read_version(spark, root).collect()) == [0, 1, 2, 3, 4]


def test_vacuum_time_retention_protects_restore_targets(spark, tmp_path):
    """keep_last_hours retains every version in the audit window, so a
    rollback to any of them stays possible after vacuum."""
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(0, 0)]), num_files=1)
    vt.overwrite(root, _rows(spark, [(1, 1)]), num_files=1)
    vt.overwrite(root, _rows(spark, [(2, 2)]), num_files=1)
    # all commits are seconds old: the 1-hour window retains them all
    assert vt.vacuum(root, keep_versions=1, keep_last_hours=1.0) == []
    assert vt.restore(spark, root, 0)["committed"]
    assert _snap(spark, root) == [(0, 0)]
    # with no window, only the latest snapshot's dirs survive
    removed = vt.vacuum(root, keep_versions=1)
    assert removed  # superseded overwrite dirs reclaimed


def test_restore_resurrects_a_dir_the_checkpoint_folded_away(spark, tmp_path, monkeypatch):
    """A checkpoint drops FULLY-masked dirs as dead; a later restore can
    make exactly those dirs live again. Snapshot-path readers must then
    degrade to a stats-less scan for the resurrected dir (never KeyError,
    never a wrong prune), and the next checkpoint must refold from the
    raw log."""
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(10)]), num_files=1,
              stats_columns=["k"])                       # v0: dir A
    vt.append(root, _rows(spark, [(i, 1) for i in range(10, 20)]),
              num_files=1)                               # v1: dir B
    vt.delete_where_pruned(spark, root, [("k", "<=", 9)])  # v2: A fully masked
    # checkpoint at v2 folded A away as dead
    vt.restore(spark, root, 1)                           # v3: A live again
    # drop the post-restore checkpoint so the snapshot path resolves
    # ckpt@v2 (A folded away) + tail(restore) — the exact shape where
    # by_dir has no entry for the resurrected dir
    for ck in (root / "_vlog").glob("ckpt-v*.parquet"):
        if vt._ckpt_version(ck) > 2:
            ck.unlink()
    # snapshot-path reads and prunes on the resurrected dir
    assert _snap(spark, root) == [(i, 0) for i in range(10)] + [
        (i, 1) for i in range(10, 20)
    ]
    rep = vt.zone_map_prune(root, [("k", "==", 3)])
    got = vt.read_where(spark, root, [("k", "==", 3)])
    assert [(r.k, r.v) for r in got.collect()] == [(3, 0)]
    assert rep["kept_files"] >= 1
    # a merge touching the resurrected dir rewrites it (stats-less =
    # candidate), result exact
    st = vt.upsert_pruned(spark, root, _rows(spark, [(3, 99)]), ["k"])
    assert st["committed"]
    got = {r.k: r.v for r in vt.read_version(spark, root).collect()}
    assert got[3] == 99 and got[4] == 0
    # the post-restore checkpoint refolded from the raw log: wiping
    # checkpoints changes nothing
    with_ck = _snap(spark, root)
    for ck in (root / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    assert _snap(spark, root) == with_ck


def test_fold_keeps_dead_dirs_named_by_restore_last_entry(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8 (high): when the fold's LAST entry is a restore whose
    target live set contains a fully-masked dir, the dead-dir drop must
    exempt that dir (entry AND mask) — its replay resets live from
    e["dirs"] and masks from lastc["removed"], so dropping either makes
    checkpoint+tail readers resurrect the deleted rows."""
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(5)]), num_files=1,
              stats_columns=["k"])                        # v0: dir A
    vt.append(root, _rows(spark, [(i, 1) for i in range(10, 15)]),
              num_files=1)                                # v1: dir B
    vt.delete_where_pruned(spark, root, [("k", ">=", 10)])  # v2: B dead
    vt.append(root, _rows(spark, [(20, 2)]), num_files=1)  # v3: dir C
    vt.restore(spark, root, 2)  # v4: live=[A, B] with B fully masked
    # a checkpoint landed ON the restore commit (cadence 1): the fold's
    # last entry is the restore naming the dead dir B
    cks = sorted((root / "_vlog").glob("ckpt-v*.parquet"))
    assert cks and vt._ckpt_version(cks[-1]) == 4
    want = [(i, 0) for i in range(5)]  # B's rows stay deleted
    assert _snap(spark, root) == want  # checkpoint+tail read
    for ck in (root / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    assert _snap(spark, root) == want  # raw log agrees
    # and the table keeps working on top of the folded restore
    vt.append(root, _rows(spark, [(30, 3)]), num_files=1)
    assert _snap(spark, root) == sorted(want + [(30, 3)])


def test_restore_records_types_of_restored_live_data(spark, tmp_path):
    """ADVICE r9 (medium): restore commits no 'types' key, so after a
    re-typing overwrite is rolled back the commit-time type guard still
    reflects the SUPERSEDED overwrite — rejecting appends that match the
    restored data and accepting the wrong-typed frame, producing mixed
    parquet footers that fail every multi-file read."""
    root = tmp_path / "tbl"
    vt.append(root, spark.createDataFrame([(1, 10)], "k: long, v: long"),
              num_files=1)                                      # v0 bigint
    vt.overwrite(root, spark.createDataFrame([(2, "x")], "k: long, v: string"),
                 num_files=1)                                   # v1 re-types v
    vt.restore(spark, root, 0)                                  # v2 rollback
    # the restored live data is bigint: a matching append must commit
    vt.append(root, spark.createDataFrame([(3, 30)], "k: long, v: long"),
              num_files=1)
    # ... and the superseded overwrite's string type must now REFUSE
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, spark.createDataFrame([(4, "y")], "k: long, v: string"),
                  num_files=1)
    # the multi-file scan stays healthy (the bug's symptom was
    # PARQUET_COLUMN_DATA_TYPE_MISMATCH here)
    assert _snap(spark, root) == [(1, 10), (3, 30)]


def test_restore_types_keep_post_target_widened_columns(spark, tmp_path):
    """Columns added AFTER the restore target stay in the schema (it
    never narrows) and keep their post-target declared type in the
    guard, so the next append still type-checks on them."""
    root = tmp_path / "tbl"
    vt.append(root, spark.createDataFrame([(1, 10)], "k: long, v: long"),
              num_files=1)                                      # v0
    vt.append(root, spark.createDataFrame([(2, 20, 0.5)],
              "k: long, v: long, w: double"),
              num_files=1, allow_new_columns=True)              # v1 widens
    vt.restore(spark, root, 0)                                  # v2
    # w survives the rollback in the schema; its declared type is double
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, spark.createDataFrame([(3, 30, "no")],
                  "k: long, v: long, w: string"), num_files=1)
    vt.append(root, spark.createDataFrame([(3, 30, 1.5)],
              "k: long, v: long, w: double"), num_files=1)
    got = sorted((r.k, r.v, r.w) for r in
                 vt.read_version(spark, root).collect())
    assert got == [(1, 10, None), (3, 30, 1.5)]


def test_clone_of_restored_snapshot_carries_restored_types(spark, tmp_path):
    """ADVICE r9 (low): clone seeds its guard from the newest typed
    entry of the resolved live set — after the restore fix, cloning a
    restored snapshot must inherit the RESTORED types, not the rolled-
    back overwrite's."""
    root, dst = tmp_path / "src", tmp_path / "dst"
    vt.append(root, spark.createDataFrame([(1, 10)], "k: long, v: long"),
              num_files=1)
    vt.overwrite(root, spark.createDataFrame([(2, "x")], "k: long, v: string"),
                 num_files=1)
    vt.restore(spark, root, 0)
    vt.clone_table(root, dst)
    vt.append(dst, spark.createDataFrame([(5, 50)], "k: long, v: long"),
              num_files=1)
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(dst, spark.createDataFrame([(6, "z")],
                  "k: long, v: string"), num_files=1)
    assert _snap(spark, dst) == [(1, 10), (5, 50)]
