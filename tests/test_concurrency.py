"""Multi-writer optimistic concurrency (sources/versioned.py — the
Delta shape): the expensive data write runs lock-free into a staging
directory; publish takes a short critical section that conflict-checks
the entries landed since the writer's snapshot, REBASES commuting
commits (blind appends, disjoint-file rewrites) onto the new tip, and
raises ConcurrentModificationError for irreconcilable ones
(overlapping files, table-wide rewrites, metadata changes)."""

import threading

import pytest

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _rows(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


def _snap(spark, root, version=None):
    return sorted(
        (r.k, r.v) for r in vt.read_version(spark, root, version).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, 0) for i in range(20)]), num_files=2,
              stats_columns=["k"])
    return root


# ---------------------------------------------------------------- unit:
# rebase/conflict decisions at the _publish_staged seam (a foreign
# commit lands between a writer's snapshot and its publish)

def test_append_rebases_over_landed_append(spark, table):
    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(100, 1)]), "append", 1, None, False, None
    )
    vt.append(table, _rows(spark, [(200, 2)]), num_files=1)  # lands first
    entry = vt._publish_staged(table, base, prep)
    assert entry["version"] == 2  # rebased past the landed commit
    assert _snap(spark, table) == sorted(
        [(i, 0) for i in range(20)] + [(100, 1), (200, 2)]
    )


def test_append_conflicts_with_landed_constraints(spark, table):
    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(100, 1)]), "append", 1, None, False, None
    )
    vt.set_constraints(table, not_null=["k"])
    with pytest.raises(vt.ConcurrentModificationError, match="constraints"):
        vt._publish_staged(table, base, prep)
    # staged dir cleanup is the caller's job (_write_commit's finally)
    import shutil

    shutil.rmtree(prep["stage"], ignore_errors=True)


def test_overwrite_conflicts_with_any_landed_commit(spark, table):
    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(1, 9)]), "overwrite", 1, None, False, None
    )
    vt.append(table, _rows(spark, [(300, 3)]), num_files=1)
    with pytest.raises(
        vt.ConcurrentModificationError, match="rewrites the whole table"
    ):
        vt._publish_staged(table, base, prep)
    import shutil

    shutil.rmtree(prep["stage"], ignore_errors=True)
    # the landed append was NOT lost
    assert (300, 3) in _snap(spark, table)


def test_append_conflicts_with_landed_widening(spark, table):
    from pyspark.sql import functions as F

    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(100, 1)]), "append", 1, None, False, None
    )
    wide = _rows(spark, [(400, 4)]).withColumn("tag", F.lit("x"))
    vt.append(table, wide, num_files=1, allow_new_columns=True)
    with pytest.raises(
        vt.ConcurrentModificationError, match="metadata changed"
    ):
        vt._publish_staged(table, base, prep)
    import shutil

    shutil.rmtree(prep["stage"], ignore_errors=True)


def test_conflict_matrix_touched_files(table):
    """delete/upsert/compaction commute iff their file sets are
    disjoint; overwrite/restore commute with nothing."""
    last = vt._snapshot_entries(table)[-1]
    landed_delete = {
        "version": 1, "action": "delete", "dir": None,
        "removed": {"c00000000": ["part-a.parquet"]},
        "columns": last["columns"],
        "partition_by": [], "stats_columns": ["k"],
    }
    # disjoint files: commutes
    vt._check_rebase(
        table, "delete", {"c00000000/part-b.parquet"}, last, [landed_delete]
    )
    # overlapping files: conflicts
    with pytest.raises(vt.ConcurrentModificationError, match="overlapping"):
        vt._check_rebase(
            table, "delete", {"c00000000/part-a.parquet"}, last,
            [landed_delete],
        )
    # a landed restore is table-wide
    landed_restore = {
        "version": 1, "action": "restore", "dirs": ["c00000000"],
        "columns": last["columns"], "partition_by": [],
        "stats_columns": ["k"],
    }
    with pytest.raises(vt.ConcurrentModificationError, match="restore"):
        vt._check_rebase(
            table, "delete", {"c00000000/part-b.parquet"}, last,
            [landed_restore],
        )
    # blind appends commute with everything
    landed_append = {
        "version": 1, "action": "append", "dir": "c00000001",
        "columns": last["columns"], "partition_by": [],
        "stats_columns": ["k"],
    }
    vt._check_rebase(table, "delete", {"c00000000/x"}, last, [landed_append])
    vt._check_rebase(table, "append", set(), last, [landed_delete])


# ------------------------------------------------------------ threads:
# genuinely concurrent writers through the public API

def test_concurrent_appenders_all_land(spark, table):
    errors = []
    barrier = threading.Barrier(4)

    def worker(w):
        try:
            barrier.wait(timeout=60)
            for j in range(3):
                vt.append(
                    table, _rows(spark, [(1000 + 10 * w + j, w)]), num_files=1
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    want = sorted(
        [(i, 0) for i in range(20)]
        + [(1000 + 10 * w + j, w) for w in range(4) for j in range(3)]
    )
    assert _snap(spark, table) == want
    # versions are gapless and every commit is auditable
    versions = [e["version"] for e in vt.history(table)]
    assert versions == list(range(13))


def test_concurrent_append_and_dv_delete(spark, table):
    """The VERDICT's disjoint-writer case: a DV delete of initial rows
    and appends of fresh rows land together, final state = serial."""
    errors = []
    barrier = threading.Barrier(2)

    def appender():
        try:
            barrier.wait(timeout=60)
            for j in range(3):
                vt.append(table, _rows(spark, [(500 + j, 5)]), num_files=1)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def deleter():
        try:
            barrier.wait(timeout=60)
            st = vt.delete_where_dv(spark, table, [("k", "between", (3, 6))])
            assert st["committed"] and st["deleted_rows"] == 4
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    ts = [threading.Thread(target=appender), threading.Thread(target=deleter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, errors
    want = sorted(
        [(i, 0) for i in range(20) if not 3 <= i <= 6]
        + [(500 + j, 5) for j in range(3)]
    )
    assert _snap(spark, table) == want


def test_vacuum_spares_fresh_stage_dirs(spark, table, tmp_path):
    stage = table / "data" / "stage-999-deadbeef"
    stage.mkdir()
    (stage / "part-0.parquet").write_bytes(b"x")
    vt.optimize(spark, table, num_files=1)
    removed = vt.vacuum(table)
    assert stage.exists()  # fresh in-flight stage survives vacuum
    assert any(r.startswith("c") for r in removed)  # old dirs retired
    import os
    import time as _t

    old = _t.time() - 25 * 3600
    os.utime(stage, (old, old))
    vt.vacuum(table)
    assert not stage.exists()  # crashed-writer orphan reclaimed


def test_append_conflicts_with_landed_rename_and_drop(spark, table):
    """Schema changes (rename/drop, r9) conflict with every in-flight
    write: the staged frame was validated against the OLD names."""
    import shutil

    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(100, 1)]), "append", 1, None, False, None
    )
    vt.rename_column(table, "v", "val")
    with pytest.raises(vt.ConcurrentModificationError, match="renamed"):
        vt._publish_staged(table, base, prep)
    shutil.rmtree(prep["stage"], ignore_errors=True)

    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table,
        base,
        _rows(spark, [(101, 1)]).withColumnRenamed("v", "val"),
        "append", 1, None, False, None,
    )
    vt.drop_column(table, "val")
    with pytest.raises(vt.ConcurrentModificationError, match="dropped"):
        vt._publish_staged(table, base, prep)
    shutil.rmtree(prep["stage"], ignore_errors=True)
