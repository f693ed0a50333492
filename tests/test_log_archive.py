"""Log archiving (r10, ``sources/versioned.py::archive_log``): the
raw ``v*.json`` count stays bounded — pre-checkpoint entries move into
an ``archive-v*.parquet`` bundle of the RAW entries (not the folded
state), so full history (time travel, history, version_at, restore)
stays exact while the hot read path keeps its O(tail) probes."""

import pytest

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _df(spark, lo, n=1):
    return spark.range(lo, lo + n).selectExpr("id as k", "id * 2 as v")


def _json_count(root):
    return len(list((root / vt._VLOG).glob("v*.json")))


def test_archive_noop_without_checkpoint(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, _df(spark, 0), num_files=1)
    st = vt.archive_log(root)
    assert st == {"archived": 0, "floor": None, "removed_json": 0}
    assert _json_count(root) == 1


def test_archive_bounds_json_and_keeps_history_exact(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 4)
    root = tmp_path / "t"
    for i in range(11):  # v0..v10, checkpoints at v4 and v8
        vt.append(root, _df(spark, i), num_files=1)
    assert _json_count(root) == 11
    st = vt.archive_log(root)
    assert st["floor"] == 8 and st["archived"] == 9
    # only the post-checkpoint tail stays as raw JSON
    assert _json_count(root) == 2
    # full history is exact through the archive
    hist = vt.history(root)
    assert [e["version"] for e in hist] == list(range(11))
    # time travel below the archive floor
    assert vt.read_version(spark, root, 3).count() == 4
    assert vt.read_version(spark, root).count() == 11
    # the latest-version hot path still resolves checkpoint + probes
    snap = vt._snapshot_entries(root)
    assert snap[-1]["version"] == 10
    # and TIMESTAMP AS OF keeps working for archived commits
    t2 = hist[2]["ts"]
    assert vt.version_at(root, t2) == 2


def test_archive_idempotent_and_grows(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 4)
    root = tmp_path / "t"
    for i in range(5):
        vt.append(root, _df(spark, i), num_files=1)
    st1 = vt.archive_log(root)
    assert st1["floor"] == 4
    st2 = vt.archive_log(root)  # nothing new below the floor
    assert st2["removed_json"] == 0
    for i in range(5, 9):  # next checkpoint at v8
        vt.append(root, _df(spark, i), num_files=1)
    st3 = vt.archive_log(root)
    assert st3["floor"] == 8 and st3["archived"] == 9
    assert [e["version"] for e in vt.history(root)] == list(range(9))
    # at most two bundles are retained (rotation cushion)
    assert len(list((root / vt._VLOG).glob("archive-v*.parquet"))) <= 2


def test_restore_to_archived_version(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 3)
    root = tmp_path / "t"
    for i in range(7):
        vt.append(root, _df(spark, i), num_files=1)
    vt.archive_log(root)
    st = vt.restore(spark, root, 1)
    assert st["committed"]
    assert vt.read_version(spark, root).count() == 2


def test_vacuum_auto_archives(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 3)
    root = tmp_path / "t"
    for i in range(7):
        vt.append(root, _df(spark, i), num_files=1)
    vt.vacuum(root, keep_versions=7)  # removes nothing, archives log
    # checkpoints landed at v3 and v6 -> floor 6 covers every entry;
    # the hot path reads ckpt-v6 + an (empty) probe tail
    assert _json_count(root) == 0
    assert [e["version"] for e in vt.history(root)] == list(range(7))
    # dry run must NOT archive
    root2 = tmp_path / "t2"
    for i in range(7):
        vt.append(root2, _df(spark, i), num_files=1)
    vt.vacuum(root2, keep_versions=7, dry_run=True)
    assert _json_count(root2) == 7


def test_keep_tail_cushion(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 4)
    root = tmp_path / "t"
    for i in range(9):
        vt.append(root, _df(spark, i), num_files=1)
    st = vt.archive_log(root, keep_tail=3)
    assert st["floor"] == 5
    assert _json_count(root) == 3  # v6..v8 stay raw
    assert [e["version"] for e in vt.history(root)] == list(range(9))
