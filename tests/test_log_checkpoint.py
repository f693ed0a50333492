"""Commit-log checkpointing (r8): every _CKPT_EVERY commits the writer
folds the log into `_vlog/ckpt-v<version>.parquet`; the hot
latest-version path then reads checkpoint + JSON tail — O(live set +
tail) instead of O(all history). The checkpoint is an OPTIMIZATION,
never the source of truth: raw entries stay on disk, explicit
time-travel reads them, and deleting every checkpoint must change no
result. These tests pin that equivalence over a history exercising
every entry shape: append, overwrite, pruned delete (incl. dir-less),
pruned upsert, compaction, constraints, change feed, schema widening,
stats + bloom sidecars."""

import json

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


@pytest.fixture()
def fast_ckpt(monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 3)


def _rows(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


def _tagged(spark, pairs):
    # post-widening commits must carry the full 3-column schema
    return _rows(spark, pairs).withColumn("tag", F.lit(None).cast("string"))


def _mixed_history(spark, root):
    """14 commits covering every entry shape; returns the model
    (version -> sorted live rows)."""
    model = []
    live = []

    def snap():
        model.append(sorted(live))

    vt.append(root, _rows(spark, [(i, 0) for i in range(10)]), num_files=2,
              stats_columns=["k"], bloom_columns=["k"], bloom_bits=4096,
              change_feed=True)
    live = [(i, 0) for i in range(10)]
    snap()
    vt.append(root, _rows(spark, [(i, 1) for i in range(10, 20)]), num_files=2)
    live += [(i, 1) for i in range(10, 20)]
    snap()
    vt.delete_where_pruned(spark, root, [("k", "between", (3, 5))])
    live = [(k, v) for k, v in live if not 3 <= k <= 5]
    snap()
    vt.upsert_pruned(spark, root, _rows(spark, [(7, 99), (25, 99)]), ["k"])
    live = [(k, v) for k, v in live if k != 7] + [(7, 99), (25, 99)]
    snap()
    vt.set_constraints(root, not_null=["k"])
    snap()
    vt.append(root, _rows(spark, [(30, 2)]), num_files=1)
    live += [(30, 2)]
    snap()
    vt.compact_small(spark, root)  # dataChange=false
    snap()
    # schema widening
    wide = spark.createDataFrame([(40, 3, "x")], "k: long, v: long, tag: string")
    vt.append(root, wide, num_files=1, allow_new_columns=True)
    live += [(40, 3)]
    snap()
    vt.overwrite(root, _rows(spark, [(1, 5), (2, 5)]).withColumn(
        "tag", F.lit(None).cast("string")), num_files=1)
    live = [(1, 5), (2, 5)]
    snap()
    for i in range(5):  # push past several checkpoint boundaries
        vt.append(root, _tagged(spark, [(50 + i, i)]), num_files=1)
        live += [(50 + i, i)]
        snap()
    return model


def test_checkpointed_log_resolves_identically(spark, tmp_path, fast_ckpt):
    root = tmp_path / "tbl"
    model = _mixed_history(spark, root)
    cks = sorted((root / "_vlog").glob("ckpt-v*.parquet"))
    assert len(cks) >= 3  # cadence fired repeatedly
    # the snapshot path folds to the same state the raw log gives
    snap_entries = vt._snapshot_entries(root)
    raw_entries = vt._committed_entries(root)
    assert snap_entries[-1] == raw_entries[-1] or (
        # folded last entry may ADD accumulated keys; core metadata equal
        {k: snap_entries[-1].get(k) for k in ("version", "action", "dir", "columns")}
        == {k: raw_entries[-1].get(k) for k in ("version", "action", "dir", "columns")}
    )
    latest = sorted(
        (r.k, r.v) for r in vt.read_version(spark, root).collect()
    )
    assert latest == model[-1]
    # EVERY historical version still time-travels exactly (raw path)
    for version, expect in enumerate(model):
        got = sorted(
            (r.k, r.v)
            for r in vt.read_version(spark, root, version).collect()
        )
        assert got == expect, f"version {version}"


def test_checkpoints_are_pure_optimization(spark, tmp_path, fast_ckpt):
    """Deleting every checkpoint changes NOTHING: reads, pruning
    reports, change feeds, and the next commit all behave identically
    off the raw log."""
    root = tmp_path / "tbl"
    model = _mixed_history(spark, root)
    pred = [("k", ">=", 50)]
    with_ck = {
        "rows": sorted((r.k, r.v) for r in vt.read_where(spark, root, pred).collect()),
        "prune": vt.zone_map_prune(root, pred),
        "dirs": vt.live_dirs(root),
        "changes": sorted(
            (r.k, r.v, r._change, r._n)
            for r in vt.changes_between(spark, root, 1, 3).collect()
        ),
    }
    for ck in (root / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    without_ck = {
        "rows": sorted((r.k, r.v) for r in vt.read_where(spark, root, pred).collect()),
        "prune": vt.zone_map_prune(root, pred),
        "dirs": vt.live_dirs(root),
        "changes": sorted(
            (r.k, r.v, r._change, r._n)
            for r in vt.changes_between(spark, root, 1, 3).collect()
        ),
    }
    assert with_ck == without_ck
    vt.append(root, _tagged(spark, [(99, 9)]), num_files=1)
    latest = sorted((r.k, r.v) for r in vt.read_version(spark, root).collect())
    assert latest == sorted(model[-1] + [(99, 9)])


def test_folded_state_carries_all_table_metadata(spark, tmp_path, fast_ckpt):
    """Inheritance through a checkpoint: stats/bloom declarations,
    constraints, change feed, widening — a commit landing on top of a
    checkpointed log must inherit them all from the folded entries."""
    root = tmp_path / "tbl"
    _mixed_history(spark, root)
    # constraints still enforced (k NOT NULL was set mid-history)
    bad = spark.createDataFrame([(None, 1, None)], "k: long, v: long, tag: string")
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(root, bad, num_files=1)
    # declarations inherited by a fresh commit
    vt.append(root, _rows(spark, [(60, 1)]).withColumn(
        "tag", F.lit(None).cast("string")), num_files=1)
    e = vt.history(root)[-1]
    assert e.get("stats_columns") == ["k"]
    assert e.get("bloom_columns") == ["k"] and e.get("blooms_file")
    # change feed still active: the next pruned delete writes CDF
    vt.delete_where_pruned(spark, root, [("k", "==", 60)])
    v = vt.history(root)[-1]["version"]
    feed = vt.read_change_feed(spark, root, v - 1, v)
    assert [(r.k, r._change) for r in feed.collect()] == [(60, "delete")]


def test_checkpoint_write_failure_never_fails_commit(spark, tmp_path, fast_ckpt, monkeypatch):
    root = tmp_path / "tbl"
    for i in range(3):  # versions 0..2
        vt.append(root, _rows(spark, [(i, i)]), num_files=1)

    def boom(_root):
        raise OSError("disk full")

    monkeypatch.setattr(vt, "_write_checkpoint", boom)
    entry = vt.append(root, _rows(spark, [(3, 3)]), num_files=1)  # v3 = cadence
    assert entry["version"] == 3
    assert not list((root / "_vlog").glob("ckpt-v*.parquet"))
    assert sorted(r.k for r in vt.read_version(spark, root).collect()) == [0, 1, 2, 3]


def test_vacuum_keeps_only_latest_checkpoint(spark, tmp_path, fast_ckpt):
    root = tmp_path / "tbl"
    _mixed_history(spark, root)
    cks = sorted((root / "_vlog").glob("ckpt-v*.parquet"))
    assert len(cks) >= 3
    removed = vt.vacuum(root)
    left = sorted((root / "_vlog").glob("ckpt-v*.parquet"))
    assert left == [cks[-1]]
    assert any(r.startswith("_vlog/ckpt-") for r in removed)
    # reads still fine post-vacuum
    assert vt.read_version(spark, root).count() > 0


def test_snapshot_entries_parse_only_the_tail(spark, tmp_path, fast_ckpt, monkeypatch):
    """The O(tail) claim, enforced: after a checkpoint at version N,
    the snapshot path must json-parse only entries > N."""
    root = tmp_path / "tbl"
    for i in range(7):  # versions 0..6, checkpoints at 3 and 6
        vt.append(root, _rows(spark, [(i, i)]), num_files=1)
    parsed = []
    real = json.loads

    def spy(s, *a, **kw):
        obj = real(s, *a, **kw)
        if isinstance(obj, dict) and "version" in obj:
            parsed.append(obj["version"])
        return obj

    import pathlib

    globs = []
    real_glob = pathlib.Path.glob

    def glob_spy(self, pattern):
        globs.append(str(pattern))
        return real_glob(self, pattern)

    monkeypatch.setattr(pathlib.Path, "glob", glob_spy)
    monkeypatch.setattr(vt.json, "loads", spy)
    entries = vt._snapshot_entries(root)
    assert [e["version"] for e in entries] == list(range(7))
    # ckpt at v6: the JSON tail is empty; only the checkpoint rows
    # (folded entries) were parsed, never the 7 raw files (+1 parse for
    # the _last_checkpoint pointer, which also carries 'version')
    assert all(v <= 6 for v in parsed) and len(parsed) <= 8
    # and the pointer + probe-the-tail path never LISTS the log
    # directory — O(tail) stat calls, no O(all commits) glob
    assert globs == [], globs
    monkeypatch.setattr(pathlib.Path, "glob", real_glob)
    # tighter: commit one more and re-read — exactly one raw parse
    monkeypatch.setattr(vt.json, "loads", real)
    vt.append(root, _rows(spark, [(7, 7)]), num_files=1)
    parsed.clear()
    monkeypatch.setattr(vt.json, "loads", spy)
    entries = vt._snapshot_entries(root)
    assert entries[-1]["version"] == 7
    # checkpoint(v6) holds 7 folded appends + 1 tail parse = 8 max;
    # the raw path would re-parse all 8 JSON files EVERY read and grow
    # with history — the folded read is bounded by the LIVE set
    assert parsed.count(7) == 1


def test_last_checkpoint_pointer_is_pure_optimization(spark, tmp_path, fast_ckpt):
    """The `_last_checkpoint` pointer (Delta's shape) only short-cuts
    discovery: a missing, stale, or corrupt pointer falls back to the
    directory glob and resolves identically."""
    root = tmp_path / "tbl"
    for i in range(7):  # checkpoints at v3 and v6
        vt.append(root, _rows(spark, [(i, i)]), num_files=1)
    ptr = root / "_vlog" / "_last_checkpoint"
    assert json.loads(ptr.read_text())["version"] == 6
    want = vt._snapshot_entries(root)
    # stale pointer: longer tail, same result
    ptr.write_text(json.dumps({"version": 3}))
    assert vt._snapshot_entries(root) == want
    # corrupt pointer: glob fallback, same result
    ptr.write_text("not json{")
    assert vt._snapshot_entries(root) == want
    assert vt._latest_checkpoint(root).name == "ckpt-v00000006.parquet"
    # missing pointer: glob fallback, same result
    ptr.unlink()
    assert vt._snapshot_entries(root) == want
    # the next checkpoint rewrites it
    for i in range(7, 10):
        vt.append(root, _rows(spark, [(i, i)]), num_files=1)
    assert json.loads(ptr.read_text())["version"] == 9
    # pointer never regresses
    vt._advance_last_checkpoint(root, 3)
    assert json.loads(ptr.read_text())["version"] == 9
