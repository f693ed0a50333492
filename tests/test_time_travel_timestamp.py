"""TIMESTAMP AS OF time travel (sources/versioned.py::version_at and
the timestamp= kwarg on read_version / read_where / restore /
register_view): the newest commit at or before the requested time wins,
resolved from the commit times the writers recorded in the log."""

import datetime as dt

import pytest

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _df(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


@pytest.fixture()
def table(spark, tmp_path):
    """Three commits with recorded (real) commit times."""
    root = tmp_path / "tbl"
    vt.append(root, _df(spark, [(1, 10)]), num_files=1,
              stats_columns=["k"])
    vt.append(root, _df(spark, [(2, 20)]), num_files=1)
    vt.overwrite(root, _df(spark, [(3, 30)]), num_files=1)
    return root


def test_version_at_boundaries(table):
    hist = vt.history(table)
    assert [e["version"] for e in hist] == [0, 1, 2]
    # exactly at a commit time: that commit is visible
    for e in hist:
        assert vt.version_at(table, e["ts"]) == e["version"]
    # between two commits: the earlier one
    mid = (hist[0]["ts"] + hist[1]["ts"]) / 2
    assert vt.version_at(table, mid) == 0
    # far future: latest
    assert vt.version_at(table, hist[-1]["ts"] + 3600) == 2
    # before the first commit: no table yet
    with pytest.raises(vt.VersionNotFoundError, match="no committed"):
        vt.version_at(table, hist[0]["ts"] - 1)


def test_timestamp_formats(table):
    hist = vt.history(table)
    t1 = hist[1]["ts"]
    # epoch float, epoch string, datetime, ISO string (local time).
    # datetime truncates to microseconds, which can round a float a
    # hair BELOW the recorded commit time — probe 1 ms after it (still
    # strictly before the next commit by construction)
    assert vt.version_at(table, t1) == 1
    assert vt.version_at(table, str(t1)) == 1
    local = dt.datetime.fromtimestamp(t1 + 0.001)
    assert vt.version_at(table, local) == 1
    assert vt.version_at(table, local.isoformat()) == 1
    # timezone-aware round trip
    aware = dt.datetime.fromtimestamp(t1 + 0.001, tz=dt.timezone.utc)
    assert vt.version_at(table, aware) == 1
    assert vt.version_at(table, aware.isoformat()) == 1
    with pytest.raises(ValueError, match="neither epoch"):
        vt.version_at(table, "not-a-time")
    with pytest.raises(TypeError):
        vt.version_at(table, [1, 2])


def test_read_as_of_timestamp(spark, table):
    hist = vt.history(table)
    got = vt.read_version(spark, table, timestamp=hist[1]["ts"])
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, 10), (2, 20)]
    got = vt.read_version(spark, table, timestamp=hist[2]["ts"] + 10)
    assert sorted((r.k, r.v) for r in got.collect()) == [(3, 30)]
    # read_where as-of prunes and filters the historical snapshot
    rows = vt.read_where(
        spark, table, [("k", "==", 1)], timestamp=hist[1]["ts"]
    )
    assert [(r.k, r.v) for r in rows.collect()] == [(1, 10)]
    with pytest.raises(ValueError, match="not both"):
        vt.read_version(spark, table, version=1, timestamp=hist[1]["ts"])


def test_restore_to_timestamp(spark, table):
    hist = vt.history(table)
    st = vt.restore(spark, table, timestamp=hist[1]["ts"])
    assert st["committed"] and st["restore_of"] == 1
    got = vt.read_version(spark, table)
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, 10), (2, 20)]
    with pytest.raises(ValueError, match="needs a target"):
        vt.restore(spark, table)


def test_register_view_as_of(spark, table):
    hist = vt.history(table)
    vt.register_view(spark, table, "t_asof", timestamp=hist[0]["ts"])
    assert spark.sql("SELECT COUNT(*) AS n FROM t_asof").collect()[0].n == 1


def test_vacuum_dry_run_touches_nothing(spark, table):
    """dry_run lists exactly what a real run removes, without removing."""
    import os

    vt.overwrite(table, _df(spark, [(9, 90)]), num_files=1)
    before = sorted(
        str(p) for p in (table / "data").rglob("*") if p.is_file()
    )
    would = vt.vacuum(table, keep_versions=1, dry_run=True)
    assert would  # something is reclaimable after the overwrite
    after = sorted(
        str(p) for p in (table / "data").rglob("*") if p.is_file()
    )
    assert after == before  # nothing moved
    real = vt.vacuum(table, keep_versions=1)
    assert real == would  # the plan was exact
    for name in real:
        assert not (table / "data" / name).exists() or "/" in name


def test_commit_records_operation_metrics(spark, table):
    """Every staged commit records num_files/bytes (Delta DESCRIBE
    HISTORY shape) — an O(commit files) walk, verified against disk."""
    hist = vt.history(table)
    for e in hist:
        if not e.get("dir"):
            continue
        d = table / "data" / e["dir"]
        files = list(d.rglob("*.parquet"))
        assert e["num_files"] == len(files)
        assert e["bytes"] == sum(f.stat().st_size for f in files)


def test_files_metadata_inventory(spark, table):
    """files() lists exactly the live files with commit/layout/stats/DV
    exposure — zero Spark jobs (pure log + listing)."""
    vt.delete_where_dv(spark, table, [("k", "==", 3)])
    inv = vt.files(table)
    on_disk = {
        f"{d.name}/{p.relative_to(d)}"
        for d in (table / "data").iterdir() if d.is_dir()
        for p in d.rglob("*.parquet")
    }
    live = {f["file"] for f in inv}
    assert live <= on_disk
    assert sum(f["dv_rows"] for f in inv) == 1
    for f in inv:
        assert f["bytes"] > 0 and f["commit_version"] in (0, 1, 2)
        if f["commit_version"] == 0:
            assert f["stats"] and "k" in f["stats"]
    # snapshot inventory: the overwrite-era files only at that version
    past = vt.files(table, version=1)
    assert {f["commit_version"] for f in past} == {0, 1}


def test_unknown_reader_features_refuse_loudly(spark, table):
    """A future writer's feature flag makes THIS reader fail with a
    clear upgrade error instead of silently mis-reading (the Delta
    protocol shape); time travel below the flag keeps working."""
    import json

    hist = vt.history(table)
    v = hist[-1]["version"] + 1
    entry = {
        "version": v, "action": "append", "dir": None,
        "columns": hist[-1]["columns"],
        "partition_by": [],
        "reader_features": ["quantum_encoding_v7"],
        "ts": hist[-1]["ts"] + 1,
    }
    (table / "_vlog" / f"v{v:08d}.json").write_text(json.dumps(entry))
    with pytest.raises(ValueError, match="quantum_encoding_v7"):
        vt.read_version(spark, table).collect()
    with pytest.raises(ValueError, match="upgrade"):
        vt.append(table, _df(spark, [(70, 7)]), num_files=1)
    # below the feature's introduction: still readable
    got = vt.read_version(spark, table, version=v - 1)
    assert got.count() == 1  # the overwrite-era snapshot


def test_describe_detail_as_of(spark, table):
    hist = vt.history(table)
    det = vt.describe_detail(table, timestamp=hist[1]["ts"])
    assert det["version"] == 1 and det["num_live_dirs"] == 2
    det2 = vt.describe_detail(table)  # latest: post-overwrite
    assert det2["version"] == 2 and det2["num_live_dirs"] == 1


def _strip_ts(root, version):
    """Simulate a legacy commit written before ts recording."""
    import json

    p = vt._entry_path(root, version)
    e = json.loads(p.read_text())
    e.pop("ts", None)
    p.write_text(json.dumps(e))


def test_no_ts_commit_backfills_from_mtime(spark, table):
    """ADVICE r9 (low): an entry missing 'ts' defaulted to epoch 0 —
    always a candidate — so on a log whose NEWER commits are
    untimestamped, TIMESTAMP AS OF resolved to a commit made AFTER the
    requested time. Backfilled from the entry file's mtime, the newer
    commit must stay invisible to an earlier request."""
    hist = vt.history(table)
    _strip_ts(table, 2)  # the newest commit loses its ts
    # a request between v0 and v1 must NOT see the (newer) v2
    mid = (hist[0]["ts"] + hist[1]["ts"]) / 2
    assert vt.version_at(table, mid) == 0
    # a far-future request still resolves to the newest commit
    assert vt.version_at(table, hist[1]["ts"] + 3600) == 2


def test_effective_ts_is_monotone(table):
    """Clock skew between writers (or stripped legacy entries) can't
    make the effective series decrease."""
    import json

    # give v1 a ts NEWER than v2's (skewed writer clock)
    p = vt._entry_path(table, 1)
    e = json.loads(p.read_text())
    e["ts"] = e["ts"] + 10_000
    p.write_text(json.dumps(e))
    eff = vt._effective_ts(table, vt._committed_entries(table))
    vals = [eff[v] for v in sorted(eff)]
    assert vals == sorted(vals)


def test_stream_starting_timestamp_includes_no_ts_commits(spark, table):
    """The stream's startingTimestamp counterpart: a legacy no-ts
    commit must be placed by when it landed, not silently skipped."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamReader,
    )

    _strip_ts(table, 0)
    r = VersionedTableStreamReader(
        None, {"path": str(table), "startingtimestamp": "1.0"}
    )
    # epoch 1.0 is before every commit's landing time: start at v0
    # (the old code compared 0.0 >= 1.0 and skipped it)
    assert r.starting_version == 0
