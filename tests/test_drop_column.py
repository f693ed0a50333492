"""Column DROP via column mapping (sources/versioned.py::drop_column —
the Delta DROP COLUMN shape): a metadata-only commit retires the column
from the schema; pre-drop data files keep the physical bytes (time
travel below the drop still reads them) and the retired physical name
may never be re-used (resurrection hazard). Zero data bytes move."""

import hashlib
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _rows(spark, triples):
    return spark.createDataFrame(sorted(triples), "k: long, v: long, w: long")


def _md5s(root):
    return {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(root, "data").rglob("*.parquet"))
    }


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, i * 10, i * 100) for i in range(10)]),
              num_files=2, stats_columns=["k"], change_feed=True)
    vt.append(root, _rows(spark, [(i, i * 10, i * 100) for i in range(10, 20)]),
              num_files=2)
    return root


def test_drop_is_metadata_only_and_reads_project(spark, table):
    before = _md5s(table)
    st = vt.drop_column(table, "w")
    assert st["action"] == "drop_column"
    assert st["columns"] == ["k", "v"]
    assert st["dropped_columns"] == ["w"]
    assert _md5s(table) == before  # zero data bytes moved
    df = vt.read_version(spark, table)
    assert df.columns == ["k", "v"]
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (i, i * 10) for i in range(20)
    ]
    # time travel BELOW the drop sees the column
    old = vt.read_version(spark, table, 1)
    assert old.columns == ["k", "v", "w"]
    assert sorted(r.w for r in old.collect()) == [i * 100 for i in range(20)]


def test_writes_and_reads_after_drop(spark, table):
    vt.drop_column(table, "w")
    # appends speak the reduced schema
    vt.append(table, spark.createDataFrame([(50, 500)], "k: long, v: long"),
              num_files=1)
    got = vt.read_version(spark, table)
    assert got.columns == ["k", "v"]
    assert (50, 500) in {(r.k, r.v) for r in got.collect()}
    # pruned reads and deletes work over the mixed pre/post-drop live set
    rows = vt.read_where(spark, table, [("k", ">=", 18)])
    assert sorted((r.k, r.v) for r in rows.collect()) == [
        (18, 180), (19, 190), (50, 500)
    ]
    vt.delete_where_pruned(spark, table, [("k", "==", 50)])
    vt.delete_where_dv(spark, table, [("k", "==", 19)])
    final = {r.k: r.v for r in vt.read_version(spark, table).collect()}
    assert 50 not in final and 19 not in final and len(final) == 19


def test_drop_after_rename_and_predicates_refuse_dropped(spark, table):
    vt.rename_column(table, "w", "weight")
    st = vt.drop_column(table, "weight")
    assert st["dropped_columns"] == ["w"]  # physical name retired
    assert st["column_mapping"] == {}
    assert vt.read_version(spark, table).columns == ["k", "v"]
    # predicates on the dropped column refuse instead of silently
    # filtering resurrected values out of pre-drop files
    with pytest.raises(ValueError, match="not in the table schema"):
        vt.read_where(spark, table, [("weight", "==", 100)]).collect()
    with pytest.raises(ValueError, match="not in the table schema"):
        vt.zone_map_prune(table, [("w", "==", 100)])


def test_retired_physical_name_cannot_return(spark, table):
    vt.drop_column(table, "w")
    wide = spark.createDataFrame([(90, 9, 1)], "k: long, v: long, w: long")
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(table, wide, num_files=1, allow_new_columns=True)
    # a different name is fine
    wide2 = spark.createDataFrame([(90, 9, 1)], "k: long, v: long, w2: long")
    vt.append(table, wide2, num_files=1, allow_new_columns=True)
    assert vt.read_version(spark, table).columns == ["k", "v", "w2"]


def test_drop_refusals(spark, tmp_path, table):
    with pytest.raises(ValueError, match="not in table schema"):
        vt.drop_column(table, "nope")
    # constraint-referenced column refuses
    vt.set_constraints(table, not_null=["w"])
    with pytest.raises(ValueError, match="constraint"):
        vt.drop_column(table, "w")
    vt.set_constraints(table)  # drop constraints, then drop succeeds
    vt.drop_column(table, "w")
    # partition columns can't be dropped (paths bake the name)
    proot = tmp_path / "ptbl"
    vt.append(
        proot,
        spark.createDataFrame([(1, 2, "a")], "k: long, v: long, p: string"),
        num_files=1, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition column"):
        vt.drop_column(proot, "p")
    # the only column can't be dropped
    sroot = tmp_path / "stbl"
    vt.append(sroot, spark.createDataFrame([(1,)], "k: long"), num_files=1)
    with pytest.raises(ValueError, match="only column"):
        vt.drop_column(sroot, "k")


def test_drop_through_checkpoint_fold(spark, table, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    vt.drop_column(table, "w")
    vt.append(
        table, spark.createDataFrame([(70, 7)], "k: long, v: long"),
        num_files=1,
    )
    assert list((table / "_vlog").glob("ckpt-v*.parquet"))
    # checkpoint+tail readers agree with the raw log
    with_ck = sorted(
        (r.k, r.v) for r in vt.read_version(spark, table).collect()
    )
    assert vt.read_version(spark, table).columns == ["k", "v"]
    # and the retired-name set survives the fold (writer-side guard)
    wide = spark.createDataFrame([(91, 9, 1)], "k: long, v: long, w: long")
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(table, wide, num_files=1, allow_new_columns=True)
    for ck in (table / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    no_ck = sorted(
        (r.k, r.v) for r in vt.read_version(spark, table).collect()
    )
    assert with_ck == no_ck and (70, 7) in no_ck


def test_cdf_stream_and_describe_after_drop(spark, table):
    vt.delete_where_pruned(spark, table, [("k", "==", 3)])   # v2
    vt.drop_column(table, "w")                               # v3
    vt.append(table, spark.createDataFrame([(30, 300)], "k: long, v: long"),
              num_files=1)                                   # v4
    # CDF across the drop: as-of-latest schema, property commit silent
    cdf = vt.read_change_feed(spark, table, 1)
    assert cdf.columns == ["k", "v", "_change", "_commit_version"]
    versions = {r._commit_version for r in cdf.collect()}
    assert versions == {2, 4}
    # snapshot diff across the drop compares the shared columns
    delta = vt.changes_between(spark, table, 1, 4)
    changed = {(r.k, r._change) for r in delta.collect()}
    assert (3, "delete") in changed and (30, "insert") in changed
    det = vt.describe_detail(table)
    assert det["columns"] == ["k", "v"]
    assert det["dropped_columns"] == ["w"]
    # the stream schema speaks the reduced schema
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )
    src = VersionedTableStreamSource({"path": str(table)})
    assert [f.name for f in src.schema().fields] == ["k", "v"]


def test_restore_keeps_drop(spark, table):
    vt.drop_column(table, "w")           # v2
    vt.restore(spark, table, 1)          # v3: rollback the DATA
    df = vt.read_version(spark, table)
    # names/schema are table metadata, not live-set state: the drop
    # survives the restore (same contract as rename)
    assert df.columns == ["k", "v"]
    assert sorted(r.k for r in df.collect()) == list(range(20))


def test_rename_onto_dropped_logical_name(spark, tmp_path):
    """Renaming another column TO a dropped column's LOGICAL name is
    legal (logical names are free after the drop — only the PHYSICAL
    name is retired): reads serve the renamed column's values; the
    dropped column's old values never resurface."""
    root = tmp_path / "tbl"
    df = spark.createDataFrame([(1, 2, 3), (4, 5, 6)],
                               "k: long, v: long, w: long")
    vt.append(root, df, num_files=1)
    vt.drop_column(root, "w")
    vt.rename_column(root, "v", "w")
    got = vt.read_version(spark, root)
    assert got.columns == ["k", "w"]
    assert sorted((r.k, r.w) for r in got.collect()) == [(1, 2), (4, 5)]
    rows = vt.read_where(spark, root, [("w", "==", 5)])
    assert [(r.k, r.w) for r in rows.collect()] == [(4, 5)]
    # the retired PHYSICAL name still may not return via widening
    wide = spark.createDataFrame([(9, 9, 9)], "k: long, w: long, x: long")
    vt.append(root, wide, num_files=1, allow_new_columns=True)
    bad = spark.createDataFrame([(9, 9, 9)],
                                "k: long, w: long, w2: long")
    # w2 is fine; the original physical 'w' would clash with mapping
    assert "x" in vt.read_version(spark, root).columns
