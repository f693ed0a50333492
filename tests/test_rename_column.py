"""Column RENAME via column mapping (sources/versioned.py::rename_column
— the Delta column-mapping shape, minus field IDs): physical names are
frozen at column creation; a rename is a METADATA-ONLY commit carrying
the accumulated logical->physical mapping, and every boundary (reads,
predicates, incoming frames, constraints, CDF, stream) projects
through it. Zero data bytes move."""

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


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _rows(spark, [(i, i * 10) for i in range(10)]),
              num_files=2, stats_columns=["k"], change_feed=True)
    vt.append(root, _rows(spark, [(i, i * 10) for i in range(10, 20)]),
              num_files=2)
    return root


def test_rename_is_metadata_only_and_reads_project(spark, table):
    before = _md5s(table)
    st = vt.rename_column(table, "v", "value")
    assert st["action"] == "rename_column" and st["column_mapping"] == {
        "value": "v"
    }
    assert _md5s(table) == before  # zero data bytes moved
    df = vt.read_version(spark, table)
    assert df.columns == ["k", "value"]
    assert sorted((r.k, r.value) for r in df.collect()) == [
        (i, i * 10) for i in range(20)
    ]
    # time travel BELOW the rename sees that version's own names
    old = vt.read_version(spark, table, 1)
    assert old.columns == ["k", "v"]


def test_writes_and_predicates_speak_new_names(spark, table):
    vt.rename_column(table, "v", "value")
    vt.rename_column(table, "k", "key")
    # append under the new names
    new = spark.createDataFrame([(50, 500)], "key: long, value: long")
    vt.append(table, new, num_files=1)
    # zone-map pruning + pruned delete via the new name
    rep = vt.zone_map_prune(table, [("key", "==", 50)])
    assert rep["skipped_files"] > 0
    got = vt.read_where(spark, table, [("key", ">=", 18)])
    assert got.columns == ["key", "value"]
    assert sorted((r.key, r.value) for r in got.collect()) == [
        (18, 180), (19, 190), (50, 500)
    ]
    vt.delete_where_pruned(spark, table, [("key", "==", 50)])
    vt.delete_where_dv(spark, table, [("key", "==", 19)])
    ups = spark.createDataFrame([(18, 999)], "key: long, value: long")
    vt.upsert_pruned(spark, table, ups, ["key"])
    final = {r.key: r.value for r in vt.read_version(spark, table).collect()}
    assert final[18] == 999 and 19 not in final and 50 not in final
    assert len(final) == 19


def test_rename_through_checkpoint_fold(spark, table, monkeypatch):
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    vt.rename_column(table, "v", "value")
    vt.append(
        table,
        spark.createDataFrame([(70, 7)], "k: long, value: long"),
        num_files=1,
    )
    assert list((table / "_vlog").glob("ckpt-v*.parquet"))
    with_ck = sorted(
        (r.k, r.value) for r in vt.read_version(spark, table).collect()
    )
    assert vt.read_version(spark, table).columns == ["k", "value"]
    for ck in (table / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    no_ck = sorted(
        (r.k, r.value) for r in vt.read_version(spark, table).collect()
    )
    assert with_ck == no_ck and (70, 7) in no_ck


def test_rename_back_drops_mapping_and_restore_keeps_names(spark, table):
    vt.rename_column(table, "v", "value")
    vt.rename_column(table, "value", "v")  # back to the physical name
    assert vt._column_mapping(vt._snapshot_entries(table)) == {}
    assert vt.read_version(spark, table).columns == ["k", "v"]
    vt.rename_column(table, "v", "val2")
    vt.restore(spark, table, 1)  # restore BELOW the renames
    # current reads: old data under the NEW names
    df = vt.read_version(spark, table)
    assert df.columns == ["k", "val2"]
    assert sorted(r.k for r in df.collect()) == list(range(20))


def test_rename_refusals(spark, tmp_path, table):
    with pytest.raises(ValueError, match="not in table schema"):
        vt.rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column(table, "v", "k")
    with pytest.raises(ValueError, match="reserved"):
        vt.rename_column(table, "v", "_dv_key")
    # a renamed-away physical name can't be reused by widening
    vt.rename_column(table, "v", "value")
    wide = spark.createDataFrame(
        [(90, 9, 1)], "k: long, value: long, v: long"
    )
    with pytest.raises(ValueError, match="PHYSICAL"):
        vt.append(table, wide, num_files=1, allow_new_columns=True)


def test_cdf_and_diff_across_rename(spark, table):
    vt.delete_where_pruned(spark, table, [("k", "==", 3)])       # v2
    vt.rename_column(table, "v", "value")                        # v3
    vt.delete_where_pruned(spark, table, [("k", "==", 4)])       # v4
    feed = vt.read_change_feed(spark, table, 1, 4)
    assert feed.columns == ["k", "value", "_change", "_commit_version"]
    got = sorted((r.k, r.value, r._change) for r in feed.collect())
    assert got == [(3, 30, "delete"), (4, 40, "delete")]
    # snapshot diff across the rename compares column-for-column
    diff = vt.changes_between(spark, table, 1, 4)
    assert sorted((r.k, r._change) for r in diff.collect()) == [
        (3, "delete"), (4, "delete")
    ]


def test_constraints_via_new_names(spark, table):
    vt.rename_column(table, "v", "value")
    vt.set_constraints(table, not_null=["value"], checks=[("value", ">=", 0)])
    bad = spark.createDataFrame([(99, -1)], "k: long, value: long")
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(table, bad, num_files=1)
    ok = spark.createDataFrame([(99, 1)], "k: long, value: long")
    vt.append(table, ok, num_files=1)


def test_stream_emits_logical_names(spark, table, tmp_path):
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    vt.rename_column(table, "v", "value")
    vt.append(
        table,
        spark.createDataFrame([(60, 6)], "k: long, value: long"),
        num_files=1,
    )
    spark.dataSource.register(VersionedTableStreamSource)
    sink = tmp_path / "sink"
    (
        spark.readStream.format("versioned_table").load(str(table))
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(str(sink))
    assert set(out.columns) == {"k", "value"}
    got = sorted((r.k, r.value) for r in out.collect())
    assert got == sorted([(i, i * 10) for i in range(20)] + [(60, 6)])


def test_landed_rename_conflicts_with_inflight_append(spark, table):
    base = vt._snapshot_entries(table)
    prep = vt._stage_commit(
        table, base, _rows(spark, [(100, 1)]), "append", 1, None, False, None
    )
    vt.rename_column(table, "v", "value")
    with pytest.raises(vt.ConcurrentModificationError, match="renamed"):
        vt._publish_staged(table, base, prep)
    import shutil

    shutil.rmtree(prep["stage"], ignore_errors=True)


def test_partition_column_rename(spark, tmp_path):
    """Partition columns rename under the mapping (r10 — the r9
    refusal was overly conservative): the physical name stays the hive
    dir key, every surface projects it to the logical name, and
    pruned mutations keep working through the rename."""
    from pyspark.sql import functions as F

    root = tmp_path / "t"
    vt.append(
        root,
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(30)],
            "k: long, region: long, v: long",
        ),
        num_files=1, partition_by=["region"], stats_columns=["k"],
    )
    vt.rename_column(root, "region", "zone")
    snap = vt.read_version(spark, root)
    assert "zone" in snap.columns and "region" not in snap.columns
    assert snap.count() == 30
    # partition pruning through the logical name
    assert vt.read_where(spark, root, [("zone", "==", 1)]).count() == 10
    # appends speak the logical name; the dir key stays physical
    vt.append(
        root,
        spark.createDataFrame([(100, 1, 5)], "k: long, zone: long, v: long"),
        num_files=1,
    )
    newest = vt.history(root)[-1]
    hive = sorted(
        p.name
        for p in (root / "data" / newest["dir"]).iterdir()
        if p.is_dir()
    )
    assert hive == ["region=1"]  # physical name frozen in the layout
    # copy-on-write delete through the renamed partition column
    st = vt.delete_where_pruned(spark, root, [("zone", "==", 2)])
    assert st["committed"] and st["deleted_rows"] == 10
    out = vt.read_version(spark, root)
    assert out.count() == 21
    assert out.filter(F.col("zone") == 2).count() == 0
    # time travel below the rename shows the old name
    assert "region" in vt.read_version(spark, root, 0).columns
