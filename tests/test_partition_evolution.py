"""Partition evolution (sources/versioned.py::set_partitioning — the
Iceberg shape, which Delta lacks): a metadata-only property commit
changes the layout FUTURE commits write; every reader resolves layout
per directory, so mixed-layout tables read/prune/mutate/compact without
any rewrite, and rewrites migrate old directories organically."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _df(spark, rows):
    return spark.createDataFrame(
        sorted(rows), "k: long, v: long, part: string"
    )


def _snap(spark, root, **kw):
    return sorted(
        (r.k, r.v, r.part)
        for r in vt.read_version(spark, root, **kw).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    """v0 unpartitioned, v1 declares partitioning, v2 partitioned."""
    root = tmp_path / "tbl"
    vt.append(root, _df(spark, [(i, i * 10, f"p{i % 2}") for i in range(6)]),
              num_files=2, stats_columns=["k"])
    vt.set_partitioning(root, ["part"])
    vt.append(root, _df(spark, [(i, i * 10, f"p{i % 2}") for i in range(6, 12)]))
    return root


def test_mixed_layout_reads_identically(spark, table):
    want = [(i, i * 10, f"p{i % 2}") for i in range(12)]
    assert _snap(spark, table) == want
    # the partitioned commit really wrote hive dirs; the old one didn't
    dirs = sorted(p.name for p in (table / "data").iterdir())
    assert dirs == ["c00000000", "c00000002"]
    assert list((table / "data" / "c00000002").glob("part=*"))
    assert not list((table / "data" / "c00000000").glob("part=*"))
    # time travel below the evolution still reads
    assert _snap(spark, table, version=0) == want[:6]


def test_metadata_only_and_refusals(spark, table):
    hist = vt.history(table)
    assert hist[1]["action"] == "set_partitioning"
    assert hist[1]["dir"] is None
    with pytest.raises(ValueError, match="not in table schema"):
        vt.set_partitioning(table, ["nope"])
    # same layout: no-op, no commit
    st = vt.set_partitioning(table, ["part"])
    assert st["committed"] is False
    assert len(vt.history(table)) == len(hist)
    det = vt.describe_detail(table)
    assert det["partition_by"] == ["part"]


def test_mutations_across_mixed_layouts(spark, table):
    # pruned delete touches files in BOTH layouts
    vt.delete_where_pruned(spark, table, [("k", "==", 2)])
    vt.delete_where_pruned(spark, table, [("k", "==", 8)])
    # dv delete on the old-layout dir
    vt.delete_where_dv(spark, table, [("k", "==", 3)])
    # upsert replaces a key from each layout era
    ups = _df(spark, [(5, 999, "p1"), (11, 999, "p1")])
    vt.upsert_pruned(spark, table, ups, ["k"])
    final = {r.k: r.v for r in vt.read_version(spark, table).collect()}
    assert 2 not in final and 8 not in final and 3 not in final
    assert final[5] == 999 and final[11] == 999
    assert len(final) == 9


def test_compaction_migrates_to_current_layout(spark, table):
    st = vt.compact_small(spark, table)
    assert st["committed"]
    # the fold wrote under the CURRENT declared layout
    newest = sorted(p.name for p in (table / "data").iterdir())[-1]
    assert list((table / "data" / newest).glob("part=*"))
    assert _snap(spark, table) == [
        (i, i * 10, f"p{i % 2}") for i in range(12)
    ]


def test_unpartition_and_repartition(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _df(spark, [(0, 0, "p0")]), partition_by=["part"],
              num_files=1)
    vt.set_partitioning(root, [])
    vt.append(root, _df(spark, [(1, 10, "p1")]), num_files=1)
    assert _snap(spark, root) == [(0, 0, "p0"), (1, 10, "p1")]
    # new commit stored part physically
    dirs = sorted(p.name for p in (root / "data").iterdir())
    assert not list((root / "data" / dirs[-1]).glob("part=*"))
    # and back again
    vt.set_partitioning(root, ["part"])
    vt.append(root, _df(spark, [(2, 20, "p0")]), num_files=1)
    assert _snap(spark, root) == [
        (0, 0, "p0"), (1, 10, "p1"), (2, 20, "p0")
    ]


def test_evolution_through_fold_stream_and_clone(spark, table, tmp_path,
                                                 monkeypatch):
    # checkpoint fold keeps per-dir layouts + the declared layout
    monkeypatch.setattr(vt, "_CKPT_EVERY", 1)
    vt.append(table, _df(spark, [(20, 200, "p0")]))
    assert list((table / "_vlog").glob("ckpt-v*.parquet"))
    want = [(i, i * 10, f"p{i % 2}") for i in range(12)] + [(20, 200, "p0")]
    assert _snap(spark, table) == want
    # the stream reconstructs partition columns from both layouts
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )
    spark.dataSource.register(VersionedTableStreamSource)
    out, ck = tmp_path / "out", tmp_path / "ck"
    q = (
        spark.readStream.format("versioned_table").load(str(table))
        .writeStream.format("parquet")
        .option("path", str(out)).option("checkpointLocation", str(ck))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.k, r.v, r.part) for r in spark.read.parquet(str(out)).collect()
    )
    assert got == want
    # a clone preserves per-dir layouts AND the declared layout
    dst = tmp_path / "dst"
    vt.clone_table(table, dst)
    assert _snap(spark, dst) == want
    assert vt.describe_detail(dst)["partition_by"] == ["part"]
    vt.append(dst, _df(spark, [(21, 210, "p1")]))
    newest = sorted(p.name for p in (dst / "data").iterdir())[-1]
    assert list((dst / "data" / newest).glob("part=*"))
