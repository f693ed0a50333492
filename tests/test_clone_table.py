"""Zero-copy CLONE (sources/versioned.py::clone_table — the Delta
SHALLOW CLONE use case via hard links, so source vacuum can never break
the clone): resolved state materialized into a fresh independent log;
masks folded in, DVs re-keyed, stats/blooms/metadata carried."""

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _df(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "k: long, v: long")


def _read(spark, root, **kw):
    return sorted(
        (r.k, r.v) for r in vt.read_version(spark, root, **kw).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "src"
    vt.append(root, _df(spark, [(i, i * 10) for i in range(10)]),
              num_files=2, stats_columns=["k"], bloom_columns=["k"],
              bloom_bits=4096)
    vt.append(root, _df(spark, [(i, i * 10) for i in range(10, 20)]),
              num_files=2)
    return root


def test_clone_is_zero_copy_and_reads_identically(spark, tmp_path, table):
    dst = tmp_path / "dst"
    st = vt.clone_table(table, dst)
    assert st["copied_files"] == 0 and st["linked_files"] == 4
    assert _read(spark, dst) == _read(spark, table)
    # hard links: same inodes, zero data bytes duplicated
    src_inodes = {
        f.stat().st_ino for f in Path(table, "data").rglob("*.parquet")
    }
    dst_inodes = {
        f.stat().st_ino for f in Path(dst, "data").rglob("*.parquet")
    }
    assert dst_inodes <= src_inodes
    # zone-map + bloom pruning carried over
    rep = vt.zone_map_prune(dst, [("k", "==", 3)])
    assert rep["skipped_files"] > 0


def test_clone_folds_masks_and_rekeys_dvs(spark, tmp_path, table):
    vt.delete_where_pruned(spark, table, [("k", "between", (0, 4))])
    vt.delete_where_dv(spark, table, [("k", "==", 17)])
    dst = tmp_path / "dst"
    st = vt.clone_table(table, dst)
    assert st["dv_sidecars"] == 1 and st["dv_rows"] == 1
    expect = [(i, i * 10) for i in range(5, 20) if i != 17]
    assert _read(spark, dst) == expect
    # the clone is independent: deleting in the clone leaves the source
    vt.delete_where_dv(spark, dst, [("k", "==", 9)])
    assert _read(spark, table) == expect
    assert (9, 90) not in _read(spark, dst)
    # and compaction in the clone physically purges without touching src
    vt.compact_small(spark, dst)
    assert _read(spark, table) == expect


def test_clone_at_version_and_timestamp(spark, tmp_path, table):
    vt.overwrite(table, _df(spark, [(99, 990)]), num_files=1)  # v2
    hist = vt.history(table)
    d1 = tmp_path / "at_v"
    vt.clone_table(table, d1, version=1)
    assert _read(spark, d1) == [(i, i * 10) for i in range(20)]
    d2 = tmp_path / "at_ts"
    vt.clone_table(table, d2, timestamp=hist[0]["ts"])
    assert _read(spark, d2) == [(i, i * 10) for i in range(10)]
    with pytest.raises(ValueError, match="already has committed"):
        vt.clone_table(table, d1)


def test_clone_survives_source_vacuum(spark, tmp_path, table):
    dst = tmp_path / "dst"
    vt.clone_table(table, dst)
    # retire every source version and vacuum it away
    vt.overwrite(table, _df(spark, [(1, 1)]), num_files=1)
    vt.vacuum(table, keep_versions=1)
    # Delta's shallow clone dangles here; hard links keep inodes alive
    assert _read(spark, dst) == [(i, i * 10) for i in range(20)]


def test_clone_carries_schema_metadata_and_constraints(spark, tmp_path, table):
    vt.rename_column(table, "v", "value")
    vt.set_constraints(table, not_null=["k"])
    wide = spark.createDataFrame([(50, 500, 5)], "k: long, value: long, w: long")
    vt.append(table, wide, num_files=1, allow_new_columns=True)
    vt.drop_column(table, "w")
    dst = tmp_path / "dst"
    vt.clone_table(table, dst)
    df = vt.read_version(spark, dst)
    assert df.columns == ["k", "value"]
    det = vt.describe_detail(dst)
    assert det["column_mapping"] == {"value": "v"}
    assert det["dropped_columns"] == ["w"]
    assert det["constraints"] == {"not_null": ["k"], "checks": []}
    # constraint enforced on writes to the clone
    with pytest.raises(ValueError, match="constraint"):
        vt.append(
            dst,
            spark.createDataFrame([(None, 7)], "k: long, value: long"),
            num_files=1,
        )
    # the retired physical name stays retired in the clone
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(
            dst,
            spark.createDataFrame([(60, 600, 6)],
                                  "k: long, value: long, w: long"),
            num_files=1, allow_new_columns=True,
        )


def test_clone_partitioned_table(spark, tmp_path):
    root = tmp_path / "psrc"
    df = spark.createDataFrame(
        [(i, i * 10, f"p{i % 2}") for i in range(8)],
        "k: long, v: long, part: string",
    )
    vt.append(root, df, partition_by=["part"])
    dst = tmp_path / "pdst"
    vt.clone_table(root, dst)
    got = vt.read_version(spark, dst)
    assert sorted((r.k, r.part) for r in got.collect()) == [
        (i, f"p{i % 2}") for i in range(8)
    ]


def test_clone_from_checkpointed_source(spark, tmp_path, monkeypatch):
    """clone_table resolves through the checkpoint+tail path: folded
    entries carry the masks/DV set/mapping on their retained last
    entry, and the clone must come out identical to a raw-log clone."""
    monkeypatch.setattr(vt, "_CKPT_EVERY", 2)
    root = tmp_path / "src"
    vt.append(root, _df(spark, [(i, i * 10) for i in range(10)]),
              num_files=2, stats_columns=["k"])
    vt.append(root, _df(spark, [(i, i * 10) for i in range(10, 20)]),
              num_files=2)
    vt.rename_column(root, "v", "val")
    vt.delete_where_pruned(spark, root, [("k", "between", (0, 4))])
    vt.delete_where_dv(spark, root, [("k", "==", 17)])
    vt.append(root, spark.createDataFrame([(30, 300)], "k: long, val: long"),
              num_files=1)
    assert list((root / "_vlog").glob("ckpt-v*.parquet"))
    want = sorted(
        (r.k, r.val) for r in vt.read_version(spark, root).collect()
    )
    d1 = tmp_path / "via_ckpt"
    vt.clone_table(root, d1)
    got = sorted((r.k, r.val) for r in vt.read_version(spark, d1).collect())
    assert got == want
    assert vt.describe_detail(d1)["column_mapping"] == {"val": "v"}
    # identical clone with every checkpoint deleted (raw-log path)
    for ck in (root / "_vlog").glob("ckpt-v*.parquet"):
        ck.unlink()
    (root / "_vlog" / "_last_checkpoint").unlink(missing_ok=True)
    d2 = tmp_path / "via_raw"
    vt.clone_table(root, d2)
    got2 = sorted(
        (r.k, r.val) for r in vt.read_version(spark, d2).collect()
    )
    assert got2 == want
