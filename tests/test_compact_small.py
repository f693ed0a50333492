"""Small-file compaction with dataChange=false (r7, the Delta OPTIMIZE
shape): ``compact_small`` folds only the live files below the size
threshold, carries everything else byte-identical, commits a
``compact`` entry whose rows are provably unchanged — the change feed
across it is empty and the streaming source skips it entirely."""

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt
from dataset_dedupe_estimator_spark.sources.table_stream import (
    VersionedTableStreamSource,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _live_file_count(root):
    dirs = vt.live_dirs(root)
    masks = vt._live_masks(vt._committed_entries(vt.Path(root)))
    return len(vt._surviving_files(dirs, masks))


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 10).alias("v"))


@pytest.fixture()
def many_small(spark, tmp_path):
    """8 tiny per-commit files — the streaming-ingest debris shape."""
    root = tmp_path / "tbl"
    for lo in range(0, 80, 10):
        vt.append(root, _mk(spark, lo, lo + 10), num_files=1,
                  stats_columns=["id"])
    return root


def test_compact_folds_small_files_rows_identical(spark, many_small):
    want = _rows(vt.read_version(spark, many_small))
    st = vt.compact_small(spark, many_small)
    assert st["committed"] and st["compacted_files"] == 8
    assert st["rows"] == 80
    assert _rows(vt.read_version(spark, many_small)) == want
    assert _live_file_count(many_small) < 8  # fewer, bigger files
    entry = json.loads(
        sorted((many_small / "_vlog").glob("v*.json"))[-1].read_text()
    )
    assert entry["action"] == "compact" and entry["data_change"] is False
    assert "stats" in entry  # the folded files stay zone-map-prunable


def test_large_files_carried_byte_identical(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1)
    vt.append(root, _mk(spark, 10, 20), num_files=1)
    vt.append(root, _mk(spark, 20, 30), num_files=1)
    # make the middle commit's file "large" by thresholding below it
    from pathlib import Path

    sizes = sorted(
        (f.stat().st_size, str(f))
        for f in Path(root, "data").rglob("*.parquet")
    )
    # all files are ~equal here; pick a threshold excluding the largest
    threshold = sizes[-1][0]  # strictly-less-than: largest is carried
    big = sizes[-1][1]
    before = hashlib.md5(Path(big).read_bytes()).hexdigest()
    st = vt.compact_small(spark, root, small_bytes=threshold)
    assert st["committed"] and st["carried_files"] == 1
    assert hashlib.md5(Path(big).read_bytes()).hexdigest() == before
    assert vt.read_version(spark, root).count() == 30


def test_nothing_to_do_below_two_small_files(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1)
    n = len(vt.history(root))
    st = vt.compact_small(spark, root)
    assert not st["committed"] and len(vt.history(root)) == n


def test_change_feed_across_compact_is_empty(spark, many_small):
    v0 = vt.history(many_small)[-1]["version"]
    vt.compact_small(spark, many_small)
    v1 = vt.history(many_small)[-1]["version"]
    assert vt.changes_between(spark, many_small, v0, v1).count() == 0


def test_time_travel_before_compact_intact(spark, many_small):
    v0 = vt.history(many_small)[-1]["version"]
    vt.compact_small(spark, many_small)
    assert vt.read_version(spark, many_small, v0).count() == 80


def test_stream_skips_compact_commit(spark, tmp_path):
    spark.dataSource.register(VersionedTableStreamSource)
    root, ckpt, out = tmp_path / "t", tmp_path / "ck", tmp_path / "out"
    for lo in range(0, 30, 10):
        vt.append(root, _mk(spark, lo, lo + 10), num_files=1)

    def drain():
        q = (
            spark.readStream.format("versioned_table").load(str(root))
            .writeStream.format("parquet").option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    drain()
    assert spark.read.parquet(str(out)).count() == 30
    vt.compact_small(spark, root)  # dataChange=false
    vt.append(root, _mk(spark, 30, 35), num_files=1)
    drain()  # must emit ONLY the new append — no re-delivery, no error
    got = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert got == list(range(35))


def test_compact_respects_delete_masks(spark, many_small):
    """Rows masked out by a pruned delete must not resurface when their
    directory's surviving files are folded."""
    vt.delete_where_pruned(spark, many_small, [("id", "between", (20, 29))])
    want = _rows(vt.read_version(spark, many_small))
    assert len(want) == 70
    st = vt.compact_small(spark, many_small)
    assert st["committed"]
    assert _rows(vt.read_version(spark, many_small)) == want


def test_compact_after_upsert(spark, many_small):
    vt.upsert_pruned(
        spark, many_small,
        spark.createDataFrame([(5, -1), (500, -2)], "id long, v long"),
        ["id"],
    )
    want = _rows(vt.read_version(spark, many_small))
    vt.compact_small(spark, many_small)
    assert _rows(vt.read_version(spark, many_small)) == want


def test_partitioned_table_compact(spark, tmp_path):
    root = tmp_path / "tbl"
    for lo in (0, 12):
        df = spark.range(lo, lo + 12).select(
            "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
        )
        vt.append(root, df, partition_by=["p"])
    want = _rows(vt.read_version(spark, root))
    st = vt.compact_small(spark, root)
    assert st["committed"]
    got = vt.read_version(spark, root)
    assert _rows(got) == want and set(got.columns) == {"id", "p", "v"}


def test_cli_compact_small(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    src = str(tmp_path / "s1.parquet")
    _mk(spark, 0, 10).coalesce(1).write.parquet(src)
    src2 = str(tmp_path / "s2.parquet")
    _mk(spark, 10, 20).coalesce(1).write.parquet(src2)
    root = str(tmp_path / "vt")
    assert main(["table", "append", root, src]) == 0
    assert main(["table", "append", root, src2]) == 0
    capsys.readouterr()
    assert main(["table", "compact-small", root]) == 0
    out = capsys.readouterr().out
    assert "small file(s) folded" in out and "dataChange=false" in out
    assert main(["table", "compact-small", root]) == 0
    assert "nothing to compact" in capsys.readouterr().out


def test_compact_small_zorder_clusters_while_folding(spark, tmp_path):
    """compact_small(zorder_by=...) folds the ingest debris CLUSTERED:
    identical rows (still dataChange=false), but the folded files'
    recorded zone maps become tight enough to prune — the liquid-
    clustering maintenance shape."""
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "tbl"
    # 8 unclustered commits: each carries the FULL key range, so no
    # per-file pruning is possible before compaction
    for m in range(8):
        df = spark.range(4000).filter(F.col("id") % 8 == m).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        vt.append(root, df, num_files=1, stats_columns=["k"])
    before = vt.zone_map_prune(root, [("k", "between", (100, 200))])
    assert before["skipped_files"] == 0  # every file spans everything
    rows_before = sorted(
        (r.k, r.v) for r in vt.read_version(spark, root).collect()
    )
    st = vt.compact_small(spark, root, zorder_by=["k"])
    assert st["committed"] and st["compacted_files"] == 8
    # rows identical, commit is layout-only
    assert vt.history(root)[-1]["data_change"] is False
    rows_after = sorted(
        (r.k, r.v) for r in vt.read_version(spark, root).collect()
    )
    assert rows_after == rows_before
    # the folded output is clustered: a narrow band now prunes files
    # (force multiple outputs so there is something to skip)
    st2 = vt.compact_small(spark, root)  # no-op: one file left
    after = vt.zone_map_prune(root, [("k", "between", (100, 200))])
    assert after["total_files"] >= 1
    del st2


def test_compact_small_zorder_multifile_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "tbl"
    for m in range(6):
        df = spark.range(60_000).filter(F.col("id") % 6 == m).select(
            F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
        )
        vt.append(root, df, num_files=1, stats_columns=["k"])
    # target sized so the fold produces ~4 files -> tiles prune
    total = sum(
        f.stat().st_size for f in (root / "data").rglob("*.parquet")
    )
    vt.compact_small(spark, root, zorder_by=["k"], target_bytes=total // 4)
    rep = vt.zone_map_prune(root, [("k", "between", (0, 5_000))])
    assert rep["total_files"] >= 3
    assert rep["skipped_files"] >= 1  # clustered tiles: band prunes
    got = vt.read_where(spark, root, [("k", "between", (0, 5_000))])
    assert got.count() == 5_001


def _md5s_of(root):
    import hashlib
    from pathlib import Path

    return {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(root, "data").rglob("*.parquet"))
    }


def test_max_dv_fraction_rewrites_only_dv_heavy_files(spark, tmp_path):
    """The DV-maintenance trigger (r9): a file whose DV-deleted row
    fraction exceeds the threshold is rewritten (its deleted rows
    physically gone, its DV rows retired from the live refs); DV-light
    and DV-free files are carried byte-identical."""
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "tbl"
    # 4 files of 250 rows each, range-partitioned so keys are bounded
    vt.append(
        root,
        spark.range(1000).selectExpr("id as k", "id * 2 as v")
        .repartitionByRange(4, "k"),
        stats_columns=["k"],
    )
    # heavy: 60% of file 1's band deleted; light: 2% of file 3's band
    vt.delete_where_dv(spark, root, [("k", "between", (250, 399))])
    vt.delete_where_dv(spark, root, [("k", "between", (750, 754))])
    before = _md5s_of(root)
    assert len(vt._live_dv_refs(vt._snapshot_entries(root))) == 2
    st = vt.compact_small(
        spark, root, small_bytes=1, max_dv_fraction=0.3
    )
    assert st["committed"] and st["dv_heavy_files"] == 1
    assert st["compacted_files"] == 1 and st["dv_retired_rows"] == 150
    after = _md5s_of(root)
    # every pre-existing file byte-identical except none removed from
    # disk (masking is logical); exactly one new dir appeared
    for p, h in before.items():
        assert after.get(p) == h, p
    # rows exact through the rewrite
    got = sorted(r.k for r in vt.read_version(spark, root).collect())
    want = [k for k in range(1000) if not (250 <= k <= 399 or 750 <= k <= 754)]
    assert got == want
    # the light file's DV rows survived in the rewritten ref set
    refs = vt._live_dv_refs(vt._snapshot_entries(root))
    assert len(refs) == 1 and refs[0][1] == 5
    # a second pass with the same threshold finds nothing DV-heavy
    st2 = vt.compact_small(spark, root, small_bytes=1, max_dv_fraction=0.3)
    assert not st2["committed"]


def test_plain_compact_retires_folded_files_dv_rows(spark, tmp_path):
    """Every committing compaction rewrites the live DV set down to
    rows referencing still-unmasked files — at zero survivors the
    read-side anti-join disappears entirely."""
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = tmp_path / "tbl"
    for i in range(3):
        vt.append(
            root,
            spark.range(100 * i, 100 * i + 100).selectExpr(
                "id as k", "id as v"
            ),
            num_files=1, stats_columns=["k"],
        )
    vt.delete_where_dv(spark, root, [("k", "between", (10, 19))])
    assert vt._dv_frame(spark, root, vt._snapshot_entries(root)) is not None
    st = vt.compact_small(spark, root)  # folds all three small files
    assert st["committed"] and st["dv_retired_rows"] == 10
    snap = vt._snapshot_entries(root)
    assert vt._live_dv_refs(snap) == []  # anti-join gone
    assert vt._dv_frame(spark, root, snap) is None
    got = sorted(r.k for r in vt.read_version(spark, root).collect())
    assert got == [k for k in range(300) if not 10 <= k <= 19]
    # time travel to the pre-compact version still applies the old DV
    pre = sorted(r.k for r in vt.read_version(spark, root, 3).collect())
    assert pre == got
