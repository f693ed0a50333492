"""Small-file compaction (sources/compact.py): many tiny files in, few
target-sized files out, rows preserved; sort-clustered variant leaves
row-group min/max stats that would prune range scans."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources.compact import (
    compact_parquet,
    plan_compaction,
)


def _make_small_files(spark, path, n_files=24):
    (
        spark.range(24_000)
        .withColumn("k", F.col("id") % 97)
        .withColumn("payload", F.md5(F.col("id").cast("string")))
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src, dest = str(tmp_path / "small"), str(tmp_path / "compacted")
    _make_small_files(spark, src)
    _df, n_in, bytes_in, _n_out = plan_compaction(spark, src, target_mb=128)
    assert n_in == 24 and bytes_in > 0
    summary = compact_parquet(spark, src, dest, target_mb=128)
    assert summary["files_in"] == 24
    assert summary["files_out"] == 1  # tiny dataset fits one target file
    assert summary["rows"] == 24_000
    back = spark.read.parquet(dest)
    assert back.count() == 24_000
    assert set(back.columns) == {"id", "k", "payload"}


def test_sorted_compaction_clusters_rowgroup_stats(spark, tmp_path):
    import glob

    src, dest = str(tmp_path / "small2"), str(tmp_path / "clustered")
    _make_small_files(spark, src)
    compact_parquet(spark, src, dest, target_mb=0.05, sort_by=["id"])
    files = sorted(glob.glob(f"{dest}/*.parquet"))
    assert len(files) > 1  # sub-MB target splits this dataset
    # range partitioning on id ⇒ per-file id ranges are disjoint, so a
    # range predicate prunes whole files via footer stats
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = list(md.schema.names).index("id")
        mins = [md.row_group(r).column(col).statistics.min for r in range(md.num_row_groups)]
        maxs = [md.row_group(r).column(col).statistics.max for r in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint id ranges across files


def test_self_compaction_refused(spark, tmp_path):
    import pytest

    src = str(tmp_path / "selfc")
    _make_small_files(spark, src, n_files=2)
    with pytest.raises(ValueError, match="overlaps"):
        compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="overlaps"):
        compact_parquet(spark, src, src + "/nested")
    with pytest.raises(ValueError, match="overlaps"):
        compact_parquet(spark, src + "/part", src)


def test_empty_listing_refused(spark, tmp_path):
    import pytest

    src = str(tmp_path / "emptydir")
    # a directory Spark can open (has _SUCCESS-like content) but holds no
    # parquet bytes must raise, not silently plan a 1-file rewrite
    (tmp_path / "emptydir").mkdir()
    (tmp_path / "emptydir" / "notdata.txt").write_text("x")
    with pytest.raises(Exception):
        plan_compaction(spark, src)


def test_hadoop_listing_matches_os_walk(spark, tmp_path):
    import os

    from dataset_dedupe_estimator_spark.sources.compact import list_parquet_files

    src = str(tmp_path / "listing")
    _make_small_files(spark, src, n_files=4)
    listed = list_parquet_files(spark, src)
    walked = {
        os.path.join(root, fn): os.path.getsize(os.path.join(root, fn))
        for root, _d, files in os.walk(src)
        for fn in files
        if fn.endswith(".parquet")
    }
    assert len(listed) == len(walked) == 4
    assert sorted(sz for _p, sz in listed) == sorted(walked.values())


def test_zorder_compaction_prunes_both_columns(spark, tmp_path):
    """Z-order clustering: per-file min/max spans shrink on BOTH keys,
    so range predicates on either column prune files (a single-key sort
    only clusters its first key)."""
    import glob

    src = str(tmp_path / "zsrc")
    (
        spark.range(40_000)
        .selectExpr(
            "pmod(hash(id), 1000) AS a",
            "pmod(hash(id + 7), 1000) AS b",
            "md5(cast(id AS string)) AS payload",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(src)
    )

    def spans(dest):
        out = {"a": [], "b": []}
        for f in sorted(glob.glob(f"{dest}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            for col in ("a", "b"):
                ci = list(md.schema.names).index(col)
                mins = [md.row_group(r).column(ci).statistics.min for r in range(md.num_row_groups)]
                maxs = [md.row_group(r).column(ci).statistics.max for r in range(md.num_row_groups)]
                out[col].append((max(maxs) - min(mins)) / 1000.0)
        return {c: sum(v) / len(v) for c, v in out.items()}

    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    compact_parquet(spark, src, plain, target_mb=0.1)
    s = compact_parquet(spark, src, zed, target_mb=0.1, zorder_by=["a", "b"])
    assert s["files_out"] > 4  # enough files for pruning to mean anything
    sp, sz = spans(plain), spans(zed)
    # round-robin files span ~the whole domain on both keys; z-ordered
    # files span a fraction of it on both
    assert sp["a"] > 0.9 and sp["b"] > 0.9
    assert sz["a"] < 0.6 and sz["b"] < 0.6, sz
    # no helper column leaks into the output
    assert "_zorder" not in spark.read.parquet(zed).columns


def test_zorder_rejects_bad_args(spark, tmp_path):
    import pytest

    src = str(tmp_path / "zargs")
    _make_small_files(spark, src, n_files=2)
    with pytest.raises(ValueError, match="not both"):
        compact_parquet(spark, src, str(tmp_path / "o1"), sort_by=["id"], zorder_by=["id", "k"])
    with pytest.raises(ValueError, match="exactly two"):
        compact_parquet(spark, src, str(tmp_path / "o2"), zorder_by=["id"])
