"""ANALYZE TABLE statistics (r13, ``versioned.analyze_table`` /
``table_statistics``): column null/NDV/min/max + table rows over the
LIVE snapshot (masks and DVs respected), atomic sidecar persistence,
staleness flag, approx (HLL) mode, rename/unknown-column handling."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


@pytest.fixture()
def tbl(spark, tmp_path):
    root = tmp_path / "t"
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "bb", None), (3, "a", 3.0), (None, "ccc", 4.0)],
        "k bigint, s string, x double",
    )
    vt.append(root, df, stats_columns=["k"])
    return root


def test_analyze_stats_values(spark, tbl):
    st = vt.analyze_table(spark, tbl)
    assert st["rows"] == 4 and st["approx"] is False
    k = st["columns"]["k"]
    assert (k["null_count"], k["ndv"], k["min"], k["max"]) == (1, 3, 1, 3)
    s = st["columns"]["s"]
    assert (s["null_count"], s["ndv"], s["min"], s["max"]) == (0, 3, "a", "ccc")
    assert s["avg_len"] == pytest.approx((1 + 2 + 1 + 3) / 4, abs=1e-4)
    x = st["columns"]["x"]
    assert (x["null_count"], x["ndv"]) == (1, 3)
    assert st["live_files"] >= 1 and st["live_bytes"] > 0


def test_analyze_respects_live_snapshot(spark, tbl):
    """Stats describe the snapshot AFTER deletes — masked rows gone."""
    vt.delete_where_pruned(spark, tbl, [("k", "==", 2)])
    st = vt.analyze_table(spark, tbl, columns=["k"])
    assert st["rows"] == 3
    assert st["columns"]["k"]["ndv"] == 2  # 1, 3 (NULL not counted)


def test_analyze_staleness_flag(spark, tbl):
    vt.analyze_table(spark, tbl)
    assert vt.table_statistics(tbl)["stale"] is False
    vt.append(tbl, spark.createDataFrame([(9, "z", 0.0)], "k bigint, s string, x double"))
    assert vt.table_statistics(tbl)["stale"] is True
    # re-analyze refreshes
    st = vt.analyze_table(spark, tbl)
    assert st["rows"] == 5
    assert vt.table_statistics(tbl)["stale"] is False


def test_analyze_never_analyzed_returns_none(spark, tbl):
    assert vt.table_statistics(tbl) is None


def test_analyze_unknown_column_refuses(spark, tbl):
    with pytest.raises(ValueError, match="not in table schema"):
        vt.analyze_table(spark, tbl, columns=["nope"])


def test_analyze_approx_mode(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, spark.range(5_000).toDF("id"))
    st = vt.analyze_table(spark, root, approx=True)
    assert st["approx"] is True
    ndv = st["columns"]["id"]["ndv"]
    assert abs(ndv - 5_000) / 5_000 < 0.10  # HLL (2% rsd) well within 10%


def test_analyze_renamed_column_speaks_logical(spark, tbl):
    vt.rename_column(tbl, "k", "key_id")
    st = vt.analyze_table(spark, tbl, columns=["key_id"])
    assert st["columns"]["key_id"]["ndv"] == 3


def test_analyze_sidecar_survives_vacuum(spark, tbl):
    vt.analyze_table(spark, tbl)
    vt.overwrite(tbl, vt.read_version(spark, tbl))
    vt.vacuum(tbl, keep_versions=1)
    back = vt.table_statistics(tbl)
    assert back is not None and back["stale"] is True
