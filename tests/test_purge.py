"""Verified physical erasure (r12, ``versioned.purge_where`` — the
GDPR right-to-be-forgotten verb) + the labeled vacuumed-version read
error it leans on."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.cli import main
from dataset_dedupe_estimator_spark.sources import versioned as vt


def _tbl(spark, root, change_feed=False, n=40):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    for m in range(2):
        vt.append(
            root, df.filter(F.col("k") % 2 == m), num_files=1,
            stats_columns=["k"], change_feed=change_feed and m == 0,
        )
    return df


def test_purge_erases_bytes_and_time_travel(spark, tmp_path):
    root = tmp_path / "t"
    _tbl(spark, root)
    st = vt.purge_where(spark, root, [("k", "between", (10, 19))])
    assert st["verified"] and st["purged_rows"] == 10
    got = vt.read_version(spark, root)
    assert got.count() == 30
    assert got.filter(F.col("k").between(10, 19)).count() == 0
    # no parquet file anywhere under the root still holds the band
    leftovers = [str(f) for f in root.rglob("*.parquet")
                 if "_vlog" not in str(f)]
    scan = spark.read.option("mergeSchema", "true").parquet(*leftovers)
    assert scan.filter(F.col("k").between(10, 19)).count() == 0
    # pre-purge versions: log entry retained, data labeled-unreadable
    assert len(vt.history(root)) >= 3
    with pytest.raises(vt.VersionVacuumedError, match="vacuum"):
        vt.read_version(spark, root, 0)


def test_purge_refuses_change_feed_unless_accepted(spark, tmp_path):
    root = tmp_path / "t"
    _tbl(spark, root, change_feed=True)
    vt.delete_where_pruned(spark, root, [("k", "==", 3)])  # writes CDF
    with pytest.raises(ValueError, match="drop_change_data"):
        vt.purge_where(spark, root, [("k", "==", 5)])
    st = vt.purge_where(
        spark, root, [("k", "==", 5)], drop_change_data=True
    )
    assert st["verified"]
    # the CDF files are gone too — no change-data file can resurrect
    # the purged row (or any other: the trade-off is documented)
    assert not list((root / "_cdf").rglob("*.parquet"))


def test_purge_verification_catches_leftovers(spark, tmp_path, monkeypatch):
    """If the physical steps silently failed, purge_where must RAISE,
    never report erasure. Simulate by making vacuum a no-op so the
    superseded pre-purge files survive."""
    root = tmp_path / "t"
    _tbl(spark, root)
    monkeypatch.setattr(vt, "vacuum", lambda *a, **k: [])
    with pytest.raises(RuntimeError, match="verification FAILED"):
        vt.purge_where(spark, root, [("k", "between", (10, 19))])


def test_cli_purge_where(capsys, spark, tmp_path):
    root = tmp_path / "t"
    _tbl(spark, root)
    rc = main([
        "table", "purge-where", str(root), "--where", "k:between:10,19",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "VERIFIED" in out and "purged 10 rows" in out
    assert vt.read_version(spark, root).count() == 30
    # change-feed refusal surfaces as exit 2 with the labeled message
    root2 = tmp_path / "t2"
    _tbl(spark, root2, change_feed=True)
    vt.delete_where_pruned(spark, root2, [("k", "==", 3)])
    rc = main(["table", "purge-where", str(root2), "--where", "k:==:5"])
    err = capsys.readouterr().err
    assert rc == 2 and "drop_change_data" in err


def test_purge_on_renamed_column_probes_physical_names(spark, tmp_path):
    """r13 (advisor): the verification scan must speak the frozen
    PHYSICAL names files store. Pre-fix, purging a renamed column
    raised AnalysisException (unresolvable logical name) AFTER the
    irreversible optimize+vacuum already ran. (The advisor's worse
    swap-rename case — probing the WRONG physical column — cannot even
    be constructed: rename_column refuses a logical name that is the
    physical name of another column.)"""
    root = tmp_path / "t"
    _tbl(spark, root)
    vt.rename_column(root, "k", "doc_id")
    st = vt.purge_where(spark, root, [("doc_id", "between", (10, 19))])
    assert st["verified"] and st["purged_rows"] == 10
    left = vt.read_version(spark, root)
    assert left.count() == 30
    assert left.filter(F.col("doc_id").between(10, 19)).count() == 0


def test_purge_verification_sees_sink_stage_leftovers(spark, tmp_path):
    """r13 (advisor): staged parquet from a hard-killed stream writer
    (younger than vacuum's 24 h stale rule) can still hold the rows —
    verification must scan _sink_stage/ and refuse to report erasure."""
    root = tmp_path / "t"
    df = _tbl(spark, root)
    stage = root / "_sink_stage"
    stage.mkdir()
    df.filter(F.col("k").isin(12, 13)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "staged"))
    import shutil as _sh
    src = next((tmp_path / "staged").glob("*.parquet"))
    _sh.copy(src, stage / "orphan.parquet")
    with pytest.raises(RuntimeError, match="_sink_stage"):
        vt.purge_where(spark, root, [("k", "between", (10, 19))])
