"""Key-set DELETE without driver materialization (r13):
``delete_where_keys`` must equal ``delete_where_pruned`` with an
IN-list row-for-row while (a) pruning untouched files via a broadcast
range join against log metadata — carried files stay byte-identical on
disk — and (b) never collecting a single key to the driver (the
APPLY CHANGES delete phase's 100 TB shape: no ``max_delete_keys``
ceiling)."""

import hashlib
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import table_sink as ts
from dataset_dedupe_estimator_spark.sources import versioned as vt


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _file_md5s(root):
    out = {}
    for f in sorted(Path(root).rglob("*.parquet")):
        out[str(f)] = hashlib.md5(f.read_bytes()).hexdigest()
    return out


@pytest.fixture()
def banded(spark, tmp_path):
    """Tight per-commit id ranges so the range join can prove most
    files clean for a narrow key set."""
    root = tmp_path / "tbl"
    for lo in range(0, 100, 20):  # 5 commits x 2 files = 10 files
        df = spark.range(lo, lo + 20).select(
            "id", (F.col("id") * 10).alias("v")
        )
        vt.append(root, df, num_files=2, stats_columns=["id", "v"])
    return root


def test_keys_delete_equals_pruned_delete(spark, banded):
    want = _rows(
        vt.read_version(spark, banded).filter(
            ~F.col("id").isin(30, 31, 32, 33, 34)
        )
    )
    keys = spark.range(30, 35).toDF("id")
    st = vt.delete_where_keys(spark, banded, "id", keys)
    assert st["committed"] and st["deleted_rows"] == 5
    assert _rows(vt.read_version(spark, banded)) == want


def test_keys_delete_prunes_untouched_files(spark, banded):
    before = _file_md5s(banded / "data")
    st = vt.delete_where_keys(
        spark, banded, "id", spark.range(30, 35).toDF("id")
    )
    # keys 30-34 intersect only the [30,39] half of the 20-39 commit —
    # at most both halves of that one commit are rewritten
    assert st["rewritten_files"] <= 2
    assert st["carried_files"] >= 8
    after = _file_md5s(banded / "data")
    carried = [p for p in before if p in after and before[p] == after[p]]
    assert len(carried) >= 8


def test_keys_delete_absent_keys_commits_nothing(spark, banded):
    st = vt.delete_where_keys(
        spark, banded, "id", spark.range(1000, 1100).toDF("id")
    )
    assert st["committed"] is False and st["deleted_rows"] == 0
    # the no-op committed nothing: the next commit is still version+1
    assert vt.read_version(spark, banded).count() == 100


def test_keys_delete_null_keys_never_match(spark, tmp_path):
    root = tmp_path / "t"
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "k bigint, v string"
    )
    vt.append(root, df, stats_columns=["k"])
    keys = spark.createDataFrame([(1,), (None,)], "k bigint")
    st = vt.delete_where_keys(spark, root, "k", keys)
    # only k=1 goes; the NULL key matches nothing, the NULL row survives
    assert st["deleted_rows"] == 1
    got = {(r["k"], r["v"]) for r in vt.read_version(spark, root).collect()}
    assert got == {(None, "b"), (3, "c")}


def test_keys_delete_txn_idempotent(spark, banded):
    st = vt.delete_where_keys(
        spark, banded, "id", spark.range(0, 5).toDF("id"), txn=("app", 7)
    )
    assert st["committed"] and st["deleted_rows"] == 5
    st2 = vt.delete_where_keys(
        spark, banded, "id", spark.range(5, 9).toDF("id"), txn=("app", 7)
    )
    assert st2.get("skipped_duplicate_txn") and st2["committed"] is False
    assert vt.read_version(spark, banded).count() == 95


def test_keys_delete_change_feed_rows(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(
        root,
        spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        stats_columns=["id"], change_feed=True,
    )
    st = vt.delete_where_keys(
        spark, root, "id", spark.createDataFrame([(2,), (5,)], "id bigint")
    )
    cdf = vt.read_change_feed(spark, root, st["version"] - 1, st["version"])
    got = sorted((r["id"], r["_change"]) for r in cdf.collect())
    assert got == [(2, "delete"), (5, "delete")]


def test_keys_delete_keys_frame_column_resolution(spark, banded):
    # single-column frame with a different name is accepted
    st = vt.delete_where_keys(
        spark, banded, "id", spark.range(3).toDF("whatever")
    )
    assert st["deleted_rows"] == 3
    with pytest.raises(ValueError, match="must contain"):
        vt.delete_where_keys(
            spark, banded, "id",
            spark.createDataFrame([(1, 2)], "a bigint, b bigint"),
        )


def test_keys_delete_renamed_column(spark, tmp_path):
    """Logical key name resolves through column mapping to the frozen
    physical name files/stats speak."""
    root = tmp_path / "t"
    vt.append(
        root, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        stats_columns=["id"],
    )
    vt.rename_column(root, "id", "doc_id")
    st = vt.delete_where_keys(
        spark, root, "doc_id", spark.createDataFrame([(4,)], "doc_id bigint")
    )
    assert st["deleted_rows"] == 1
    assert vt.read_version(spark, root).filter("doc_id = 4").count() == 0


def test_keys_delete_no_driver_key_materialization(spark, banded, monkeypatch):
    """The 100 TB pin: with 50k keys, no driver-side action during the
    delete ever materializes more than O(files) rows — the key set
    stays executor-side (collect returns only touched file names)."""
    from pyspark.sql.classic.dataframe import DataFrame

    sizes = []
    orig_collect = DataFrame.collect
    orig_tolocal = DataFrame.toLocalIterator

    def spy_collect(self):
        out = orig_collect(self)
        sizes.append(len(out))
        return out

    def spy_tolocal(self, *a, **k):
        raise AssertionError("toLocalIterator during delete_where_keys")

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    monkeypatch.setattr(DataFrame, "toLocalIterator", spy_tolocal)
    keys = spark.range(50_000).toDF("id")  # 100 present, 49 900 absent
    st = vt.delete_where_keys(spark, banded, "id", keys)
    assert st["committed"] and st["deleted_rows"] == 100
    assert sizes and max(sizes) <= 100  # file names / scalar rows only


def test_apply_changes_over_a_million_net_deletes(spark, tmp_path):
    """The r12 ceiling is gone: a batch netting >1M deleted keys
    applies without refusal and without a driver key list."""
    root = tmp_path / "dst"
    vt.append(
        root,
        spark.range(2_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        stats_columns=["k"],
    )
    fn = ts.apply_changes(root, ["k"], app_id="big")
    batch = (
        spark.range(1_000, 1_001_500)
        .select(
            F.col("id").alias("k"),
            F.lit(0).cast("bigint").alias("v"),
            F.lit("delete").alias("_change"),
            F.lit(1).cast("bigint").alias("_commit_version"),
        )
    )
    fn(batch, 0)  # old code: ValueError 'nets > 1000000 deleted keys'
    # keys 1000..1999 of the 0..1999 table are gone
    assert vt.read_version(spark, root).count() == 1_000
