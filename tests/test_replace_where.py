"""Atomic predicate-scoped overwrite (r13, ``versioned.replace_where``
— the Delta replaceWhere / dynamic-partition-backfill shape): one
commit swaps the matching slice for the supplied rows, zone maps bound
the rewrite to touched files, out-of-scope rows refuse, CDF records
delete+insert, and time travel still sees the pre-replace slice."""

import hashlib
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

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
    root = tmp_path / "tbl"
    for lo in range(0, 100, 20):  # 5 commits x 2 files
        df = spark.range(lo, lo + 20).select(
            "id", (F.col("id") * 10).alias("v")
        )
        vt.append(root, df, num_files=2, stats_columns=["id", "v"])
    return root


def test_replace_where_swaps_the_slice_atomically(spark, banded):
    new = spark.range(20, 40).select("id", (F.col("id") * 1000).alias("v"))
    st = vt.replace_where(spark, banded, new, [("id", "between", (20, 39))])
    assert st["committed"] and st["replaced_rows"] == 20
    assert st["inserted_rows"] == 20
    got = vt.read_version(spark, banded)
    assert got.count() == 100
    assert got.filter("id between 20 and 39").agg(
        F.min("v"), F.max("v")
    ).head()[:] == (20_000, 39_000)
    assert got.filter("id < 20 or id > 39").filter("v >= 1000").count() == 0


def test_replace_where_can_resize_the_slice(spark, banded):
    # a backfill may legitimately produce a different row count
    new = spark.range(20, 25).select("id", (F.col("id") * 1000).alias("v"))
    st = vt.replace_where(spark, banded, new, [("id", "between", (20, 39))])
    assert st["replaced_rows"] == 20 and st["inserted_rows"] == 5
    assert vt.read_version(spark, banded).count() == 85


def test_replace_where_prunes_untouched_files(spark, banded):
    before = _file_md5s(banded / "data")
    new = spark.range(20, 40).select("id", (F.col("id") * 1000).alias("v"))
    st = vt.replace_where(spark, banded, new, [("id", "between", (20, 39))])
    assert st["rewritten_files"] == 2
    assert st["carried_files"] == 8
    after = _file_md5s(banded / "data")
    carried = [p for p in before if p in after and before[p] == after[p]]
    assert len(carried) >= 8


def test_replace_where_refuses_out_of_scope_rows(spark, banded):
    smuggle = spark.range(20, 41).select("id", F.lit(0).alias("v"))
    with pytest.raises(ValueError, match="do not match"):
        vt.replace_where(spark, banded, smuggle, [("id", "between", (20, 39))])
    # NULL predicate column never matches -> refused too
    nulls = spark.createDataFrame([(None, 0)], "id bigint, v bigint")
    with pytest.raises(ValueError, match="do not match"):
        vt.replace_where(spark, banded, nulls, [("id", "between", (20, 39))])
    # nothing committed by the refusals
    assert vt.read_version(spark, banded).count() == 100


def test_replace_where_time_travel_and_change_feed(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(
        root,
        spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        stats_columns=["id"], change_feed=True,
    )
    new = spark.range(2, 5).select("id", F.lit(7).alias("v"))
    st = vt.replace_where(spark, root, new, [("id", "between", (2, 4))])
    # time travel below the replace still sees the old slice
    old = vt.read_version(spark, root, version=st["version"] - 1)
    assert _rows(old.filter("id between 2 and 4").select("v")) == [
        (20,), (30,), (40,)
    ]
    # CDF: the replaced rows as deletes, the new rows as inserts
    cdf = vt.read_change_feed(spark, root, st["version"] - 1, st["version"])
    got = sorted((r["id"], r["_change"], r["v"]) for r in cdf.collect())
    assert got == [
        (2, "delete", 20), (2, "insert", 7),
        (3, "delete", 30), (3, "insert", 7),
        (4, "delete", 40), (4, "insert", 7),
    ]


def test_replace_where_txn_idempotent(spark, banded):
    new = spark.range(0, 20).select("id", F.lit(1).alias("v"))
    st = vt.replace_where(
        spark, banded, new, [("id", "<", 20)], txn=("app", 3)
    )
    assert st["committed"]
    st2 = vt.replace_where(
        spark, banded, new, [("id", "<", 20)], txn=("app", 3)
    )
    assert st2.get("skipped_duplicate_txn") and st2["committed"] is False
    assert vt.read_version(spark, banded).filter("v = 1").count() == 20


def test_replace_where_streaming_source_stops_without_ignore_changes(
    registered, tmp_path
):
    """A replace is a rewriting commit: the streaming source must stop
    with the rewrite error unless ignoreChanges accepts re-delivery."""
    spark = registered
    root = tmp_path / "t"
    vt.append(root, spark.range(10).toDF("id"), stats_columns=["id"])
    vt.replace_where(
        spark, root,
        spark.range(0, 3).toDF("id"), [("id", "<", 3)],
    )
    q = (
        spark.readStream.format("versioned_table")
        .load(str(root))
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="ignoreChanges|rewrit"):
        q.awaitTermination()


@pytest.fixture()
def registered(spark):
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    return spark
