"""Versioned tables: time travel, commit atomicity, crash orphans, vacuum.

The reproducibility contract under test: a committed version's content
never changes — appends and overwrites after it, crashed commits, and
vacuum (within retention) all leave historical reads byte-identical.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.plans._index_lock import (
    ConcurrentWriterError,
)
from dataset_dedupe_estimator_spark.sources import versioned as vt


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 10).alias("v"))


@pytest.fixture()
def table(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(root, _mk(spark, 0, 10), num_files=1)          # v0
    vt.append(root, _mk(spark, 10, 15), num_files=1)         # v1
    vt.overwrite(root, _mk(spark, 100, 103), num_files=1)    # v2
    return root


def test_time_travel_reads(spark, table):
    assert sorted(r.id for r in vt.read_version(spark, table, 0).collect()) == list(range(10))
    assert sorted(r.id for r in vt.read_version(spark, table, 1).collect()) == list(range(15))
    assert sorted(r.id for r in vt.read_version(spark, table, 2).collect()) == [100, 101, 102]
    # default = latest
    assert vt.read_version(spark, table).count() == 3


def test_history_and_missing_version(spark, table):
    h = vt.history(table)
    assert [e["version"] for e in h] == [0, 1, 2]
    assert [e["action"] for e in h] == ["append", "append", "overwrite"]
    with pytest.raises(vt.VersionNotFoundError):
        vt.read_version(spark, table, 99)


def test_append_after_overwrite(spark, table):
    vt.append(table, _mk(spark, 200, 202), num_files=1)      # v3
    assert sorted(r.id for r in vt.read_version(spark, table, 3).collect()) == [
        100, 101, 102, 200, 201,
    ]
    # v1 is untouched by everything after it
    assert vt.read_version(spark, table, 1).count() == 15


def test_schema_mismatch_rejected(spark, table):
    bad = spark.range(5).select("id", F.lit("x").alias("other"))
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.append(table, bad)
    assert [e["version"] for e in vt.history(table)] == [0, 1, 2]


def test_crash_orphan_is_invisible_and_vacuumed(spark, table):
    # simulate a writer that crashed after writing data, before commit
    orphan = table / "data" / "c00000099"
    _mk(spark, 0, 3).coalesce(1).write.parquet(str(orphan))
    assert vt.read_version(spark, table).count() == 3  # not resolved
    removed = vt.vacuum(table, keep_versions=10)
    assert "c00000099" in removed
    assert vt.read_version(spark, table, 0).count() == 10  # history intact


def test_vacuum_retires_old_versions_keeps_retained(spark, table):
    removed = vt.vacuum(table, keep_versions=1)
    # v2 was an overwrite: only c0/c1 are unreachable from the latest
    assert sorted(removed) == ["c00000000", "c00000001"]
    assert vt.read_version(spark, table, 2).count() == 3
    # vacuumed versions stay in history but are no longer readable
    assert [e["version"] for e in vt.history(table)] == [0, 1, 2]
    with pytest.raises(Exception):
        vt.read_version(spark, table, 0).collect()


def test_optimize_compacts_preserving_history(spark, table):
    entry = vt.optimize(spark, table, num_files=1)
    assert entry["version"] == 3 and entry["action"] == "overwrite"
    # latest content unchanged by the rewrite
    assert sorted(r.id for r in vt.read_version(spark, table).collect()) == [100, 101, 102]
    assert vt.live_dirs(table) == [str(table / "data" / "c00000003")]
    # every historical version still reads exactly as before
    assert vt.read_version(spark, table, 1).count() == 15


def test_optimize_zorder_tightens_footers(spark, tmp_path):
    from dataset_dedupe_estimator_spark.operators.layout import rowgroup_ranges

    root = tmp_path / "zt"
    df = spark.range(20_000).select(
        "id",
        (F.xxhash64("id") % 512).alias("a"),
        (F.xxhash64("id", F.lit(7)) % 512).alias("b"),
    ).select("id", F.abs("a").alias("a"), F.abs("b").alias("b"))
    vt.append(root, df, num_files=8)
    before = rowgroup_ranges(vt.live_dirs(root)[0], "a")
    vt.optimize(spark, root, zorder_by=["a", "b"], num_files=32)
    after_dir = vt.live_dirs(root)[0]
    after = rowgroup_ranges(after_dir, "a")
    span = lambda rs: sum(mx - mn for mn, mx in rs) / len(rs)  # noqa: E731
    assert span(after) < 0.5 * span(before)
    assert vt.read_version(spark, root).count() == 20_000


def test_cli_table_lifecycle(capsys, spark, tmp_path, sf_dir):
    from dataset_dedupe_estimator_spark.cli import main

    root = str(tmp_path / "t")
    src = f"{sf_dir}/region.parquet"
    assert main(["table", "append", root, src]) == 0
    assert main(["table", "overwrite", root, src, "--files", "1"]) == 0
    assert main(["table", "history", root]) == 0
    assert main(["table", "read", root, "--version", "0"]) == 0
    assert main(["table", "optimize", root, "--zorder-by", "r_regionkey", "--files", "1"]) == 0
    assert main(["table", "vacuum", root, "--keep", "1"]) == 0
    out = capsys.readouterr().out
    assert "committed v0 (append" in out and "committed v1 (overwrite" in out
    assert "v0: rows=" in out
    assert "optimize: z-ordered by ['r_regionkey']" in out
    assert "removed 2 data dirs: c00000000, c00000001" in out


def test_partitioned_commits_prune(spark, tmp_path):
    root = tmp_path / "pt"
    df = spark.range(100).select(
        "id", (F.col("id") % 4).alias("bucket"), (F.col("id") * 2).alias("v")
    )
    vt.append(root, df, partition_by=["bucket"])
    vt.append(root, df.withColumn("id", F.col("id") + 100))
    # later commits inherit the table's partitioning
    assert vt.history(root)[-1]["partition_by"] == ["bucket"]
    got = vt.read_version(spark, root).filter(F.col("bucket") == 2)
    assert got.count() == 50
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan
    with pytest.raises(ValueError, match="partitioning mismatch"):
        vt.append(root, df, partition_by=["v"])


def test_schema_widening_reads_null_for_old_commits(spark, tmp_path):
    root = tmp_path / "sw"
    vt.append(root, _mk(spark, 0, 3), num_files=1)
    widened = _mk(spark, 3, 5).withColumn("extra", F.lit("x"))
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.append(root, widened, num_files=1)
    vt.append(root, widened, num_files=1, allow_new_columns=True)
    assert vt.history(root)[-1]["added_columns"] == ["extra"]
    latest = vt.read_version(spark, root)
    assert latest.columns == ["id", "v", "extra"]
    rows = {r.id: r.extra for r in latest.collect()}
    assert rows[0] is None and rows[4] == "x"
    # an incoming frame may never silently narrow the schema
    # (dropping a column is its own auditable commit: drop_column)
    with pytest.raises(ValueError, match="drop_column"):
        vt.append(root, _mk(spark, 5, 6).select("id"), allow_new_columns=True)
    # the v0 snapshot keeps its original two-column schema
    assert vt.read_version(spark, root, 0).columns == ["id", "v"]


def test_upsert_and_delete(spark, tmp_path):
    root = tmp_path / "up"
    vt.append(root, _mk(spark, 0, 5), num_files=1)
    updates = spark.createDataFrame([(3, 999), (7, 777)], "id: long, v: long")
    vt.upsert(spark, root, updates, ["id"], num_files=1)
    got = {r.id: r.v for r in vt.read_version(spark, root).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 999, 4: 40, 7: 777}
    vt.delete_where(spark, root, F.col("id") % 2 == 1, num_files=1)
    assert sorted(r.id for r in vt.read_version(spark, root).collect()) == [0, 2, 4]
    # time travel: the pre-upsert version is untouched
    assert {r.id: r.v for r in vt.read_version(spark, root, 0).collect()}[3] == 30


def test_changes_between_feeds_mv_refresh(spark, tmp_path):
    """CDF rows map 1:1 onto the MV changelog contract: refreshing the
    v0-state MV with the diff equals aggregating v2 from scratch."""
    from dataset_dedupe_estimator_spark.operators.matview import (
        COUNT_COL,
        additive_state,
        merge_states,
    )

    root = tmp_path / "cdf"
    vt.append(root, _mk(spark, 0, 6), num_files=1)                 # v0
    updates = spark.createDataFrame([(2, 222), (9, 90)], "id: long, v: long")
    vt.upsert(spark, root, updates, ["id"], num_files=1)           # v1
    vt.delete_where(spark, root, F.col("id") == 0, num_files=1)    # v2

    feed = vt.changes_between(spark, root, 0, 2)
    got = {(r.id, r._change, r._n) for r in feed.collect()}
    assert got == {
        (9, "insert", 1), (2, "insert", 1), (2, "delete", 1), (0, "delete", 1),
    }

    keys = ["grp"]
    measures = {"s": F.col("v")}
    grp = lambda df: df.withColumn("grp", F.col("id") % 2)  # noqa: E731
    sign = (
        F.when(F.col("_change") == "insert", 1).otherwise(-1) * F.col("_n")
    )
    mv = merge_states(
        [
            additive_state(grp(vt.read_version(spark, root, 0)), keys, measures),
            additive_state(grp(feed), keys, measures, sign=sign),
        ],
        keys,
    )
    scratch = additive_state(grp(vt.read_version(spark, root, 2)), keys, measures)
    as_dict = lambda df: {r.grp: (r[COUNT_COL], r.s) for r in df.collect()}  # noqa: E731
    assert as_dict(mv) == as_dict(scratch)


def test_changes_between_counts_duplicate_rows(spark, tmp_path):
    """Tables are multisets: a second append of an identical row must
    surface in the feed with its multiplicity (a set-based anti-join
    would return an empty diff and silently corrupt downstream MVs)."""
    root = tmp_path / "dup"
    row = [(1, 10)]
    vt.append(root, spark.createDataFrame(row, "k: long, v: long"), num_files=1)
    vt.append(root, spark.createDataFrame(row * 2, "k: long, v: long"), num_files=1)
    feed = vt.changes_between(spark, root, 0, 1).collect()
    assert [(r.k, r.v, r._change, r._n) for r in feed] == [(1, 10, "insert", 2)]


def test_register_view_pins_snapshot(spark, tmp_path):
    root = tmp_path / "rv"
    vt.append(root, _mk(spark, 0, 4), num_files=1)
    vt.register_view(spark, root, "snap_v0")
    vt.append(root, _mk(spark, 4, 8), num_files=1)
    # the view still reads the version resolved at registration time
    assert spark.sql("SELECT COUNT(*) AS n FROM snap_v0").first().n == 4
    vt.register_view(spark, root, "snap_latest")
    assert spark.sql("SELECT COUNT(*) AS n FROM snap_latest").first().n == 8
    spark.catalog.dropTempView("snap_v0")
    spark.catalog.dropTempView("snap_latest")


def test_streaming_ingest_commits_per_batch(spark, tmp_path):
    """foreachBatch append = one commit per microbatch: arrivals become
    auditable versions, and a time-travel read reproduces the table as
    of any batch. Checkpoint dedupes across restarts, so a second run
    with no new files commits nothing."""
    src = tmp_path / "arrivals"
    src.mkdir()
    root = tmp_path / "tbl"
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v long"

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda batch, _id: vt.append(root, batch, num_files=1)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for lo, hi in ((0, 5), (5, 9)):
        _mk(spark, lo, hi).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert [e["version"] for e in vt.history(root)] == [0, 1]
    assert vt.read_version(spark, root, 0).count() in (4, 5)  # one file each
    assert vt.read_version(spark, root, 1).count() == 9
    run_stream()  # no new files -> no new commits
    assert [e["version"] for e in vt.history(root)] == [0, 1]
    _mk(spark, 9, 12).coalesce(1).write.mode("append").parquet(str(src))
    run_stream()
    assert vt.read_version(spark, root).count() == 12
    assert vt.read_version(spark, root, 1).count() == 9  # history stable


def test_cli_sql_versioned_table_view(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    root = str(tmp_path / "t")
    vt.append(root, _mk(spark, 0, 7), num_files=1)
    vt.overwrite(root, _mk(spark, 0, 3), num_files=1)
    rc = main([
        "sql", "SELECT COUNT(*) AS n FROM snap", "--table", f"snap={root}@0",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "|7|" in out.replace(" ", "")
    spark.catalog.dropTempView("snap")


def test_commit_is_exclusive_per_version(spark, tmp_path):
    root = tmp_path / "tbl2"
    vt.append(root, _mk(spark, 0, 2), num_files=1)
    # forge a pre-existing entry for the next version: the O_EXCL-style
    # link must refuse to double-commit even if the lock were bypassed
    entry = vt._entry_path(root, 1)
    entry.write_text(json.dumps({"version": 1, "action": "append",
                                 "dir": "c00000001", "columns": ["id", "v"],
                                 "ts": 0}))
    with pytest.raises(RuntimeError, match="already committed"):
        vt._commit(root, {"version": 1, "action": "append",
                          "dir": "cX", "columns": ["id", "v"], "ts": 0})


@pytest.mark.slow
def test_writer_lock_held_during_commit(spark, tmp_path):
    root = tmp_path / "tbl3"
    vt.append(root, _mk(spark, 0, 2), num_files=1)
    lock = root / "_writer.lock"
    lock.write_text("pid=99999999\nhost=elsewhere\n")  # live foreign lock
    try:
        with pytest.raises(ConcurrentWriterError):
            vt.append(root, _mk(spark, 2, 4), num_files=1)
    finally:
        os.unlink(lock)
    vt.append(root, _mk(spark, 2, 4), num_files=1)  # recovers after release
    assert vt.read_version(spark, root).count() == 4


# ---------------------------------------------------------------- zone maps


def _ranged(spark, lo, hi, files):
    """`files` parquet files each holding a disjoint contiguous id range
    (repartitionByRange on id), so zone maps have real pruning power."""
    df = spark.range(lo, hi).select(
        "id", (F.col("id") % 7).cast("double").alias("score")
    )
    return df.repartitionByRange(files, "id")


def test_stats_columns_recorded_per_file(spark, tmp_path):
    root = tmp_path / "zt"
    entry = vt.append(root, _ranged(spark, 0, 1000, 4), stats_columns=["id"])
    assert entry["stats_columns"] == ["id"]
    stats = entry["stats"]
    assert len(stats) == 4
    spans = sorted((v["id"][0], v["id"][1]) for v in stats.values())
    # disjoint, covering 0..999
    assert spans[0][0] == 0 and spans[-1][1] == 999
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b


def test_stats_columns_inherited_by_later_commits(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 100, 2), stats_columns=["id"])
    e1 = vt.append(root, _ranged(spark, 100, 200, 2))  # no explicit stats
    assert e1["stats_columns"] == ["id"]
    assert len(e1["stats"]) == 2


def test_stats_columns_validation(spark, tmp_path):
    root = tmp_path / "zt"
    df = spark.range(10).select(
        "id", F.lit("x").alias("s"), (F.col("id") % 2).alias("p")
    )
    with pytest.raises(ValueError, match="not in commit schema"):
        vt.append(root, df, stats_columns=["nope"])
    with pytest.raises(ValueError, match="string"):
        vt.append(root, df, stats_columns=["s"])
    with pytest.raises(ValueError, match="partition column"):
        vt.append(root, df, partition_by=["p"], stats_columns=["p"])


def test_zone_map_prune_skips_files(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 1000, 8), stats_columns=["id"])
    rep = vt.zone_map_prune(root, [("id", "between", (0, 100))])
    assert rep["total_files"] == 8
    assert rep["kept_files"] < 8 and rep["skipped_files"] >= 6
    assert rep["skip_fraction"] == rep["skipped_files"] / 8
    # equality probe touches exactly one file
    rep1 = vt.zone_map_prune(root, [("id", "==", 500)])
    assert rep1["kept_files"] == 1
    # provably-empty predicate keeps nothing
    rep0 = vt.zone_map_prune(root, [("id", ">", 10_000)])
    assert rep0["kept_files"] == 0


def test_zone_map_prune_keeps_statless_commits(spark, tmp_path):
    root = tmp_path / "zt"
    # first commit predates stats; second carries them
    vt.append(root, _ranged(spark, 0, 100, 2))
    vt.append(root, _ranged(spark, 1000, 2000, 4), stats_columns=["id"])
    rep = vt.zone_map_prune(root, [("id", "<", 50)])
    # both statless files stay (as whole dirs), all 4 stats files pruned
    assert rep["dirs"] and rep["files"] == []
    assert rep["total_files"] == 6 and rep["kept_files"] == 2


def test_read_where_matches_filtered_read_version(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 500, 4), stats_columns=["id"])
    vt.append(root, _ranged(spark, 500, 1000, 4))
    for preds, expr in [
        ([("id", "between", (100, 250))], F.col("id").between(100, 250)),
        ([("id", ">=", 900)], F.col("id") >= 900),
        ([("id", "==", 7)], F.col("id") == 7),
        ([("id", "<", 60), ("score", ">=", 3.0)],
         (F.col("id") < 60) & (F.col("score") >= 3.0)),
    ]:
        got = sorted(r.id for r in vt.read_where(spark, root, preds).collect())
        want = sorted(
            r.id for r in vt.read_version(spark, root).filter(expr).collect()
        )
        assert got == want and want, preds


def test_read_where_empty_prune_returns_empty_with_schema(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 100, 2), stats_columns=["id"])
    out = vt.read_where(spark, root, [("id", ">", 10_000)])
    assert out.columns == ["id", "score"]
    assert out.count() == 0


def test_read_where_partitioned_keeps_partition_columns(spark, tmp_path):
    root = tmp_path / "zt"
    df = spark.range(400).select(
        "id",
        (F.col("id") % 4).cast("string").alias("src"),
    ).repartitionByRange(4, "id")
    vt.append(root, df, partition_by=["src"], stats_columns=["id"])
    out = vt.read_where(spark, root, [("id", "<", 100)])
    assert set(out.columns) == {"id", "src"}
    rows = out.collect()
    assert sorted(r.id for r in rows) == list(range(100))
    assert all(r.src is not None for r in rows)


def test_read_where_time_travel(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 100, 2), stats_columns=["id"])
    vt.overwrite(root, _ranged(spark, 500, 600, 2))
    got = sorted(
        r.id for r in vt.read_where(spark, root, [("id", "<", 50)], version=0).collect()
    )
    assert got == list(range(50))
    assert vt.read_where(spark, root, [("id", "<", 50)]).count() == 0


def test_optimize_zorder_with_stats_maximizes_skip(spark, tmp_path):
    root = tmp_path / "zt"
    # ingest unsorted: zone maps nearly useless (every file spans ~full range)
    df = spark.range(20_000).select(
        (F.col("id") * 2654435761 % 20_000).alias("k"),
        F.col("id").alias("v"),
    )
    vt.append(root, df.repartition(8), stats_columns=["k"])
    before = vt.zone_map_prune(root, [("k", "between", (0, 1000))])
    vt.optimize(spark, root, zorder_by=["k"], num_files=8)
    after = vt.zone_map_prune(root, [("k", "between", (0, 1000))])
    assert before["skip_fraction"] == 0.0
    assert after["skip_fraction"] >= 0.5
    # correctness unchanged
    n = vt.read_where(spark, root, [("k", "between", (0, 1000))]).count()
    assert n == spark.range(20_000).select(
        (F.col("id") * 2654435761 % 20_000).alias("k")
    ).filter(F.col("k").between(0, 1000)).count()


def test_zone_map_bad_predicate_rejected(spark, tmp_path):
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 10, 1), stats_columns=["id"])
    with pytest.raises(ValueError, match="predicate"):
        vt.zone_map_prune(root, [("id", "!=", 3)])


def test_cli_table_zone_maps(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    src = str(tmp_path / "src.parquet")
    spark.range(1000).select("id", (F.col("id") % 5).alias("g")).repartitionByRange(
        4, "id"
    ).write.parquet(src)
    root = str(tmp_path / "vt")
    assert main(["table", "append", root, src, "--stats-columns", "id"]) == 0
    assert "zone maps on ['id']" in capsys.readouterr().out
    assert main(["table", "read", root, "--where", "id:between:0,100"]) == 0
    out = capsys.readouterr().out
    assert "rows=101" in out and "skipped" in out
    assert main(["table", "read", root, "--where", "id:>=:990"]) == 0
    assert "rows=10" in capsys.readouterr().out


def test_read_where_after_schema_widening(spark, tmp_path):
    """Zone-map pruned reads across a widening: pre-widening files lack
    the new column (NULL on read) and their stats omit it — the pruned
    result must still equal the plain filtered snapshot."""
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 200, 2), stats_columns=["id"])
    widened = _ranged(spark, 200, 400, 2).withColumn(
        "extra", (F.col("id") * 2).cast("long")
    )
    vt.append(root, widened, allow_new_columns=True)
    got = vt.read_where(spark, root, [("id", "between", (150, 250))])
    want = vt.read_version(spark, root).filter(F.col("id").between(150, 250))
    assert sorted((r.id, r.extra) for r in got.collect()) == sorted(
        (r.id, r.extra) for r in want.collect()
    )
    # pre-widening rows surface NULL extra through the pruned path too
    assert got.filter(F.col("extra").isNull()).count() == 50


def test_zone_map_prune_property(spark, tmp_path):
    """Property: for random committed range layouts and random
    predicates, read_where row-sets equal read_version().filter() and
    pruning never drops a needed file. Driven data-parametrically (one
    table, many predicates) to keep Spark session cost sane."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 300, 3), stats_columns=["id"])
    vt.append(root, _ranged(spark, 300, 700, 4))
    vt.append(root, _ranged(spark, 650, 900, 2))  # overlapping commit
    full = {r.id for r in vt.read_version(spark, root).collect()}

    ops = st.sampled_from(["==", "<", "<=", ">", ">="])
    val = st.integers(min_value=-50, max_value=950)

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(op=ops, v=val)
    def check(op, v):
        import operator as _op

        py = {"==": _op.eq, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}[op]
        got = {r.id for r in vt.read_where(spark, root, [("id", op, v)]).collect()}
        want = {x for x in full if py(x, v)}
        assert got == want

    check()


def test_read_where_widened_column_fully_pruned(spark, tmp_path):
    """Predicate on a widened column when EVERY file that carries it is
    pruned: pre-widening files lack the column (kept — no stats for it),
    the post-widening files all miss the range. The read must surface
    the missing column as NULL (dropped by the null-rejecting predicate)
    instead of failing analysis — row-equal to the plain filtered read."""
    root = tmp_path / "zt"
    vt.append(root, _ranged(spark, 0, 100, 2), stats_columns=["id"])
    widened = (
        _ranged(spark, 100, 200, 2)
        .withColumn("extra", (F.col("id") * 2).cast("long"))
    )
    vt.append(root, widened, allow_new_columns=True, stats_columns=["id", "extra"])
    # extra spans [200, 398]; predicate misses it entirely -> both
    # post-widening files pruned, both pre-widening files kept (no stats)
    rep = vt.zone_map_prune(root, [("extra", ">", 1000)])
    assert rep["kept_files"] == 2 and rep["skipped_files"] == 2
    got = vt.read_where(spark, root, [("extra", ">", 1000)])
    assert got.columns == ["id", "score", "extra"]
    assert got.count() == 0  # NULL extra never satisfies > 1000
    want = vt.read_version(spark, root).filter(F.col("extra") > 1000)
    assert want.count() == 0
    # and a satisfiable band still matches the plain read exactly
    got2 = sorted(
        r.id for r in vt.read_where(spark, root, [("extra", "<=", 250)]).collect()
    )
    want2 = sorted(
        r.id
        for r in vt.read_version(spark, root).filter(F.col("extra") <= 250).collect()
    )
    assert got2 == want2 and got2


def test_zone_maps_on_timestamps_and_dates(spark, sf_dir, tmp_path):
    """Temporal zone maps: naive-timestamp and date columns prune by
    time range — the dominant predicate on event data — and the pruned
    read is row-identical to the plain filtered snapshot."""
    import datetime as dt

    root = tmp_path / "ev"
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", F.to_date("ts").alias("day")
    )
    assert dict(events.dtypes)["ts"] == "timestamp_ntz"
    vt.append(
        root,
        events.repartitionByRange(6, "ts"),
        stats_columns=["ts", "day"],
    )
    entry = vt.history(root)[-1]
    assert entry["stats_types"] == {"ts": "timestamp_ntz", "day": "date"}
    # stats landed as integers (epoch micros / ordinal days), not strings
    some = next(iter(entry["stats"].values()))
    assert all(isinstance(b, int) for rng in some.values() for b in rng)

    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    band = (mid, mid + dt.timedelta(hours=6))
    rep = vt.zone_map_prune(root, [("ts", "between", band)])
    assert rep["skipped_files"] >= 4, rep  # range layout prunes most files

    got = sorted(
        r.event_id
        for r in vt.read_where(spark, root, [("ts", "between", band)]).collect()
    )
    want = sorted(
        r.event_id
        for r in vt.read_version(spark, root)
        .filter(F.col("ts").between(*band))
        .collect()
    )
    assert got == want and want

    # date-typed predicate, passed as an ISO string
    day = mid.date().isoformat()
    got_d = vt.read_where(spark, root, [("day", "==", day)]).count()
    want_d = (
        vt.read_version(spark, root).filter(F.col("day") == day).count()
    )
    assert got_d == want_d > 0
    # datetime against a DATE column is ambiguous -> refused
    with pytest.raises(ValueError, match="DATE-typed"):
        vt.zone_map_prune(root, [("day", "==", mid)])


def test_zone_maps_refuse_zoned_timestamps(spark, tmp_path):
    root = tmp_path / "tz"
    df = spark.range(10).select(
        "id", F.timestamp_seconds(F.col("id") * 3600).alias("zoned_ts")
    )
    assert dict(df.dtypes)["zoned_ts"] == "timestamp"
    with pytest.raises(ValueError, match="zone maps support"):
        vt.append(root, df, stats_columns=["zoned_ts"])


def test_cli_table_ingest_stream(capsys, spark, tmp_path):
    """de table ingest: exactly-once streaming ingestion, one commit per
    arrived file, zone maps recorded when --stats-columns given."""
    from dataset_dedupe_estimator_spark.cli import main

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, 0, 50).coalesce(1).write.parquet(str(inbox / "a.parquet"))
    _mk(spark, 50, 90).coalesce(1).write.parquet(str(inbox / "b.parquet"))

    assert main([
        "table", "ingest", root, str(inbox),
        "--checkpoint", ckpt, "--stats-columns", "id",
    ]) == 0
    assert "2 commit(s) ingested" in capsys.readouterr().out
    hist = vt.history(root)
    assert [e["version"] for e in hist] == [0, 1]
    assert all(e.get("stats_columns") == ["id"] for e in hist)
    assert vt.read_version(spark, root).count() == 90
    # replay with the same checkpoint: nothing new
    assert main(["table", "ingest", root, str(inbox), "--checkpoint", ckpt]) == 0
    assert "nothing new" in capsys.readouterr().out
    assert len(vt.history(root)) == 2
    # missing checkpoint refused
    assert main(["table", "ingest", root, str(inbox)]) == 2


def test_cli_table_ingest_replay_is_idempotent(capsys, spark, tmp_path):
    """foreachBatch is at-least-once: deleting the checkpoint replays
    every file under the SAME batch ids — the per-commit ingest_batch
    tag must turn the replay into a no-op instead of duplicating rows."""
    import shutil

    from dataset_dedupe_estimator_spark.cli import main

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    root = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, 0, 40).coalesce(1).write.parquet(str(inbox / "a.parquet"))
    assert main(["table", "ingest", root, str(inbox), "--checkpoint", ckpt]) == 0
    capsys.readouterr()
    assert vt.read_version(spark, root).count() == 40
    # content-addressed tag: md5 of the batch's sorted input-file list
    assert len(vt.history(root)[-1]["ingest_batch"]) == 32
    assert vt.history(root)[-1]["ingest_files"] == 1
    # replay: wipe the checkpoint so Spark redelivers batch 0
    shutil.rmtree(ckpt)
    assert main(["table", "ingest", root, str(inbox), "--checkpoint", ckpt]) == 0
    assert "nothing new to ingest" in capsys.readouterr().out
    assert len(vt.history(root)) == 1
    assert vt.read_version(spark, root).count() == 40  # no duplication
    # a NEW file after the wipe is ingested even though it lands at the
    # already-seen batch ordinal (content addressing, not batch ids)
    _mk(spark, 40, 60).coalesce(1).write.parquet(str(inbox / "b.parquet"))
    shutil.rmtree(ckpt)
    assert main(["table", "ingest", root, str(inbox), "--checkpoint", ckpt]) == 0
    assert vt.read_version(spark, root).count() == 60
    assert len(vt.history(root)) == 2


def test_cli_table_ingest_empty_inbox(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    inbox = tmp_path / "empty"
    inbox.mkdir()
    assert main([
        "table", "ingest", str(tmp_path / "vt"), str(inbox),
        "--checkpoint", str(tmp_path / "ckpt"),
    ]) == 0
    assert "inbox empty" in capsys.readouterr().out
    # a nonexistent inbox is a usage error, NOT a silent success
    assert main([
        "table", "ingest", str(tmp_path / "vt"), str(tmp_path / "no-such"),
        "--checkpoint", str(tmp_path / "ckpt2"),
    ]) == 2


def test_commit_type_guard(spark, tmp_path):
    """A physical column may never change type across live commits
    (mixed parquet footers fail at READ time, far from the bad write
    — r9 guard fails the WRITE instead); overwrite replaces all live
    data and may re-type."""
    root = tmp_path / "tg"
    vt.append(root, _mk(spark, 0, 5), num_files=1)  # v: long
    bad = spark.createDataFrame([(9, 9)], "id: long, v: int")
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, bad, num_files=1)
    # nothing landed
    assert [e["version"] for e in vt.history(root)] == [0]
    # widening adds a NEW column freely; its type is then pinned too
    wide = _mk(spark, 5, 6).withColumn("tag", F.lit(1).cast("int"))
    vt.append(root, wide, num_files=1, allow_new_columns=True)
    bad2 = wide.withColumn("tag", F.col("tag").cast("long"))
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, bad2, num_files=1)
    # overwrite may re-type (it replaces every live file; the full
    # schema is still required — narrowing stays drop_column's job)
    retyped = _mk(spark, 0, 3).select(
        "id", F.col("v").cast("int").alias("v"),
        F.lit(1).cast("int").alias("tag"),
    )
    vt.overwrite(root, retyped, num_files=1)
    assert dict(vt.read_version(spark, root).dtypes)["v"] == "int"
    # and the new type is pinned from there on
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(
            root,
            _mk(spark, 0, 1).withColumn("tag", F.lit(1).cast("int")),
            num_files=1,
        )
