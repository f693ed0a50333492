"""Versioned table as a Structured Streaming SINK (r12):
exactly-once appends keyed by (queryId, batchId) in the commit log —
the write half of the r9 streaming source (sources/table_sink.py).

Covers: the txn (app, batch) watermark on append (skip-at-or-below,
accept-above), watermark survival across a commit-log checkpoint fold
that compacts away the very commit that recorded it, the native
``writeStream.format("versioned_table")`` path end-to-end, the
kill-and-restart replay proof (a cloned checkpoint missing its last
commit marker makes Spark re-run the batch; the table must NOT grow),
the foreachBatch helper, and the labeled refusals for table features
whose enforcement needs a Spark plan inside the gateway-less sink
commit hook.
"""

import glob
import json
import os
import shutil

import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import table_sink as ts
from dataset_dedupe_estimator_spark.sources import versioned as vt


@pytest.fixture()
def registered(spark):
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    return spark


def _frame(spark, n=10, shift=0):
    return spark.range(n).select(
        (F.col("id") + shift).alias("k"), (F.col("id") * 2).alias("v")
    )


# ---------------------------------------------------------------- txn core


def test_txn_append_is_idempotent(spark, tmp_path):
    root = tmp_path / "tbl"
    df = _frame(spark)
    e0 = vt.append(root, df, txn=("app", 0))
    assert e0["version"] == 0 and e0["txn"] == {"app": "app", "batch": 0}
    assert vt.append(root, df, txn=("app", 0)) is None  # replay
    assert vt.append(root, df, txn=("app", 1))["version"] == 1
    # at-or-BELOW the watermark skips (a late replay of an old batch)
    assert vt.append(root, df, txn=("app", 0)) is None
    assert vt.read_version(spark, root).count() == 20
    # a different app id is independent
    assert vt.append(root, df, txn=("other", 0))["version"] == 2
    assert vt.read_version(spark, root).count() == 30


def test_txn_without_stamp_never_dedupes(spark, tmp_path):
    root = tmp_path / "tbl"
    df = _frame(spark)
    vt.append(root, df, txn=("app", 0))
    vt.append(root, df)  # unstamped append: always lands
    assert vt.read_version(spark, root).count() == 20


def test_txn_survives_checkpoint_fold_and_compaction(
    spark, tmp_path, monkeypatch
):
    """The Delta SetTransaction property: the watermark must outlive
    the commit that recorded it. Fold the log into a checkpoint AND
    compact the stamped commit's files away — the replay must still be
    refused when the snapshot is served from checkpoint + tail."""
    monkeypatch.setattr(vt, "_CKPT_EVERY", 2)
    root = tmp_path / "tbl"
    for b in range(4):
        vt.append(
            root, _frame(spark, n=5, shift=100 * b), num_files=1,
            txn=("ingest", b),
        )
    vt.compact_small(spark, root)  # folds the small stamped commits
    assert (root / vt._VLOG / "ckpt-v00000004.parquet").exists()
    folded = vt._snapshot_entries(root)
    assert vt._latest_txns(folded) == {"ingest": 3}
    for b in range(4):  # full replay of history: every batch refused
        assert vt.append(root, _frame(spark, n=5), txn=("ingest", b)) is None
    assert vt.read_version(spark, root).count() == 20


def test_txn_checked_under_writer_lock(spark, tmp_path):
    """The authoritative check runs inside _publish_staged: a txn that
    lands BETWEEN the base snapshot and the lock is seen."""
    root = tmp_path / "tbl"
    df = _frame(spark)
    base = vt._snapshot_entries  # force a stale base for the 2nd call
    vt.append(root, df, txn=("app", 0))
    stale = vt._snapshot_entries(root)

    calls = {"n": 0}

    def snap(r):
        calls["n"] += 1
        return list(stale) if calls["n"] == 1 else base(r)

    orig = vt._snapshot_entries
    vt._snapshot_entries = snap
    try:
        vt.append(root, df, txn=("app", 1))  # lands normally
        vt._snapshot_entries = orig
        # replay of batch 1 with a base snapshot that predates it:
        # the pre-check passes, the in-lock check must refuse
        calls["n"] = 0
        vt._snapshot_entries = snap
        assert vt.append(root, df, txn=("app", 1)) is None
    finally:
        vt._snapshot_entries = orig
    assert vt.read_version(spark, root).count() == 20


# ------------------------------------------------------- native sink path


def _drain(spark, src, root, ckpt, **opts):
    w = (
        spark.readStream.schema("k bigint, v bigint").json(str(src))
        .writeStream.format("versioned_table")
        .option("path", str(root))
        .option("checkpointLocation", str(ckpt))
    )
    for k, v in opts.items():
        w = w.option(k, v)
    q = w.trigger(availableNow=True).start()
    assert q.awaitTermination(300), "sink drain did not finish"


def test_stream_sink_commits_batches(registered, tmp_path):
    spark = registered
    src, root, ck = tmp_path / "src", tmp_path / "tbl", tmp_path / "ck"
    _frame(spark).write.json(str(src))
    _drain(spark, src, root, ck, statsColumns="k")
    assert vt.read_version(spark, root).count() == 10
    _frame(spark, shift=100).write.mode("append").json(str(src))
    _drain(spark, src, root, ck)
    got = vt.read_version(spark, root)
    assert got.count() == 20
    h = vt.history(root)
    qid = json.loads((ck / "metadata").read_text())["id"]
    assert [(e["version"], e["txn"]) for e in h] == [
        (0, {"app": qid, "batch": 0}),
        (1, {"app": qid, "batch": 1}),
    ]
    # inherited zone maps: the sink's stats flow into read_where pruning
    assert h[0]["stats_columns"] == ["k"]
    pruned = vt.read_where(spark, root, [("k", "between", (100, 104))])
    assert pruned.count() == 5
    # staging fully drained
    assert not list((root / ts._STAGE_DIR).glob("*")) or not (
        root / ts._STAGE_DIR
    ).exists()


def test_stream_sink_replay_after_restart_is_exactly_once(
    registered, tmp_path
):
    """THE kill-and-restart proof: clone the checkpoint, delete its
    newest commit marker (crash between sink commit and checkpoint
    commit — Spark's at-least-once window), restart. Spark re-runs the
    batch with the same (queryId, batchId); the table log must refuse
    the duplicate and the restarted query must still complete."""
    spark = registered
    src, root, ck = tmp_path / "src", tmp_path / "tbl", tmp_path / "ck"
    _frame(spark).write.json(str(src))
    _drain(spark, src, root, ck)
    _frame(spark, shift=100).write.mode("append").json(str(src))
    _drain(spark, src, root, ck)
    assert vt.read_version(spark, root).count() == 20

    ck2 = tmp_path / "ck_replay"  # the "restarted process" checkpoint
    shutil.copytree(ck, ck2)
    last = max(
        int(os.path.basename(p))
        for p in glob.glob(str(ck2 / "commits" / "[0-9]*"))
    )
    os.remove(ck2 / "commits" / str(last))
    crc = ck2 / "commits" / f".{last}.crc"
    if crc.exists():
        os.remove(crc)
    _drain(spark, src, root, ck2)  # replays batch `last`
    assert vt.read_version(spark, root).count() == 20  # no duplicates
    assert [e["txn"]["batch"] for e in vt.history(root)] == [0, 1]


def test_stream_sink_refusals(registered, tmp_path):
    spark = registered
    src = tmp_path / "src"
    _frame(spark).write.json(str(src))
    # no appId and no checkpoint -> no exactly-once key -> refuse
    with pytest.raises(Exception, match="appId|checkpointLocation"):
        (
            spark.readStream.schema("k bigint, v bigint").json(str(src))
            .writeStream.format("versioned_table")
            .option("path", str(tmp_path / "t1"))
            .trigger(availableNow=True)
            .start()
        )
    # constraints need a Spark plan: the gateway-less commit hook refuses
    root = tmp_path / "t2"
    vt.append(root, _frame(spark))
    vt.set_constraints(root, checks=[("k", "<", 1_000_000)])
    with pytest.raises(ValueError, match="constraints"):
        ts.publish_staged_files(root, ["unused"], txn=("a", 0))
    # schema mismatch is caught before any file moves
    root3 = tmp_path / "t3"
    vt.append(root3, _frame(spark))
    staged = tmp_path / "stage.parquet"
    _frame(spark).withColumnRenamed("v", "w").coalesce(1).write.parquet(
        str(tmp_path / "stg")
    )
    part = glob.glob(str(tmp_path / "stg" / "*.parquet"))[0]
    with pytest.raises(ValueError, match="schema mismatch"):
        ts.publish_staged_files(root3, [part], txn=("a", 0))
    assert staged.exists() is False


# ------------------------------------------------------ foreachBatch path


def test_exactly_once_appender_helper(spark, tmp_path):
    root = tmp_path / "tbl"
    fn = ts.exactly_once_appender(root, app_id="pipe", stats_columns=["k"])
    df = _frame(spark)
    fn(df, 0)
    fn(df, 0)  # replayed microbatch
    fn(df, 1)
    assert vt.read_version(spark, root).count() == 20
    assert vt.history(root)[0]["stats_columns"] == ["k"]


def test_exactly_once_appender_resolves_query_id(spark, tmp_path):
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "metadata").write_text(json.dumps({"id": "qid-123"}))
    fn = ts.exactly_once_appender(tmp_path / "tbl", checkpoint=ck)
    fn(_frame(spark), 7)
    assert vt.history(tmp_path / "tbl")[0]["txn"] == {
        "app": "qid-123", "batch": 7,
    }
    with pytest.raises(ValueError, match="app_id or checkpoint"):
        ts.exactly_once_appender(tmp_path / "tbl")


def test_exactly_once_appender_auto_compact(spark, tmp_path):
    """auto_compact_every=N: a long-running streaming ingest must not
    degrade readers into a small-file scan. Every Nth committed batch
    triggers compact_small (dataChange=false); replayed batches tick
    neither the table nor the cadence; the exactly-once watermark
    survives the compaction that folds its commits away."""
    root = tmp_path / "tbl"
    fn = ts.exactly_once_appender(
        root, app_id="pipe", auto_compact_every=3, num_files=1
    )
    for b in range(6):
        fn(_frame(spark, n=50, shift=1000 * b), b)
        fn(_frame(spark, n=50, shift=1000 * b), b)  # replay: no tick
    h = vt.history(root)
    compactions = [e for e in h if e["action"] == "compact"]
    assert len(compactions) == 2, [e["action"] for e in h]
    got = vt.read_version(spark, root)
    assert got.count() == 300  # 6 batches x 50 rows, no dupes
    # post-compaction live files are bounded: the compacted outputs +
    # the small tail since the last fold, never 6 per-batch files
    snap = vt._snapshot_entries(root)
    masks = vt._live_masks(snap)
    live = {
        f"{e['dir']}/{p.name}"
        for e in snap if e.get("dir")
        for p in (root / vt._DATA / e["dir"]).rglob("*.parquet")
    } - {f"{d}/{r}" for d, rels in masks.items() for r in rels}
    assert 0 < len(live) < 6, sorted(live)
    # watermark intact after folds: every replay still refuses
    for b in range(6):
        assert vt.append(root, _frame(spark, n=5), txn=("pipe", b)) is None
    assert vt.read_version(spark, root).count() == 300


# ------------------------------------------------------- CDC apply path


def test_dml_txn_idempotence(spark, tmp_path):
    """upsert_pruned and delete_where_pruned honor the same (app,
    batch) watermark as append — the primitives the two-phase CDC
    apply stamps."""
    root = tmp_path / "tbl"
    vt.append(root, _frame(spark, n=20), stats_columns=["k"])
    up = _frame(spark, n=5).withColumn("v", F.col("v") + 100)
    st = vt.upsert_pruned(spark, root, up, ["k"], txn=("a", 0))
    assert st["committed"] is not False
    st2 = vt.upsert_pruned(spark, root, up, ["k"], txn=("a", 0))
    assert st2.get("skipped_duplicate_txn") and st2["committed"] is False
    st3 = vt.delete_where_pruned(
        spark, root, [("k", "in", [10, 11])], txn=("a", 1)
    )
    assert st3["committed"] and st3["deleted_rows"] == 2
    st4 = vt.delete_where_pruned(
        spark, root, [("k", "in", [12, 13])], txn=("a", 1)
    )
    assert st4.get("skipped_duplicate_txn") and st4["committed"] is False
    assert vt.read_version(spark, root).count() == 18


def test_apply_changes_net_effect_and_replay(spark, tmp_path):
    """apply_changes: newest version wins per key, an update's
    delete+insert pair nets to the insert, pure deletes delete — and a
    full replay of the batch (crash after both phases) changes
    nothing; a replay after only phase 1 committed completes phase 2
    exactly once (the monotonic 2b/2b+1 watermark)."""
    root = tmp_path / "dst"
    vt.append(root, _frame(spark, n=20), stats_columns=["k"])
    fn = ts.apply_changes(root, ["k"], app_id="cdc")

    def cdf(rows):
        return spark.createDataFrame(
            rows, "k bigint, v bigint, _change string, _commit_version bigint"
        )

    batch = cdf(
        # update k=3: delete+insert pair at v5 -> nets to insert v=999
        [(3, 6, "delete", 5), (3, 999, "insert", 5),
         # delete k=7 at v5
         (7, 14, "delete", 5),
         # k=9: deleted at v5 then re-inserted at v6 -> newest wins
         (9, 18, "delete", 5), (9, 777, "insert", 6),
         # brand-new key
         (100, 1, "insert", 6)]
    )
    fn(batch, 0)
    got = {r["k"]: r["v"] for r in vt.read_version(spark, root).collect()}
    assert got[3] == 999 and got[9] == 777 and got[100] == 1
    assert 7 not in got and len(got) == 20  # 20 - 1 del + 1 new
    fn(batch, 0)  # full replay: both phases skipped
    assert vt.read_version(spark, root).count() == 20
    # partial-crash replay: phase 1 (merge, txn 2*1) already committed,
    # phase 2 never ran -> replay must skip the merge and run the delete
    batch2 = cdf([(100, 2, "insert", 7), (3, 0, "delete", 7)])
    up2 = batch2.filter(F.col("_change") == "insert").drop(
        "_change", "_commit_version"
    )
    vt.upsert_pruned(spark, root, up2, ["k"], txn=("cdc", 2))
    fn(batch2, 1)  # the "restarted" batch 1
    got2 = {r["k"]: r["v"] for r in vt.read_version(spark, root).collect()}
    assert got2[100] == 2 and 3 not in got2
    assert vt.read_version(spark, root).count() == 19
    # no double-merge: k=100 was upserted once, not duplicated
    assert (
        vt.read_version(spark, root).filter(F.col("k") == 100).count() == 1
    )


def test_apply_changes_refusals(spark, tmp_path):
    with pytest.raises(ValueError, match="one key column"):
        ts.apply_changes(tmp_path / "t", ["a", "b"], app_id="x")
    with pytest.raises(ValueError, match="app_id or checkpoint"):
        ts.apply_changes(tmp_path / "t", ["a"])


def test_apply_changes_refuses_duplicate_key_inserts(spark, tmp_path):
    """A source batch with several insert rows for one key at its
    newest version is a contract violation (net-effect replication
    would silently keep one row) — refuse, never diverge. Superseded
    duplicates (older versions) stay fine."""
    root = tmp_path / "dst"
    vt.append(root, _frame(spark, n=5), stats_columns=["k"])
    fn = ts.apply_changes(root, ["k"], app_id="dup")

    def cdf(rows):
        return spark.createDataFrame(
            rows, "k bigint, v bigint, _change string, _commit_version bigint"
        )

    with pytest.raises(ValueError, match="key-unique"):
        fn(cdf([(1, 10, "insert", 5), (1, 11, "insert", 5)]), 0)
    # an update pair + a same-version EXTRA insert is ambiguous too
    with pytest.raises(ValueError, match="key-unique"):
        fn(
            cdf([(2, 1, "delete", 5), (2, 2, "insert", 5),
                 (2, 3, "insert", 5)]),
            1,
        )
    # duplicates superseded by a newer version are NOT a violation
    fn(cdf([(3, 1, "insert", 4), (3, 2, "insert", 4),
            (3, 9, "insert", 5)]), 2)
    got = {r["k"]: r["v"] for r in vt.read_version(spark, root).collect()}
    assert got[3] == 9


def test_dv_dml_txn_idempotence(spark, tmp_path):
    """The merge-on-read DML shapes honor the watermark too — the full
    DML surface (append/upsert/delete/update x CoW/DV) is streaming-
    idempotent."""
    root = tmp_path / "tbl"
    vt.append(root, _frame(spark, n=20), stats_columns=["k"])
    st = vt.delete_where_dv(spark, root, [("k", "<=", 1)], txn=("a", 0))
    assert st["committed"] and st["deleted_rows"] == 2
    st2 = vt.delete_where_dv(spark, root, [("k", "<=", 5)], txn=("a", 0))
    assert st2.get("skipped_duplicate_txn") and st2["committed"] is False
    st3 = vt.update_where_dv(
        spark, root, [("k", ">=", 18)], {"v": F.col("v") + 1}, txn=("a", 1)
    )
    assert st3["committed"] and st3["updated_rows"] == 2
    st4 = vt.update_where_dv(
        spark, root, [("k", ">=", 10)], {"v": F.col("v") + 1}, txn=("a", 1)
    )
    assert st4.get("skipped_duplicate_txn") and st4["committed"] is False
    got = {r["k"]: r["v"] for r in vt.read_version(spark, root).collect()}
    assert len(got) == 18 and got[18] == 37 and got[19] == 39 and got[10] == 20


def test_vacuum_sweeps_stale_sink_staging(spark, tmp_path):
    """A hard kill between the sink's write() and commit() leaves
    staged files abort() never saw; vacuum reclaims them after 24 h."""
    import os as _os
    import time as _time

    root = tmp_path / "tbl"
    vt.append(root, _frame(spark))
    stage = root / ts._STAGE_DIR
    stage.mkdir()
    stale = stage / "part-deadbeef.parquet"
    stale.write_bytes(b"orphan")
    fresh = stage / "part-live.parquet"
    fresh.write_bytes(b"inflight")
    old = _time.time() - 25 * 3600
    _os.utime(stale, (old, old))
    removed = vt.vacuum(root)
    assert "_sink_stage/part-deadbeef.parquet" in removed
    assert not stale.exists() and fresh.exists()


def test_stream_sink_schema_widening(registered, tmp_path):
    """option('allowNewColumns','true'): a stream that grows a column
    mid-pipeline widens the table schema (the mergeSchema shape); older
    commits surface NULL for the new column; without the option the
    widened batch refuses loudly."""
    spark = registered
    src, root, ck = tmp_path / "src", tmp_path / "tbl", tmp_path / "ck"
    _frame(spark).write.json(str(src))
    _drain(spark, src, root, ck)
    src2, ck2 = tmp_path / "src2", tmp_path / "ck2"
    wide = _frame(spark, shift=100).withColumn("w", F.col("k") * 3)
    wide.write.json(str(src2))

    def drain_wide(allow):
        w = (
            spark.readStream.schema("k bigint, v bigint, w bigint")
            .json(str(src2))
            .writeStream.format("versioned_table")
            .option("path", str(root))
            .option("checkpointLocation", str(ck2))
        )
        if allow:
            w = w.option("allowNewColumns", "true")
        q = w.trigger(availableNow=True).start()
        return q.awaitTermination(300)

    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        drain_wide(False)
    import shutil as _sh

    _sh.rmtree(ck2)
    assert drain_wide(True)
    got = vt.read_version(spark, root)
    assert got.count() == 20
    assert got.filter(F.col("w").isNull()).count() == 10  # pre-widening
    assert got.filter(F.col("w") == F.col("k") * 3).count() == 10


def test_update_where_pruned_txn_and_detail_watermarks(spark, tmp_path):
    """The CoW UPDATE honors the watermark (completing the DML surface)
    and describe_detail surfaces per-app watermarks — including as-of
    time travel (the watermark as it stood at that version)."""
    root = tmp_path / "tbl"
    vt.append(root, _frame(spark, n=20), stats_columns=["k"], txn=("in", 0))
    st = vt.update_where_pruned(
        spark, root, [("k", ">=", 15)], {"v": F.col("v") + 1},
        txn=("in", 1),
    )
    assert st["updated_rows"] == 5
    st2 = vt.update_where_pruned(
        spark, root, [("k", ">=", 0)], {"v": F.col("v") + 1}, txn=("in", 1)
    )
    assert st2.get("skipped_duplicate_txn") and st2["committed"] is False
    vt.append(root, _frame(spark, n=5, shift=100), txn=("other", 7))
    d = vt.describe_detail(root)
    assert d["txns"] == {"in": 1, "other": 7}
    # as-of: the watermark as it stood at v0
    assert vt.describe_detail(root, version=0)["txns"] == {"in": 0}


def test_two_pipelines_one_table_independent_watermarks(spark, tmp_path):
    """Two ingest pipelines (distinct app ids) feed ONE table from
    racing threads with overlapping batch ids: every (app, batch)
    lands exactly once, replays are refused per app, and the final
    row count is exact — the multi-writer exactly-once contract."""
    import threading

    root = tmp_path / "tbl"
    vt.append(root, _frame(spark, n=0))  # create
    errors = []
    barrier = threading.Barrier(2)

    def run(app, shift):
        try:
            fn = ts.exactly_once_appender(root, app_id=app, num_files=1)
            barrier.wait(timeout=60)
            for b in range(4):
                fn(_frame(spark, n=10, shift=shift + 100 * b), b)
                fn(_frame(spark, n=10, shift=shift + 100 * b), b)  # replay
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=run, args=(app, shift))
        for app, shift in (("alpha", 0), ("beta", 10_000))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert vt.read_version(spark, root).count() == 80  # 2 x 4 x 10
    d = vt.describe_detail(root)
    assert d["txns"] == {"alpha": 3, "beta": 3}
    # late replays still refused for both apps
    for app in ("alpha", "beta"):
        assert vt.append(root, _frame(spark, n=3), txn=(app, 2)) is None
