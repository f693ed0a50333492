"""Incremental MV maintenance: merge semantics + streaming refresh.

The contract under test: merged additive state equals a from-scratch
aggregate over the surviving rows, regardless of how the deltas are
grouped into batches (associativity) or whether they arrive via batch
merge_states or a Structured-Streaming changelog with per-row signs —
and the base data is never re-read (the streaming test's second wave
merges into the stored state through foreachBatch).
"""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.matview import (
    COUNT_COL,
    additive_state,
    merge_states,
    read_mv,
    refresh_mv_parquet,
)

def _m():
    return {"s": F.col("v")}


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k: long, v: long")


def _asdict(mv):
    return {r.k: (r[COUNT_COL], r.s) for r in mv.collect()}


def test_merge_equals_scratch(spark):
    base = _mk(spark, [(1, 10), (1, 20), (2, 5)])
    ins = _mk(spark, [(2, 7), (3, 1)])
    ret = _mk(spark, [(1, 20)])
    mv = merge_states(
        [
            additive_state(base, ["k"], _m()),
            additive_state(ins, ["k"], _m()),
            additive_state(ret, ["k"], _m(), sign=-1),
        ],
        ["k"],
    )
    assert _asdict(mv) == {1: (1, 10), 2: (2, 12), 3: (1, 1)}


def test_full_retraction_removes_key(spark):
    base = _mk(spark, [(9, 4), (8, 2)])
    ret = _mk(spark, [(9, 4)])
    mv = merge_states(
        [additive_state(base, ["k"], _m()), additive_state(ret, ["k"], _m(), sign=-1)],
        ["k"],
    )
    assert _asdict(mv) == {8: (1, 2)}


def test_merge_is_associative(spark):
    a = additive_state(_mk(spark, [(1, 1), (2, 2)]), ["k"], _m())
    b = additive_state(_mk(spark, [(1, 3)]), ["k"], _m())
    c = additive_state(_mk(spark, [(2, 5), (3, 7)]), ["k"], _m())
    all_at_once = merge_states([a, b, c], ["k"])
    pairwise = merge_states([merge_states([a, b], ["k"]), c], ["k"])
    assert _asdict(all_at_once) == _asdict(pairwise)


def test_merge_rejects_empty():
    with pytest.raises(ValueError):
        merge_states([], ["k"])


def test_column_sign_mixed_batch(spark):
    """One changelog batch carrying both inserts and retractions."""
    delta = spark.createDataFrame(
        [(1, 10, 1), (1, 10, -1), (2, 3, 1)], "k: long, v: long, mv_sign: int"
    )
    state = additive_state(delta, ["k"], _m(), sign=F.col("mv_sign"))
    mv = merge_states([state], ["k"])
    assert _asdict(mv) == {2: (1, 3)}


def test_streaming_refresh_equals_batch(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    mv_path = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v long, mv_sign int"

    def write_wave(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(
                lambda batch, _id: refresh_mv_parquet(
                    spark, mv_path, batch, ["k"], _m()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1 = [(1, 10, 1), (1, 20, 1), (2, 5, 1)]
    wave2 = [(2, 7, 1), (1, 20, -1), (3, 4, 1)]
    write_wave("w1", wave1)
    run_stream()
    mid = _asdict(read_mv(spark, mv_path))
    assert mid == {1: (2, 30), 2: (1, 5)}

    # Second wave: the SAME checkpoint means only new files are read —
    # the refresh merges into stored state, never recomputes wave 1.
    write_wave("w2", wave2)
    run_stream()
    got = _asdict(read_mv(spark, mv_path))

    scratch = (
        spark.createDataFrame(wave1 + wave2, schema)
        .groupBy("k")
        .agg(
            F.sum("mv_sign").alias(COUNT_COL),
            F.sum(F.col("v") * F.col("mv_sign")).alias("s"),
        )
        .filter(F.col(COUNT_COL) > 0)
    )
    assert got == _asdict(scratch)
    assert got == {1: (1, 10), 2: (2, 12), 3: (1, 4)}


def test_retraction_before_insert_residue_cancels(spark):
    """Out-of-order changelog: a retraction arriving first leaves
    negative residue that the late insert cancels — the final state
    equals in-order application (ADVICE r5: dropping count<0 state made
    the late insert double-count)."""
    ret = additive_state(_mk(spark, [(5, 9)]), ["k"], _m(), sign=-1)
    mid = merge_states([ret], ["k"])
    assert _asdict(mid) == {5: (-1, -9)}  # residue survives
    ins = additive_state(_mk(spark, [(5, 9), (5, 9)]), ["k"], _m())
    final = merge_states([mid, ins], ["k"])
    assert _asdict(final) == {5: (1, 9)}


def test_refresh_survives_history_and_vacuums(spark, tmp_path):
    """Each refresh is an atomic versioned commit: the previous state
    stays readable (time travel) and old versions are vacuumed past the
    retention floor — a crash mid-refresh can never lose the MV."""
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    mv_path = str(tmp_path / "mv")
    for i in range(5):
        delta = spark.createDataFrame(
            [(1, 10 * (i + 1), 1)], "k: long, v: long, mv_sign: int"
        )
        refresh_mv_parquet(spark, mv_path, delta, ["k"], _m(), retain_versions=2)
    hist = vt.history(mv_path)
    assert len(hist) == 5  # full audit log retained
    assert _asdict(read_mv(spark, mv_path)) == {1: (5, 150)}
    # previous retained version still time-travels
    prev = vt.read_version(spark, mv_path, hist[-2]["version"])
    assert {r.k: (r[COUNT_COL], r.s) for r in prev.collect()} == {1: (4, 100)}
    # versions past the retention floor are vacuumed (directories gone)
    import pytest as _pt

    with _pt.raises(Exception):
        vt.read_version(spark, mv_path, 0).collect()
