import pytest

pytestmark = pytest.mark.slow  # driver-budget: deselected from the default run

"""Model-based property test for the versioned-table commit protocol.

A random sequence of append / overwrite / upsert / delete_where ops runs
against BOTH the real table (sources/versioned.py, parquet + log on
disk) and a trivially-correct in-memory dict model. After the sequence,
EVERY historical version's snapshot must equal the model's recorded
state for that version — i.e. commits are linearizable and time travel
is exact under any op interleaving, not just the hand-picked sequences
in test_versioned.py. Spark actions dominate the budget, so examples
are few but each replays a full multi-op history.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt

# an op is (kind, payload); keys/values drawn from tiny domains so
# collisions (the interesting case) are common
_KEYS = st.integers(min_value=0, max_value=9)
_VALS = st.integers(min_value=0, max_value=99)
_ROWS = st.dictionaries(_KEYS, _VALS, min_size=0, max_size=5)

_OP = st.one_of(
    st.tuples(st.just("append"), _ROWS.filter(len)),
    st.tuples(st.just("overwrite"), _ROWS),
    st.tuples(st.just("upsert"), _ROWS.filter(len)),
    st.tuples(st.just("delete_mod"), st.integers(min_value=2, max_value=4)),
)


def _df(spark, rows: dict):
    return spark.createDataFrame(sorted(rows.items()), "k: long, v: long")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP, min_size=1, max_size=6))
def test_random_histories_time_travel_exactly(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("vtm") / "tbl"
    # model: multiset of (k, v) rows — append keeps duplicates, so the
    # model is a list; upsert/delete are key-level
    live: list[tuple[int, int]] = []
    snapshots: list[list[tuple[int, int]]] = []
    for kind, arg in ops:
        if kind == "append":
            vt.append(root, _df(spark, arg), num_files=1)
            live = live + sorted(arg.items())
        elif kind == "overwrite":
            vt.overwrite(root, _df(spark, arg), num_files=1)
            live = sorted(arg.items())
        elif kind == "upsert":
            if not snapshots:  # upsert needs an existing table
                vt.append(root, _df(spark, arg), num_files=1)
                live = sorted(arg.items())
            else:
                vt.upsert(spark, root, _df(spark, arg), ["k"], num_files=1)
                live = sorted(
                    [(k, v) for k, v in live if k not in arg] + list(arg.items())
                )
        elif kind == "delete_mod":
            if not snapshots:
                continue
            vt.delete_where(spark, root, F.col("k") % arg == 0, num_files=1)
            live = [(k, v) for k, v in live if k % arg != 0]
        snapshots.append(sorted(live))

    assert len(vt.history(root)) == len(snapshots)
    for version, expect in enumerate(snapshots):
        got = sorted(
            (r.k, r.v) for r in vt.read_version(spark, root, version).collect()
        )
        assert got == expect, f"version {version}: {got} != {expect}"


# --- r7 surface: PRUNED mutations + compaction under random histories --------
#
# Same linearizability contract, now over the zone-map/bloom-bounded
# paths: delete_where_pruned / upsert_pruned / compact_small against a
# table whose first commit declares stats+bloom columns on k, so every
# op exercises pruning, file carrying, and removed-masks — and a
# "nothing to touch" no-commit from the pruning metadata is asserted to
# imply the model also had nothing to touch (conservativeness).

_OP_PRUNED = st.one_of(
    st.tuples(st.just("append"), _ROWS.filter(len)),
    st.tuples(st.just("overwrite"), _ROWS.filter(len)),
    st.tuples(st.just("upsert_pruned"), _ROWS.filter(len)),
    st.tuples(st.just("delete_eq"), _KEYS),
    st.tuples(st.just("delete_band"), st.tuples(_KEYS, _KEYS)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=11)),
    st.tuples(st.just("dv_delete"), _KEYS),
    st.tuples(st.just("update_eq"), st.tuples(_KEYS, _VALS)),
    st.tuples(st.just("dv_update"), st.tuples(_KEYS, _VALS)),
    st.tuples(
        st.just("concurrent_append"),
        st.tuples(_ROWS.filter(len), _ROWS.filter(len)),
    ),
    st.tuples(st.just("rename"), st.none()),
    st.tuples(st.just("widen_drop"), _ROWS.filter(len)),
    # r12 exactly-once: stamped ops are immediately REPLAYED with a
    # DIFFERENT payload under the same (app, batch) — the replay must
    # commit nothing, under any surrounding history (folds, restores,
    # compactions, renames included)
    st.tuples(st.just("txn_append"), st.tuples(_ROWS.filter(len), _ROWS.filter(len))),
    st.tuples(st.just("txn_upsert"), st.tuples(_ROWS.filter(len), _ROWS.filter(len))),
    st.tuples(st.just("txn_replay_old"), _ROWS.filter(len)),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OP_PRUNED, min_size=1, max_size=6))
def test_pruned_mutations_time_travel_exactly(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("vtm2") / "tbl"
    live: list[tuple[int, int]] = []
    snapshots: list[list[tuple[int, int]]] = []
    # the expected LOGICAL schema per committed version (rename ops
    # toggle the value column's name; widen_drop ops add a transient
    # extra column for exactly one version)
    schemas: list[list[str]] = []
    vname = "v"
    n_widened = 0

    def _df_named(rows):
        out = _df(spark, rows)
        return out.withColumnRenamed("v", vname) if vname != "v" else out

    def _first_append(rows):
        vt.append(
            root, _df_named(rows), num_files=1,
            stats_columns=["k"], bloom_columns=["k"], bloom_bits=4096,
        )

    next_batch = [0]  # monotone per-history exactly-once batch counter

    for kind, arg in ops:
        if kind == "append":
            if not snapshots:
                _first_append(arg)
            else:
                vt.append(root, _df_named(arg), num_files=1)
            live = live + sorted(arg.items())
        elif kind == "overwrite":
            if not snapshots:
                _first_append(arg)
            else:
                vt.overwrite(root, _df_named(arg), num_files=1)
            live = sorted(arg.items())
        elif kind == "upsert_pruned":
            if not snapshots:
                _first_append(arg)
                live = sorted(arg.items())
            else:
                vt.upsert_pruned(spark, root, _df_named(arg), ["k"])
                live = sorted(
                    [(k, v) for k, v in live if k not in arg]
                    + list(arg.items())
                )
        elif kind == "delete_eq":
            if not snapshots:
                continue
            stt = vt.delete_where_pruned(spark, root, [("k", "==", arg)])
            want_gone = [(k, v) for k, v in live if k == arg]
            if not stt["committed"]:
                # pruning said "no file can hold it": the model must
                # agree nothing matched (conservativeness)
                assert not want_gone
                continue
            live = [(k, v) for k, v in live if k != arg]
        elif kind == "delete_band":
            if not snapshots:
                continue
            lo, hi = sorted(arg)
            stt = vt.delete_where_pruned(
                spark, root, [("k", "between", (lo, hi))]
            )
            if not stt["committed"]:
                assert not [(k, v) for k, v in live if lo <= k <= hi]
                continue
            live = [(k, v) for k, v in live if not (lo <= k <= hi)]
        elif kind == "compact":
            if not snapshots:
                continue
            stt = vt.compact_small(spark, root)
            if not stt["committed"]:
                continue
            # rows identical by contract
        elif kind == "restore":
            if not snapshots:
                continue
            target = arg % len(snapshots)
            stt = vt.restore(spark, root, target)
            if not stt["committed"]:  # target == current: no-op
                continue
            live = list(snapshots[target])
        elif kind == "dv_delete":
            if not snapshots:
                continue
            stt = vt.delete_where_dv(spark, root, [("k", "==", arg)])
            want_gone = [(k, v) for k, v in live if k == arg]
            if not stt["committed"]:
                assert not want_gone  # nothing matched ⇒ model agrees
                continue
            assert stt["deleted_rows"] == len(want_gone)
            live = [(k, v) for k, v in live if k != arg]
        elif kind in ("update_eq", "dv_update"):
            # r11 UPDATE verbs — copy-on-write (pruned) and
            # merge-on-read (DV): SET the value column for one key,
            # speaking the CURRENT logical value-column name
            if not snapshots:
                continue
            key, nv = arg
            fn = (
                vt.update_where_pruned
                if kind == "update_eq"
                else vt.update_where_dv
            )
            stt = fn(spark, root, [("k", "==", key)], {vname: nv})
            touched = [(k, v) for k, v in live if k == key]
            if not stt["committed"]:
                assert not touched  # nothing matched ⇒ model agrees
                continue
            assert stt["updated_rows"] == len(touched)
            live = [(k, nv if k == key else v) for k, v in live]
        elif kind == "rename":
            if not snapshots:
                continue
            new_name = "v2" if vname == "v" else "v"
            stt = vt.rename_column(root, vname, new_name)
            assert stt["action"] == "rename_column"
            vname = new_name
        elif kind == "widen_drop":
            # r9 DROP COLUMN: widen with a fresh throwaway column (its
            # physical name is retired forever after the drop, so each
            # op mints a new one), then drop it — the widened schema is
            # visible for exactly one version and time travel must keep
            # showing it there
            if not snapshots:
                continue
            xcol = f"x{n_widened}"
            n_widened += 1
            vt.append(
                root,
                _df_named(arg).withColumn(xcol, F.lit(1)),
                num_files=1, allow_new_columns=True,
            )
            live = live + sorted(arg.items())
            snapshots.append(sorted(live))
            schemas.append(["k", vname, xcol])
            stt = vt.drop_column(root, xcol)
            assert stt["action"] == "drop_column"
        elif kind == "txn_append":
            rows, replay_rows = arg
            b = next_batch[0]
            next_batch[0] += 1
            if not snapshots:
                vt.append(
                    root, _df_named(rows), num_files=1,
                    stats_columns=["k"], bloom_columns=["k"],
                    bloom_bits=4096, txn=("m", b),
                )
            else:
                assert vt.append(
                    root, _df_named(rows), num_files=1, txn=("m", b)
                ) is not None
            # immediate replay, different payload: MUST commit nothing
            assert vt.append(
                root, _df_named(replay_rows), num_files=1, txn=("m", b)
            ) is None
            live = live + sorted(rows.items())
        elif kind == "txn_upsert":
            rows, replay_rows = arg
            b = next_batch[0]
            next_batch[0] += 1
            if not snapshots:
                # bootstrap: version 0 unstamped, version 1 stamped —
                # then a replayed MERGE under the same batch must skip
                _first_append(rows)
                live = sorted(rows.items())
                snapshots.append(sorted(live))
                schemas.append(["k", vname])
                assert vt.append(
                    root, _df_named(replay_rows), num_files=1,
                    txn=("m", b),
                ) is not None
                live = live + sorted(replay_rows.items())
                snapshots.append(sorted(live))
                schemas.append(["k", vname])
                assert vt.upsert_pruned(
                    spark, root, _df_named(rows), ["k"], txn=("m", b)
                ).get("skipped_duplicate_txn")
                continue  # snapshots appended manually for both commits
            stt = vt.upsert_pruned(
                spark, root, _df_named(rows), ["k"], txn=("m", b)
            )
            assert stt["committed"] is not False
            replay = vt.upsert_pruned(
                spark, root, _df_named(replay_rows), ["k"], txn=("m", b)
            )
            assert replay.get("skipped_duplicate_txn")
            live = sorted(
                [(k, v) for k, v in live if k not in rows]
                + list(rows.items())
            )
        elif kind == "txn_replay_old":
            # a LATE replay of the very first stamped batch: refused as
            # long as any stamped commit exists (accumulate-only, even
            # across restore/compact/fold)
            if not snapshots or next_batch[0] == 0:
                continue
            assert vt.append(
                root, _df_named(arg), num_files=1, txn=("m", 0)
            ) is None
            continue  # no commit, no snapshot
        elif kind == "concurrent_append":
            # r9 optimistic concurrency: two appends race from a shared
            # barrier; BOTH must land (blind appends always commute),
            # committing two versions whose ORDER the races decide —
            # recovered post-hoc from the first landed version's rows
            import threading
            from collections import Counter

            if not snapshots:
                continue
            rows_a, rows_b = arg
            errors = []
            barrier = threading.Barrier(2)

            def _race(rows):
                try:
                    barrier.wait(timeout=60)
                    vt.append(root, _df_named(rows), num_files=1)
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)

            ts = [
                threading.Thread(target=_race, args=(r,))
                for r in (rows_a, rows_b)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=300)
            assert not errors, errors
            v_first = len(snapshots)
            got_first = Counter(
                (r.k, r[vname])
                for r in vt.read_version(spark, root, v_first).collect()
            ) - Counter(live)
            order = (
                (rows_a, rows_b)
                if got_first == Counter(rows_a.items())
                else (rows_b, rows_a)
            )
            live = live + sorted(order[0].items())
            snapshots.append(sorted(live))
            schemas.append(["k", vname])
            live = live + sorted(order[1].items())
        snapshots.append(sorted(live))
        schemas.append(["k", vname])

    assert len(vt.history(root)) == len(snapshots)
    for version, expect in enumerate(snapshots):
        df = vt.read_version(spark, root, version)
        assert df.columns == schemas[version], f"v{version} schema"
        val = schemas[version][1]
        got = sorted(
            (r.k, r[val]) for r in df.collect()
        )
        assert got == expect, f"version {version}: {got} != {expect}"
    if snapshots:
        # bloom/zone-map pruned point reads agree with the model on the
        # final snapshot for EVERY key in the domain (tables are
        # multisets: compare row lists, not last-write-wins dicts)
        for key in range(10):
            got = sorted(
                (r.k, r[vname])
                for r in vt.read_where(
                    spark, root, [("k", "==", key)]
                ).collect()
            )
            assert got == sorted(
                (k, v) for k, v in snapshots[-1] if k == key
            ), f"pruned point read for k={key}"
