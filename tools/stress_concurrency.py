"""Multi-writer stress: SEPARATE PROCESSES (each its own Spark JVM)
write the same versioned table concurrently — N appenders + one
DV-deleter — and the final table must equal the serial multiset.

This is the two-process proof behind the optimistic-concurrency design
(sources/versioned.py): data writes run lock-free into staging
directories; the short publish critical section rebases commuting
commits (blind appends, disjoint-file deletes) onto the moving tip.
Nothing here retries at the APPLICATION level — every rebase happens
inside the engine, and every writer must succeed exactly once.

Usage: python tools/stress_concurrency.py [APPENDERS] [BATCHES]
       (defaults 3 appenders x 5 batches, plus 1 DV deleter)

Asserts:
- every worker process exits 0 (no ConcurrentModificationError for
  these commuting workloads, no lock timeout)
- final live rows == initial rows minus the DV band plus every
  appended batch (exact multiset)
- the commit log is GAPLESS (v0..vN, one entry per landed commit) and
  contains every worker's commits
- a checkpoint + pointer materialized under the concurrent load and
  the snapshot path resolves identically to the raw log

Prints one JSON line; exit 0 only if every invariant holds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(kind: str, root: str, wid: int, batches: int) -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")
    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    spark = get_spark(
        app_name=f"stress-conc-{kind}-{wid}", master="local[4]",
        shuffle_partitions=4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if kind == "append":
        for j in range(batches):
            lo = 100_000 * (wid + 1) + 100 * j
            vt.append(
                root,
                spark.range(lo, lo + 50).selectExpr(
                    "id as k", f"{wid}L as v"
                ),
                num_files=1,
            )
    else:  # dv-deleter: carve the initial band away in chunks
        for j in range(batches):
            lo, hi = 10 * j, 10 * j + 9
            st = vt.delete_where_dv(
                spark, root, [("k", "between", (lo, hi))]
            )
            assert st["committed"] and st["deleted_rows"] == 10, st
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        return _worker(
            sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
        )
    appenders = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    out = {"appenders": appenders, "batches": batches}
    spark = get_spark(
        app_name="stress-conc-main", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="dde-conc-") as d:
        root = Path(d) / "tbl"
        n_initial = 10 * batches + 20
        vt.append(
            root,
            spark.range(n_initial).selectExpr("id as k", "-1L as v"),
            num_files=2, stats_columns=["k"],
        )
        t0 = time.perf_counter()
        procs = []
        for w in range(appenders):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "append", str(root), str(w), str(batches)],
                cwd=REPO, stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
            ))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "dv", str(root), str(appenders), str(batches)],
            cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        ))
        fails = []
        for p in procs:
            _, err = p.communicate(timeout=900)
            if p.returncode != 0:
                fails.append(err.decode()[-800:])
        out["wall_sec"] = round(time.perf_counter() - t0, 2)
        out["workers_failed"] = len(fails)
        if fails:
            out["first_failure"] = fails[0]
        # exact multiset: initial minus the deleted band plus appends
        got = sorted(
            (r.k, r.v)
            for r in vt.read_version(spark, str(root)).collect()
        )
        want = sorted(
            [(k, -1) for k in range(10 * batches, n_initial)]
            + [
                (100_000 * (w + 1) + 100 * j + i, w)
                for w in range(appenders)
                for j in range(batches)
                for i in range(50)
            ]
        )
        out["rows"] = len(got)
        out["rows_expected"] = len(want)
        ok_rows = got == want
        # gapless log, every commit audited
        versions = [e["version"] for e in vt.history(str(root))]
        n_commits = 1 + appenders * batches + batches
        ok_log = versions == list(range(n_commits))
        out["commits"] = len(versions)
        # checkpoint + pointer materialized under concurrency; snapshot
        # path == raw log
        ck = vt._latest_checkpoint(root)
        out["checkpoint"] = ck.name if ck else None
        snap = vt._snapshot_entries(root)
        raw = vt._committed_entries(root)
        need_ck = n_commits > vt._CKPT_EVERY  # cadence reached at all?
        ok_snap = snap[-1]["version"] == raw[-1]["version"] and (
            not need_ck
            or (
                ck is not None
                and (root / "_vlog" / "_last_checkpoint").exists()
            )
        )
        out["ok_rows"] = bool(ok_rows)
        out["ok_log"] = bool(ok_log)
        out["ok_snapshot"] = bool(ok_snap)
        out["ok"] = bool(ok_rows and ok_log and ok_snap and not fails)
    print(json.dumps(out))
    spark.stop()
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
