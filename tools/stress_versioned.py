"""At-size stress for sources/versioned.py — many-commit tables.

The claims measured (not assumed): commit cost is flat as history grows
(the log fold is O(commits), ~KB of JSON — never data-sized); a
120-commit snapshot read is a plain multi-scan union that still counts
120 x 50k rows in seconds; time travel to any midpoint is exact; one
optimize commit collapses the 120-directory live set to one; vacuum
reclaims every superseded directory while historical log entries remain.

Prints one JSON line; exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COMMITS = 120
ROWS_PER_COMMIT = 50_000


def main() -> int:
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    spark = get_spark(app_name="stress-versioned")
    out: dict[str, object] = {"commits": COMMITS, "rows_per_commit": ROWS_PER_COMMIT}
    root = os.path.join(tempfile.mkdtemp(prefix="stress_vt_"), "tbl")
    try:
        first_ten = last_ten = 0.0
        for i in range(COMMITS):
            df = (
                spark.range(i * ROWS_PER_COMMIT, (i + 1) * ROWS_PER_COMMIT)
                .select("id", (F.col("id") % 97).alias("v"))
            )
            t0 = time.time()
            vt.append(root, df, num_files=1)
            dt = time.time() - t0
            if i < 10:
                first_ten += dt
            if i >= COMMITS - 10:
                last_ten += dt
        out["commit_s_first10_avg"] = round(first_ten / 10, 3)
        out["commit_s_last10_avg"] = round(last_ten / 10, 3)

        t0 = time.time()
        dirs = vt.live_dirs(root)
        out["resolve_ms"] = round((time.time() - t0) * 1000, 1)
        out["live_dirs"] = len(dirs)

        t0 = time.time()
        n = vt.read_version(spark, root).count()
        out["read_latest_s"] = round(time.time() - t0, 2)
        out["rows_latest"] = n

        mid = COMMITS // 2 - 1
        n_mid = vt.read_version(spark, root, mid).count()
        out["rows_mid_exact"] = n_mid == (mid + 1) * ROWS_PER_COMMIT

        t0 = time.time()
        vt.optimize(spark, root, num_files=8)
        out["optimize_s"] = round(time.time() - t0, 2)
        out["live_dirs_after_optimize"] = len(vt.live_dirs(root))

        removed = vt.vacuum(root, keep_versions=1)
        # vacuum also reports retired sidecars/checkpoints (prefixed
        # "<kind>/"); the data-directory count is the structural claim
        out["vacuumed_dirs"] = len([r for r in removed if "/" not in r])
        out["vacuumed_ckpts"] = len(
            [r for r in removed if r.startswith("_vlog/")]
        )
        out["history_entries"] = len(vt.history(root))
        n2 = vt.read_version(spark, root).count()

        # --- partitioned variant: pruning must hold through the log ---
        proot = os.path.join(os.path.dirname(root), "ptbl")
        pdf = (
            spark.range(4_000_000)
            .select("id", (F.col("id") % 16).alias("bucket"), (F.col("id") * 3).alias("v"))
        )
        vt.append(proot, pdf, partition_by=["bucket"])
        vt.append(proot, pdf.withColumn("id", F.col("id") + 4_000_000))
        t0 = time.time()
        full = vt.read_version(spark, proot).count()
        t_full = time.time() - t0
        t0 = time.time()
        one = vt.read_version(spark, proot).filter(F.col("bucket") == 3).count()
        t_pruned = time.time() - t0
        out["part_full_s"] = round(t_full, 2)
        out["part_pruned_s"] = round(t_pruned, 2)
        out["part_counts_ok"] = full == 8_000_000 and one == 500_000
        plan = (
            vt.read_version(spark, proot)
            .filter(F.col("bucket") == 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        out["part_filters_in_plan"] = "PartitionFilters: [isnotnull(bucket" in plan

        ok = (
            out["part_counts_ok"]
            and out["part_filters_in_plan"]
            and n == COMMITS * ROWS_PER_COMMIT
            and n2 == n
            and out["rows_mid_exact"]
            and out["live_dirs"] == COMMITS
            and out["live_dirs_after_optimize"] == 1
            and out["vacuumed_dirs"] == COMMITS
            and out["history_entries"] == COMMITS + 1
            # commit cost must not grow with history (3x guard well above
            # noise; the log fold is KB-sized JSON)
            and out["commit_s_last10_avg"] < 3 * max(out["commit_s_first10_avg"], 0.05)
        )
        out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
