"""UPDATE-at-size stress: both update shapes against a ~100 MB,
multi-commit versioned table.

- copy-on-write (`update_where_pruned`): cost tracks the FILES the
  predicate touches (zone maps carry the rest by reference);
- merge-on-read (`update_where_dv`): cost tracks the UPDATED ROWS —
  a 10-row update writes a KB-sized sidecar + 10 rows of parquet and
  rewrites nothing, regardless of table size.

Asserts exactness after each step (spot-checked keys + total counts)
and that maintenance (optimize) purges DV pre-images without
resurrection.

Usage: python tools/stress_update.py [ROWS] (default 2_000_000)
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


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    if rows < 80:
        raise SystemExit("ROWS must be >= 80 (8 commits, 10 probe keys)")
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    spark = get_spark(app_name="stress-update", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_upd_")
    out: dict = {"rows": rows}
    try:
        n_commits = 8
        per = rows // n_commits
        t0 = time.perf_counter()
        for i in range(n_commits):
            hi = (i + 1) * per if i < n_commits - 1 else rows
            df = (
                spark.range(i * per, hi)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") % 1000).alias("price"),
                    F.sha2(F.col("id").cast("string"), 256).alias("pad"),
                )
                .repartitionByRange(8, "k")
            )
            vt.append(root, df, stats_columns=["k"])
        out["build_s"] = round(time.perf_counter() - t0, 2)
        out["live_files"] = sum(
            1 for _ in vt.Path(root).glob("data/*/*.parquet")
        )
        out["table_mb"] = round(
            sum(
                f.stat().st_size
                for f in vt.Path(root).glob("data/*/*.parquet")
            )
            / 1e6,
            1,
        )

        # copy-on-write: a band inside ONE commit — only its files move
        t0 = time.perf_counter()
        st = vt.update_where_pruned(
            spark, root, [("k", "between", (100, 199))], {"price": -1}
        )
        out["cow_update_s"] = round(time.perf_counter() - t0, 2)
        out["cow_rewritten_files"] = st["rewritten_files"]
        out["cow_carried_files"] = st["carried_files"]
        assert st["updated_rows"] == 100, st

        # merge-on-read: 10 scattered rows — zero rewrites, KB sidecar
        keys = tuple(range(0, rows, rows // 10))[:10]
        t0 = time.perf_counter()
        st2 = vt.update_where_dv(
            spark, root, [("k", "in", keys)], {"price": -2}
        )
        out["dv_update_s"] = round(time.perf_counter() - t0, 2)
        out["dv_rewritten_files"] = st2["rewritten_files"]
        assert st2["rewritten_files"] == 0 and st2["updated_rows"] == 10, st2
        dv_kb = sum(
            f.stat().st_size for f in vt.Path(root).glob("_dv/*/*.parquet")
        ) / 1e3
        out["dv_kb"] = round(dv_kb, 1)

        # exactness after both
        snap = vt.read_version(spark, root)
        assert snap.count() == rows
        got = {
            r.k: r.price
            for r in snap.filter(
                F.col("k").isin(150, *keys, 5000)
            ).collect()
        }
        assert got[150] == -1 and got[5000] == 5000 % 1000
        for k in keys:
            assert got[k] == -2, (k, got[k])

        # maintenance purges DV pre-images, keeps both updates
        t0 = time.perf_counter()
        vt.optimize(spark, root, num_files=8)
        out["optimize_s"] = round(time.perf_counter() - t0, 2)
        snap2 = vt.read_version(spark, root)
        assert snap2.count() == rows
        got2 = {
            r.k: r.price
            for r in snap2.filter(F.col("k").isin(150, keys[3])).collect()
        }
        assert got2[150] == -1 and got2[keys[3]] == -2
        out["ok"] = True
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
