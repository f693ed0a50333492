"""At-size stress for clone_table — the O(live files) claim, measured.

Builds a table with hundreds of live files across many commits, masks a
band (copy-on-write delete), lays a ~50k-row deletion vector
(merge-on-read delete), then CLONES it and measures:

  * wall time of the clone (metadata + hard links + DV re-key only);
  * zero copied files (hard-link path taken for every live file);
  * the clone reads IDENTICALLY to the source (count + keyed checksum)
    while the source keeps moving afterwards;
  * clone time is dominated by neither data size nor DV row count
    (the Arrow re-key path, not a Python row loop).

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

COMMITS = 40
FILES_PER_COMMIT = 8
ROWS_PER_COMMIT = 25_000


def main() -> int:
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    spark = get_spark(app_name="stress-clone", shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="dde-stress-clone-")
    src = os.path.join(base, "src")
    dst = os.path.join(base, "dst")
    out: dict = {}
    try:
        for c in range(COMMITS):
            lo = c * ROWS_PER_COMMIT
            df = (
                spark.range(lo, lo + ROWS_PER_COMMIT)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 7 % 1_000_003).alias("v"),
                )
                .repartition(FILES_PER_COMMIT)
            )
            vt.append(src, df, stats_columns=["k"])
        # copy-on-write band: masks files out of one commit era
        vt.delete_where_pruned(
            spark, src, [("k", "between", (100_000, 149_999))]
        )
        # merge-on-read band: a ~50k-row deletion vector
        vt.delete_where_dv(
            spark, src, [("k", "between", (500_000, 549_999))]
        )

        t0 = time.perf_counter()
        st = vt.clone_table(src, dst)
        clone_s = time.perf_counter() - t0
        out["clone_s"] = round(clone_s, 3)
        out["linked_files"] = st["linked_files"]
        out["copied_files"] = st["copied_files"]
        out["dv_rows"] = st["dv_rows"]
        ok = st["copied_files"] == 0 and st["linked_files"] > 200
        ok = ok and st["dv_rows"] == 50_000

        def _sig(root):
            r = (
                vt.read_version(spark, root)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("k") * F.col("v")).alias("s"),
                )
                .collect()[0]
            )
            return (r.n, r.s)

        src_sig = _sig(src)
        dst_sig = _sig(dst)
        out["rows"] = src_sig[0]
        ok = ok and src_sig == dst_sig
        # source moves on; the clone must hold its snapshot
        vt.delete_where_pruned(spark, src, [("k", "<", 50_000)])
        ok = ok and _sig(dst) == dst_sig
        out["clone_ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
