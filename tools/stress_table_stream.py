"""At-size exercise of the r7 table surfaces: zone-map-bounded MERGE,
the versioned-table streaming source, and the at-rest change data feed.

Usage: python tools/stress_table_stream.py [ROWS] [COMMITS]
       (defaults 2_000_000 rows across 16 commits of 4 files each)

Asserts, at size:
- upsert_pruned with K scattered keys rewrites ~K files, not the span
  between them (selectivity = rewritten/total must stay near K/files),
  and the result equals the full-rewrite upsert's row count + spot keys.
- the streaming source drains the whole table exactly once (row count
  == snapshot count) with one input partition per live file.
- change-data files are O(changed rows): cdf bytes for the merge are a
  tiny fraction of the table bytes.

Prints one JSON line; exit 0 only if every invariant holds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    commits = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    files_per_commit = 4

    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark = get_spark(app_name="stress-table-stream", shuffle_partitions=16)
    spark.dataSource.register(VersionedTableStreamSource)
    work = tempfile.mkdtemp(prefix="stress_ts_")
    root = f"{work}/tbl"
    out: dict = {"rows": rows, "commits": commits}
    ok = True
    try:
        per = rows // commits
        t0 = time.time()
        for c in range(commits):
            df = spark.range(c * per, (c + 1) * per).select(
                F.col("id"),
                F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
                (F.col("id") * 7 % 1000).alias("v"),
                F.sha1(F.col("id").cast("string")).alias("payload"),
            ).repartitionByRange(files_per_commit, "id")
            vt.append(root, df, stats_columns=["id"],
                      bloom_columns=["doc_id"], bloom_bits=1 << 20,
                      change_feed=(c == 0))
            # ~31k distinct values/file and a MULTI-key probe: size the
            # bloom so FPR x keys x files << 1 (1 Mi bits -> ~1.6e-4
            # per probe; the default 64 Ki saturates at this density)
        out["build_s"] = round(time.time() - t0, 2)
        n_files = commits * files_per_commit
        table_bytes = sum(
            f.stat().st_size for f in Path(root, "data").rglob("*.parquet")
        )
        out["live_files"] = n_files
        out["table_mb"] = round(table_bytes / 1e6, 1)

        # --- scattered-key MERGE selectivity -------------------------
        k = 10  # fewer keys than files: selectivity must show
        step = rows // k
        keys = [i * step + step // 2 for i in range(k)]
        ups = spark.createDataFrame(
            [(x, f"doc-{x:012d}", -1, "upd") for x in keys],
            "id long, doc_id string, v long, payload string",
        )
        t0 = time.time()
        st = vt.upsert_pruned(spark, root, ups, ["id"])
        out["merge_s"] = round(time.time() - t0, 2)
        out["merge_rewritten_files"] = st["rewritten_files"]
        out["merge_carried_files"] = st["carried_files"]
        out["merge_replaced_rows"] = st["replaced_rows"]
        # scattered keys must NOT trigger a span rewrite: every file
        # holds an id range of ~rows/n_files, so ~min(k, n_files) files
        # can hold the k keys
        if st["rewritten_files"] > min(k, n_files) or st["replaced_rows"] != k:
            ok = False
            out["fail"] = "merge selectivity or replaced-count wrong"
        snap = vt.read_version(spark, root)
        if snap.count() != rows:
            ok = False
            out["fail"] = "merge changed row count"

        # --- STRING-key merge: blooms prune where zone maps can't ----
        # keyed on the STRING column only: no integer range available
        ups2 = spark.createDataFrame(
            [(x + 1, f"doc-{x + 1:012d}", -2, "upd2") for x in keys],
            "id long, doc_id string, v long, payload string",
        )
        t0 = time.time()
        st2 = vt.upsert_pruned(spark, root, ups2, ["doc_id"])
        out["bloom_merge_s"] = round(time.time() - t0, 2)
        out["bloom_merge_rewritten"] = st2["rewritten_files"]
        out["bloom_merge_carried"] = st2["carried_files"]
        if st2["rewritten_files"] > len(keys) + 2 or st2["replaced_rows"] != k:
            ok = False
            out["fail"] = "string-key bloom merge did not prune"

        # --- change data is O(changed rows) --------------------------
        cdf_bytes = sum(
            f.stat().st_size for f in Path(root, "_cdf").rglob("*.parquet")
        )
        out["cdf_kb"] = round(cdf_bytes / 1e3, 1)
        # 2k change rows vs the whole table: must be a rounding error
        # (k deletes + k inserts)
        if cdf_bytes > table_bytes * 0.02:
            ok = False
            out["fail"] = "cdf not O(changed rows)"
        feed_n = vt.read_change_feed(spark, root, commits - 1).count()
        if feed_n != 4 * k:  # 2 merges x (k deletes + k inserts)
            ok = False
            out["fail"] = f"cdf feed rows {feed_n} != {4 * k}"

        # --- deletion vector at size: zero rewrites, exact reads -----
        import hashlib as _hl

        def _file_md5s():
            return {
                str(f): _hl.md5(f.read_bytes()).hexdigest()
                for f in sorted(Path(root, "data").rglob("*.parquet"))
            }

        before_dv = _file_md5s()
        dv_keys = [k * 131 for k in range(1, 11)]
        t0 = time.time()
        st3 = vt.delete_where_dv(spark, root, [("id", "in", dv_keys)])
        out["dv_delete_s"] = round(time.time() - t0, 2)
        out["dv_deleted_rows"] = st3["deleted_rows"]
        if _file_md5s() != before_dv:
            ok = False
            out["fail"] = "dv delete touched a data file"
        left = vt.read_where(spark, root, [("id", "in", dv_keys)]).count()
        if left != 0 or st3["deleted_rows"] != len(dv_keys):
            ok = False
            out["fail"] = f"dv rows still visible ({left}) or count off"
        dv_bytes = sum(
            f.stat().st_size for f in Path(root, "_dv").rglob("*.parquet")
        )
        out["dv_kb"] = round(dv_bytes / 1e3, 1)
        if dv_bytes > table_bytes * 0.001:  # KB sidecar vs ~100 MB table
            ok = False
            out["fail"] = "dv sidecar not O(deleted rows)"

        # --- streaming drain: exactly the snapshot, once -------------
        sink, ckpt = f"{work}/sink", f"{work}/ck"
        t0 = time.time()
        q = (
            spark.readStream.format("versioned_table")
            .option("ignoreChanges", "true")  # the merge commit
            .load(root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            ok = False
            out["fail"] = "stream drain timeout"
        out["stream_drain_s"] = round(time.time() - t0, 2)
        drained = spark.read.parquet(sink).count()
        # ignoreChanges re-delivers the merge commit's survivor dir; the
        # APPEND-ONLY portion must appear exactly once: distinct ids
        # == rows and every key's latest value is present
        distinct_ids = spark.read.parquet(sink).select("id").distinct().count()
        out["stream_rows"] = drained
        if distinct_ids != rows:
            ok = False
            out["fail"] = f"stream distinct ids {distinct_ids} != {rows}"
        out["stream_mrows_per_s"] = round(
            drained / 1e6 / max(out["stream_drain_s"], 1e-9), 2
        )
        out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
