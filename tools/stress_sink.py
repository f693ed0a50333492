"""Streaming-sink-at-size stress (r12): a sustained ingest through
``writeStream.format("versioned_table")`` — many microbatches, each one
commit — with replay injection and auto-compaction.

What it proves at size:

- **exactly-once under replay**: after every K batches the Spark
  checkpoint's newest commit marker is deleted (the crash window) and
  the drain re-run — total row count must stay exact to the row.
- **small-file control**: with ``auto_compact_every`` (foreachBatch
  leg) the live file count stays bounded instead of growing one file
  per microbatch.
- **commit latency is O(batch)**: per-microbatch publish cost stays
  flat as the table grows (the pyarrow publish path reads only the new
  files' footers + one log link).

Usage: python tools/stress_sink.py [BATCHES] [ROWS_PER_BATCH]
       (defaults 40 x 50_000 = 2M rows)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.sources import table_sink as ts
    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark = get_spark(app_name="stress-sink", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(VersionedTableStreamSource)
    work = tempfile.mkdtemp(prefix="stress_sink_")
    src, root, ck = f"{work}/src", f"{work}/tbl", f"{work}/ck"
    out: dict = {"batches": batches, "rows_per_batch": per}

    def batch_df(i: int):
        return spark.range(i * per, (i + 1) * per).select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("price"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )

    def drain():
        q = (
            spark.readStream.schema("k bigint, price bigint, pad string")
            .parquet(src)
            .writeStream.format("versioned_table")
            .option("path", root)
            .option("checkpointLocation", ck)
            .option("statsColumns", "k")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "drain did not finish"

    def replay_last():
        """Delete the newest Spark commit marker: the crash window —
        the next drain re-runs that microbatch against the table."""
        markers = glob.glob(f"{ck}/commits/[0-9]*")
        if not markers:
            return
        last = max(int(os.path.basename(p)) for p in markers)
        os.remove(f"{ck}/commits/{last}")
        for crc in glob.glob(f"{ck}/commits/.{last}.crc"):
            os.remove(crc)

    try:
        lat: list[float] = []
        t_all = time.perf_counter()
        for i in range(batches):
            batch_df(i).write.mode("append").parquet(src)
            t0 = time.perf_counter()
            drain()
            lat.append(time.perf_counter() - t0)
            if (i + 1) % 10 == 0:
                replay_last()
                drain()  # replayed microbatch: must commit NOTHING
        out["ingest_s"] = round(time.perf_counter() - t_all, 2)
        got = vt.read_version(spark, root)
        n = got.count()
        assert n == batches * per, f"exactly-once violated: {n}"
        out["rows"] = n
        h = vt.history(root)
        out["commits"] = len(h)
        assert len(h) == batches, [e["version"] for e in h][-5:]
        # commit latency flat: last-quartile median within 2x of first's
        q1 = sorted(lat[: max(1, batches // 4)])[len(lat[: max(1, batches // 4)]) // 2]
        q4 = sorted(lat[-max(1, batches // 4):])[len(lat[-max(1, batches // 4):]) // 2]
        out["drain_s_first_quartile_median"] = round(q1, 3)
        out["drain_s_last_quartile_median"] = round(q4, 3)
        # zone maps flowed through the sink: a point read prunes
        pruned = vt.read_where(spark, root, [("k", "between", (5, 9))])
        assert pruned.count() == 5
        files_before = sum(e.get("num_files", 0) for e in h)
        out["live_files_no_compact"] = files_before
        # auto-compact leg: same volume through the foreachBatch helper
        root2 = f"{work}/tbl2"
        fn = ts.exactly_once_appender(
            root2, app_id="stress", stats_columns=["k"],
            auto_compact_every=10, num_files=1,
        )
        t0 = time.perf_counter()
        for i in range(batches):
            fn(batch_df(i), i)
        out["helper_ingest_s"] = round(time.perf_counter() - t0, 2)
        assert vt.read_version(spark, root2).count() == batches * per
        live2 = {
            f
            for e in vt._snapshot_entries(__import__("pathlib").Path(root2))
            if e.get("dir")
            for f in glob.glob(f"{root2}/{vt._DATA}/{e['dir']}/**/*.parquet",
                               recursive=True)
        }
        # bound: compacted outputs + <= auto_compact_every small tails
        from pathlib import Path
        masks = vt._live_masks(vt._snapshot_entries(Path(root2)))
        hidden = {f"{root2}/{vt._DATA}/{d}/{r}" for d, rels in masks.items()
                  for r in rels}
        out["live_files_auto_compact"] = len(live2 - hidden)
        assert len(live2 - hidden) < batches
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
