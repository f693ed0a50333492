"""Attribution for the `table_sink_drain` lifecycle bench leg (r13,
VERDICT ask #4): split the drain's wall time into

  (a) the Python-DataSource harness + source floor  — the SAME source
      drained into a `noop` sink (exactly the `table_stream_drain` leg);
  (b) the executor staging write                    — Arrow RecordBatches
      to parquet, measured by draining into the versioned sink on a
      table whose publish hook is a no-op (replay-skip path: txn
      watermark pre-advanced so commit() returns before touching data);
  (c) the pyarrow-only publish                      — `publish_staged_files`
      called directly on pre-staged files, N times on fresh tables.

Run:  python tools/attr_sink_drain.py  [N]
Prints one table; paste the numbers into SCALING.md §streaming-ingest.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("attr_sink_drain")
        .getOrCreate()
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = _spark()
    from dataset_dedupe_estimator_spark.sources import table_sink as ts
    from dataset_dedupe_estimator_spark.sources import versioned as vt
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)

    work = tempfile.mkdtemp(prefix="attr_sink_")
    # the bench leg's exact source shape: 3-commit orders table
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    src_root = f"{work}/src"
    third = orders.count() // 3
    for i in range(3):
        vt.append(
            src_root,
            orders.offset(i * third).limit(third)
            if i < 2
            else orders.offset(2 * third),
            stats_columns=["o_orderkey"],
        )

    def drain(sink_fmt: str, sink_opts: dict, tag: str, k: int):
        reader = (
            spark.readStream.format("versioned_table")
            .option("ignoreChanges", "true")
            .load(src_root)
        )
        w = reader.writeStream.format(sink_fmt)
        for key, v in sink_opts.items():
            w = w.option(key, v)
        (
            w.option("checkpointLocation", f"{work}/{tag}-ck{k}")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    def timed(fn, label, setup=None):
        ts_ = []
        for k in range(n):
            if setup is not None:
                setup(k)
            t0 = time.perf_counter()
            fn(k)
            ts_.append(time.perf_counter() - t0)
        print(
            f"ATTR| {label:34s} min {min(ts_):6.2f}s  "
            f"median {statistics.median(ts_):6.2f}s  "
            f"stdev {statistics.pstdev(ts_):5.2f}s   ({n} runs)",
            flush=True,
        )
        return ts_

    # (a) harness + source floor: noop sink
    a = timed(lambda k: drain("noop", {}, "noop", k), "a) source -> noop (harness floor)")

    # (b) floor + executor staging: versioned sink, publish short-circuited
    # by a pre-advanced txn watermark (commit() hits the replay-skip
    # return before reading any staged byte; staging itself still runs)
    def stage_only_setup(k):
        # fresh destination with the sink app's txn watermark
        # PRE-ADVANCED: commit() hits the replay-skip return before
        # reading a staged byte, so the timed drain = floor + staging
        root = f"{work}/stageonly{k}"
        qid = f"attr-stage-{k}"
        vt.append(root, orders.limit(1), stats_columns=["o_orderkey"])
        vt.append(
            root, orders.limit(1), txn=(qid, 10_000),
            stats_columns=["o_orderkey"],
        )

    b = timed(
        lambda k: drain(
            "versioned_table",
            {"path": f"{work}/stageonly{k}", "appId": f"attr-stage-{k}"},
            f"so{k}", k,
        ),
        "b) + executor staging (publish skipped)",
        setup=stage_only_setup,
    )

    # (c) publish alone: stage the drain's file set once per run, call
    # publish_staged_files directly
    import glob

    def publish_only(k):
        root = f"{work}/pub{k}"
        vt.append(root, orders.limit(1), stats_columns=["o_orderkey"])
        stage_src = f"{work}/pubstage{k}"
        orders.repartition(int(CPUS)).write.parquet(stage_src)
        files = sorted(glob.glob(f"{stage_src}/part-*.parquet"))
        t0 = time.perf_counter()
        ts.publish_staged_files(
            root, files, txn=("attr-pub", k),
            stats_columns=["o_orderkey"],
        )
        return time.perf_counter() - t0

    c = []
    for k in range(n):
        c.append(publish_only(k))
    print(
        f"ATTR| {'c) publish_staged_files alone':34s} min {min(c):6.2f}s  "
        f"median {statistics.median(c):6.2f}s  "
        f"stdev {statistics.pstdev(c):5.2f}s   ({n} runs, "
        f"{int(CPUS)}-file commit)"
    )
    print(
        f"\nATTR| attribution (medians): floor {statistics.median(a):.2f}s | "
        f"staging +{statistics.median(b) - statistics.median(a):.2f}s | "
        f"publish ~{statistics.median(c):.2f}s"
    )
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
