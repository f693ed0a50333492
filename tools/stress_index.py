"""At-size stress for the persistent chunk index (plans/chunk_index.py):
admit successive edited versions of a BASE_MB blob and check that each
admission transfers only ~the edit bytes (CDC resync against ALL
history, not just the previous snapshot), that re-admission is a no-op,
and that update wall time tracks the snapshot being admitted — never
the accumulated index.

Usage: python tools/stress_index.py [base_mb]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.plans.chunk_index import (
        build_index,
        index_stats,
        update_index,
    )

    base_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, base_mb << 20, dtype=np.uint8).tobytes()
    edit_mb = max(1, base_mb // 50)
    edit = rng.integers(0, 256, edit_mb << 20, dtype=np.uint8).tobytes()
    versions = [
        ("v1-insert", base[: len(base) // 2] + edit + base[len(base) // 2 :]),
        ("v2-delete", base[: len(base) // 3] + base[len(base) // 3 + (edit_mb << 20) :]),
        ("v3-edit", base[: len(base) // 4] + edit + base[len(base) // 4 + len(edit) :]),
    ]
    slack = 4 << 20  # boundary-resync slack per admission

    spark = get_spark(app_name="dde-stress-index", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    with tempfile.TemporaryDirectory(prefix="dde-idx-") as d:
        idx = os.path.join(d, "index")

        def write(name: str, blob: bytes) -> str:
            p = os.path.join(d, f"{name}.bin")
            with open(p, "wb") as f:
                f.write(blob)
            return p

        p0 = write("v0-base", base)
        t0 = time.perf_counter()
        st = build_index(spark, [p0], idx)
        print(f"build: {st['novel_chunks']} chunks "
              f"{st['novel_bytes'] / 1e6:.1f}MB wall={time.perf_counter() - t0:.1f}s")

        for name, blob in versions:
            p = write(name, blob)
            t0 = time.perf_counter()
            st = update_index(spark, [p], idx)
            wall = time.perf_counter() - t0
            # v2-delete admits ~0 novel bytes; inserts/edits admit ~edit_mb
            bound = (edit_mb << 20) + slack
            good = st["novel_bytes"] <= bound
            ok &= good
            print(
                f"{name}: snapshot={st['snapshot_bytes'] / 1e6:.1f}MB "
                f"novel={st['novel_bytes'] / 1e6:.1f}MB "
                f"ratio={st['transfer_ratio']:.4f} wall={wall:.1f}s "
                f"o_novel_ok={good}"
            )

        t0 = time.perf_counter()
        st = update_index(spark, [p0], idx)
        wall = time.perf_counter() - t0
        noop = st["novel_chunks"] == 0 and st["novel_bytes"] == 0
        ok &= noop
        print(f"readmit-base: novel={st['novel_bytes']} wall={wall:.1f}s noop_ok={noop}")

        r = index_stats(spark, idx).collect()[0]
        # unique store ≈ base + 2 edits (+slack), never sum of snapshots
        bound = len(base) + 2 * (edit_mb << 20) + 3 * slack
        store_ok = r.unique_bytes <= bound
        ok &= store_ok
        print(
            f"store: generations={r.generations} chunks={r.unique_chunks} "
            f"unique={r.unique_bytes / 1e6:.1f}MB store_ok={store_ok}"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
