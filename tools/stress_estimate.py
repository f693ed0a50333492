"""At-size stress for the estimate pipeline: N versions of a BASE_MB
random blob with realistic edits (insert / delete / in-place edit), run
the full chunk→dedup→stats pipeline, and check the CDC resync property:
unique bytes ≈ base + edit bytes, NOT N × base.

Usage: python tools/stress_estimate.py [base_mb] [n_versions]

This is the scale smoke the parquet fixtures can't give (they're ~17 MB
at sf0.1): it exercises multi-hundred-MB per-task chunking, the 8 MiB
streaming reader, and the groupBy(hash) shuffle at real chunk counts.
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
    from dataset_dedupe_estimator_spark.plans.estimate import estimate

    base_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_versions = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, base_mb << 20, dtype=np.uint8).tobytes()
    edit_mb = max(1, base_mb // 50)
    edit = rng.integers(0, 256, edit_mb << 20, dtype=np.uint8).tobytes()

    with tempfile.TemporaryDirectory(prefix="dde-stress-") as d:
        paths = []
        variants = {
            "v0-base": base,
            "v1-insert": base[: len(base) // 2] + edit + base[len(base) // 2 :],
            "v2-delete": base[: len(base) // 3] + base[len(base) // 3 + (edit_mb << 20) :],
            "v3-edit": base[: len(base) // 4] + edit + base[len(base) // 4 + len(edit) :],
        }
        for name, blob in list(variants.items())[:n_versions]:
            p = os.path.join(d, f"{name}.bin")
            with open(p, "wb") as f:
                f.write(blob)
            paths.append(p)

        spark = get_spark(app_name="dde-stress", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        res = estimate(spark, paths)
        wall = time.perf_counter() - t0
        total = res["total_len"]
        unique = res["chunk_bytes"]
        # resync bound: base + inserted/edited bytes + per-boundary slack
        expected_max = len(base) + 2 * (edit_mb << 20) + (4 << 20)
        ok = unique <= expected_max
        print(
            f"files={res['numfiles']} total={total / 1e6:.1f}MB "
            f"unique={unique / 1e6:.1f}MB ratio={res['dedup_ratio']:.4f} "
            f"wall={wall:.1f}s resync_ok={ok}"
        )
        return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
