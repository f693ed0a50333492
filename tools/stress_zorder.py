"""At-size stress for operators/layout.py — z-order write + measured pruning.

20M rows over a 4096x4096 two-dimensional key space are rewritten
z-ordered (one bounds broadcast + one range exchange) into 256 files,
and the claim that matters at 100 TB is measured from the real parquet
footers, not assumed:

* a conjunctive ~3% x ~3% band must touch <8% of row groups (the
  natural layout touches ~100%; equal-count range partitions over
  correlated data are not square Morton tiles, so the floor is above
  the 0.1% rectangle area — measured ~4-5%, a 20x+ scan reduction),
* a band on EITHER single dimension alone must prune (<25% touched) —
  the property a 1-D sort only gives one column,
* row counts and per-column sums survive the rewrite bit-exactly.

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

N = 20_000_000
DOMAIN = 4096
FILES = 256


def main() -> int:
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.operators.layout import (
        pruning_fraction,
        write_zordered,
    )

    spark = get_spark(app_name="stress-zorder")
    out: dict[str, object] = {"rows": N, "files": FILES}
    root = tempfile.mkdtemp(prefix="stress_zorder_")
    try:
        # Adversarial-ish profile: x uniform, y correlated with x for half
        # the rows (correlated dimensions are the common real case) and
        # uniform for the rest.
        df = (
            spark.range(N)
            .withColumn("x", F.xxhash64("id") % DOMAIN)
            .withColumn("x", F.abs("x"))
            .withColumn(
                "y",
                F.when(
                    F.col("id") % 2 == 0,
                    (F.col("x") + F.abs(F.xxhash64("id", F.lit(1)) % 64)) % DOMAIN,
                ).otherwise(F.abs(F.xxhash64("id", F.lit(2)) % DOMAIN)),
            )
            .select("id", "x", "y")
        )
        natural = f"{root}/natural"
        t0 = time.time()
        df.repartition(FILES).write.mode("overwrite").parquet(natural)
        out["write_natural_s"] = round(time.time() - t0, 2)

        zpath = f"{root}/zordered"
        t0 = time.time()
        write_zordered(
            spark.read.parquet(natural), ["x", "y"], zpath, bits=12, num_files=FILES
        )
        out["write_zorder_s"] = round(time.time() - t0, 2)

        band = (2000, 2127)  # 128/4096 ~ 3% of each dimension
        conj = {"x": band, "y": band}
        out["conj_natural"] = round(pruning_fraction(natural, conj), 4)
        out["conj_zorder"] = round(pruning_fraction(zpath, conj), 4)
        out["x_only_zorder"] = round(pruning_fraction(zpath, {"x": band}), 4)
        out["y_only_zorder"] = round(pruning_fraction(zpath, {"y": band}), 4)

        a = spark.read.parquet(natural).agg(
            F.count(F.lit(1)), F.sum("x"), F.sum("y")
        ).first()
        b = spark.read.parquet(zpath).agg(
            F.count(F.lit(1)), F.sum("x"), F.sum("y")
        ).first()
        out["roundtrip_exact"] = tuple(a) == tuple(b)

        ok = (
            out["roundtrip_exact"]
            and out["conj_natural"] > 0.9
            and out["conj_zorder"] < 0.08
            and out["x_only_zorder"] < 0.25
            and out["y_only_zorder"] < 0.25
        )
        out["ok"] = ok
        print(json.dumps(out))
        return 0 if ok else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
