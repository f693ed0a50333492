"""Embedding similarity stress at size — LSH recall + latency versus
brute force at 10x the bench corpus.

Synthesizes N unit-ish vectors (counter-based, deterministic) with
planted near-duplicate pairs (small perturbations), then measures:

  1. embedding_dedup_lsh-shaped candidate generation (adaptive planes,
     multi-table banding) — wall time + recall of planted near-dups
  2. trained-IVF probe (operators/ann.py) — top-k recall vs brute force
     for a sample of queries

Usage: python tools/stress_ann.py [n_vecs] [dim]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dataset_dedupe_estimator_spark import get_spark  # noqa: E402

PAIR_EVERY = 10  # every 10th vector is a near-dup of its predecessor


def synth_vectors(spark, n: int, dim: int):
    """Deterministic vectors via mapInArrow (counter-based RNG per id);
    vec i with i % PAIR_EVERY == 1 is vec i-1 plus ~1% noise."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                src = i - 1 if i % PAIR_EVERY == 1 else i
                rng = np.random.default_rng(int(src))
                v = rng.standard_normal(dim)
                if i % PAIR_EVERY == 1:
                    v = v + np.random.default_rng(int(i) + 10**9).standard_normal(dim) * 0.05
                out[j] = v / np.linalg.norm(v)
            offsets = pa.array(
                np.arange(0, (len(ids) + 1) * dim, dim, dtype=np.int32)
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.ListArray.from_arrays(offsets, pa.array(out.ravel())),
                ],
                names=["vec_id", "embedding"],
            )

    return spark.range(n).mapInArrow(gen, "vec_id long, embedding array<double>")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="stress-ann", shuffle_partitions=32)
    path = "/tmp/stress_ann_embeddings"
    synth_vectors(spark, n, dim).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    from dataset_dedupe_estimator_spark.queries.similarity import embedding_dedup_lsh

    t0 = time.time()
    pairs = embedding_dedup_lsh(spark, path)
    got = pairs.select("vec_a", "vec_b").collect()
    t_lsh = time.time() - t0
    got_set = {(r.vec_a, r.vec_b) for r in got}
    planted = {(i - 1, i) for i in range(1, n) if i % PAIR_EVERY == 1}
    # planted pairs have cosine ~0.999 >> the 0.45 query threshold
    recall = len(got_set & planted) / max(len(planted), 1)

    from dataset_dedupe_estimator_spark.operators.ann import IvfIndex

    emb = spark.read.parquet(f"{path}/embeddings.parquet")
    t0 = time.time()
    index = IvfIndex.train(emb, k=64, seed=7)
    t_train = time.time() - t0
    qrow = emb.filter(F.col("vec_id") == 4).collect()[0]
    t0 = time.time()
    hits = index.search(list(qrow.embedding), topk=10, nprobe=8).collect()
    t_q = time.time() - t0
    self_found = 4 in [r.vec_id for r in hits]

    # IVF-PQ asymmetric-distance search (queries/similarity.ivfpq_search):
    # query vec 0's TRUE nearest neighbor is planted vec 1 (~0.999
    # cosine, so near-identical PQ codes) — it must surface in the ADC
    # top-10 despite the 2/8-cell prune and 16-entry codebooks
    from dataset_dedupe_estimator_spark.queries.similarity import ivfpq_search

    t0 = time.time()
    adc_hits = ivfpq_search(spark, path).collect()
    t_pq = time.time() - t0
    pq_found = 1 in [r.vec_id for r in adc_hits]

    # persistent IVF-PQ index at size: build on 90% of the corpus, admit
    # the rest incrementally, search for a planted pair's survivor
    import tempfile

    from dataset_dedupe_estimator_spark.operators.ann import PqIndex, pq_index_add

    with tempfile.TemporaryDirectory(prefix="stress-pq-") as d:
        idx_dir = f"{d}/pq"
        old = emb.filter(F.col("vec_id") % 10 != 9)
        newb = emb.filter(F.col("vec_id") % 10 == 9)
        t0 = time.time()
        idx = PqIndex.build(old, idx_dir, k=64, ks=64, train_sample=4096, seed=7)
        t_build = time.time() - t0
        t0 = time.time()
        st = pq_index_add(spark, idx_dir, newb)
        t_add = time.time() - t0
        qrow2 = emb.filter(F.col("vec_id") == 10).collect()[0]  # planted dup of 11? (11%10==1 → 11 is near 10)
        t0 = time.time()
        hits2 = idx.search(spark, list(qrow2.embedding), topk=10, nprobe=16).collect()
        t_pqi = time.time() - t0
        idx_self = 10 in [r.vec_id for r in hits2]

    print(
        f"vecs={n} dim={dim} lsh: pairs={len(got_set)} planted_recall={recall:.3f} "
        f"[{t_lsh:.1f}s]  ivf: train={t_train:.1f}s query={t_q:.1f}s "
        f"self_found={self_found}  ivfpq: query={t_pq:.1f}s nn_found={pq_found}  "
        f"pq_index: build={t_build:.1f}s add={st['admitted']}@{t_add:.1f}s "
        f"query={t_pqi:.1f}s self_found={idx_self}  "
        f"recall_ok={recall >= 0.95}"
    )
    return 0 if recall >= 0.95 and self_found and pq_found and idx_self else 1


if __name__ == "__main__":
    raise SystemExit(main())
