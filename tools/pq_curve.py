"""PqIndex quality/latency curve: recall@k and per-query wall vs nprobe.

The 500k stress records one end-to-end number; this tool produces the
operating curve a deployment actually tunes: for nprobe in {1,2,4,8}
cells, ADC search recall@K against exact cosine ground truth on a
deterministic probe sample, plus mean per-query latency. Ground truth
is computed once in numpy on the collected corpus — this is an offline
audit tool, the corpus at audit scale (sf0.1: ~60k x 64 floats ~ 30 MB)
fits the driver; the INDEX path under test stays fully distributed.

Usage: python tools/pq_curve.py [sf_dir] [n_probes]
Prints one JSON line; paste into SCALING.md §PqIndex.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 10  # recall depth
SHORTLIST = 200  # ADC shortlist depth for the exact-rerank row
NPROBES = (1, 2, 4, 8, 64)  # 64 = every cell: isolates PQ-distortion ceiling from cell misses
N_QUERIES = 16


def main() -> None:
    import tempfile

    import numpy as np

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.operators.ann import PqIndex

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="dde-pq-curve")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    n = len(ids)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    probe_idx = np.linspace(0, n - 1, N_QUERIES, dtype=int)

    # exact cosine ground truth (self excluded)
    gt = {}
    for pi in probe_idx:
        sims = Xn @ Xn[pi]
        sims[pi] = -2.0
        top = np.argsort(-sims)[:K]
        gt[int(ids[pi])] = {int(ids[t]) for t in top}

    out = {"sf_dir": sf, "n_vecs": int(n), "k": K, "n_queries": N_QUERIES}
    with tempfile.TemporaryDirectory(prefix="pq-curve-") as d:
        t0 = time.time()
        idx = PqIndex.build(emb, f"{d}/idx", k=64, ks=64, train_sample=4096, seed=7)
        out["build_s"] = round(time.time() - t0, 2)
        curve = []
        for nprobe in NPROBES:
            recalls, rr_recalls, lats, rr_lats = [], [], [], []
            for pi in probe_idx:
                q = [float(v) for v in X[pi]]
                # code-only mode (emb=None): the archival/cold-vector path
                t0 = time.time()
                hits = idx.search(spark, q, topk=K + 1, nprobe=nprobe).collect()
                lats.append(time.time() - t0)
                got = {h.vec_id for h in hits if h.vec_id != int(ids[pi])}
                recalls.append(len(got & gt[int(ids[pi])]) / K)
                # DEFAULT deployment path: built-in ADC shortlist ->
                # exact rerank inside PqIndex.search (the broadcast
                # join reads only SHORTLIST float rows)
                t0 = time.time()
                rr_hits = idx.search(
                    spark, q, topk=K + 1, nprobe=nprobe, emb=emb, rerank=SHORTLIST
                ).collect()
                rr_lats.append(time.time() - t0)
                rr = {h.vec_id for h in rr_hits if h.vec_id != int(ids[pi])}
                rr_recalls.append(len(rr & gt[int(ids[pi])]) / K)
            curve.append(
                {
                    "nprobe": nprobe,
                    "recall_at_k": round(float(np.mean(recalls)), 4),
                    "rerank_recall_at_k": round(float(np.mean(rr_recalls)), 4),
                    "mean_query_s": round(float(np.mean(lats)), 3),
                    "rerank_query_s": round(float(np.mean(rr_lats)), 3),
                }
            )
        out["curve"] = curve

        # Encoding ablation (r7): plain vs residual recall at higher
        # query count, evaluated numpy-side with EXACTLY the search
        # path's math (cell assignment by L2, per-cell ADC tables,
        # shortlist SHORTLIST, exact-cosine rerank to K) — the Spark
        # path is a deterministic function of codes + tables, so the
        # recall numbers are the ones a cluster would serve; latency is
        # measured above on the real path.
        t0 = time.time()
        idx_plain = PqIndex.build(
            emb, f"{d}/plain", k=64, ks=64, train_sample=4096, seed=7,
            encoding="plain",
        )
        out["plain_build_s"] = round(time.time() - t0, 2)
        out["encoding_ablation_64q"] = _ablation(
            spark, X, ids, (("plain", idx_plain), ("residual", idx))
        )
    print(json.dumps(out))


def _ablation(spark, X, ids, indexes) -> dict:
    """Reranked recall@K of each (name, PqIndex) over 64 queries,
    numpy twin of the search math (see comment at the call site)."""
    import numpy as np

    n = len(ids)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    abl_q = np.linspace(0, n - 1, 64, dtype=int)
    abl_gt = {}
    for pi in abl_q:
        sims = Xn @ Xn[pi]
        sims[pi] = -2.0
        abl_gt[int(pi)] = {int(t) for t in np.argsort(-sims)[:K]}
    pos = {int(v): i for i, v in enumerate(ids)}
    abl = {}
    for name, ix in indexes:
        codes_pdf = ix.codes_df(spark).toPandas()
        cvec = codes_pdf["cell"].to_numpy()
        cid = codes_pdf["vec_id"].to_numpy()
        cmat = np.stack(codes_pdf["codes"].to_numpy()).astype(np.int64)
        per_np = {}
        for nprobe in (8, 64):
            recs = []
            for pi in abl_q:
                q = X[pi]
                d2 = ((ix.centroids - q[None, :]) ** 2).sum(axis=1)
                cells = [int(c) for c in np.argsort(d2)[:nprobe]]
                mask = np.isin(cvec, cells)
                sub_cells = cvec[mask]
                sub_codes = cmat[mask]
                adc = np.zeros(mask.sum())
                for c in cells:
                    m2 = sub_cells == c
                    if not m2.any():
                        continue
                    T = ix._cell_table(q, c)
                    a = np.zeros(m2.sum())
                    for mi in range(ix.m):
                        a += T[mi, sub_codes[m2][:, mi]]
                    adc[m2] = a
                short = cid[mask][np.argsort(adc, kind="stable")[:SHORTLIST]]
                sel = np.array([pos[int(v)] for v in short])
                sims = Xn[sel] @ Xn[pi]
                ranked = [
                    int(sel[t])
                    for t in np.argsort(-sims, kind="stable")
                    if int(sel[t]) != int(pi)
                ][:K]
                recs.append(len(set(ranked) & abl_gt[int(pi)]) / K)
            per_np[f"rerank_recall_nprobe{nprobe}"] = round(
                float(np.mean(recs)), 4
            )
        abl[name] = per_np
    return abl


def clustered() -> None:
    """--clustered: the ablation on a CLUSTERED corpus (mixture of 64
    Gaussians, within-cluster sigma a fraction of the centroid
    spread — the shape real embedding corpora have, where residual
    encoding is the standard win; the testdata embeddings are
    near-uniform, the adversarial case documented in SCALING.md)."""
    import tempfile

    import numpy as np

    from dataset_dedupe_estimator_spark import get_spark
    from dataset_dedupe_estimator_spark.operators.ann import PqIndex

    n, dim, n_clusters, sigma = 20_000, 64, 64, 0.15
    rng = np.random.default_rng(11)
    cents = rng.normal(0.0, 1.0, (n_clusters, dim))
    assign = rng.integers(0, n_clusters, n)
    X = cents[assign] + rng.normal(0.0, sigma, (n, dim))
    ids = np.arange(n)

    spark = get_spark(app_name="dde-pq-curve-clustered")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    # float32 storage like the real table: evaluate on what was stored
    Xf = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], np.float64
    )
    out = {
        "corpus": "clustered-mog", "n_vecs": n, "dim": dim,
        "clusters": n_clusters, "sigma": sigma, "k": K,
    }
    with tempfile.TemporaryDirectory(prefix="pq-clu-") as d:
        res = PqIndex.build(
            emb, f"{d}/res", k=64, ks=64, train_sample=4096, seed=7
        )
        plain = PqIndex.build(
            emb, f"{d}/plain", k=64, ks=64, train_sample=4096, seed=7,
            encoding="plain",
        )
        out["encoding_ablation_64q"] = _ablation(
            spark, Xf, ids, (("plain", plain), ("residual", res))
        )
    print(json.dumps(out))


if __name__ == "__main__":
    if "--clustered" in sys.argv:
        clustered()
    else:
        main()
