"""Trained IVF approximate-nearest-neighbor index over an embedding column.

The queries layer has the oracle-checkable ANN forms (hyperplane LSH,
seed-vector IVF); this operator is the production form: centroids trained
with pyspark.ml KMeans (iterative, distributed), corpus assigned to cells
once (persist the assignment at scale), queries probe the ``nprobe``
nearest cells and exact-rerank inside them.

Scale: training samples the corpus; assignment is one broadcast of k
centroids; a query scans ~nprobe/k of the corpus. The assignment table is
the thing you bucket/persist at 100 TB (sources/bucketed.py), giving
shuffle-free probe scans.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from dataset_dedupe_estimator_spark.functions.vectors import cosine, norm


class IvfIndex:
    def __init__(self, assigned: DataFrame, centroids: np.ndarray):
        self.assigned = assigned  # (vec_id, embedding, nrm, cell)
        self.centroids = centroids  # (k, dim) float64

    @classmethod
    def train(
        cls,
        emb: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 16,
        seed: int = 42,
    ) -> "IvfIndex":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector, vector_to_array

        vecs = emb.select(
            id_col, vec_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
        )
        model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cell").fit(vecs)
        assigned = model.transform(vecs).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            norm(F.col(vec_col)).alias("nrm"),
            F.col("cell"),
        )
        centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
        return cls(assigned, centroids)

    def search(self, query_vec: list[float], topk: int = 10, nprobe: int = 2) -> DataFrame:
        """Top-k by cosine among the nprobe nearest cells' members."""
        q = np.asarray(query_vec, dtype=np.float64)
        cnorm = np.linalg.norm(self.centroids, axis=1) * (np.linalg.norm(q) or 1.0)
        sims = (self.centroids @ q) / np.where(cnorm == 0, 1.0, cnorm)
        probe_cells = [int(c) for c in np.argsort(-sims)[:nprobe]]
        qcol = F.array(*[F.lit(float(v)) for v in q])
        cos = cosine(F.col("embedding"), qcol, F.col("nrm"))
        return (
            self.assigned.filter(F.col("cell").isin(probe_cells))
            .select("vec_id", "cell", cos.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("vec_id"))
            .limit(topk)
        )


class PqIndex:
    """Persistent IVF-PQ index — the billion-vector production shape of
    ``queries/similarity.py:ivfpq_search``: trained coarse centroids and
    per-subspace PQ codebooks live in a JSON manifest; the corpus is
    stored ONLY as (vec_id, codes) parquet PARTITIONED BY cell. A query
    probes the ``nprobe`` nearest cells — Spark's partition pruning reads
    just those directories — and scores by asymmetric distance against a
    broadcast lookup table. No float vector is ever read at query time:
    at 64 dims the code column is 32x smaller than the vectors, which is
    what lets a 1B-vector index fit a small fraction of cluster memory.

    Single-writer build (plans/_index_lock.py); the manifest write is the
    atomic commit point, mirroring the chunk/LSH index protocol.
    """

    MANIFEST = "_pq_meta.json"

    def __init__(self, index_dir, centroids, codebooks, m, sub):
        self.index_dir = str(index_dir)
        self.centroids = centroids  # (k, dim)
        self.codebooks = codebooks  # (m, ks, sub)
        self.m, self.sub = m, sub

    @staticmethod
    def _train_codebooks(sample: np.ndarray, m: int, ks: int, iters: int, seed: int):
        """Per-subspace Lloyd k-means on a driver-side sample (FAISS
        trains PQ on samples too); deterministic for a fixed seed."""
        dim = sample.shape[1]
        sub = dim // m
        rng = np.random.default_rng(seed)
        books = np.empty((m, ks, sub), dtype=np.float64)
        for mi in range(m):
            x = sample[:, mi * sub : (mi + 1) * sub]
            cent = x[rng.choice(len(x), size=ks, replace=len(x) < ks)].copy()
            for _ in range(iters):
                d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                for c in range(ks):
                    hit = x[a == c]
                    if len(hit):
                        cent[c] = hit.mean(axis=0)
            books[mi] = cent
        return books

    @classmethod
    def build(
        cls,
        emb: DataFrame,
        index_dir,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        k: int = 16,
        m: int = 8,
        ks: int = 256,
        train_sample: int = 8192,
        kmeans_iters: int = 10,
        seed: int = 42,
    ) -> "PqIndex":
        import json
        import os
        from pathlib import Path

        from dataset_dedupe_estimator_spark.plans._index_lock import writer_lock

        index_dir = Path(index_dir)
        ivf = IvfIndex.train(emb, vec_col=vec_col, id_col=id_col, k=k, seed=seed)
        sample = np.array(
            [
                [float(v) for v in r[0]]
                for r in emb.select(vec_col).limit(train_sample).collect()
            ],
            dtype=np.float64,
        )
        dim = sample.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        books = cls._train_codebooks(sample, m, ks, kmeans_iters, seed)
        sub = dim // m

        def encode(batches):
            import pyarrow as pa

            C = books  # (m, ks, sub) — broadcast via closure
            for batch in batches:
                idx = {n: i for i, n in enumerate(batch.schema.names)}
                flat = batch.column(idx["embedding"]).flatten().to_numpy(
                    zero_copy_only=False
                )
                e = flat.astype(np.float64).reshape(-1, dim)
                codes = np.empty((e.shape[0], m), dtype=np.int64)
                for mi in range(m):
                    x = e[:, mi * sub : (mi + 1) * sub]
                    d = ((x[:, None, :] - C[mi][None, :, :]) ** 2).sum(axis=2)
                    codes[:, mi] = d.argmin(axis=1)
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(idx["vec_id"]),
                        batch.column(idx["cell"]),
                        pa.array([list(map(int, r)) for r in codes], pa.list_(pa.int64())),
                    ],
                    names=["vec_id", "cell", "codes"],
                )

        with writer_lock(index_dir):
            coded = ivf.assigned.select(
                F.col("vec_id"), F.col("cell"), F.col("embedding")
            ).mapInArrow(encode, "vec_id long, cell int, codes array<long>")
            coded.write.mode("overwrite").partitionBy("cell").parquet(
                str(index_dir / "codes")
            )
            manifest = {
                "k": k, "m": m, "ks": ks, "dim": dim,
                "centroids": ivf.centroids.tolist(),
                "codebooks": books.tolist(),
            }
            tmp = index_dir / (cls.MANIFEST + ".tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, index_dir / cls.MANIFEST)  # commit point
        return cls(index_dir, ivf.centroids, books, m, sub)

    @classmethod
    def load(cls, index_dir) -> "PqIndex":
        import json
        from pathlib import Path

        with open(Path(index_dir) / cls.MANIFEST) as f:
            mf = json.load(f)
        books = np.asarray(mf["codebooks"], dtype=np.float64)
        return cls(
            index_dir,
            np.asarray(mf["centroids"], dtype=np.float64),
            books,
            mf["m"],
            mf["dim"] // mf["m"],
        )

    def search(self, spark, query_vec, topk: int = 10, nprobe: int = 2) -> DataFrame:
        """ADC top-k over the probed cells' code partitions (smaller adc =
        closer). Partition pruning keeps the scan to nprobe/k of the
        code files; join vec_ids back to the source table for exact
        rerank if needed."""
        q = np.asarray(query_vec, dtype=np.float64)
        d2 = ((self.centroids - q[None, :]) ** 2).sum(axis=1)
        probe_cells = [int(c) for c in np.argsort(d2)[:nprobe]]
        table = np.empty((self.m, self.codebooks.shape[1]), dtype=np.float64)
        for mi in range(self.m):
            qs = q[mi * self.sub : (mi + 1) * self.sub]
            table[mi] = ((self.codebooks[mi] - qs[None, :]) ** 2).sum(axis=1)
        codes = spark.read.parquet(f"{self.index_dir}/codes").filter(
            F.col("cell").isin(probe_cells)
        )
        adc = None
        for mi in range(self.m):
            term = F.element_at(
                F.array(*[F.lit(float(v)) for v in table[mi]]),
                (F.col("codes")[mi] + 1).cast("int"),
            )
            adc = term if adc is None else adc + term
        return (
            codes.select("vec_id", "cell", adc.alias("adc"))
            .orderBy("adc", "vec_id")
            .limit(topk)
        )


def pq_index_add(spark, index_dir, emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Admit a new vector batch into an existing PqIndex — the
    continuous-ingestion path (same posture as the chunk/LSH indexes):
    centroids and codebooks are FROZEN at build time (re-training would
    silently invalidate every stored code), the batch is assigned and
    encoded against them, and its codes append into the same
    cell-partitioned layout. Already-present vec_ids are skipped
    (idempotent re-admission). O(batch) cost; holds the index writer
    lock for the append."""
    import numpy as np

    from dataset_dedupe_estimator_spark.plans._index_lock import writer_lock

    idx = PqIndex.load(index_dir)
    C = idx.centroids
    books = idx.codebooks
    m, sub = idx.m, idx.sub
    dim = C.shape[1]

    def assign_encode(batches):
        import pyarrow as pa

        for batch in batches:
            bidx = {n: i for i, n in enumerate(batch.schema.names)}
            flat = batch.column(bidx["embedding"]).flatten().to_numpy(
                zero_copy_only=False
            )
            e = flat.astype(np.float64).reshape(-1, dim)
            d2 = ((e[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cells = d2.argmin(axis=1).astype(np.int32)
            codes = np.empty((e.shape[0], m), dtype=np.int64)
            for mi in range(m):
                x = e[:, mi * sub : (mi + 1) * sub]
                dd = ((x[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = dd.argmin(axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(bidx["vec_id"]),
                    pa.array(cells, pa.int32()),
                    pa.array([list(map(int, r)) for r in codes], pa.list_(pa.int64())),
                ],
                names=["vec_id", "cell", "codes"],
            )

    with writer_lock(index_dir):
        known = spark.read.parquet(f"{index_dir}/codes").select("vec_id")
        fresh = (
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
            .join(known, "vec_id", "left_anti")
        )
        coded = fresh.mapInArrow(
            assign_encode, "vec_id long, cell int, codes array<long>"
        )
        coded.write.mode("append").partitionBy("cell").parquet(f"{index_dir}/codes")
        n_before = known.count()
        n_after = spark.read.parquet(f"{index_dir}/codes").count()
    return {"admitted": n_after - n_before, "total": n_after}


def pq_index_compact(spark, index_dir, files_per_cell: int = 1) -> dict:
    """Reclaim the small files a long admission history accumulates:
    rewrite the cell-partitioned code store with ``files_per_cell``
    files per cell. Runs under the writer lock; the rewrite lands in a
    staging dir and swaps in with two renames. A crash between the
    renames leaves ``codes`` absent and ``codes.__new__`` complete —
    the next compact (or load via _recover) finishes the swap; a crash
    before the swap leaves the staging dir an orphan that the next
    compact removes."""
    import shutil
    from pathlib import Path

    from dataset_dedupe_estimator_spark.plans._index_lock import writer_lock

    index_dir = Path(index_dir)
    codes = index_dir / "codes"
    staged = index_dir / "codes.__new__"
    trash = index_dir / "codes.__old__"
    with writer_lock(index_dir):
        _pq_recover(index_dir)
        for p in (staged, trash):
            if p.exists():
                shutil.rmtree(p)  # orphan from a crashed attempt
        df = spark.read.parquet(str(codes))
        n_before = sum(1 for f in codes.rglob("*.parquet"))
        (
            df.repartition(int(files_per_cell), "cell")
            .write.partitionBy("cell")
            .parquet(str(staged))
        )
        n_rows = spark.read.parquet(str(staged)).count()
        codes.rename(trash)
        staged.rename(codes)  # commit point
        shutil.rmtree(trash)
        n_after = sum(1 for f in codes.rglob("*.parquet"))
    return {"rows": n_rows, "files_before": n_before, "files_after": n_after}


def _pq_recover(index_dir) -> None:
    """Finish a compact interrupted between its two renames."""
    from pathlib import Path

    index_dir = Path(index_dir)
    codes = index_dir / "codes"
    staged = index_dir / "codes.__new__"
    if not codes.exists() and staged.exists():
        staged.rename(codes)
