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
