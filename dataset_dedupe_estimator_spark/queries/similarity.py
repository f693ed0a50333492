"""Similarity search over the ``embeddings`` table (array<float>, dim 64):
brute-force cosine top-k (baseline), random-hyperplane LSH bucketing (scale
path), and embedding-cosine near-dup pairs.

Float discipline: both engines cast float→double (exact) and fold the
products **left-to-right from 0.0** — Spark ``F.aggregate`` and DuckDB
``list_reduce`` are both sequential left folds, so dot products are
bit-identical and need no rounding; comparisons and top-k orderings are
therefore stable across engines.

Scale notes: brute-force is one broadcast of the query vector — no
shuffle at all; the LSH variant buckets the corpus once (narrow shuffle on
bucket id) and scans only the query's bucket. At 100 TB you persist the
bucketed table and the per-bucket centroid stats; IVF-style probing is the
same plan with >1 bucket scanned.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.queries.base import Q, load

DIM = 64
QUERY_VEC_ID = 0
N_PLANES = 4

# Deterministic hyperplanes, shared verbatim by both engines as literals.
_PLANES = np.round(
    np.random.default_rng(20260813).standard_normal((N_PLANES, DIM)), 4
).tolist()


# canonical fold-deterministic implementations live in functions.vectors
from dataset_dedupe_estimator_spark.functions.vectors import (  # noqa: E402
    dot as _dot,
    norm as _norm,
)


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _sql_plane(p: int) -> str:
    return "[" + ", ".join(repr(v) for v in _PLANES[p]) + "]"


def _sql_plane_dot(p: int, vec: str = "embedding") -> str:
    lits = _PLANES[p]
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({vec}[i] AS DOUBLE) * ({_sql_plane(p)})[i]), (x, y) -> x + y)"
    )


def knn_brute_force(spark, sf):
    """Exact cosine top-10 neighbours of vec {QUERY_VEC_ID} (broadcast query,
    no shuffle)."""
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding")
    )
    cos = _dot(F.col("embedding"), F.col("q_embedding")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_embedding"))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


KNN_SQL = f"""
WITH q AS (SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       {_sql_dot("embedding", "q_embedding")}
       / (sqrt({_sql_dot("embedding", "embedding")}) * sqrt({_sql_dot("q_embedding", "q_embedding")}))
       AS cosine
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def _bucket_bits(vec: Column) -> Column:
    planes = [
        F.array(*[F.lit(float(v)) for v in _PLANES[p]]) for p in range(N_PLANES)
    ]
    bits = [
        F.when(_dot(vec, planes[p]) >= 0.0, "1").otherwise("0") for p in range(N_PLANES)
    ]
    return F.concat(*bits)


def ann_lsh_bucketed(spark, sf):
    """ANN via random-hyperplane LSH: scan only the query vector's bucket,
    exact cosine within it, top-5. The 100 TB plan: bucket once, probe one
    (or few) buckets per query."""
    emb = load(spark, sf, "embeddings").withColumn(
        "bucket", _bucket_bits(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    cos = _dot(F.col("embedding"), F.col("q_embedding")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_embedding"))
    )
    return (
        emb.join(F.broadcast(q), emb.bucket == F.col("q_bucket"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", "bucket", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


_BUCKET_SQL = " || ".join(
    f"CASE WHEN {_sql_plane_dot(p)} >= 0.0 THEN '1' ELSE '0' END"
    for p in range(N_PLANES)
)

ANN_LSH_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, label, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
),
q AS (SELECT embedding AS q_embedding, bucket AS q_bucket FROM bucketed
      WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label, bucket,
       {_sql_dot("embedding", "q_embedding")}
       / (sqrt({_sql_dot("embedding", "embedding")}) * sqrt({_sql_dot("q_embedding", "q_embedding")}))
       AS cosine
FROM bucketed, q
WHERE bucket = q_bucket AND vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 5
"""


def embedding_dedup_pairs(spark, sf):
    """Embedding-cosine near-duplicate pairs, brute-force baseline.
    Threshold 0.45 (corpus max pairwise cosine is ~0.51). Norms are
    computed ONCE per vector before the pair join — the per-pair work is a
    single dot product."""
    emb = load(spark, sf, "embeddings")
    normed = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    a = normed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )


EMB_DEDUP_NORMED_CTE = f"""
normed AS (
  SELECT vec_id, embedding, sqrt({_sql_dot("embedding", "embedding")}) AS nrm
  FROM embeddings
)
"""

EMB_DEDUP_SQL = f"""
WITH {EMB_DEDUP_NORMED_CTE}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
FROM normed a JOIN normed b ON a.vec_id < b.vec_id
WHERE {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
ORDER BY vec_a, vec_b
"""


def embedding_dedup_lsh(spark, sf):
    """Scale path for embedding near-dup: hyperplane-LSH bucket the corpus
    once, then exact cosine only within buckets — pair candidates drop by
    ~the bucket count (16 here; more planes at larger corpora). Same
    threshold as the brute-force baseline, so results are its subset."""
    emb = load(spark, sf, "embeddings")
    normed = emb.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _bucket_bits(F.col("embedding")).alias("bucket"),
    )
    a = normed.select(
        F.col("bucket"), F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
    )
    b = normed.select(
        F.col("bucket"), F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("bucket", "vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )


EMB_DEDUP_LSH_SQL = f"""
WITH normed AS (
  SELECT vec_id, embedding, sqrt({_sql_dot("embedding", "embedding")}) AS nrm,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
)
SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
FROM normed a JOIN normed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.45
ORDER BY vec_a, vec_b
"""


N_CELLS = 8


def ann_ivf_probe(spark, sf):
    """IVF-style ANN: partition the corpus into cells around seed vectors
    (deterministically the first {N_CELLS} vec_ids), then probe only the
    query's cell with exact cosine.

    The 100 TB shape: assignment is one broadcast of {N_CELLS} centroids +
    a narrow shuffle on cell id (persisted once); each query scans one
    cell (~1/{N_CELLS} of the corpus; real IVF uses trained centroids and
    nprobe>1 — same plan, more cells)."""
    emb = load(spark, sf, "embeddings")
    normed = emb.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    cents = normed.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("cemb"),
        F.col("nrm").alias("cnrm"),
    )
    sim = _dot(F.col("embedding"), F.col("cemb")) / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell_id"))
    assigned = (
        normed.crossJoin(F.broadcast(cents))
        .withColumn("csim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "nrm", "cell_id")
    )
    q = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        F.col("cell_id").alias("qcell"),
    )
    cos = _dot(F.col("embedding"), F.col("qe")) / (F.col("nrm") * F.col("qn"))
    return (
        assigned.join(F.broadcast(q), assigned.cell_id == F.col("qcell"))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", "cell_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


ANN_IVF_SQL = f"""
WITH normed AS (
  SELECT vec_id, label, embedding,
         sqrt({_sql_dot("embedding", "embedding")}) AS nrm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cell_id, embedding AS cemb, nrm AS cnrm
  FROM normed WHERE vec_id < {N_CELLS}
),
assigned AS (
  SELECT vec_id, label, embedding, nrm, cell_id
  FROM (
    SELECT n.*, c.cell_id,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY {_sql_dot("n.embedding", "c.cemb")} / (n.nrm * c.cnrm) DESC,
                      c.cell_id) AS rn
    FROM normed n CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT embedding AS qe, nrm AS qn, cell_id AS qcell
      FROM assigned WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label, cell_id,
       {_sql_dot("embedding", "qe")} / (nrm * qn) AS cosine
FROM assigned, q
WHERE cell_id = qcell AND vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT 5
"""


def label_centroid_spread(spark, sf):
    """Per-label vector statistics via positional aggregation — integer
    counts + left-fold sums kept deterministic."""
    emb = load(spark, sf, "embeddings")
    first_component = F.col("embedding")[0].cast("double")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(first_component).alias("min_c0"),
            F.max(first_component).alias("max_c0"),
        )
        .orderBy("label")
    )


LABEL_STATS_SQL = """
SELECT label, COUNT(*) AS n_vectors,
       MIN(CAST(embedding[1] AS DOUBLE)) AS min_c0,
       MAX(CAST(embedding[1] AS DOUBLE)) AS max_c0
FROM embeddings GROUP BY label ORDER BY label
"""


QUERIES = {
    "knn_brute_force": Q(knn_brute_force, KNN_SQL, headline=True),
    "ann_lsh_bucketed": Q(ann_lsh_bucketed, ANN_LSH_SQL),
    "ann_ivf_probe": Q(ann_ivf_probe, ANN_IVF_SQL),
    "embedding_dedup_pairs": Q(embedding_dedup_pairs, EMB_DEDUP_SQL),
    "embedding_dedup_lsh": Q(embedding_dedup_lsh, EMB_DEDUP_LSH_SQL, headline=True),
    "label_centroid_spread": Q(label_centroid_spread, LABEL_STATS_SQL),
}
