"""Deterministic dataset splitting + cross-split leakage audit over
``documents`` — the train/val/test bookkeeping a training-data pipeline
runs after dedup (extension surface; no reference counterpart — the
reference stops at dedup estimation).

* ``split_assign`` — every document lands in train/val/test by hashing
  its ``doc_id`` (md5-prefix bucket, the repo's cross-engine hash
  discipline, dedupe_text.py:6). The split is a pure projection — stable
  under any row order, partitioning, or cluster layout, and reproducible
  forever from the id alone (the property sample()/randomSplit() lack:
  their assignment changes with partitioning). Output is the per
  (split, source) doc/token census a mixing report needs.
* ``cross_split_leakage`` — near-duplicate groups that span more than
  one split. Hash-based splitting assigns *copies* of the same content
  independently, so duplicates surviving upstream dedup leak train text
  into eval. Documents are keyed by the repo's normalized fingerprint
  (md5 of the sorted distinct token set, the ``dedup_fingerprint_groups``
  identity — exact texts never collide in this corpus, reordered
  near-copies do); groups spanning >1 split are reported one row per
  distinct split-combination.
* ``split_purge_eval`` — the actionable follow-up: eval (val/test) docs
  whose fingerprint also appears in train, i.e. the rows to drop before
  evaluation. Anti-leak decontamination as a survivor filter.

Scale shape (100 TB): ``split_assign`` is expression-only until a
3×n_sources groupBy — effectively zero shuffle. The leakage pair
aggregates only the 16-byte digest + split tag (never text), one
shuffle on digest; the purge is a digest semi-join AQE broadcasts when
the train-digest side's duplicate set is small.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.base import Q, load

# bucket thresholds out of 100: [0,80) train, [80,90) val, [90,100) test
TRAIN_LT, VAL_LT = 80, 90


def _with_split(docs):
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return docs.withColumn(
        "split",
        F.when(bucket < TRAIN_LT, F.lit("train"))
        .when(bucket < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test")),
    )


_SPLIT_EXPR = (
    "CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
    f" < {TRAIN_LT} THEN 'train'"
    " WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
    f" < {VAL_LT} THEN 'val' ELSE 'test' END"
)


def split_assign(spark, sf):
    """Per (split, source) census after deterministic hash splitting."""
    docs = load(spark, sf, "documents").select("doc_id", "source", "text")
    return (
        _with_split(docs)
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
        .orderBy("split", "source")
    )


SPLIT_ASSIGN_SQL = f"""
SELECT {_SPLIT_EXPR} AS split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
ORDER BY split, source
"""


def _fp_col():
    # built lazily: Column construction requires an active SparkContext
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ").cast("binary")
    )
_FP_SQL = "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"


def cross_split_leakage(spark, sf):
    """Near-dup fingerprint groups spanning >1 split, one row per combo."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    hashed = _with_split(docs).select(_fp_col().alias("text_hash"), "split")
    groups = hashed.groupBy("text_hash").agg(
        F.array_join(F.array_sort(F.collect_set("split")), "+").alias("splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        groups.filter(F.col("splits").contains("+"))
        .groupBy("splits")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_docs").alias("n_leaked_docs"),
        )
        .orderBy("splits")
    )


CROSS_SPLIT_LEAKAGE_SQL = f"""
WITH hashed AS (
  SELECT {_FP_SQL} AS text_hash, {_SPLIT_EXPR} AS split FROM documents
),
groups AS (
  SELECT text_hash,
         string_agg(DISTINCT split, '+' ORDER BY split) AS splits,
         COUNT(*) AS n_docs
  FROM hashed GROUP BY text_hash
)
SELECT splits, COUNT(*) AS n_groups,
       CAST(SUM(n_docs) AS BIGINT) AS n_leaked_docs
FROM groups WHERE splits LIKE '%+%'
GROUP BY splits ORDER BY splits
"""


def split_purge_eval(spark, sf):
    """Eval docs to drop: val/test rows whose fingerprint appears in train."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    hashed = _with_split(docs).select("doc_id", "split", _fp_col().alias("text_hash"))
    train_digests = hashed.filter(F.col("split") == "train").select("text_hash").distinct()
    return (
        hashed.filter(F.col("split") != "train")
        .join(train_digests, "text_hash", "left_semi")
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


SPLIT_PURGE_EVAL_SQL = f"""
WITH hashed AS (
  SELECT doc_id, {_SPLIT_EXPR} AS split, {_FP_SQL} AS text_hash FROM documents
)
SELECT h.doc_id, h.split
FROM hashed h
WHERE h.split <> 'train'
  AND EXISTS (SELECT 1 FROM hashed t
              WHERE t.split = 'train' AND t.text_hash = h.text_hash)
ORDER BY h.doc_id
"""


SAMPLE_K = 8  # docs kept per source


def pick_per_source(docs, k, id_col="doc_id", group_col="source"):
    """The K rows with the smallest md5(id) per group, rank attached as
    ``rnk`` — the layout-stable sampling primitive shared by the
    ``stratified_sample_docs`` gate entry and the ``de sample`` CLI.
    Hash discipline follows the cross-engine rule: md5 over the id's
    decimal string."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col))
    return docs.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def stratified_sample_docs(spark, sf):
    """Deterministic per-source sample: the K docs with the smallest
    md5(doc_id) rank within each source — eval-set construction that is
    stable under any partition layout or corpus growth ordering (unlike
    ``df.sample``, which changes with the split plan).  The rank window
    partitions by source, so the sort is per-source and bounded; ties
    are impossible (md5 of distinct ids).  At 100 TB this shuffles only
    (source, hash, doc_id) triples — never text.
    """
    docs = load(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return (
        pick_per_source(docs, SAMPLE_K)
        .select("source", "rnk", "doc_id", "n_chars")
        .orderBy("source", "rnk")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
SELECT source, rnk, doc_id, n_chars
FROM ranked WHERE rnk <= {SAMPLE_K}
ORDER BY source, rnk
"""


QUERIES = {
    "split_assign": Q(split_assign, SPLIT_ASSIGN_SQL),
    "stratified_sample_docs": Q(stratified_sample_docs, STRATIFIED_SAMPLE_SQL),
    "cross_split_leakage": Q(cross_split_leakage, CROSS_SPLIT_LEAKAGE_SQL),
    "split_purge_eval": Q(split_purge_eval, SPLIT_PURGE_EVAL_SQL),
}
