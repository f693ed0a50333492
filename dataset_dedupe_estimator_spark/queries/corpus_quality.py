"""Corpus quality & incremental-ingest operators over ``documents`` —
the CCNet/RefinedWeb-style scoring passes a training-data pipeline runs
after dedup, plus the Bloom-prefiltered "new vs already-ingested" split.

* ``unigram_surprisal`` — per-document mean surprisal under a corpus
  unigram LM, the CCNet quality signal (docs whose tokens are globally
  rare score high; boilerplate scores low). Surprisal is integer-
  quantized to whole bits (``floor(log2 N) - floor(log2 cnt)`` per
  token) so every aggregate is exact BIGINT arithmetic — hash-identical
  across engines by construction, no float-summation order hazard.
* ``tfidf_top_terms`` — top-5 characteristic terms per source by a
  deterministic tf-idf variant (``tf / df``: term count in the source
  over the number of sources containing the term). The only float op is
  one correctly-rounded IEEE division, so ranking is engine-identical.
* ``bloom_incremental_dedup`` — split an incoming batch into duplicate
  vs new against an already-ingested history using a broadcast Bloom
  prefilter (``operators/bloom.py``); exact output (Bloom has no false
  negatives), oracle is a plain semi-join. The reference's global
  HashSet dedup (``/root/reference/src/xet.rs:24-33``) re-expressed for
  a history too big to shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.bloom import bloom_build, bloom_probe
from dataset_dedupe_estimator_spark.queries.base import Q, load

TOP_K_TERMS = 5
MIN_TERM_LEN = 4  # skip stopword-length tokens in tf-idf


def _bits(col):
    """floor(log2(col)) for a positive BIGINT, exactly: length of the
    minimal binary representation minus one. Avoids float log entirely
    (DuckDB mirrors with ``length(bin(x)) - 1``)."""
    return (F.length(F.conv(col.cast("string"), 10, 2)) - 1).cast("long")


def unigram_surprisal(spark, sf):
    """Per-doc token count and total/mean unigram surprisal in whole bits.

    Plan shape: one shuffle to count tokens (map-side combine collapses
    each partition to its vocabulary), one token-keyed join of the
    (doc_id, token) stream against the counts (AQE broadcasts the counts
    side when the vocabulary is small; at web scale it stays a shuffle
    join on the token key, which is the right shape — no vocab
    broadcast, the round-1 MinHash lesson), one groupBy(doc_id). The
    corpus-total N joins in as a 1-row cross join, not a collect.
    """
    docs = load(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (
        tok.join(counts, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(_bits(F.col("cnt"))).alias("sum_cnt_bits"),
        )
    )
    total = counts.agg(_bits(F.sum("cnt")).alias("bits_n"))
    return (
        per_doc.crossJoin(total)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bits_n") * F.col("n_tokens") - F.col("sum_cnt_bits")).alias(
                "total_bits"
            ),
            (
                (F.col("bits_n") * F.col("n_tokens") - F.col("sum_cnt_bits")).cast(
                    "double"
                )
                / F.col("n_tokens").cast("double")
            ).alias("mean_bits"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_SURPRISAL_SQL = """
WITH tok AS (
  SELECT doc_id, u.token FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
),
counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
total AS (
  SELECT CAST(length(bin(CAST(SUM(cnt) AS BIGINT))) - 1 AS BIGINT) AS bits_n
  FROM counts
),
per_doc AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(length(bin(c.cnt)) - 1) AS BIGINT) AS sum_cnt_bits
  FROM tok t JOIN counts c USING (token) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(bits_n * n_tokens - sum_cnt_bits AS BIGINT) AS total_bits,
       CAST(bits_n * n_tokens - sum_cnt_bits AS DOUBLE)
         / CAST(n_tokens AS DOUBLE) AS mean_bits
FROM per_doc, total
ORDER BY doc_id
"""


def tfidf_top_terms(spark, sf):
    """Top-5 characteristic terms per source by tf/df (see module doc).

    Plan shape: two hash aggregates ((source, token) then token) and one
    token-keyed join; the ranking window partitions by source, so the
    sort is per-source, never global. Ties break on the term itself —
    fully deterministic on any cluster layout.
    """
    docs = load(spark, sf, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token")).filter(
        F.length("token") >= MIN_TERM_LEN
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "token").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K_TERMS)
        .select("source", "rnk", "token", "tf", "df", "score")
        .orderBy("source", "rnk")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tok AS (
  SELECT source, u.token FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
  WHERE length(u.token) >= {MIN_TERM_LEN}
),
tf AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY source, token
),
idf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.source, tf.token, tf.tf, idf.df,
         CAST(tf.tf AS DOUBLE) / CAST(idf.df AS DOUBLE) AS score
  FROM tf JOIN idf USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY score DESC, token
  ) AS rnk
  FROM scored
)
SELECT source, rnk, token, tf, df, score
FROM ranked WHERE rnk <= {TOP_K_TERMS}
ORDER BY source, rnk
"""


def bloom_incremental_dedup(spark, sf):
    """Per-source duplicate/new counts for an incoming batch checked
    against an already-ingested history, Bloom-prefiltered.

    ``doc_id % 10 < 7`` plays the multi-PB history; the rest is the
    incoming batch. The history folds into a 1 Mi-bit Bloom filter once
    (bounded 128 KiB broadcast), the batch probes it JVM-side, and only
    bloom-positive candidates enter the exact md5-digest semi-join. The
    oracle is the plain semi-join — identical output because Bloom
    filters never produce false negatives.
    """
    docs = load(spark, sf, "documents")
    digest = F.md5(F.col("text").cast("binary")).alias("digest")
    old = docs.filter(F.col("doc_id") % 10 < 7).select(digest)
    incoming = docs.filter(F.col("doc_id") % 10 >= 7).select(
        "doc_id", "source", digest
    )
    bloom = bloom_build(old, "digest")
    probed = bloom_probe(incoming, "digest", bloom)
    candidates = probed.filter(F.col("bloom_hit")).join(
        old.distinct(), "digest", "left_semi"
    )
    dup_flag = incoming.join(
        candidates.select("doc_id", F.lit(1).alias("is_dup")), "doc_id", "left"
    )
    return (
        dup_flag.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            ).cast("long").alias("n_new"),
        )
        .orderBy("source")
    )


BLOOM_INCREMENTAL_DEDUP_SQL = """
WITH old AS (SELECT md5(text) AS digest FROM documents WHERE doc_id % 10 < 7),
inc AS (
  SELECT doc_id, source, md5(text) AS digest
  FROM documents WHERE doc_id % 10 >= 7
),
flagged AS (
  SELECT doc_id, source,
         CASE WHEN digest IN (SELECT digest FROM old) THEN 1 ELSE 0 END AS is_dup
  FROM inc
)
SELECT source, COUNT(*) AS n_incoming,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_new
FROM flagged GROUP BY source ORDER BY source
"""


QUERIES = {
    "unigram_surprisal": Q(unigram_surprisal, UNIGRAM_SURPRISAL_SQL),
    "tfidf_top_terms": Q(tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "bloom_incremental_dedup": Q(bloom_incremental_dedup, BLOOM_INCREMENTAL_DEDUP_SQL),
}
