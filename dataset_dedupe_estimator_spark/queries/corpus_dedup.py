"""Corpus-scale dedup & sampling operators over ``documents`` —
round-3 additions to the LLM-training-data extension surface:

* ``dedup_keep_first_pruned`` — same survivor set as ``dedup_keep_first``
  but with the 100 TB plan shape: the full-width document rows never
  enter a window sort. Only the 16-byte digest column shuffles (map-side
  partial agg collapses to unique digests per partition), the *duplicated*
  digests — typically a tiny fraction of the corpus — come back as a
  keeper table, and the survivor filter is a join AQE converts to a
  broadcast hash join when the dup set is small (runtime-Bloom-style
  pruning: rows whose digest is not in the dup table pass through
  untouched). Compare ``dedup_keep_first`` (dedupe_text.py:115-126),
  which windows over every row.
* ``dedup_spans`` — sub-document exact dedup: non-overlapping
  ``SPAN_W``-word segments, global first-occurrence-wins (the C4/
  RefinedWeb line-dedup move, applied to word windows because the test
  corpus has no newlines). Per-doc summary of surviving spans.
* ``mixture_sample`` — deterministic source-weighted resampling ("data
  mixing"): each source gets a quota ∝ its weight, filled by a stable
  hash-ranking of its documents, so the sample is reproducible on any
  cluster layout and any row order.

All three are fully oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.ranking import with_global_cumsum
from dataset_dedupe_estimator_spark.queries.base import Q, load

SPAN_W = 8  # words per span (sub-document dedup granularity)
MIX_FRACTION = 0.4  # overall sampling target as a fraction of the corpus


def dedup_keep_first_pruned(spark, sf):
    """Survivor set after exact dedup, duplicate-pruned plan (see module
    docstring). Output is identical to ``dedup_keep_first``."""
    docs = load(spark, sf, "documents").select(
        F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id"
    )
    dup_keepers = (
        docs.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
        .select("text_hash", "keeper")
    )
    # No explicit F.broadcast: at petabyte scale the dup set *can* exceed
    # broadcast limits, and AQE picks broadcast at runtime whenever it is
    # actually small — the adaptive answer, not a hard-coded hint.
    return (
        docs.join(dup_keepers, "text_hash", "left")
        .filter(F.col("keeper").isNull() | (F.col("doc_id") == F.col("keeper")))
        .select("doc_id")
        .orderBy("doc_id")
    )


DEDUP_KEEP_FIRST_PRUNED_SQL = """
WITH h AS (SELECT md5(text) AS text_hash, doc_id FROM documents),
dups AS (
  SELECT text_hash, MIN(doc_id) AS keeper
  FROM h GROUP BY 1 HAVING COUNT(*) > 1
)
SELECT h.doc_id FROM h LEFT JOIN dups USING (text_hash)
WHERE keeper IS NULL OR doc_id = keeper
ORDER BY doc_id
"""


def _spans(spark, sf):
    """(doc_id, span_idx, span_hash): md5 of each non-overlapping SPAN_W-word
    window (trailing partial window included, so every token is covered)."""
    docs = load(spark, sf, "documents")
    toks = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    t = F.col("t")
    n_spans = F.ceil(F.size(t) / F.lit(SPAN_W)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda j: F.concat_ws(" ", F.slice(t, j * SPAN_W + 1, SPAN_W)),
    )
    return toks.select(
        "doc_id", F.posexplode(spans).alias("span_idx", "span_text")
    ).select(
        "doc_id", "span_idx", F.md5(F.col("span_text").cast("binary")).alias("span_hash")
    )


def dedup_spans(spark, sf):
    """Sub-document span dedup summary: per doc, how many of its SPAN_W-word
    spans are globally first occurrences (kept) vs repeats of a span seen
    earlier (by (doc_id, span_idx) order) anywhere in the corpus.

    Scale shape: the window shuffles only (span_hash, doc_id, span_idx)
    triples — ~24 bytes per span regardless of document width.
    """
    sp = _spans(spark, sf)
    w = Window.partitionBy("span_hash").orderBy("doc_id", "span_idx")
    flagged = sp.withColumn("rn", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
        .orderBy("doc_id")
    )


DEDUP_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
spans AS (
  SELECT doc_id, j - 1 AS span_idx,
         md5(array_to_string(t[(j-1)*{SPAN_W}+1 : j*{SPAN_W}], ' ')) AS span_hash
  FROM toks, UNNEST(generate_series(1, CAST(ceil(len(t) / {SPAN_W}.0) AS BIGINT))) AS u(j)
),
flagged AS (
  SELECT doc_id, span_idx,
         ROW_NUMBER() OVER (PARTITION BY span_hash ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


def mixture_sample(spark, sf):
    """Deterministic source-weighted corpus resampling.

    Source ``srcN`` gets weight 3 if N is even else 1; its quota is
    ``floor(total * MIX_FRACTION * w / Σw)`` documents, filled by ranking
    its documents on md5(doc_id) — a stable, layout-independent lottery.
    Returns the sampled (source, doc_id) pairs.

    Scale shape: one narrow shuffle on source for the ranking window; the
    per-source weight/quota table is a per-group aggregate, not a
    driver-side list.
    """
    docs = load(spark, sf, "documents").select("source", "doc_id")
    # sources without trailing digits: cast('') -> null -> weight 1, which
    # the oracle mirrors with TRY_CAST (a plain CAST errors in DuckDB)
    weight = F.when(
        (F.regexp_extract("source", r"(\d+)$", 1).cast("int") % 2) == 0, F.lit(3)
    ).otherwise(F.lit(1))
    weighted = docs.withColumn("w", weight)
    # per-source size and weight; total corpus count + total weight-mass
    # come from a scalar aggregate broadcast back over the per-source
    # rows (no single-partition window anywhere in the plan)
    per_src = weighted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_src"), F.first("w").alias("w")
    )
    totals = per_src.agg(
        F.sum("n_src").alias("_tot_n"), F.sum("w").alias("_tot_w")
    )
    quotas = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.floor(
            F.col("_tot_n") * F.lit(MIX_FRACTION) * F.col("w") / F.col("_tot_w")
        ).alias("quota"),
    )
    rank_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = weighted.withColumn("rk", F.row_number().over(rank_w))
    return (
        ranked.join(quotas, "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


MIXTURE_SAMPLE_SQL = f"""
WITH weighted AS (
  SELECT source, doc_id,
         CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 2 = 0
              THEN 3 ELSE 1 END AS w
  FROM documents
),
quotas AS (
  SELECT source,
         CAST(FLOOR(SUM(COUNT(*)) OVER () * {MIX_FRACTION} * ANY_VALUE(w)
                    / SUM(ANY_VALUE(w)) OVER ()) AS BIGINT) AS quota
  FROM weighted GROUP BY source
),
ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM weighted
)
SELECT r.source, r.doc_id
FROM ranked r JOIN quotas q ON r.source = q.source
WHERE r.rk <= q.quota
ORDER BY r.source, r.doc_id
"""


SEQ_LEN = 256  # tokens per packed training sequence


def sequence_pack(spark, sf):
    """GPT-style sequence packing accounting: concatenate every document's
    tokens in doc_id order, slice the stream into fixed SEQ_LEN windows,
    and report per sequence how many documents contribute, how many tokens
    it holds (== SEQ_LEN except the tail), and its first/last doc — the
    bookkeeping a pretraining dataloader needs to map sequences back to
    provenance.

    Plan: token counts are a projection; the concatenated stream position
    is one exact distributed prefix sum
    (``operators/ranking.with_global_cumsum``: range-partition by doc_id,
    cumsum within each range partition + broadcast per-partition offsets
    — no single-partition window); each doc explodes into only the
    sequences it overlaps (a doc spanning k windows emits k rows).
    """
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    cum, _ = with_global_cumsum(
        toks, [F.col("doc_id")], weight_col="n_tokens", out_col="_cum"
    )
    pos = cum.select(
        "doc_id",
        "n_tokens",
        (F.col("_cum") - F.col("n_tokens")).alias("start_pos"),
    )
    first_seq = F.floor(F.col("start_pos") / SEQ_LEN)
    last_seq = F.floor((F.col("start_pos") + F.col("n_tokens") - 1) / SEQ_LEN)
    exploded = pos.select(
        "doc_id",
        "n_tokens",
        "start_pos",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    overlap = F.least(
        F.col("start_pos") + F.col("n_tokens"), (F.col("seq_id") + 1) * SEQ_LEN
    ) - F.greatest(F.col("start_pos"), F.col("seq_id") * SEQ_LEN)
    return (
        exploded.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(overlap).alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


SEQUENCE_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
pos AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_pos
  FROM toks
),
exploded AS (
  SELECT doc_id, n_tokens, start_pos, u.seq_id
  FROM pos, UNNEST(generate_series(
    CAST(FLOOR(start_pos / {SEQ_LEN}.0) AS BIGINT),
    CAST(FLOOR((start_pos + n_tokens - 1) / {SEQ_LEN}.0) AS BIGINT)
  )) AS u(seq_id)
)
SELECT seq_id, COUNT(*) AS n_docs,
       CAST(SUM(LEAST(start_pos + n_tokens, (seq_id + 1) * {SEQ_LEN})
                - GREATEST(start_pos, seq_id * {SEQ_LEN})) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM exploded GROUP BY seq_id ORDER BY seq_id
"""



CHUNK_W = 64  # tokens per retrieval/training chunk
CHUNK_S = 48  # stride (CHUNK_W - CHUNK_S = 16 tokens of overlap)


def doc_chunk_windows(spark, sf):
    """RAG/embedding-style document chunking: each document splits into
    overlapping token windows of CHUNK_W tokens at stride CHUNK_S, the
    unit a retrieval or long-context-training pipeline embeds. Output is
    the chunk ledger (doc_id, chunk_idx, start/end token positions,
    n_tokens, md5 of the chunk text for downstream chunk-level dedup).

    Distinct from ``sequence_pack`` (cross-doc concatenation, no
    overlap) and ``dedup_spans`` (disjoint spans, dedup-only).

    Scale shape: map-only — tokens are split once per document and each
    chunk is a slice() projection; the explode multiplies rows within
    the partition, nothing shuffles (the final ORDER BY is the oracle
    contract, not the pipeline's)."""
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.when(
        F.size("t") <= CHUNK_W, F.lit(1)
    ).otherwise(
        F.ceil((F.size("t") - F.lit(CHUNK_W)) / F.lit(CHUNK_S)).cast("int") + 1
    )
    chunked = toks.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
    ).select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * CHUNK_S).alias("start_tok"),
        F.least(F.col("chunk_idx") * CHUNK_S + CHUNK_W, F.size("t")).alias("end_tok"),
        F.slice(F.col("t"), F.col("chunk_idx") * CHUNK_S + 1, F.lit(CHUNK_W)).alias("ctoks"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "end_tok",
        (F.col("end_tok") - F.col("start_tok")).alias("n_tokens"),
        F.md5(F.array_join("ctoks", " ").cast("binary")).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


DOC_CHUNK_WINDOWS_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
counted AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= {CHUNK_W} THEN 1
              ELSE CAST(CEIL((len(t) - {CHUNK_W}) * 1.0 / {CHUNK_S}) AS INT) + 1
         END AS n_chunks
  FROM toks
),
chunked AS (
  SELECT doc_id,
         CAST(u.i AS INT) AS chunk_idx,
         CAST(u.i * {CHUNK_S} AS BIGINT) AS start_tok,
         CAST(LEAST(u.i * {CHUNK_S} + {CHUNK_W}, len(t)) AS BIGINT) AS end_tok,
         t[u.i * {CHUNK_S} + 1 : u.i * {CHUNK_S} + {CHUNK_W}] AS ctoks
  FROM counted, UNNEST(range(0, n_chunks)) AS u(i)
)
SELECT doc_id, chunk_idx, start_tok, end_tok,
       end_tok - start_tok AS n_tokens,
       md5(array_to_string(ctoks, ' ')) AS chunk_hash
FROM chunked ORDER BY doc_id, chunk_idx
"""


SUB_K = 8  # sliding-gram width for exact-substring dedup


def dedup_substring_spans(spark, sf):
    """Exact-substring dedup summary (operators/substring_dedup.py): every
    *sliding* SUB_K-token window is hashed; occurrences that are not the
    global first (min (doc_id, pos)) occurrence of their hash are
    duplicates; per doc the duplicated [pos, pos+k) marks merge into
    maximal spans — the span-removal dedup of Lee et al.'s "Deduplicating
    Training Data" at fixed k (any duplicated substring of length >= k is
    tiled exactly by duplicated k-grams). Stronger than ``dedup_spans``:
    that one only sees repeats aligned to disjoint window boundaries;
    this one catches a duplicated passage at ANY token offset.

    Scale shape: the corpus-wide exchange carries only (md5, doc_id, pos);
    the keeper per gram is a map-side-partial min(struct) agg (hot
    boilerplate grams collapse before the shuffle; the dup-flag join on
    the hash is unordered, so AQE may skew-split it); only duplicate
    occurrences reach the per-doc interval-merge windows.
    """
    from dataset_dedupe_estimator_spark.operators.substring_dedup import (
        substring_dedup_stats,
    )

    docs = load(spark, sf, "documents")
    return (
        substring_dedup_stats(docs, SUB_K)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    )


DEDUP_SUBSTRING_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(GREATEST(len(t) - {SUB_K - 1}, 0) AS BIGINT) AS n_grams, t
  FROM toks
),
grams AS (
  SELECT doc_id, CAST(u.j AS INT) AS pos,
         md5(array_to_string(t[u.j + 1 : u.j + {SUB_K}], ' ')) AS h
  FROM base, UNNEST(range(0, n_grams)) AS u(j)
),
dups AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM grams
  ) WHERE rn > 1
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN MAX(pos + {SUB_K}) OVER w IS NULL
                OR pos > MAX(pos + {SUB_K}) OVER w THEN 1 ELSE 0 END AS new_island
  FROM dups
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {SUB_K} AS e
  FROM islands GROUP BY doc_id, island
),
span_stats AS (
  SELECT doc_id, COUNT(*) AS n_spans, CAST(SUM(e - s) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
),
dup_counts AS (SELECT doc_id, COUNT(*) AS n_dup_grams FROM dups GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.n_grams,
       COALESCE(dc.n_dup_grams, 0) AS n_dup_grams,
       COALESCE(ss.n_spans, 0) AS n_spans,
       COALESCE(ss.dup_tokens, 0) AS dup_tokens,
       ROUND(COALESCE(ss.dup_tokens, 0) / b.n_tokens, 4) AS dup_ratio
FROM base b
LEFT JOIN dup_counts dc USING (doc_id)
LEFT JOIN span_stats ss USING (doc_id)
ORDER BY b.doc_id
"""


QUERIES = {
    "dedup_keep_first_pruned": Q(dedup_keep_first_pruned, DEDUP_KEEP_FIRST_PRUNED_SQL),
    "dedup_spans": Q(dedup_spans, DEDUP_SPANS_SQL),
    "dedup_substring_spans": Q(dedup_substring_spans, DEDUP_SUBSTRING_SQL),
    "mixture_sample": Q(mixture_sample, MIXTURE_SAMPLE_SQL),
    "sequence_pack": Q(sequence_pack, SEQUENCE_PACK_SQL),
    "doc_chunk_windows": Q(doc_chunk_windows, DOC_CHUNK_WINDOWS_SQL),
}
