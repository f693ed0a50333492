"""Exact-substring dedup: sliding k-gram duplicate spans with interval merge.

The strongest exact-dedup granularity in the LLM-pipeline surface: instead
of whole-document hashes (``dedup_keep_first``) or *disjoint* word windows
(``dedup_spans``), every **sliding** k-token window is hashed, later
occurrences of a window seen anywhere in the corpus (including earlier in
the same document) are marked duplicated, and per document the marked
``[pos, pos+k)`` intervals are merged into maximal spans — the
"deduplicate training data" span-removal move (suffix-array dedup's
fixed-k approximation: any duplicated substring of length >= k is covered
by duplicated k-grams, so merged spans tile exactly the duplicated
regions of length >= k). The reference engine stops at chunk-level
provenance (dedup_estimator.rs); this is part of the extension surface.

First-occurrence rule: the globally smallest (id, pos) occurrence of a
k-gram is the keeper; every other occurrence is a duplicate. Deterministic
on any cluster layout — no row-order dependence anywhere.

Scale shape (100 TB):
- the only corpus-wide exchange carries (16-byte md5, id, pos) triples —
  document width never shuffles;
- the keeper per k-gram is ``groupBy(h).agg(min(struct(id, pos)))`` — a
  map-side partial aggregate, so boilerplate k-grams repeated millions of
  times collapse to one row per partition *before* the shuffle (a window
  ``row_number`` would sort entire hot-hash partitions instead);
- the dup-flag join on ``h`` needs no ordering, so AQE skew-join can
  split hot hashes freely;
- only *duplicate* occurrences (typically a small fraction) reach the
  per-document interval-merge windows, which partition by document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_K = 8


def gram_occurrences(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, h): md5 of every sliding k-token window. Documents shorter
    than k tokens emit nothing (no partial grams — a shorter window would
    make span lengths ambiguous)."""
    toks = F.split(F.col(text_col), " ")
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda j: F.md5(F.concat_ws(" ", F.slice(t, j + 1, k)).cast("binary")),
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("t"))
        .filter(F.size(t) >= k)
        .select("id", F.posexplode(grams).alias("pos", "h"))
    )


def duplicate_occurrences(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos) of every k-gram occurrence that is NOT the global first
    occurrence (min (id, pos)) of its hash."""
    grams = gram_occurrences(docs, k, id_col, text_col)
    firsts = grams.groupBy("h").agg(F.min(F.struct("id", "pos")).alias("first"))
    return (
        grams.join(firsts, "h")
        .filter(
            (F.col("id") != F.col("first.id")) | (F.col("pos") != F.col("first.pos"))
        )
        .select("id", "pos")
    )


def merged_islands(dups: DataFrame, k: int) -> DataFrame:
    """(id, span_start, span_end, n_grams) from a (id, pos) duplicate set:
    overlapping/adjacent [pos, pos+k) marks coalesce into maximal spans.
    Two partitioned-by-id windows (prev-interval max end → island flag →
    cumulative island id), then one groupBy; only duplicate occurrences
    (not the corpus) flow through them."""
    w_prev = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_end = F.max(F.col("pos") + k).over(w_prev)
    flagged = dups.withColumn(
        "new_island",
        (prev_end.isNull() | (F.col("pos") > prev_end)).cast("int"),
    ).withColumn("island", F.sum("new_island").over(w_cum))
    return (
        flagged.groupBy("id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("id", "span_start", "span_end", "n_grams")
    )


def duplicate_spans(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, span_start, span_end): maximal merged token intervals covered
    by duplicated k-grams."""
    return merged_islands(
        duplicate_occurrences(docs, k, id_col, text_col), k
    ).select("id", "span_start", "span_end")


def substring_dedup_stats(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document summary: token/gram counts, duplicate grams, merged
    span count, tokens covered by duplicate spans, and the covered ratio.
    Every document appears (zero rows for clean docs)."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    # ONE pass over the gram pipeline: island merge carries the per-island
    # gram count, so dup-gram totals and span stats come from the same
    # aggregate (a second duplicate_occurrences branch would re-scan the
    # corpus and re-shuffle every gram).
    span_stats = (
        merged_islands(duplicate_occurrences(docs, k, id_col, text_col), k)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
            F.sum("n_grams").alias("n_dup_grams"),
        )
    )
    return (
        base.join(span_stats, "id", "left")
        .select(
            "id",
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 4
            ).alias("dup_ratio"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The deduped corpus: every document with tokens inside duplicate
    spans removed (first occurrences survive verbatim). Returns
    (id, text_clean, n_tokens, kept_tokens). Span lists are per-doc tiny
    (merged intervals), so the filter is an in-row array expression —
    document text is never shuffled; the span table joins onto it."""
    spans = (
        duplicate_spans(docs, k, id_col, text_col)
        .groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("spans")
        )
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.expr(
        "filter(t, (x, i) -> NOT exists(spans, "
        "sp -> i >= sp.span_start AND i < sp.span_end))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("t"))
        .join(spans, "id", "left")
        .withColumn("spans", F.coalesce("spans", F.expr("array()")))
        .select(
            "id",
            F.concat_ws(" ", kept).alias("text_clean"),
            F.size("t").cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("kept_tokens"),
        )
    )
