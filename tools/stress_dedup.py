"""Text-dedup pipeline stress at size — the LLM-pipeline counterpart to
tools/stress_estimate.py (CDC).

Synthesizes a corpus of N documents (~1 KB each) where a known fraction
are near-duplicates (exact copies and one-word edits of earlier docs),
then runs the three dedup tiers and checks their recall/precision
properties hold at size, with wall times:

  1. exact dedup (dedup_keep_first shape: digest groupBy)
  2. MinHash + LSH banding candidates
  3. connected-components duplicate clusters over the LSH edges

Usage: python tools/stress_dedup.py [n_docs] [dup_fraction]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dataset_dedupe_estimator_spark import get_spark  # noqa: E402
from dataset_dedupe_estimator_spark.operators.components import (  # noqa: E402
    connected_components,
)

WORDS = [f"w{i}" for i in range(4096)]


def synth_corpus(spark, n_docs: int, dup_frac: float):
    """Deterministic corpus: doc i is (a) an exact copy of doc i-step for
    i % K == 1, (b) a one-word edit of doc i-step for i % K == 2, else
    (c) unique text from a counter-based generator. Pure SQL expressions
    — generation is distributed and reproducible."""
    k = max(3, int(round(3 / max(dup_frac, 1e-9))))  # 2 of every k are dups
    base = (
        spark.range(n_docs)
        .withColumn("src_id", F.when(F.col("id") % k <= 2, (F.col("id") / k).cast("long") * k) .otherwise(F.col("id")))
        .withColumn("kind", (F.col("id") % k).cast("int"))
    )
    word = lambda seed: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in WORDS]),
        ((F.xxhash64(seed) % len(WORDS) + len(WORDS)) % len(WORDS) + 1).cast("int"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(127)),
        lambda i: word(F.concat_ws(":", F.col("src_id").cast("string"), i.cast("string"))),
    )
    text = F.concat_ws(" ", words)
    edited = F.concat_ws(
        " ", F.concat_ws(" ", F.slice(words, 1, 63)), F.lit("EDITWORD"),
        F.concat_ws(" ", F.slice(words, 65, 63)),
    )
    return base.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("kind") == 2, edited).otherwise(text).alias("text"),
        F.col("kind"),
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    spark = get_spark(app_name="stress-dedup", shuffle_partitions=32)
    docs = synth_corpus(spark, n_docs, dup_frac)
    docs.write.mode("overwrite").parquet("/tmp/stress_dedup_corpus")
    docs = spark.read.parquet("/tmp/stress_dedup_corpus")
    total_mb = n_docs * 128 * 4 / 1e6  # ~4 B/word avg

    # 1. exact dedup: digest groupBy — copies (kind 1) collapse
    t0 = time.time()
    groups = (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
    )
    n_groups = groups.count()
    n_dupes = docs.count() - n_groups
    t_exact = time.time() - t0

    # 2. MinHash/LSH candidates over the corpus
    from dataset_dedupe_estimator_spark.queries.dedupe_text import (
        MH_A, MH_B, MH_P, N_BANDS, N_MINHASH,
    )

    t0 = time.time()
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.split("text", " "), i),
                    F.element_at(F.split("text", " "), i + 1),
                    F.element_at(F.split("text", " "), i + 2),
                ),
            )
        ).alias("shingle"),
    ).distinct()
    base_h = (
        F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10)
        .cast("long") % MH_P
    )
    hashed = sh.select(
        "doc_id", *[((F.lit(MH_A[i]) * base_h + F.lit(MH_B[i])) % MH_P).alias(f"h{i}") for i in range(N_MINHASH)]
    )
    sig = hashed.groupBy("doc_id").agg(*[F.min(f"h{i}").alias(f"m{i}") for i in range(N_MINHASH)])
    rows = N_MINHASH // N_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws("|", *[F.col(f"m{b * rows + r}") for r in range(rows)]).cast("binary"))
                for b in range(N_BANDS)
            ])
        ).alias("band_id", "band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n_cand = cand.count()
    t_lsh = time.time() - t0

    # recall check: one-word edits (kind 2) should be LSH candidates of
    # their source (126 of 128 shingles shared => any-band collision near 1)
    edits = docs.filter(F.col("kind") == 2).select(
        F.col("doc_id").alias("doc_b"), (F.col("doc_id") - 1).alias("doc_a")
    )
    n_edits = edits.count()
    found = cand.join(edits, ["doc_a", "doc_b"]).count()
    recall = found / max(n_edits, 1)

    # 3. connected components over candidate edges
    t0 = time.time()
    comp = connected_components(cand, "doc_a", "doc_b")
    n_clusters = comp.select("comp").distinct().count()
    t_cc = time.time() - t0

    print(
        f"docs={n_docs} (~{total_mb:.0f} MB text) exact: groups={n_groups} "
        f"dupes={n_dupes} [{t_exact:.1f}s]  lsh: cands={n_cand} "
        f"edit_recall={recall:.3f} [{t_lsh:.1f}s]  cc: clusters={n_clusters} "
        f"[{t_cc:.1f}s]  recall_ok={recall >= 0.95}"
    )
    return 0 if recall >= 0.95 else 1


if __name__ == "__main__":
    raise SystemExit(main())
