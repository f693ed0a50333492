"""Exact-substring dedup stress at size (operators/substring_dedup.py).

Synthesizes N documents (~150 tokens each, unique counter-based filler)
with two planted duplication modes whose span ground truth is exact:

  - kind 4 (1 in 10): a fixed 40-token boilerplate PASSAGE spliced at a
    per-doc offset — every occurrence after the global first must yield
    EXACTLY one merged span of exactly 40 tokens (sliding grams that
    straddle the splice boundary mix in unique filler, so the marked
    region tiles the passage precisely);
  - kind 9 (1 in 10): an exact copy of the decade's kind-0 doc — the copy
    must come back 100% duplicated (one span, dup_ratio 1.0).

The passage grams repeat ~N/10 times: a deliberate hot-hash skew probe for
the min(struct) keeper aggregate (map-side partial collapse) and the
unordered dup-flag join. Everything else must come back zero-dup.

Checks are exact (no tolerances), with wall times for the stats pass and
the span-strip pass.

Usage: python tools/stress_substring.py [n_docs] [k]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dataset_dedupe_estimator_spark import get_spark  # noqa: E402
from dataset_dedupe_estimator_spark.operators.substring_dedup import (  # noqa: E402
    strip_duplicate_spans,
    substring_dedup_stats,
)

FILLER_TOKENS = 110
PASSAGE = [f"p{i}" for i in range(40)]  # outside the filler vocab
PASSAGE_LEN = len(PASSAGE)


def synth_corpus(spark, n_docs: int):
    """doc_id, text, kind. kind 4 docs embed PASSAGE at offset 5+(id%7);
    kind 9 docs are exact copies of doc (id//10)*10; all filler tokens are
    unique per (doc, position) via a counter hash (no accidental grams)."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10).cast("int").alias("kind")
    )
    # filler doc: seed is the doc whose text this row carries (copies reuse
    # the decade head's seed, so the text is bit-identical)
    seed = F.when(F.col("kind") == 9, (F.col("doc_id") / 10).cast("long") * 10).otherwise(
        F.col("doc_id")
    )
    # full 64-bit hash per token: filler must be collision-free, or grams
    # that straddle the passage boundary (7 shared passage tokens + 1
    # filler token) birthday-collide across passage docs and stretch the
    # planted spans past their exact 40-token ground truth
    filler = F.transform(
        F.sequence(F.lit(0), F.lit(FILLER_TOKENS - 1)),
        lambda j: F.concat(
            F.lit("f"), F.xxhash64(seed * FILLER_TOKENS + j).cast("string")
        ),
    )
    passage = F.array(*[F.lit(w) for w in PASSAGE])
    off = (F.col("doc_id") % 7 + 5).cast("int")
    with_passage = F.concat(
        F.slice(filler, 1, off), passage, F.slice(filler, off + 1, FILLER_TOKENS)
    )
    toks = F.when(F.col("kind") == 4, with_passage).otherwise(filler)
    return base.select(
        "doc_id", "kind", F.concat_ws(" ", toks).alias("text")
    )


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # ~24M in-flight md5 grams at the default size: give the single local
    # JVM the heap a real executor would have, and smaller shuffle slices
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark(app_name="stress-substring", shuffle_partitions=64)
    docs = synth_corpus(spark, n_docs).localCheckpoint()  # freeze the corpus

    t0 = time.perf_counter()
    stats = substring_dedup_stats(docs, k).localCheckpoint()
    t_stats = time.perf_counter() - t0

    joined = stats.join(docs.select("doc_id", "kind"), stats.id == F.col("doc_id"))
    agg = joined.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_spans").alias("spans"),
        F.sum("dup_tokens").alias("dup_toks"),
        F.sum((F.col("dup_ratio") == 1.0).cast("long")).alias("full_dup"),
        F.max("n_spans").alias("max_spans"),
    )
    by_kind = {r["kind"]: r for r in agg.collect()}

    n_passage = n_docs // 10 + (1 if n_docs % 10 > 4 else 0)
    n_copies = n_docs // 10  # kind 9 exists for every complete decade head
    ok = True

    # kind 4: every passage doc except the global first has exactly one
    # span of exactly PASSAGE_LEN tokens
    p = by_kind[4]
    exp_spans = n_passage - 1
    if (p["spans"], p["dup_toks"]) != (exp_spans, exp_spans * PASSAGE_LEN) or p[
        "max_spans"
    ] > 1:
        ok = False
        print(f"FAIL kind4: {p}")

    # kind 9: every copy is 100% duplicated in one span
    c = by_kind[9]
    if (c["spans"], c["full_dup"], c["max_spans"]) != (n_copies, n_copies, 1):
        ok = False
        print(f"FAIL kind9: {c}")

    # all other kinds: zero duplication anywhere
    clean = [r for kind, r in by_kind.items() if kind not in (4, 9)]
    if any(r["spans"] != 0 or r["dup_toks"] != 0 for r in clean):
        ok = False
        print(f"FAIL clean kinds: {[r.asDict() for r in clean]}")

    t0 = time.perf_counter()
    stripped = strip_duplicate_spans(docs, k)
    removed = stripped.agg(
        F.sum(F.col("n_tokens") - F.col("kept_tokens")).alias("removed"),
        F.sum((F.col("kept_tokens") == 0).cast("long")).alias("emptied"),
    ).collect()[0]
    t_strip = time.perf_counter() - t0

    exp_removed = exp_spans * PASSAGE_LEN + n_copies * FILLER_TOKENS
    if (removed["removed"], removed["emptied"]) != (exp_removed, n_copies):
        ok = False
        print(f"FAIL strip: {removed} expected ({exp_removed}, {n_copies})")

    # ---- incremental leg: the persistent gram index must reproduce the
    # batch operator at size. Build on the first quarter, admit the rest
    # in three doc_id-ordered batches (boundaries on decade edges so a
    # kind-9 copy always arrives with or after its source), then require
    # EXACT span parity with the single-shot operator.
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.operators.substring_dedup import (
        duplicate_spans,
    )
    from dataset_dedupe_estimator_spark.plans.gram_index import (
        admit_docs,
        build_gram_index,
    )

    b = max(10, (n_docs // 4) // 10 * 10)
    idx = tempfile.mkdtemp(prefix="stress-gram-idx-")
    shutil.rmtree(idx)  # build wants to create it
    t0 = time.perf_counter()
    build_gram_index(spark, docs.filter(F.col("doc_id") < b), idx, k=k)
    t_build = time.perf_counter() - t0
    all_spans = None
    t_admit = 0.0
    for lo, hi in [(b, 2 * b), (2 * b, 3 * b), (3 * b, n_docs)]:
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.perf_counter()
        spans, rep = admit_docs(spark, batch, idx)
        t_admit += time.perf_counter() - t0
        all_spans = spans if all_spans is None else all_spans.unionByName(spans)
    expected = duplicate_spans(docs, k).filter(F.col("id") >= b).localCheckpoint()
    missing = expected.exceptAll(all_spans).count()
    extra = all_spans.exceptAll(expected).count()
    if missing or extra:
        ok = False
        print(f"FAIL incremental parity: missing={missing} extra={extra}")
    shutil.rmtree(idx)

    n_grams = n_docs * (FILLER_TOKENS - k + 1) + n_passage * PASSAGE_LEN
    print(
        f"docs={n_docs} k={k} grams~{n_grams / 1e6:.1f}M  "
        f"stats={t_stats:.1f}s ({n_docs / t_stats:,.0f} docs/s)  "
        f"strip={t_strip:.1f}s  "
        f"index build(quarter)={t_build:.1f}s admit(3 batches)={t_admit:.1f}s  "
        f"incremental==single-shot and planted spans exact: "
        f"{'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
