"""Bloom-prefiltered incremental dedup (operators/bloom.py,
queries/corpus_quality.py): the prefilter must never lose a true
duplicate (no false negatives), must actually prune (false-positive rate
bounded), must probe via broadcast joins only (no shuffle of the batch
side), and the corpus quality scores must be deterministic."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.bloom import bloom_build, bloom_probe
from dataset_dedupe_estimator_spark.queries.corpus_quality import (
    TOP_K_TERMS,
    bloom_incremental_dedup,
    tfidf_top_terms,
    unigram_surprisal,
)


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _fixture(spark, n_old=2000, n_inc=500, n_dup=40):
    old = spark.range(n_old).select(
        F.concat(F.lit("history-doc-"), F.col("id")).alias("v")
    )
    fresh = spark.range(n_inc - n_dup).select(
        F.concat(F.lit("incoming-doc-"), F.col("id")).alias("v")
    )
    dups = spark.range(n_dup).select(
        F.concat(F.lit("history-doc-"), F.col("id") * 7).alias("v")
    )
    return old, fresh.unionAll(dups)


def test_bloom_no_false_negatives(spark):
    old, inc = _fixture(spark)
    bloom = bloom_build(old, "v")
    probed = bloom_probe(inc, "v", bloom)
    true_dups = inc.join(old, "v", "left_semi")
    missed = true_dups.join(
        probed.filter(F.col("bloom_hit")).select("v"), "v", "left_anti"
    )
    assert missed.count() == 0


def test_bloom_prunes_false_positives(spark):
    old, inc = _fixture(spark)
    probed = bloom_probe(inc, "v", bloom_build(old, "v"))
    n_hits = probed.filter(F.col("bloom_hit")).count()
    n_true = inc.join(old, "v", "left_semi").count()
    # 2000 elements in 2^20 bits, k=3 → fp rate ≪ 1%; allow slack for
    # hash clustering but require the prefilter to kill ≥95% of non-dups
    assert n_true == 40
    assert n_hits - n_true <= 0.05 * (500 - n_true)


def test_bloom_probe_is_broadcast_only(spark):
    old, inc = _fixture(spark)
    plan = _plan(bloom_probe(inc, "v", bloom_build(old, "v")))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_word_count_bounded(spark):
    old, _ = _fixture(spark)
    m_bits = 1 << 14
    bloom = bloom_build(old, "v", m_bits=m_bits)
    assert bloom.count() <= m_bits // 64
    # bits actually set: union of 3 positions per element
    n_set = bloom.select(F.sum(F.bit_count("bits")).alias("n")).collect()[0]["n"]
    assert 0 < n_set <= 3 * 2000


def test_bloom_incremental_matches_exact_antijoin(spark, sf_dir):
    got = bloom_incremental_dedup(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("digest")
    )
    old = docs.filter(F.col("doc_id") % 10 < 7).select("digest")
    inc = docs.filter(F.col("doc_id") % 10 >= 7)
    dup = inc.join(old, "digest", "left_semi").groupBy("source").count()
    expected = {r["source"]: r["count"] for r in dup.collect()}
    for row in got:
        assert row["n_dup"] == expected.get(row["source"], 0)
        assert row["n_incoming"] == row["n_dup"] + row["n_new"]


def test_unigram_surprisal_properties(spark, sf_dir):
    rows = unigram_surprisal(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # surprisal in bits is non-negative and at most bits(N) per token
        assert 0 <= r["total_bits"]
        assert abs(r["mean_bits"] - r["total_bits"] / r["n_tokens"]) < 1e-12


def test_tfidf_top_terms_shape(spark, sf_dir):
    rows = tfidf_top_terms(spark, sf_dir).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for source, rs in per_source.items():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K_TERMS
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert r["score"] == r["tf"] / r["df"]


def test_source_overlap_invariants(spark, sf_dir):
    from dataset_dedupe_estimator_spark.queries.corpus_quality import (
        source_overlap_minhash,
    )
    from dataset_dedupe_estimator_spark.queries.dedupe_text import N_MINHASH

    rows = source_overlap_minhash(spark, sf_dir).collect()
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2  # every pair once
    for r in rows:
        assert 0 <= r.n_inter <= min(r.n_a, r.n_b)
        assert 0.0 <= r.exact_jaccard <= 1.0
        # the estimate is a multiple of 1/N_MINHASH by construction
        assert abs(r.est_jaccard * N_MINHASH - round(r.est_jaccard * N_MINHASH)) < 1e-9
