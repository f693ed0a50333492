"""functions/ expression library: hash variants, quality flags, vector ops
with precomputed norms."""

import math

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.functions import (
    cents,
    content_hash,
    cosine,
    dot,
    minhash_expr,
    norm,
    quality_flags,
    shingle_expr,
    tokens,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "a b")],
        "id long, text string",
    )


def test_content_hash_variants(spark, docs):
    rows = docs.select(
        content_hash("text").alias("slow"), content_hash("text", fast=True).alias("fast")
    ).collect()
    assert all(len(r.slow) == 32 for r in rows)  # md5 hex
    assert all(isinstance(r.fast, int) for r in rows)  # xxhash64 bigint
    # deterministic
    again = docs.select(content_hash("text", fast=True).alias("fast")).collect()
    assert [r.fast for r in again] == [r.fast for r in rows]


def test_minhash_expr_seeds_differ(spark, docs):
    r = docs.select(
        minhash_expr("text", 0).alias("a"), minhash_expr("text", 1).alias("b")
    ).collect()[0]
    assert r.a != r.b


def test_shingles_and_quality(spark, docs):
    out = docs.select("id", tokens("text").alias("t")).select(
        "id",
        F.size(shingle_expr(F.col("t"))).alias("n_shingles"),
        quality_flags(F.col("t"), min_tokens=3).alias("ok"),
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n_shingles == 9 - 3 + 1  # 9 tokens -> 7 trigrams
    assert rows[1].ok is True
    assert rows[2].n_shingles == 0  # under width -> empty, no error
    assert rows[2].ok is False


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>"
    )
    rows = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("na"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    assert rows[0].d == 25.0
    assert rows[0].na == 5.0
    assert rows[0].c == pytest.approx(1.0)
    assert rows[1].c == pytest.approx(0.0)
    # precomputed-norm path agrees with inline path
    pre = df.select(
        cosine(F.col("a"), F.col("b"), norm(F.col("a")), norm(F.col("b"))).alias("c")
    ).collect()
    assert [r.c for r in pre] == [r.c for r in rows]


def test_cents_exact(spark):
    df = spark.createDataFrame([(19.99,), (0.01,), (100.0,)], "v double")
    assert [r.c for r in df.select(cents("v").alias("c")).collect()] == [1999, 1, 10000]


def test_cms_never_underestimates(spark):
    from dataset_dedupe_estimator_spark.queries.dedupe_text import cms_token_counts

    rows = cms_token_counts(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    # the defining CMS guarantee: estimate >= exact, always
    assert all(r.cms_estimate >= r.exact for r in rows)
    assert all(r.overestimate == r.cms_estimate - r.exact for r in rows)
