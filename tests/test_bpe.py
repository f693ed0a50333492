"""operators/bpe.py — distributed BPE training must train the IDENTICAL
vocabulary (same merges, same order, same counts) as the pure-Python
reference implementation of the same greedy algorithm."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.bpe import (
    bpe_reference,
    bpe_train,
    word_census,
)


@pytest.fixture(scope="module")
def spark():
    from dataset_dedupe_estimator_spark import get_spark

    return get_spark(app_name="test-bpe", shuffle_partitions=8)


def test_spark_bpe_equals_reference(spark):
    docs = spark.createDataFrame(
        [
            ("low lower lowest low low",),
            ("new newer newest new newer",),
            ("wide wider widest new low",),
        ],
        "text string",
    )
    census = word_census(docs)
    rows = [(r.word, r.n) for r in census.collect()]
    got = bpe_train(census, 8)
    want = bpe_reference(rows, 8)
    assert got == want
    # the classic example: frequent suffixes merge early
    assert len(got) == 8
    assert got[0]["pair_count"] >= got[-1]["pair_count"]


def test_spark_bpe_on_real_corpus_prefix(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50)
    )
    census = word_census(docs)
    rows = [(r.word, r.n) for r in census.collect()]
    got = bpe_train(census, 5)
    want = bpe_reference(rows, 5)
    assert got == want


def test_char_split_has_no_empty_symbols(spark):
    docs = spark.createDataFrame([("ab a",)], "text string")
    census = word_census(docs)
    syms = (
        census.select(
            F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))).alias("s")
        )
        .collect()
    )
    for r in syms:
        assert "" not in r.s


def test_bpe_encode_counts(spark):
    from dataset_dedupe_estimator_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest low")], "doc_id long, text string"
    )
    census = word_census(docs)
    merges = bpe_train(census, 6)
    out = {r.doc_id: (r.ws_tokens, r.bpe_tokens) for r in bpe_encode(docs, merges).collect()}
    assert out[1][0] == 3 and out[2][0] == 2
    # BPE tokens per word: between 1 and len(word)+1 symbols
    assert 3 <= out[1][1] <= sum(len(w) + 1 for w in "low low lower".split())
    # with zero merges every word is fully character-split
    none = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, []).collect()}
    assert none[1] == sum(len(w) + 1 for w in "low low lower".split())
    # more merges never increase the token count
    fewer = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges[:2]).collect()}
    assert fewer[1] >= out[1][1]


def test_bpe_encode_text_only_frame(spark):
    """A corpus with ONLY the text column must encode (regression: the
    DDL schema was built with a leading comma and failed to parse)."""
    from dataset_dedupe_estimator_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        word_census,
    )

    docs = spark.createDataFrame([("aa ab",), ("ab ab",)], "text string")
    merges = bpe_train(word_census(docs), 2)
    out = bpe_encode(docs, merges).collect()
    assert [r.ws_tokens for r in out] == [2, 2]
    assert all(r.bpe_tokens >= 2 for r in out)
