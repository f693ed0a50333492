"""r14: the whole-doc MinHash kernel (_minhash_sig_fn) must be
value-identical to the declarative shingle-explode plan it replaced —
same doc set (short/NULL docs absent), same 16 minima, edge for edge."""
import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.dedupe_text import (
    MH_A,
    MH_B,
    MH_P,
    N_MINHASH,
    minhash_sig_of,
    shingles_of,
)


def _declarative_sig(docs):
    """The pre-r14 plan, verbatim: shingles -> md5 base -> 16 affine
    columns -> min-aggregate (kept here as the parity reference)."""
    sh = shingles_of(docs)
    base = (
        F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % MH_P
    )
    based = sh.select("doc_id", base.alias("base"))
    hashed = based.select(
        "doc_id",
        *[
            ((F.lit(MH_A[i]) * F.col("base") + F.lit(MH_B[i])) % MH_P).alias(f"h{i}")
            for i in range(N_MINHASH)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(N_MINHASH)]
    )


def test_minhash_kernel_matches_declarative_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {tuple(r) for r in _declarative_sig(docs).collect()}
    got = {tuple(r) for r in minhash_sig_of(docs).collect()}
    assert want and got == want


def test_minhash_kernel_edge_docs(spark):
    """Tokenization edges: consecutive/leading/trailing spaces (empty
    tokens kept by the literal-space split), exactly-3-token docs,
    sub-threshold docs and NULL text (both absent from the output),
    unicode shingles (UTF-8 md5)."""
    rows = [
        (1, "a b c d"),
        (2, "a  b c"),          # empty token inside
        (3, " a b"),            # leading space -> 3 tokens incl empty
        (4, "ab"),              # 1 token: absent
        (5, ""),                # [''] -> absent
        (6, None),              # NULL -> absent
        (7, "é ü 漢 x"),        # unicode
        (8, "a b c "),          # trailing empty token -> 2 shingles
        (9, "a b c d a b c d"), # repeated shingles (distinct)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in _declarative_sig(docs).collect()}
    got = {tuple(r) for r in minhash_sig_of(docs).collect()}
    assert got == want
    present = {t[0] for t in got}
    assert present == {1, 2, 3, 7, 8, 9}
