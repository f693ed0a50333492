"""Hybrid BM25+vector RRF search (queries/similarity.py:hybrid_rrf_frame).

Not yet a registry gate entry (r5 attestation budget is full — r6 gate
candidate), so this test runs the SAME dtype-sensitive oracle comparison
the driver gate would: Spark result vs _hybrid_sql() in DuckDB via the
check_oracles canon/compare machinery, at both test scale factors."""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracles import TABLES, canon, compare  # noqa: E402

from dataset_dedupe_estimator_spark.queries.similarity import (  # noqa: E402
    RRF_K,
    RRF_POOL,
    RRF_TOP,
    _hybrid_sql,
    hybrid_rrf_frame,
    hybrid_search_rrf,
)


def _oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.sql(_hybrid_sql()).df()


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_matches_duckdb_oracle(spark, sf_dir):
    sdf = hybrid_search_rrf(spark, sf_dir).toPandas()
    odf = _oracle(sf_dir)
    problems = compare("hybrid_search_rrf", canon(sdf), canon(odf))
    assert problems == [], problems
    assert len(sdf) == RRF_TOP


def test_fusion_semantics(spark, sf_dir):
    """Docs in both pools outrank same-rank single-leg docs; rrf matches
    the hand-computed reciprocal sum; rank 0 means absent from a leg."""
    rows = hybrid_search_rrf(spark, sf_dir).collect()
    for r in rows:
        exp = (1.0 / (RRF_K + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (RRF_K + r["sem_rank"]) if r["sem_rank"] else 0.0
        )
        assert abs(r["rrf"] - round(exp, 6)) < 1e-12
        assert 0 <= r["lex_rank"] <= RRF_POOL
        assert 0 <= r["sem_rank"] <= RRF_POOL
        assert r["lex_rank"] > 0 or r["sem_rank"] > 0
    # descending rrf, doc_id tie-break
    key = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert key == sorted(key)


def test_both_legs_contribute(spark, sf_dir):
    """The fused top must actually draw from both modalities on the test
    corpus (if one leg dominated entirely, the fusion would be dead code)."""
    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert any(r["lex_rank"] > 0 for r in rows)
    assert any(r["sem_rank"] > 0 for r in rows)


def test_query_doc_excluded(spark, sf_dir):
    from dataset_dedupe_estimator_spark.queries.similarity import RRF_QUERY_ID

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert all(r["doc_id"] != RRF_QUERY_ID for r in rows)


def test_custom_query_and_pool(spark, sf_dir):
    """Arbitrary terms / query vector / pool sizes work (the CLI path)."""
    from dataset_dedupe_estimator_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    out = hybrid_rrf_frame(
        docs, emb, ("data", "model"), query_vec_id=3, pool=10, top=5
    )
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["doc_id"] != 3 for r in rows)
    assert all(r["lex_rank"] <= 10 and r["sem_rank"] <= 10 for r in rows)
