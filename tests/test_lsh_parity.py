"""The Arrow-batched LSH feature pass must be bit-identical to the
declarative fold expressions (which the DuckDB oracle mirrors): same
float64 products, same left-to-right addition order (np.cumsum), so the
same sign bits and unit components."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.similarity import (
    MAX_PLANES,
    N_TABLES,
    _bits_col,
    _norm,
    _unit_col,
    lsh_features,
)


def test_lsh_features_match_fold_expressions(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr_df = emb.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        *[_bits_col(F.col("embedding"), t).alias(f"bits{t}") for t in range(N_TABLES)],
    ).select(
        "vec_id",
        _unit_col().alias("unit"),
        *[f"bits{t}" for t in range(N_TABLES)],
    )
    expected = {r["vec_id"]: r for r in expr_df.collect()}
    actual = {r["vec_id"]: r for r in lsh_features(emb).collect()}
    assert expected.keys() == actual.keys() and expected
    for vid, exp in expected.items():
        act = actual[vid]
        for t in range(N_TABLES):
            assert exp[f"bits{t}"] == act[f"bits{t}"], f"vec {vid} table {t}"
            assert len(act[f"bits{t}"]) == MAX_PLANES
        # exact float equality, not approx — the contract is bit-identity
        assert list(exp["unit"]) == list(act["unit"]), f"vec {vid} unit"
