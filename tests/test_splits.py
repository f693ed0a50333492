"""Split assignment + leakage audit invariants (queries/splits.py)."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.splits import (
    cross_split_leakage,
    split_assign,
    split_purge_eval,
)

SF = "/root/testdata/sf0.001"


def test_split_partitions_whole_corpus(spark):
    rows = split_assign(spark, SF).collect()
    n_docs = sum(r.n_docs for r in rows)
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs == total  # every doc in exactly one split
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) <= {"train", "val", "test"}
    # 80/10/10 hash buckets: train strictly dominates at any corpus size
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_split_is_deterministic_under_repartition(spark):
    from dataset_dedupe_estimator_spark.queries.splits import _with_split

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = {r.doc_id: r.split for r in _with_split(docs).collect()}
    b = {r.doc_id: r.split for r in _with_split(docs.repartition(7)).collect()}
    assert a == b


def test_purged_eval_docs_are_never_train(spark):
    purged = split_purge_eval(spark, SF).collect()
    assert all(r.split in ("val", "test") for r in purged)


def test_leakage_rows_consistent_with_purge(spark):
    leaks = cross_split_leakage(spark, SF).collect()
    purged = split_purge_eval(spark, SF).collect()
    # every reported combo involves >=2 splits; purge only counts combos
    # that include train, so purge count <= total leaked docs
    assert all("+" in r.splits for r in leaks)
    leaked_with_train = sum(
        r.n_leaked_docs for r in leaks if "train" in r.splits.split("+")
    )
    assert len(purged) <= leaked_with_train
