"""maybe_spread (r13): the §2.5 input-skew remedy must fire ONLY when
both gates agree — enough on-disk bytes AND fewer planned splits than
cores — and must be a plan no-op otherwise (a 100 TB table must never be
coalesced to core count; a tiny fixture must not pay an exchange)."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.base import maybe_spread


def _parts(df):
    return df.rdd.getNumPartitions()


def test_small_file_gated_off(spark, sf_dir):
    """Below min_bytes the frame is returned untouched (same plan object
    semantics: no Repartition node)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = maybe_spread(docs, sf_dir, "documents", "doc_id")
    assert out is docs  # byte gate short-circuits before any plan work


def test_spread_fires_with_lowered_byte_gate(spark, sf_dir):
    """With the byte gate lowered, an under-partitioned scan is hash-
    repartitioned to defaultParallelism on the given key."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    assert _parts(docs) < par  # the fixture arrives under-partitioned
    out = maybe_spread(docs, sf_dir, "documents", "doc_id", min_bytes=1)
    assert out is not docs
    assert _parts(out) == par
    # row multiset unchanged
    assert out.count() == docs.count()
    assert (
        out.agg(F.sum("doc_id")).collect()[0][0]
        == docs.agg(F.sum("doc_id")).collect()[0][0]
    )


def test_already_partitioned_gated_off(spark, sf_dir):
    """A frame that already has >= cores partitions is returned as-is
    even when the byte gate passes — the scale guard."""
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        par + 2, "doc_id"
    )
    out = maybe_spread(docs, sf_dir, "documents", "doc_id", min_bytes=1)
    assert out is docs


def test_missing_file_is_noop(spark, sf_dir):
    """An unreadable/absent backing file disables the spread instead of
    raising (the helper is advisory, never load-bearing)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = maybe_spread(docs, sf_dir, "no_such_table", "doc_id", min_bytes=1)
    assert out is docs
