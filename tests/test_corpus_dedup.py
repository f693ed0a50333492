"""Corpus dedup & sampling operators (queries/corpus_dedup.py): the
pruned keep-first plan must match the windowed version row-for-row while
keeping wide rows out of any window sort; span dedup and mixture sampling
must be deterministic and satisfy their counting invariants."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries import REGISTRY
from dataset_dedupe_estimator_spark.queries.corpus_dedup import (
    MIX_FRACTION,
    SEQ_LEN,
    _spans,
    dedup_keep_first_pruned,
    dedup_spans,
    mixture_sample,
    sequence_pack,
)


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_pruned_keep_first_matches_windowed(spark, sf_dir):
    pruned = dedup_keep_first_pruned(spark, sf_dir).collect()
    windowed = REGISTRY["dedup_keep_first"].spark(spark, sf_dir).collect()
    assert pruned == windowed
    assert len(pruned) > 0


def test_pruned_keep_first_plan_has_no_window(spark, sf_dir):
    p = _plan(dedup_keep_first_pruned(spark, sf_dir))
    assert "Window" not in p  # survivor filter is agg + join, never a window sort
    assert "HashAggregate" in p


def test_span_dedup_invariants(spark, sf_dir):
    rows = dedup_spans(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()
    # n_kept == 0 is legitimate: every span of a fully-duplicated document
    # already appeared in an earlier document
    assert all(0 <= r.n_kept <= r.n_spans for r in rows)
    # global: total kept spans == number of distinct span hashes
    n_distinct = _spans(spark, sf_dir).select("span_hash").distinct().count()
    assert sum(r.n_kept for r in rows) == n_distinct
    # every token is covered: span count is ceil(len/W) per doc
    exp = docs.select(
        F.ceil(F.size(F.split("text", " ")) / F.lit(8)).cast("long").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert sum(r.n_spans for r in rows) == exp


def test_mixture_sample_quotas_and_determinism(spark, sf_dir):
    sample = mixture_sample(spark, sf_dir)
    rows = sample.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.count()
    per_src = docs.groupBy("source").count().collect()
    weights = {
        r.source: 3 if int(r.source.lstrip("src")) % 2 == 0 else 1 for r in per_src
    }
    wsum = sum(weights.values())
    got = {}
    for r in rows:
        got[r.source] = got.get(r.source, 0) + 1
    for src, w in weights.items():
        assert got.get(src, 0) == int(total * MIX_FRACTION * w / wsum)
    # deterministic under re-evaluation (stable hash lottery, no rand())
    assert sorted(rows) == sorted(sample.collect())


def test_sequence_pack_conservation(spark, sf_dir):
    rows = sequence_pack(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    # every token lands in exactly one sequence
    assert sum(r.n_tokens for r in rows) == total_tokens
    # sequences are dense 0..N-1; all full except possibly the last
    assert [r.seq_id for r in rows] == list(range(len(rows)))
    assert all(r.n_tokens == SEQ_LEN for r in rows[:-1])
    assert 0 < rows[-1].n_tokens <= SEQ_LEN
    # doc ranges tile the corpus in order: consecutive sequences overlap by
    # at most the boundary-straddling doc
    for prev, cur in zip(rows, rows[1:]):
        assert cur.first_doc >= prev.first_doc
        assert cur.first_doc in (prev.last_doc, prev.last_doc + 1)


def test_materialize_survivors_roundtrip(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.queries.text_analysis import (
        corpus_survival_pipeline,
        materialize_survivors,
    )

    dest = str(tmp_path / "clean")
    n_in, n_out = materialize_survivors(spark, sf_dir, dest, files_per_source=2)
    stats = corpus_survival_pipeline(spark, sf_dir).agg(
        F.sum("n_docs").alias("docs"), F.sum("n_survivors").alias("survivors")
    ).collect()[0]
    assert n_in == stats.docs
    assert n_out == stats.survivors
    back = spark.read.parquet(dest)
    assert set(back.columns) >= {"doc_id", "text", "source"}
    assert back.count() == n_out
    # hive partition directories exist on disk, one per surviving source
    import os

    dirs = {d for d in os.listdir(dest) if d.startswith("source=")}
    assert dirs == {
        f"source={r.source}"
        for r in back.select("source").distinct().collect()
    }


def test_materialize_survivors_strip_spans(spark, sf_dir, tmp_path):
    """strip_spans removes exactly the survivor set's duplicate-span
    tokens: same doc set as the plain materialization, token mass reduced
    by the spans strip_duplicate_spans reports, text never grows."""
    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.operators.substring_dedup import (
        DEFAULT_K,
        strip_duplicate_spans,
    )
    from dataset_dedupe_estimator_spark.queries.text_analysis import (
        materialize_survivors,
    )

    plain_dest = str(tmp_path / "plain")
    strip_dest = str(tmp_path / "stripped")
    _, n_plain = materialize_survivors(spark, sf_dir, plain_dest)
    _, n_strip = materialize_survivors(spark, sf_dir, strip_dest, strip_spans=True)
    assert n_strip == n_plain  # span removal edits text, never drops docs

    plain = spark.read.parquet(plain_dest)
    stripped = spark.read.parquet(strip_dest)
    assert {r.doc_id for r in stripped.select("doc_id").collect()} == {
        r.doc_id for r in plain.select("doc_id").collect()
    }
    # stripped text equals the operator's text_clean for the survivor set
    expect = strip_duplicate_spans(plain, DEFAULT_K).select(
        F.col("id").alias("doc_id"), "text_clean", "n_tokens", "kept_tokens"
    )
    joined = stripped.select("doc_id", "text").join(expect, "doc_id")
    assert joined.filter(F.col("text") != F.col("text_clean")).count() == 0
    tot = joined.agg(
        F.sum("n_tokens").alias("before"), F.sum("kept_tokens").alias("after")
    ).collect()[0]
    assert tot.after < tot.before  # the corpus genuinely contains dup spans
