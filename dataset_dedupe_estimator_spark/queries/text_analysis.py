"""Text-analysis operators over ``documents``: token statistics, quality
scoring, stopword-overlap language scoring, corpus token frequencies.

All ratios are exact-integer divisions (IEEE-identical in Spark/DuckDB);
no rounding tricks needed.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.queries.base import Q, load, maybe_spread

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is", "on")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# Tiny per-language marker sets for the heuristic language scorer. The test
# corpus is synthetic word-soup, so the *predictions* are arbitrary — the
# operator contract (deterministic argmax over overlap scores) is what the
# oracle verifies.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
}


def text_quality(spark, sf):
    """Per-doc quality metrics: token counts, type-token ratio, stopword
    ratio, average token length — the standard LLM-data quality gates."""
    # §2.5 spread: the split/distinct/intersect projection is pure
    # map-side CPU over text — serial on a single-row-group file. Text
    # is ~an order denser in CPU-per-byte than the numeric scans, so the
    # byte gate sits lower than the relational default.
    docs = maybe_spread(
        load(spark, sf, "documents"), sf, "documents", "doc_id",
        min_bytes=4 * 1024 * 1024,
    )
    t = F.split(F.col("text"), " ")
    n_tok = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    n_stop = F.size(F.array_intersect(F.array_distinct(t), F.array(*[F.lit(w) for w in STOPWORDS])))
    avg_len = (F.length(F.col("text")) - n_tok + 1).cast("double") / n_tok.cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            n_tok.alias("n_tokens"),
            n_uniq.alias("n_unique_tokens"),
            (n_uniq.cast("double") / n_tok.cast("double")).alias("type_token_ratio"),
            n_stop.alias("n_stopword_types"),
            avg_len.alias("avg_token_len"),
            (
                (n_tok >= 20)
                & (n_uniq.cast("double") / n_tok.cast("double") > 0.05)
            ).alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             [{", ".join(f"'{w}'" for w in STOPWORDS)}])) AS n_stopword_types,
         length(text) AS n_chars_calc
  FROM documents
)
SELECT doc_id, lang, n_tokens, n_unique_tokens,
       CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
       n_stopword_types,
       CAST(n_chars_calc - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
       (n_tokens >= 20 AND CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.05)
           AS passes_quality
FROM base ORDER BY doc_id
"""


def lang_score(spark, sf):
    """Stopword-overlap language scoring with deterministic argmax."""
    docs = load(spark, sf, "documents")
    uniq = F.array_distinct(F.split(F.col("text"), " "))
    scores = {
        lang: F.size(F.array_intersect(uniq, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), "en"
        )
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return (
        docs.select(
            "doc_id",
            F.col("lang").alias("actual_lang"),
            scores["en"].alias("score_en"),
            scores["de"].alias("score_de"),
            scores["fr"].alias("score_fr"),
            pred.alias("predicted_lang"),
        )
        .orderBy("doc_id")
    )


def _score_sql(words):
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_intersect(list_distinct(string_split(text, ' ')), [{lst}]))"


LANG_SCORE_SQL = f"""
WITH s AS (
  SELECT doc_id, lang AS actual_lang,
         {_score_sql(LANG_MARKERS["en"])} AS score_en,
         {_score_sql(LANG_MARKERS["de"])} AS score_de,
         {_score_sql(LANG_MARKERS["fr"])} AS score_fr
  FROM documents
)
SELECT doc_id, actual_lang, score_en, score_de, score_fr,
       CASE WHEN score_en >= score_de AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_fr THEN 'de'
            ELSE 'fr' END AS predicted_lang
FROM s ORDER BY doc_id
"""


def token_frequencies(spark, sf):
    """Corpus-level token frequency table (top 50, deterministic order)."""
    docs = load(spark, sf, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(50)
    )


TOKEN_FREQ_SQL = """
SELECT token, COUNT(*) AS freq
FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
GROUP BY token ORDER BY freq DESC, token LIMIT 50
"""


def source_token_stats(spark, sf):
    """Per-source corpus statistics (grouped token counting)."""
    docs = load(spark, sf, "documents")
    t = F.split(F.col("text"), " ")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(t)).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


SOURCE_STATS_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY source ORDER BY source
"""


def binary_digest_features(spark, sf):
    """Binary-column pipeline (multimodal plumbing, oracle-checkable form):
    text bytes → opaque binary content → digest-derived integer feature
    vector + size bucketing. Mirrors operators/multimodal.extract_features
    with md5 (the cross-engine digest) instead of blake2."""
    docs = load(spark, sf, "documents")
    content = F.encode(F.col("text"), "utf-8")
    digest = F.md5(content)
    feat = [
        F.conv(F.substring(digest, 1 + 8 * i, 8), 16, 10).cast("long").alias(f"feat{i}")
        for i in range(4)
    ]
    return (
        docs.select(
            "doc_id",
            F.octet_length(F.col("text")).alias("byte_len"),
            (F.octet_length(F.col("text")) / F.lit(256)).cast("long").alias("size_bucket"),
            *feat,
        )
        .orderBy("doc_id")
    )


BINARY_FEATURES_SQL = """
SELECT doc_id, octet_length(encode(text)) AS byte_len,
       octet_length(encode(text)) // 256 AS size_bucket,
       CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS feat0,
       CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) AS feat1,
       CAST('0x' || substr(md5(text), 17, 8) AS BIGINT) AS feat2,
       CAST('0x' || substr(md5(text), 25, 8) AS BIGINT) AS feat3
FROM documents ORDER BY doc_id
"""


def repetition_stats(spark, sf):
    """Gopher-style repetition signals per document: duplicate word-trigram
    fraction and duplicate-token fraction (high values ⇒ boilerplate /
    generated spam — a standard LLM-data filter alongside text_quality).

    Entirely columnar array expressions — NO explode, NO shuffle; the plan
    is a projection over the scan and parallelizes perfectly at any corpus
    size. Ratios are exact integer-over-integer doubles."""
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    t = F.col("t")
    n = F.size(t)
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(" ", t[i], t[i + 1], t[i + 2]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_tri = F.size(tri)
    dup_tri = (n_tri - F.size(F.array_distinct(tri))).cast("double") / F.greatest(
        n_tri, F.lit(1)
    ).cast("double")
    dup_tok = (n - F.size(F.array_distinct(t))).cast("double") / n.cast("double")
    return toks.select(
        "doc_id",
        n.alias("n_tokens"),
        n_tri.alias("n_trigrams"),
        dup_tri.alias("dup_trigram_frac"),
        dup_tok.alias("dup_token_frac"),
        ((dup_tri < 0.30) & (dup_tok < 0.70)).alias("passes_repetition"),
    ).orderBy("doc_id")


REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tri AS (
  SELECT doc_id, len(t) AS n_tokens,
         len(list_distinct(t)) AS n_uniq_tok,
         list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
  FROM toks
)
SELECT doc_id, n_tokens, len(tg) AS n_trigrams,
       CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
         / CAST(greatest(len(tg), 1) AS DOUBLE) AS dup_trigram_frac,
       CAST(n_tokens - n_uniq_tok AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_token_frac,
       (CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
         / CAST(greatest(len(tg), 1) AS DOUBLE) < 0.30)
       AND (CAST(n_tokens - n_uniq_tok AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.70)
         AS passes_repetition
FROM tri ORDER BY doc_id
"""


N_EVAL_DOCS = 5  # docs 0..4 play the held-out benchmark


def contamination_check(spark, sf):
    """Benchmark contamination scan: which training documents share
    word-trigram shingles with a held-out eval set (docs 0..{N_EVAL_DOCS-1})?

    The 100 TB plan: the eval set is tiny by construction, so its distinct
    shingle set is BROADCAST and the scan over the training corpus is a
    broadcast hash join (no shuffle of the corpus). Output: contaminated
    doc → number of leaked shingles, strongest leak first."""
    from dataset_dedupe_estimator_spark.queries.dedupe_text import shingles_df

    sh = shingles_df(spark, sf)
    eval_sh = sh.filter(F.col("doc_id") < N_EVAL_DOCS).select("shingle").distinct()
    train = sh.filter(F.col("doc_id") >= N_EVAL_DOCS)
    return (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked_shingles"))
        .orderBy(F.col("n_leaked_shingles").desc(), "doc_id")
    )


_CONTAMINATION_SQL_TEMPLATE = """
WITH {shingles_cte},
eval_sh AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id < {n_eval}),
train AS (SELECT * FROM shingles WHERE doc_id >= {n_eval})
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_leaked_shingles
FROM train JOIN eval_sh USING (shingle)
GROUP BY doc_id ORDER BY n_leaked_shingles DESC, doc_id
"""


def _contamination_sql() -> str:
    from dataset_dedupe_estimator_spark.queries.dedupe_text import SHINGLES_CTE

    return _CONTAMINATION_SQL_TEMPLATE.format(
        shingles_cte=SHINGLES_CTE, n_eval=N_EVAL_DOCS
    )


def survival_scores(spark, sf):
    """Per-document survival flags for the composed training-data filter:
    exact dedup keeper (first doc per text hash) / quality gate (length +
    type-token ratio) / repetition gate (dup n-gram fractions). Shared by
    the stats rollup (corpus_survival_pipeline) and the corpus
    materializer (materialize_survivors)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(" ", t[i], t[i + 1], t[i + 2]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_tri = F.size(tri)
    dup_tri = (n_tri - F.size(F.array_distinct(tri))).cast("double") / F.greatest(
        n_tri, F.lit(1)
    ).cast("double")
    dup_tok = (n - n_uniq).cast("double") / n.cast("double")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return docs.select(
        "doc_id",
        "source",
        n.cast("long").alias("n_tokens"),  # free here; saves consumers a
        #                                    second text scan (token budget)
        (F.row_number().over(w) == 1).alias("is_keeper"),
        ((n >= 20) & (n_uniq.cast("double") / n.cast("double") > 0.05)).alias(
            "passes_quality"
        ),
        ((dup_tri < 0.30) & (dup_tok < 0.70)).alias("passes_repetition"),
    )


def corpus_survival_pipeline(spark, sf):
    """The composed training-data filter — what a real pipeline runs before
    tokenization: exact dedup (keep first doc per text hash) ∧ quality gate
    (length + type-token ratio) ∧ repetition gate (dup n-gram fractions),
    reduced to per-source survival statistics — plus the span-mass
    accounting of exact-substring dedup (operators/substring_dedup.py):
    ``span_dup_tokens`` is each source's token mass inside merged
    duplicate spans (sliding k-gram, global-first-occurrence rule), the
    number span-removal dedup would strip.

    One plan per leg: the dedup window shuffles on text hash once and
    every filter is a columnar expression over that scan; the span leg's
    corpus-wide exchange carries only (md5, id, pos) triples and only
    duplicate occurrences reach the interval-merge windows; the final
    per-source rollup is a small aggregate. At 100 TB this is the shape
    you run nightly."""
    from dataset_dedupe_estimator_spark.operators.substring_dedup import (
        DEFAULT_K,
        duplicate_spans,
    )

    docs = load(spark, sf, "documents")
    scored = survival_scores(spark, sf)
    span_mass = (
        duplicate_spans(docs, DEFAULT_K)
        .groupBy("id")
        .agg(
            F.sum(F.col("span_end") - F.col("span_start")).alias("span_dup_tokens")
        )
        .withColumnRenamed("id", "doc_id")
    )
    scored = scored.join(span_mass, "doc_id", "left").withColumn(
        "span_dup_tokens", F.coalesce("span_dup_tokens", F.lit(0))
    )
    survives = F.col("is_keeper") & F.col("passes_quality") & F.col("passes_repetition")
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(survives.cast("long")).alias("n_survivors"),
            F.sum((~F.col("is_keeper")).cast("long")).alias("n_dropped_dup"),
            F.sum(
                (F.col("is_keeper") & ~F.col("passes_quality")).cast("long")
            ).alias("n_dropped_quality"),
            F.sum("span_dup_tokens").cast("long").alias("span_dup_tokens"),
        )
        .withColumn(
            "survival_rate",
            F.col("n_survivors").cast("double") / F.col("n_docs").cast("double"),
        )
        .select(
            "source", "n_docs", "n_survivors", "n_dropped_dup",
            "n_dropped_quality", "survival_rate", "span_dup_tokens",
        )
        .orderBy("source")
    )


_SURVIVAL_K = 8  # == operators/substring_dedup.DEFAULT_K (span-mass leg)

SURVIVAL_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS is_keeper,
         (len(string_split(text, ' ')) >= 20 AND
          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05) AS passes_quality,
         (CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
            / CAST(greatest(len(tg), 1) AS DOUBLE) < 0.30
          AND CAST(len(t) - len(list_distinct(t)) AS DOUBLE)
            / CAST(len(t) AS DOUBLE) < 0.70) AS passes_repetition
  FROM (
    SELECT doc_id, source, text, t,
           list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents)
  )
),
sub_toks AS (
  SELECT doc_id, t, CAST(GREATEST(len(t) - {_SURVIVAL_K - 1}, 0) AS BIGINT) AS n_grams
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
sub_grams AS (
  SELECT doc_id, CAST(u.j AS INT) AS pos,
         md5(array_to_string(t[u.j + 1 : u.j + {_SURVIVAL_K}], ' ')) AS h
  FROM sub_toks, UNNEST(range(0, n_grams)) AS u(j)
),
sub_dups AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM sub_grams
  ) WHERE rn > 1
),
sub_islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM (
    SELECT doc_id, pos,
           CASE WHEN MAX(pos + {_SURVIVAL_K}) OVER w IS NULL
                  OR pos > MAX(pos + {_SURVIVAL_K}) OVER w THEN 1 ELSE 0 END AS new_island
    FROM sub_dups
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
  )
),
span_mass AS (
  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS span_dup_tokens
  FROM (
    SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {_SURVIVAL_K} AS e
    FROM sub_islands GROUP BY doc_id, island
  ) GROUP BY doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_keeper AND passes_quality AND passes_repetition
                THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN NOT is_keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_dup,
       CAST(SUM(CASE WHEN is_keeper AND NOT passes_quality THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped_quality,
       CAST(SUM(CASE WHEN is_keeper AND passes_quality AND passes_repetition
                THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS survival_rate,
       CAST(SUM(COALESCE(sm.span_dup_tokens, 0)) AS BIGINT) AS span_dup_tokens
FROM scored LEFT JOIN span_mass sm USING (doc_id)
GROUP BY source ORDER BY source
"""


def materialize_survivors(
    spark, sf, dest: str, files_per_source: int = 1, strip_spans: bool = False
) -> tuple[int, int]:
    """Write the cleaned corpus: every document passing the survival
    pipeline, as parquet partitioned by source. Returns (n_input_docs,
    n_written_docs) after an O3-style write sanity read-back.

    With ``strip_spans`` the surviving documents additionally have their
    exact-substring duplicate spans removed
    (operators/substring_dedup.strip_duplicate_spans — first occurrences
    survive verbatim; span removal runs on the SURVIVOR set so a
    passage's keeper copy is whatever survivor saw it first).

    100 TB shape: survivors are selected by a doc_id join against the
    scored flags (same single-shuffle plan as the stats rollup), and the
    writer repartitions on (source, doc_id mod files_per_source) so each
    Hive partition gets ``files_per_source`` similar-sized files instead
    of one file per upstream task — raise it with corpus size to bound
    file sizes without a global sort."""
    docs = load(spark, sf, "documents")
    scored = survival_scores(spark, sf)
    survives = (
        F.col("is_keeper") & F.col("passes_quality") & F.col("passes_repetition")
    )
    survivors = docs.join(
        scored.filter(survives).select("doc_id"), "doc_id"
    )
    if strip_spans:
        from dataset_dedupe_estimator_spark.operators.substring_dedup import (
            DEFAULT_K,
            strip_duplicate_spans,
        )

        cleaned = strip_duplicate_spans(survivors, DEFAULT_K).select(
            F.col("id").alias("doc_id"), F.col("text_clean").alias("text")
        )
        survivors = survivors.drop("text").join(cleaned, "doc_id")
    (
        survivors.repartition(
            F.col("source"), F.pmod(F.col("doc_id"), F.lit(files_per_source))
        )
        .write.partitionBy("source")
        .mode("overwrite")
        .parquet(dest)
    )
    n_in = docs.count()
    n_out = spark.read.parquet(dest).count()
    return n_in, n_out


def effective_token_budget(spark, sf):
    """Per-source token accounting before vs after the survival pipeline —
    the number an epoch planner actually needs: raw corpus tokens are
    meaningless for training-budget math once dedup/quality/repetition
    filters run. One pass: token counts are a columnar expression over the
    same scan the survival flags come from; the rollup is per-source.

    All counts exact integers; the retention ratio is one IEEE division.
    One scan: survival_scores carries n_tokens, so no second text scan
    and no doc_id join — the rollup consumes the scored pass directly."""
    scored = survival_scores(spark, sf)
    survives = (
        F.col("is_keeper") & F.col("passes_quality") & F.col("passes_repetition")
    )
    joined = scored.select(
        "source", F.col("n_tokens").alias("n_tok"), survives.alias("survives")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.sum("n_tok").alias("raw_tokens"),
            F.sum(F.when(F.col("survives"), F.col("n_tok")).otherwise(F.lit(0))).alias(
                "effective_tokens"
            ),
        )
        .select(
            "source",
            F.col("raw_tokens").cast("long").alias("raw_tokens"),
            F.col("effective_tokens").cast("long").alias("effective_tokens"),
            (
                F.col("effective_tokens").cast("double")
                / F.col("raw_tokens").cast("double")
            ).alias("token_retention"),
        )
        .orderBy("source")
    )


EFFECTIVE_TOKEN_SQL = """
WITH scored AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
         (ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
          AND (len(string_split(text, ' ')) >= 20 AND
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.05)
          AND (CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
                 / CAST(greatest(len(tg), 1) AS DOUBLE) < 0.30
               AND CAST(len(t) - len(list_distinct(t)) AS DOUBLE)
                 / CAST(len(t) AS DOUBLE) < 0.70)) AS survives
  FROM (
    SELECT doc_id, source, text, t,
           list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents)
  )
)
SELECT source,
       CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
       CAST(SUM(CASE WHEN survives THEN n_tok ELSE 0 END) AS BIGINT)
         AS effective_tokens,
       CAST(SUM(CASE WHEN survives THEN n_tok ELSE 0 END) AS DOUBLE)
         / CAST(SUM(n_tok) AS DOUBLE) AS token_retention
FROM scored GROUP BY source ORDER BY source
"""


VOCAB_K = 24  # top-K corpus vocabulary (tiny here; 10k-100k in production)


def vocab_coverage_score(spark, sf):
    """LM-style frequency scoring without floats-in-aggregation: build the
    top-{VOCAB_K} corpus vocabulary (count desc, token asc tie-break —
    bounded, so broadcastable at ANY corpus size, unlike a full frequency
    table), then score each document by in-vocab coverage and mean
    corpus-frequency of its tokens. All aggregates are exact integers; the
    two ratios are single IEEE divisions of exact integers — deterministic
    across engines where a sum-of-logs perplexity would not be (float
    addition order).

    The 100 TB shape: the corpus explodes into the (doc, token)
    occurrence aggregate ONCE; both the vocab top-K and the scoring pass
    consume that aggregate, so the second traversal of the raw text that
    a tok-level vocab build would cost is gone, and the broadcast join
    sees distinct (doc, token) pairs instead of every occurrence."""
    docs = load(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    vocab = (
        per.groupBy("token")
        .agg(F.sum("k").alias("corpus_count"))
        .orderBy(F.col("corpus_count").desc(), "token")
        .limit(VOCAB_K)
    )
    scored = per.join(F.broadcast(vocab), "token", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(
                F.col("corpus_count").isNotNull().cast("long") * F.col("k")
            ).alias("n_in_vocab"),
            F.sum(F.coalesce(F.col("corpus_count"), F.lit(0)) * F.col("k")).alias(
                "freq_sum"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_in_vocab",
            "freq_sum",
            (F.col("n_in_vocab").cast("double") / F.col("n_tokens").cast("double")).alias(
                "vocab_coverage"
            ),
            (F.col("freq_sum").cast("double") / F.col("n_tokens").cast("double")).alias(
                "avg_token_freq"
            ),
        )
        .orderBy("doc_id")
    )


VOCAB_COVERAGE_SQL = f"""
WITH tok AS (
  SELECT doc_id, u.token FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
),
vocab AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS corpus_count
  FROM tok GROUP BY token
  ORDER BY corpus_count DESC, token LIMIT {VOCAB_K}
),
scored AS (SELECT t.doc_id, v.corpus_count FROM tok t LEFT JOIN vocab v USING (token))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN corpus_count IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
       CAST(SUM(COALESCE(corpus_count, 0)) AS BIGINT) AS freq_sum,
       CAST(SUM(CASE WHEN corpus_count IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS vocab_coverage,
       CAST(SUM(COALESCE(corpus_count, 0)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_token_freq
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def bpe_pair_frequencies(spark, sf):
    """Adjacent-token pair frequencies (top 50): the merge-candidate
    census a BPE tokenizer trainer computes each round — the corpus-wide
    sibling of the per-token ``token_frequencies`` table.

    Pairs come from zipping each document's token array with itself
    shifted by one (``slice``+``zip_with`` — expression-only, no UDF),
    then one explode + count. 100 TB shape: map-side fan-out is exactly
    (tokens-1) per doc, one aggregation shuffle on the pair string, and
    the top-50 is a TakeOrderedAndProject — the same scalable shape a
    real BPE trainer iterates (with the winning merge applied between
    rounds, which stays a map-only rewrite)."""
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair"))
        .limit(50)
    )


BPE_PAIR_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT t[i] || ' ' || t[i + 1] AS pair
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
)
SELECT pair, COUNT(*) AS freq
FROM pairs GROUP BY pair ORDER BY freq DESC, pair LIMIT 50
"""


def doc_length_quantiles(spark, sf):
    """Exact per-source token-length quantiles — the number a packing /
    truncation / curriculum plan actually needs (``sequence_pack``'s
    SEQ_LEN should come from p90, not a guess).

    Scale shape: lengths collapse to a per-(source, n_tokens) census
    first — cardinality bounded by the length DOMAIN per source, never
    the doc count — then every window is PARTITIONED BY SOURCE (ordered
    cumsum + full-frame total), so no row of any source funnels through
    a single global task. Discrete type-1 ranks in pure integer math on
    both engines (the spend_quartiles discipline: interpolating
    percentile() would diverge from the oracle)."""
    docs = load(spark, sf, "documents")
    toks = docs.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    census = toks.groupBy("source", "n_tokens").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_ord = (
        Window.partitionBy("source")
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = census.select(
        "source",
        "n_tokens",
        "cnt",
        F.sum("cnt").over(w_ord).alias("cum"),
        F.sum("cnt").over(w_all).alias("tot"),
    )

    def q(num, den):
        k = F.expr(f"(tot - 1) * {num} div {den} + 1")
        hit = (F.col("cum") - F.col("cnt") < k) & (k <= F.col("cum"))
        return F.min(F.when(hit, F.col("n_tokens")))

    return (
        ranked.groupBy("source")
        .agg(
            F.max("tot").alias("n_docs"),
            q(1, 4).alias("p25_tokens"),
            q(1, 2).alias("median_tokens"),
            q(3, 4).alias("p75_tokens"),
            q(9, 10).alias("p90_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


def _dlq_case(num, den):
    k = f"(tot - 1) * {num} // {den} + 1"
    return f"MIN(CASE WHEN cum - cnt < {k} AND {k} <= cum THEN n_tokens END)"


DOC_LENGTH_QUANTILES_SQL = f"""
WITH toks AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
census AS (
  SELECT source, n_tokens, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
),
ranked AS (
  SELECT source, n_tokens, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY n_tokens
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS tot
  FROM census
)
SELECT source, MAX(tot) AS n_docs,
       {_dlq_case(1, 4)} AS p25_tokens,
       {_dlq_case(1, 2)} AS median_tokens,
       {_dlq_case(3, 4)} AS p75_tokens,
       {_dlq_case(9, 10)} AS p90_tokens,
       MAX(n_tokens) AS max_tokens
FROM ranked GROUP BY source ORDER BY source
"""


BPE_MERGES = 12


def bpe_train_merges(spark, sf):
    """Distributed BPE tokenizer TRAINING (operators/bpe.py): one corpus
    scan builds the word census, then {BPE_MERGES} greedy merge rounds
    run over census-sized data only — the vocabulary-construction step
    every LLM pipeline performs before token counting. Deterministic
    (lexicographic tie-break), but the training loop is iterative and
    not SQL-expressible → rows-only driver check; exact equivalence to
    a pure-Python reference BPE is pinned in tests/test_bpe.py."""
    from dataset_dedupe_estimator_spark.operators.bpe import bpe_train, word_census

    docs = load(spark, sf, "documents")
    merges = bpe_train(word_census(docs), BPE_MERGES)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    ).orderBy("rank")


def bpe_token_stats(spark, sf):
    """Train → tokenize → budget, end to end: the {BPE_MERGES}-merge
    vocabulary from `bpe_train_merges` applied back to the corpus
    (operators/bpe.py:bpe_encode, one Arrow pass with a per-batch word
    cache), rolled up per source: whitespace vs BPE token counts and
    the chars-per-BPE-token compression the budget planner actually
    uses. Rows-only (the train+encode loop is not SQL-expressible);
    encode correctness is pinned against the reference implementation
    in tests/test_bpe.py."""
    from dataset_dedupe_estimator_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        word_census,
    )

    docs = load(spark, sf, "documents")
    merges = bpe_train(word_census(docs), BPE_MERGES)
    enc = bpe_encode(docs.select("source", "text", F.length("text").alias("n_chars_c")), merges)
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.round(
                F.sum("n_chars_c") / F.sum("bpe_tokens"), 3
            ).alias("chars_per_bpe_token"),
        )
        .orderBy("source")
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("vector", "window", "fast")  # fixed benchmark query
BM25_TOP = 20


def bm25_frame(docs, terms, k1=BM25_K1, b=BM25_B, top=BM25_TOP,
               id_col="doc_id", text_col="text"):
    """BM25 top-k over ``docs`` for constant ``terms`` — the reusable
    core behind the ``bm25_search`` gate entry and the ``de search``
    CLI.  See ``bm25_search`` for the plan-shape discussion."""
    toks = F.split(text_col, " ")

    def tf_expr(term):
        # size - size(array_remove) == exact token count; 2x faster than a
        # higher-order filter lambda (ArrayFilter evals an interpreted
        # closure per element; ArrayRemove is a plain equality scan)
        return F.size(toks) - F.size(F.array_remove(toks, term))

    base = docs.select(
        id_col,
        F.size(toks).alias("dl"),
        *[tf_expr(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    matched = base.filter(
        reduce(operator.or_, [F.col(f"tf{i}") > 0 for i in range(len(terms))])
    ).crossJoin(F.broadcast(stats))

    def comp(i):
        tf = F.col(f"tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
            / (F.col(f"df{i}") + F.lit(0.5))
        )
        raw = (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            )
        )
        return F.when(tf > 0, raw).otherwise(F.lit(0.0))

    score = comp(0)
    for i in range(1, len(terms)):
        score = score + comp(i)
    n_terms = reduce(
        operator.add,
        [(F.col(f"tf{i}") > 0).cast("long") for i in range(len(terms))],
    )
    return (
        matched.select(
            id_col,
            n_terms.alias("n_terms"),
            F.round(score, 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(top)
    )


def bm25_search(spark, sf):
    """BM25 top-k keyword search over the documents table.

    The query terms are plan constants, so the inverted index
    dissolves into expressions: per-doc term frequencies are
    ``size(toks) - size(array_remove(toks, term))`` — no explode, no
    (doc, token) shuffle at all.  ONE aggregate over that projection
    yields N, avgdl, and every term's document frequency together; it
    broadcasts as a scalar row and scoring is a pure per-row expression
    on a second pass of the same narrow projection.  Per-term
    components are added in FIXED expression order, so no float
    aggregation order-dependence exists anywhere — the DuckDB oracle
    reproduces the score bit-for-bit before the shared ROUND.  Top-k is
    orderBy+limit (TakeOrdered), never a global window.  At 100 TB:
    two column-pruned scans of ``text``, zero shuffles (cache the
    narrow projection to make it one scan); scoring rides the scan.
    """
    docs = load(spark, sf, "documents")
    return bm25_frame(docs, BM25_QUERY)


def _bm25_sql(corpus_where: str = "") -> str:
    """The shared BM25 oracle; ``corpus_where`` restricts the corpus
    (the deletion entry scores against documents minus the deleted
    set — N, avgdl and df all recomputed over the survivors, exactly
    what the index's manifest decrements + postings anti-join must
    reproduce)."""
    n = len(BM25_QUERY)
    tf_exprs = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    df_exprs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(n)
    )
    comps = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {BM25_K1 + 1.0})"
        f" / (tf{i} + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * dl / avgdl))"
        f" ELSE 0.0 END)"
        for i in range(n)
    )
    n_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(n)
    )
    any_tf = " OR ".join(f"tf{i} > 0" for i in range(n))
    return f"""
WITH base AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         {tf_exprs}
  FROM documents {corpus_where}
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl,
         {df_exprs}
  FROM base
)
SELECT doc_id,
       CAST({n_terms} AS BIGINT) AS n_terms,
       ROUND({comps}, 4) AS score
FROM base CROSS JOIN stats
WHERE {any_tf}
ORDER BY score DESC, doc_id
LIMIT {BM25_TOP}
"""


def bm25_index_search(spark, sf):
    """BM25 top-k served from the PERSISTENT inverted index
    (plans/text_index.py) — the query-at-rest twin of ``bm25_search``.

    Exercises the full index lifecycle end-to-end: builds generation 0
    over the even-doc_id half of the corpus, ADMITS the odd half as a
    second generation (O(batch), manifest-committed), then searches the
    benchmark terms reading only the manifest, the query terms' bucket
    partitions, and candidate doclens — no corpus scan. Shares
    ``bm25_search``'s DuckDB oracle verbatim: two completely different
    physical paths (inline scan expressions vs log-structured inverted
    index) must produce the bit-identical ranked answer. Eager by
    construction (index commits run at build); result localCheckpointed
    before the temp index vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.plans.text_index import (
        admit_docs,
        build_text_index,
        search,
    )

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="dde_ti_")
    try:
        idx = f"{root}/idx"
        build_text_index(spark, docs.filter(F.col("doc_id") % 2 == 0), idx)
        admit_docs(spark, docs.filter(F.col("doc_id") % 2 == 1), idx)
        return search(
            spark, idx, BM25_QUERY, k1=BM25_K1, b=BM25_B, top=BM25_TOP
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


BM25_DELETE_MOD = 7  # deleted set: doc_id % 7 == 3 (deterministic)
BM25_DELETE_REM = 3


def bm25_delete_search(spark, sf):
    """BM25 search AFTER DELETION from the persistent inverted index
    (plans/text_index.py::delete_docs — the r7 takedown surface).

    Builds the index over the full corpus, deletes every doc_id ≡ 3
    (mod 7) via a tombstone set (no generation rewritten), then runs
    the benchmark search. The oracle scores a corpus that NEVER
    CONTAINED the deleted docs — N, avgdl, and every per-term df
    recomputed over the survivors — so the index path only matches if
    the manifest stat decrements AND the postings anti-join are both
    exactly right: search-after-delete ≡ rebuild-without-deleted,
    driver-attested. Eager by construction; result localCheckpointed
    before the temp index vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.plans.text_index import (
        build_text_index,
        delete_docs,
        search,
    )

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="dde_tid_")
    try:
        idx = f"{root}/idx"
        build_text_index(spark, docs, idx)
        gone = docs.filter(
            F.col("doc_id") % BM25_DELETE_MOD == BM25_DELETE_REM
        ).select("doc_id")
        delete_docs(spark, idx, gone)
        return search(
            spark, idx, BM25_QUERY, k1=BM25_K1, b=BM25_B, top=BM25_TOP
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


PHRASE_QUERY = ("slow", "hash", "batch")  # fixed benchmark phrase
PHRASE_TOP = 20


def phrase_search_index(spark, sf):
    """Exact-phrase retrieval from the persistent inverted index
    (plans/text_index.py::phrase_search): documents containing the
    benchmark phrase {PHRASE_QUERY} as CONSECUTIVE tokens, ranked by
    occurrence count — the capability BM25's bag-of-words scoring
    cannot express (quoted-passage lookup, boilerplate-sentence
    counting). Served entirely from per-(term, doc) position lists in
    the phrase terms' bucket partitions; document text is never read at
    query time. The oracle re-derives occurrences by scanning token
    windows directly, so a positions list that lost an occurrence — or
    a run check that matched non-consecutive tokens — hash-mismatches.
    Eager by construction; result localCheckpointed before the temp
    index vanishes.
    """
    import shutil
    import tempfile

    from dataset_dedupe_estimator_spark.plans.text_index import (
        build_text_index,
        phrase_search,
    )

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="dde_ph_")
    try:
        idx = f"{root}/idx"
        build_text_index(spark, docs, idx)
        return phrase_search(spark, idx, PHRASE_QUERY, top=PHRASE_TOP).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _phrase_sql() -> str:
    k = len(PHRASE_QUERY)
    run = " AND ".join(
        f"t[i + {j}] = '{t}'" for j, t in enumerate(PHRASE_QUERY)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, COUNT(*) AS n
  FROM toks, UNNEST(range(1, len(t) - {k - 2})) AS u(i)
  WHERE {run}
  GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_occurrences
FROM occ ORDER BY n_occurrences DESC, doc_id LIMIT {PHRASE_TOP}
"""


QUERIES = {
    "bm25_search": Q(bm25_search, _bm25_sql()),
    "bm25_index_search": Q(bm25_index_search, _bm25_sql()),
    "bm25_delete_search": Q(
        bm25_delete_search,
        _bm25_sql(
            f"WHERE doc_id % {BM25_DELETE_MOD} <> {BM25_DELETE_REM}"
        ),
    ),
    "phrase_search_index": Q(phrase_search_index, _phrase_sql()),
    "bpe_train_merges": Q(bpe_train_merges),
    "bpe_token_stats": Q(bpe_token_stats),
    "doc_length_quantiles": Q(doc_length_quantiles, DOC_LENGTH_QUANTILES_SQL),
    "bpe_pair_frequencies": Q(bpe_pair_frequencies, BPE_PAIR_SQL),
    "repetition_stats": Q(repetition_stats, REPETITION_SQL),
    "vocab_coverage_score": Q(vocab_coverage_score, VOCAB_COVERAGE_SQL),
    "contamination_check": Q(contamination_check, _contamination_sql()),
    "corpus_survival_pipeline": Q(corpus_survival_pipeline, SURVIVAL_SQL),
    "effective_token_budget": Q(effective_token_budget, EFFECTIVE_TOKEN_SQL),
    "text_quality": Q(text_quality, TEXT_QUALITY_SQL, headline=True),
    "binary_digest_features": Q(binary_digest_features, BINARY_FEATURES_SQL),
    "lang_score": Q(lang_score, LANG_SCORE_SQL),
    "token_frequencies": Q(token_frequencies, TOKEN_FREQ_SQL),
    "source_token_stats": Q(source_token_stats, SOURCE_STATS_SQL),
}
