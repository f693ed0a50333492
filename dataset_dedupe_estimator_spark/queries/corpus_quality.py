"""Corpus quality & incremental-ingest operators over ``documents`` —
the CCNet/RefinedWeb-style scoring passes a training-data pipeline runs
after dedup, plus the Bloom-prefiltered "new vs already-ingested" split.

* ``unigram_surprisal`` — per-document mean surprisal under a corpus
  unigram LM, the CCNet quality signal (docs whose tokens are globally
  rare score high; boilerplate scores low). Surprisal is integer-
  quantized to whole bits (``floor(log2 N) - floor(log2 cnt)`` per
  token) so every aggregate is exact BIGINT arithmetic — hash-identical
  across engines by construction, no float-summation order hazard.
* ``tfidf_top_terms`` — top-5 characteristic terms per source by a
  deterministic tf-idf variant (``tf / df``: term count in the source
  over the number of sources containing the term). The only float op is
  one correctly-rounded IEEE division, so ranking is engine-identical.
* ``bloom_incremental_dedup`` — split an incoming batch into duplicate
  vs new against an already-ingested history using a broadcast Bloom
  prefilter (``operators/bloom.py``); exact output (Bloom has no false
  negatives), oracle is a plain semi-join. The reference's global
  HashSet dedup (``/root/reference/src/xet.rs:24-33``) re-expressed for
  a history too big to shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataset_dedupe_estimator_spark.operators.bloom import bloom_build, bloom_probe
from dataset_dedupe_estimator_spark.queries.base import Q, load

TOP_K_TERMS = 5
MIN_TERM_LEN = 4  # skip stopword-length tokens in tf-idf


def _bits(col):
    """floor(log2(col)) for a positive BIGINT, exactly: length of the
    minimal binary representation minus one. Avoids float log entirely
    (DuckDB mirrors with ``length(bin(x)) - 1``)."""
    return (F.length(F.conv(col.cast("string"), 10, 2)) - 1).cast("long")


def unigram_surprisal(spark, sf):
    """Per-doc token count and total/mean unigram surprisal in whole bits.

    Plan shape: ONE scan/explode into the (doc, token) occurrence
    aggregate; the global token count is a WINDOW over the token key of
    that aggregate — never a join of a counts table back against the
    full occurrence stream (which re-scans and re-explodes the corpus:
    AQE exchange reuse fails across the consumers' prunings, and the
    occurrence-stream join shuffles every token occurrence instead of
    every distinct (doc, token) pair). No vocab broadcast — the round-1
    MinHash lesson. The corpus-total N is one plain aggregate scan (no
    explode, no shuffle) joined as a 1-row cross join, not a collect.
    """
    docs = load(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    per = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    scored = per.withColumn("cnt", F.sum("k").over(Window.partitionBy("token")))
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.sum(F.col("k") * _bits(F.col("cnt"))).alias("sum_cnt_bits"),
    )
    total = docs.agg(F.sum(F.size(F.split("text", " "))).alias("n")).select(
        _bits(F.col("n")).alias("bits_n")
    )
    return (
        per_doc.crossJoin(total)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bits_n") * F.col("n_tokens") - F.col("sum_cnt_bits")).alias(
                "total_bits"
            ),
            (
                (F.col("bits_n") * F.col("n_tokens") - F.col("sum_cnt_bits")).cast(
                    "double"
                )
                / F.col("n_tokens").cast("double")
            ).alias("mean_bits"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_SURPRISAL_SQL = """
WITH tok AS (
  SELECT doc_id, u.token FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
),
counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
total AS (
  SELECT CAST(length(bin(CAST(SUM(cnt) AS BIGINT))) - 1 AS BIGINT) AS bits_n
  FROM counts
),
per_doc AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(length(bin(c.cnt)) - 1) AS BIGINT) AS sum_cnt_bits
  FROM tok t JOIN counts c USING (token) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(bits_n * n_tokens - sum_cnt_bits AS BIGINT) AS total_bits,
       CAST(bits_n * n_tokens - sum_cnt_bits AS DOUBLE)
         / CAST(n_tokens AS DOUBLE) AS mean_bits
FROM per_doc, total
ORDER BY doc_id
"""


def tfidf_top_terms(spark, sf):
    """Top-5 characteristic terms per source by tf/df (see module doc).

    Plan shape: ONE scan/explode into the (source, token) aggregate;
    the document frequency is a window over the token key of that
    aggregate (a groupBy-and-join-back would recompute the explode
    subtree and scan the corpus twice). The ranking window partitions
    by source, so the sort is per-source, never global. Ties break on
    the term itself — fully deterministic on any cluster layout.
    """
    docs = load(spark, sf, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token")).filter(
        F.length("token") >= MIN_TERM_LEN
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    ).withColumn("score", F.col("tf").cast("double") / F.col("df").cast("double"))
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K_TERMS)
        .select("source", "rnk", "token", "tf", "df", "score")
        .orderBy("source", "rnk")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tok AS (
  SELECT source, u.token FROM documents, UNNEST(string_split(text, ' ')) AS u(token)
  WHERE length(u.token) >= {MIN_TERM_LEN}
),
tf AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY source, token
),
idf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.source, tf.token, tf.tf, idf.df,
         CAST(tf.tf AS DOUBLE) / CAST(idf.df AS DOUBLE) AS score
  FROM tf JOIN idf USING (token)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY score DESC, token
  ) AS rnk
  FROM scored
)
SELECT source, rnk, token, tf, df, score
FROM ranked WHERE rnk <= {TOP_K_TERMS}
ORDER BY source, rnk
"""


def bloom_incremental_dedup(spark, sf):
    """Per-source duplicate/new counts for an incoming batch checked
    against an already-ingested history, Bloom-prefiltered.

    ``doc_id % 10 < 7`` plays the multi-PB history; the rest is the
    incoming batch. The history folds into a 1 Mi-bit Bloom filter once
    (bounded 128 KiB broadcast), the batch probes it JVM-side, and only
    bloom-positive candidates enter the exact md5-digest semi-join. The
    oracle is the plain semi-join — identical output because Bloom
    filters never produce false negatives.
    """
    docs = load(spark, sf, "documents")
    digest = F.md5(F.col("text").cast("binary")).alias("digest")
    old = docs.filter(F.col("doc_id") % 10 < 7).select(digest)
    incoming = docs.filter(F.col("doc_id") % 10 >= 7).select(
        "doc_id", "source", digest
    )
    bloom = bloom_build(old, "digest")
    probed = bloom_probe(incoming, "digest", bloom)
    candidates = probed.filter(F.col("bloom_hit")).join(
        old.distinct(), "digest", "left_semi"
    )
    dup_flag = incoming.join(
        candidates.select("doc_id", F.lit(1).alias("is_dup")), "doc_id", "left"
    )
    return (
        dup_flag.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dup"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            ).cast("long").alias("n_new"),
        )
        .orderBy("source")
    )


BLOOM_INCREMENTAL_DEDUP_SQL = """
WITH old AS (SELECT md5(text) AS digest FROM documents WHERE doc_id % 10 < 7),
inc AS (
  SELECT doc_id, source, md5(text) AS digest
  FROM documents WHERE doc_id % 10 >= 7
),
flagged AS (
  SELECT doc_id, source,
         CASE WHEN digest IN (SELECT digest FROM old) THEN 1 ELSE 0 END AS is_dup
  FROM inc
)
SELECT source, COUNT(*) AS n_incoming,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_new
FROM flagged GROUP BY source ORDER BY source
"""


def source_overlap_minhash(spark, sf):
    """Dataset-overlap audit: exact shingle Jaccard vs the MinHash
    estimate for every pair of sources — the measurement you run before
    mixing corpora (near-identical sources = wasted epochs, and the
    estimate column shows exactly what signature-only comparison would
    have reported at scale, where the exact path is unaffordable).

    Per-source signatures reuse the minhash permutation scheme
    (dedupe_text.MH_A/MH_B over the md5-prefix base hash), so a source's
    signature is the slot-wise MIN over its distinct shingles — mergeable,
    16 ints of state per source no matter the corpus size. The exact
    intersection is the verification baseline: one self-join shuffled on
    shingle. est_jaccard = matching slots / 16, an integer ratio —
    deterministic in both engines.
    """
    from dataset_dedupe_estimator_spark.queries.dedupe_text import (
        MH_A,
        MH_B,
        MH_P,
        N_MINHASH,
        shingles_df,
    )

    docs = load(spark, sf, "documents").select("doc_id", "source")
    sh = (
        shingles_df(spark, sf)
        .join(docs, "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    base = (
        F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % MH_P
    )
    based = sh.select("source", base.alias("base"))
    sig = based.groupBy("source").agg(
        *[
            F.min((F.lit(MH_A[i]) * F.col("base") + F.lit(MH_B[i])) % MH_P).alias(
                f"m{i}"
            )
            for i in range(N_MINHASH)
        ]
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sizes.select(F.col("source").alias("src_a"), F.col("n_sh").alias("n_a"))
        .crossJoin(
            # broadcast: source cardinality is tiny by definition; without
            # the hint Spark plans an unpartitioned CartesianProduct
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("n_sh").alias("n_b"))
            )
        )
        .filter(F.col("src_a") < F.col("src_b"))
    )
    inter = (
        sh.select(F.col("source").alias("src_a"), "shingle")
        .join(sh.select(F.col("source").alias("src_b"), "shingle"), "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    siga = sig.select(
        F.col("source").alias("src_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    sigb = sig.select(
        F.col("source").alias("src_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    n_match = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("long") for i in range(N_MINHASH)
    )
    return (
        pairs.join(inter, ["src_a", "src_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .join(F.broadcast(siga), "src_a")
        .join(F.broadcast(sigb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("exact_jaccard"),
            (n_match.cast("double") / F.lit(float(N_MINHASH))).alias("est_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def _source_overlap_sql() -> str:
    from dataset_dedupe_estimator_spark.queries.dedupe_text import (
        MH_A,
        MH_B,
        MH_P,
        N_MINHASH,
        SHINGLES_CTE,
    )

    mh_cols = ", ".join(
        f"MIN(({MH_A[i]} * base + {MH_B[i]}) % {MH_P}) AS m{i}"
        for i in range(N_MINHASH)
    )
    n_match = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
WITH {SHINGLES_CTE},
src_sh AS (
  SELECT DISTINCT d.source, s.shingle
  FROM shingles s JOIN documents d USING (doc_id)
),
based AS (
  SELECT source,
         CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {MH_P} AS base
  FROM src_sh
),
sig AS (SELECT source, {mh_cols} FROM based GROUP BY source),
sizes AS (SELECT source, COUNT(*) AS n_sh FROM src_sh GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, a.n_sh AS n_a, b.n_sh AS n_b
  FROM sizes a CROSS JOIN sizes b WHERE a.source < b.source
),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
  FROM src_sh a JOIN src_sh b USING (shingle)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.src_a, p.src_b, p.n_a, p.n_b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(p.n_a + p.n_b - COALESCE(i.n_inter, 0) AS DOUBLE) AS exact_jaccard,
       CAST({n_match} AS DOUBLE) / {float(N_MINHASH)} AS est_jaccard
FROM pairs p
LEFT JOIN inter i ON p.src_a = i.src_a AND p.src_b = i.src_b
JOIN sig sa ON sa.source = p.src_a
JOIN sig sb ON sb.source = p.src_b
ORDER BY p.src_a, p.src_b
"""


def charlm_familiarity(spark, sf):
    """Per-document character-trigram LM familiarity — the
    perplexity-filter shape (CCNet/KenLM-style quality gating) at the
    character level, in exact integer bits.

    A document whose trigrams are corpus-common scores high; noise,
    wrong-language, or mojibake text scores low. Familiarity per trigram
    occurrence is ``floor(log2 count)`` (same integer-bits discipline as
    unigram_surprisal — no float log, no summation-order hazard), so
    every aggregate is hash-exact BIGINT arithmetic.

    100 TB shape: the text column is scanned and exploded ONCE — the
    (doc, trigram) occurrence counts aggregate in one shuffle, the
    global trigram count arrives as a WINDOW over the trigram key of
    that aggregate (a count-table broadcast back onto a second explode
    would scan and explode the corpus twice: AQE exchange reuse fails
    across the two consumers' prunings), and the per-doc rollup
    reduces doc-cardinality rows. Trigrams come from a JVM-side
    sequence/transform/explode — no Python in the path."""
    docs = load(spark, sf, "documents").filter(F.length("text") >= 3)
    tri = docs.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(1, length(text) - 2),"
            " i -> substring(text, i, 3)))"
        ).alias("tg"),
    )
    per = tri.groupBy("doc_id", "tg").agg(F.count(F.lit(1)).alias("k"))
    scored = per.withColumn("cnt", F.sum("k").over(Window.partitionBy("tg")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_trigrams"),
            F.sum(F.col("k") * _bits(F.col("cnt"))).alias("familiarity_bits"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "familiarity_bits",
            (
                F.col("familiarity_bits").cast("double")
                / F.col("n_trigrams").cast("double")
            ).alias("mean_bits"),
        )
        .orderBy("doc_id")
    )


CHARLM_FAMILIARITY_SQL = """
WITH tri AS (
  SELECT doc_id, substr(text, i, 3) AS tg
  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
),
counts AS (SELECT tg, CAST(COUNT(*) AS BIGINT) AS cnt FROM tri GROUP BY tg)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(length(bin(cnt)) - 1) AS BIGINT) AS familiarity_bits,
       CAST(SUM(length(bin(cnt)) - 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_bits
FROM tri JOIN counts USING (tg)
GROUP BY doc_id
ORDER BY doc_id
"""



def ngram_novelty(spark, sf):
    """Cross-corpus novelty per source: the fraction of a source's
    word-trigram shingles that occur in NO other document — high novelty
    means fresh text, low means the source mostly restates the corpus
    (complements repetition_stats, which is within-document, and
    contamination_check, which is vs an eval set).

    Exact arithmetic end-to-end: per-source totals are integer shingle
    counts and the novelty ratio is a single division of two BIGINTs, so
    the oracle comparison is float-stable.

    Scale shape: one shuffle keyed on the shingle for the occurrence
    count, one narrow shuffle on doc_id for the join back — the same
    two-exchange family as tf-idf; no broadcast grows with the corpus.
    """
    from dataset_dedupe_estimator_spark.queries.dedupe_text import shingles_df

    sh = shingles_df(spark, sf)
    occ = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs_with"))
    per_doc = (
        sh.join(occ, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("n_docs_with") == 1).cast("long")).alias("n_unique"),
        )
    )
    docs = load(spark, sf, "documents").select("doc_id", "source")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_shingles").alias("total_shingles"),
            F.sum("n_unique").alias("unique_shingles"),
            F.round(
                F.sum("n_unique").cast("double") / F.sum("n_shingles").cast("double"), 4
            ).alias("novelty"),
        )
        .orderBy("source")
    )


def _ngram_novelty_sql() -> str:
    from dataset_dedupe_estimator_spark.queries.dedupe_text import SHINGLES_CTE

    return f"""
WITH {SHINGLES_CTE},
occ AS (SELECT shingle, COUNT(*) AS n_docs_with FROM shingles GROUP BY shingle),
per_doc AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN o.n_docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
  FROM shingles s JOIN occ o USING (shingle)
  GROUP BY s.doc_id
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(p.n_shingles) AS BIGINT) AS total_shingles,
       CAST(SUM(p.n_unique) AS BIGINT) AS unique_shingles,
       ROUND(CAST(SUM(p.n_unique) AS DOUBLE) / CAST(SUM(p.n_shingles) AS DOUBLE), 4) AS novelty
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


EMAIL_RE = r"[a-z0-9.]+@[a-z0-9]+\.[a-z]+"
PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}"


def pii_scan(spark, sf):
    """PII detection + redaction audit per source: email/phone pattern
    hits, affected-document counts, and proof the redaction pass leaves
    zero residual matches.

    The synthetic corpus contains no PII, so the query deterministically
    injects it first (every 20th doc gets an email, every 30th a phone
    number — both derived from doc_id), exactly like the fuzzy-match
    query derives its dirty CRM feed: the operator under test is the
    scan/redact expression pipeline, which is pure whole-stage-codegen
    regex work — zero shuffles beyond the final per-source rollup, and
    the patterns behave identically under Java regex and RE2."""
    docs = load(spark, sf, "documents")
    injected = docs.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 20 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 30 == 0,
                F.concat(
                    F.lit(" call +01-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    emails = F.regexp_count(F.col("text2"), F.lit(EMAIL_RE))
    phones = F.regexp_count(F.col("text2"), F.lit(PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text2"), EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    residual = F.regexp_count(redacted, F.lit(EMAIL_RE)) + F.regexp_count(
        redacted, F.lit(PHONE_RE)
    )
    scanned = injected.select(
        "source",
        emails.alias("n_email"),
        phones.alias("n_phone"),
        residual.alias("n_residual"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_email") + F.col("n_phone") > 0).cast("long")).alias(
                "docs_with_pii"
            ),
            F.sum("n_email").alias("email_hits"),
            F.sum("n_phone").alias("phone_hits"),
            F.sum("n_residual").alias("residual_after_redaction"),
        )
        .orderBy("source")
    )


PII_SCAN_SQL = f"""
WITH injected AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 20 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 30 = 0
                 THEN ' call +01-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text2
  FROM documents
),
scanned AS (
  SELECT source,
         len(regexp_extract_all(text2, '{EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(text2, '{PHONE_RE}')) AS n_phone,
         len(regexp_extract_all(
             regexp_replace(
                 regexp_replace(text2, '{EMAIL_RE}', '[EMAIL]', 'g'),
                 '{PHONE_RE}', '[PHONE]', 'g'),
             '{EMAIL_RE}'))
         + len(regexp_extract_all(
             regexp_replace(
                 regexp_replace(text2, '{EMAIL_RE}', '[EMAIL]', 'g'),
                 '{PHONE_RE}', '[PHONE]', 'g'),
             '{PHONE_RE}')) AS n_residual
  FROM injected
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(n_email) AS BIGINT) AS email_hits,
       CAST(SUM(n_phone) AS BIGINT) AS phone_hits,
       CAST(SUM(n_residual) AS BIGINT) AS residual_after_redaction
FROM scanned GROUP BY source ORDER BY source
"""


# fasttext-style linear quality classifier: fixed public weights over
# engineered features (the shape of a trained quality filter's inference
# pass — training would fit these weights; inference is what runs at
# 100 TB, and it's expression-only)
QC_STOPWORDS = ("the", "a", "of", "and", "to", "in")
QC_BIAS = -1.5
QC_W_DISTINCT = 2.0  # lexical diversity rewards
QC_W_STOP = 1.2  # function-word rate ~ natural language
QC_W_TOKLEN = -0.08  # very long average tokens ~ code/garbage
QC_HI, QC_LO = 0.35, 0.0


def quality_classifier(spark, sf):
    """Linear quality-classifier inference over documents: three
    deterministic features (distinct-token ratio, stopword rate, mean
    token length), a fixed-weight logit, and a high/mid/low bucketing —
    reported as a per (source, bucket) census with the logit range.

    Float discipline: every feature is one IEEE division of two exact
    integers, and the logit is a fixed-order multiply-add chain — Spark
    and DuckDB produce bit-identical doubles (base.py discipline), so
    min/max (order-independent) are safe to compare; no averages.

    100 TB shape: pure per-row expressions (no UDF, no shuffle until
    the 3xn_sources groupBy) — classifier inference rides the scan."""
    docs = load(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    r_distinct = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_lit = F.array(*[F.lit(s) for s in QC_STOPWORDS])
    r_stop = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t))).cast("double")
        / n_tok
    )
    mean_len = F.length("text").cast("double") / n_tok
    logit = (
        F.lit(QC_BIAS)
        + F.lit(QC_W_DISTINCT) * r_distinct
        + F.lit(QC_W_STOP) * r_stop
        + F.lit(QC_W_TOKLEN) * mean_len
    )
    bucket = (
        F.when(logit >= QC_HI, F.lit("high"))
        .when(logit >= QC_LO, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    return (
        docs.select("source", logit.alias("logit"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("logit"), 6).alias("min_logit"),
            F.round(F.max("logit"), 6).alias("max_logit"),
        )
        .orderBy("source", "bucket")
    )


_QC_STOP_SQL = "', '".join(QC_STOPWORDS)
QUALITY_CLASSIFIER_SQL = f"""
WITH feats AS (
  SELECT source,
         {QC_BIAS}
         + {QC_W_DISTINCT} * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                              / CAST(len(string_split(text, ' ')) AS DOUBLE))
         + {QC_W_STOP} * (CAST(len(list_filter(string_split(text, ' '),
                                   t -> t IN ('{_QC_STOP_SQL}'))) AS DOUBLE)
                          / CAST(len(string_split(text, ' ')) AS DOUBLE))
         + {QC_W_TOKLEN} * (CAST(length(text) AS DOUBLE)
                            / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS logit
  FROM documents
)
SELECT source,
       CASE WHEN logit >= {QC_HI} THEN 'high'
            WHEN logit >= {QC_LO} THEN 'mid' ELSE 'low' END AS bucket,
       COUNT(*) AS n_docs,
       ROUND(MIN(logit), 6) AS min_logit,
       ROUND(MAX(logit), 6) AS max_logit
FROM feats
GROUP BY 1, 2 ORDER BY source, bucket
"""


DRIFT_BINS = 10


def source_drift_tvd(spark, sf):
    """Distribution-drift audit: how far each source's document-length
    distribution sits from the corpus-wide one, as total variation
    distance over {DRIFT_BINS} equal-width bins — the drift check a
    training pipeline runs when a new crawl snapshot lands.

    Numeric discipline: bin edges, bin counts and the TVD numerator
    Σ|c_sb·N − C_b·N_s| are ALL exact integers (the absolute difference
    of cross-multiplied counts); the single division by 2·N_s·N happens
    once per source at the end. No floating-point accumulation anywhere,
    so the oracle matches bit-for-bit.

    Scale shape: one scalar min/max row broadcast, one (source, bin)
    aggregate over per-row integer math, and a {DRIFT_BINS}-row-per-source
    join — nothing grows with corpus size except the first aggregate."""
    docs = load(spark, sf, "documents").select("source", "n_chars")
    bounds = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    width = (F.col("hi") - F.col("lo") + DRIFT_BINS) / DRIFT_BINS
    binned = docs.crossJoin(F.broadcast(bounds)).select(
        "source",
        F.floor((F.col("n_chars") - F.col("lo")) / width).cast("long").alias("bin"),
    )
    per_sb = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c_sb"))
    per_b = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c_b"))
    per_s = binned.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_df = binned.agg(F.count(F.lit(1)).alias("n_total"))
    dense = (
        per_s.crossJoin(F.broadcast(per_b))
        .join(per_sb, ["source", "bin"], "left")
        .withColumn("c_sb", F.coalesce(F.col("c_sb"), F.lit(0)))
        .crossJoin(F.broadcast(n_df))
    )
    num = F.abs(F.col("c_sb") * F.col("n_total") - F.col("c_b") * F.col("n_s"))
    return (
        dense.groupBy("source", "n_s", "n_total")
        .agg(F.sum(num).alias("tvd_num"))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            F.round(
                F.col("tvd_num").cast("double")
                / (F.lit(2.0) * F.col("n_s").cast("double") * F.col("n_total").cast("double")),
                6,
            ).alias("tvd"),
        )
        .orderBy("source")
    )


SOURCE_DRIFT_SQL = f"""
WITH bounds AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents),
binned AS (
  SELECT source,
         CAST(FLOOR((n_chars - lo) / ((hi - lo + {DRIFT_BINS}) / {DRIFT_BINS}.0)) AS BIGINT) AS bin
  FROM documents, bounds
),
per_sb AS (SELECT source, bin, COUNT(*) AS c_sb FROM binned GROUP BY 1, 2),
per_b AS (SELECT bin, COUNT(*) AS c_b FROM binned GROUP BY 1),
per_s AS (SELECT source, COUNT(*) AS n_s FROM binned GROUP BY 1),
n AS (SELECT COUNT(*) AS n_total FROM binned),
dense AS (
  SELECT s.source, s.n_s, b.bin, b.c_b, COALESCE(sb.c_sb, 0) AS c_sb, n.n_total
  FROM per_s s CROSS JOIN per_b b
  LEFT JOIN per_sb sb ON sb.source = s.source AND sb.bin = b.bin
  CROSS JOIN n
)
SELECT source, n_s AS n_docs,
       ROUND(CAST(SUM(ABS(c_sb * n_total - c_b * n_s)) AS DOUBLE)
             / (2.0 * CAST(n_s AS DOUBLE) * CAST(n_total AS DOUBLE)), 6) AS tvd
FROM dense
GROUP BY source, n_s, n_total
ORDER BY source
"""


def dataset_card_stats(spark, sf):
    """The per-source "dataset card" rollup — the one-table summary a
    data curator publishes and a mixture designer reads: volume (docs,
    tokens, chars), exact within-source duplicate mass, and average
    document size. Composes the registry's primitives into one report.

    Plan: one documents scan feeds a per-(source, md5) exact-dup census
    and a per-source volume aggregate; the dup census rolls up into the
    volume rows with a broadcast join (sources are a tiny dimension).
    All counts integer-exact; the two averages are single rounded
    divisions."""
    docs = load(spark, sf, "documents")
    t = F.split(F.col("text"), " ")
    vol = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(t).cast("long")).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )
    dup_groups = (
        docs.select("source", F.md5(F.col("text").cast("binary")).alias("h"))
        .groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dups = dup_groups.groupBy("source").agg(
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)).alias(
            "redundant_docs"
        )
    )
    return (
        vol.join(F.broadcast(dups), "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            F.round(F.col("total_tokens") / F.col("n_docs"), 2).alias(
                "avg_doc_tokens"
            ),
            "redundant_docs",
            F.round(F.col("redundant_docs") * 100.0 / F.col("n_docs"), 3).alias(
                "dup_pct"
            ),
        )
        .orderBy("source")
    )


DATASET_CARD_SQL = """
WITH vol AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
),
dup_groups AS (
  SELECT source, md5(text) AS h, COUNT(*) AS n
  FROM documents GROUP BY source, h
),
dups AS (
  SELECT source,
         CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
             AS redundant_docs
  FROM dup_groups GROUP BY source
)
SELECT vol.source AS source, n_docs, total_tokens, total_chars,
       ROUND(total_tokens * 1.0 / n_docs, 2) AS avg_doc_tokens,
       redundant_docs,
       ROUND(redundant_docs * 100.0 / n_docs, 3) AS dup_pct
FROM vol JOIN dups ON dups.source = vol.source
ORDER BY vol.source
"""


QUERIES = {
    "dataset_card_stats": Q(dataset_card_stats, DATASET_CARD_SQL),
    "quality_classifier": Q(quality_classifier, QUALITY_CLASSIFIER_SQL),
    "source_drift_tvd": Q(source_drift_tvd, SOURCE_DRIFT_SQL),
    "pii_scan": Q(pii_scan, PII_SCAN_SQL),
    "unigram_surprisal": Q(unigram_surprisal, UNIGRAM_SURPRISAL_SQL),
    "charlm_familiarity": Q(charlm_familiarity, CHARLM_FAMILIARITY_SQL),
    "tfidf_top_terms": Q(tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "bloom_incremental_dedup": Q(bloom_incremental_dedup, BLOOM_INCREMENTAL_DEDUP_SQL),
    "source_overlap_minhash": Q(source_overlap_minhash, _source_overlap_sql()),
    "ngram_novelty": Q(ngram_novelty, _ngram_novelty_sql()),
}
