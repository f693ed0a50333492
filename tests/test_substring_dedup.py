"""Exact-substring dedup (operators/substring_dedup.py) vs a pure-Python
reference: sliding k-gram duplicate marking, interval merge, span strip."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataset_dedupe_estimator_spark.operators.substring_dedup import (
    duplicate_spans,
    strip_duplicate_spans,
    substring_dedup_stats,
)


def ref_dedup(texts, k):
    """(stats, spans, cleaned) per doc id (dict id -> ...), first-occurrence
    rule = global min (id, pos) per gram string."""
    toks = {i: t.split(" ") for i, t in texts.items()}
    first = {}
    for i in sorted(toks):
        tt = toks[i]
        for p in range(len(tt) - k + 1):
            g = " ".join(tt[p : p + k])
            if g not in first:
                first[g] = (i, p)
    dups = {
        i: [
            p
            for p in range(len(toks[i]) - k + 1)
            if first[" ".join(toks[i][p : p + k])] != (i, p)
        ]
        for i in sorted(toks)
    }
    spans = {}
    for i, ps in dups.items():
        merged = []
        for p in ps:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + k)
            else:
                merged.append([p, p + k])
        spans[i] = [tuple(m) for m in merged]
    stats = {
        i: dict(
            n_tokens=len(toks[i]),
            n_grams=max(len(toks[i]) - k + 1, 0),
            n_dup_grams=len(dups[i]),
            n_spans=len(spans[i]),
            dup_tokens=sum(e - s for s, e in spans[i]),
        )
        for i in sorted(toks)
    }
    cleaned = {
        i: " ".join(
            tok
            for j, tok in enumerate(toks[i])
            if not any(s <= j < e for s, e in spans[i])
        )
        for i in sorted(toks)
    }
    return stats, spans, cleaned


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


CORPUS = {
    0: "a b c d e f g h i j",  # keeper of the a..j run
    1: "x x a b c d e f g h i j y y",  # same 10-gram run at offset 2
    2: "p q r s t u v w a b c d e f g h",  # prefix of the run (8 tokens)
    3: "m n o p q",  # shorter than k: no grams at all
    4: "z z z z z z z z z z z z",  # self-repetition within one doc
    5: "a b c d e f g h i j a b c d e f g h i j",  # doc-internal repeat of doc 0's run
}


@pytest.mark.parametrize("k", [3, 8])
def test_stats_match_reference(spark, k):
    stats, spans, _ = ref_dedup(CORPUS, k)
    got = {
        r["id"]: r.asDict()
        for r in substring_dedup_stats(_docs(spark, CORPUS), k).collect()
    }
    assert set(got) == set(stats)
    for i, exp in stats.items():
        for key, v in exp.items():
            assert got[i][key] == v, (i, key)
        assert got[i]["dup_ratio"] == round(exp["dup_tokens"] / exp["n_tokens"], 4)
    got_spans = {}
    for r in duplicate_spans(_docs(spark, CORPUS), k).collect():
        got_spans.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    for i in spans:
        assert sorted(got_spans.get(i, [])) == spans[i], i


def test_strip_matches_reference(spark):
    k = 4
    _, _, cleaned = ref_dedup(CORPUS, k)
    got = {r["id"]: r for r in strip_duplicate_spans(_docs(spark, CORPUS), k).collect()}
    for i, txt in cleaned.items():
        assert got[i]["text_clean"] == txt, i
        assert got[i]["kept_tokens"] == (len(txt.split(" ")) if txt else 0)
        assert got[i]["n_tokens"] == len(CORPUS[i].split(" "))


def test_first_occurrence_survives_whole(spark):
    """The global first occurrence of a duplicated passage is never
    stripped; later copies are."""
    k = 8
    got = {r["id"]: r["text_clean"] for r in
           strip_duplicate_spans(_docs(spark, CORPUS), k).collect()}
    assert got[0] == CORPUS[0]
    assert "a b c d e f g h i j" not in got[1]
    assert got[1].startswith("x x") and got[1].endswith("y y")


@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(0, 9),
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=30).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([2, 3, 5]),
)
@pytest.mark.slow
def test_property_vs_reference(spark, texts, k):
    stats, _, cleaned = ref_dedup(texts, k)
    df = _docs(spark, texts)
    got = {r["id"]: r.asDict() for r in substring_dedup_stats(df, k).collect()}
    for i, exp in stats.items():
        for key, v in exp.items():
            assert got[i][key] == v, (i, key, texts)
    got_clean = {r["id"]: r["text_clean"] for r in strip_duplicate_spans(df, k).collect()}
    assert got_clean == cleaned


def test_gram_hash_is_md5_of_window(spark):
    """Pin the hash so the DuckDB oracle and any external index agree."""
    from dataset_dedupe_estimator_spark.operators.substring_dedup import (
        gram_occurrences,
    )

    rows = gram_occurrences(_docs(spark, {7: "a b c d"}), 3).collect()
    assert {(r["pos"], r["h"]) for r in rows} == {
        (0, hashlib.md5(b"a b c").hexdigest()),
        (1, hashlib.md5(b"b c d").hexdigest()),
    }
