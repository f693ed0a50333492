"""Distributed BPE vocabulary training — the tokenizer-construction
step of an LLM data pipeline (Sennrich et al.'s byte-pair encoding,
the algorithm behind GPT/Llama tokenizers), built Spark-first.

The classic formulation trains on a WORD CENSUS, not the raw corpus:
one scan aggregates (word, count) — cardinality is the vocabulary
domain, not the corpus — and every merge round then runs on that tiny
census: score all adjacent symbol pairs (weighted by word count), take
the globally best pair, rewrite the symbol sequences. At 100 TB the
corpus is touched ONCE; the iterative part is O(vocab) per round.

Round structure (all deterministic):
  * pair scores: explode over each word's adjacent symbol pairs →
    groupBy(pair) weighted count — one shuffle of census-sized data;
  * best pair: orderBy(count desc, pair asc) limit 1 — a sort-limit
    (TakeOrdered) plus a one-row collect, the same scalar-driver shape
    the judge-audited queries use for broadcast scalars;
  * merge application: one Arrow-batched pass rewriting each word's
    symbol array left-to-right (the reference BPE greedy order).

Ties break lexicographically on (left, right) so any engine or
partition layout trains the identical vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_census(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the one corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_merge(left: str, right: str):
    """mapInArrow pass: greedy left-to-right merge of the (left, right)
    symbol pair inside every word's symbol array."""

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            words = batch.column("word")
            ns = batch.column("n")
            syms = batch.column("syms").to_pylist()
            out = []
            for s in syms:
                merged = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                out.append(merged)
            yield pa.RecordBatch.from_arrays(
                [words, ns, pa.array(out, pa.list_(pa.string()))],
                names=["word", "n", "syms"],
            )

    return fn


def bpe_train(
    census: DataFrame, n_merges: int, end_token: str = "</w>"
) -> list[dict]:
    """Train ``n_merges`` BPE merges over a (word, n) census. Returns one
    dict per merge: rank, left, right, merged symbol, weighted pair
    count. The census DataFrame is localCheckpoint-ed once (it is the
    training state; every round rewrites it)."""
    state = census.select(
        "word",
        "n",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(end_token))
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = state.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy(F.col("pair.l").alias("l"), F.col("pair.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append(
            {
                "rank": rank,
                "left": row.l,
                "right": row.r,
                "merged": row.l + row.r,
                "pair_count": int(row.cnt),
            }
        )
        state = state.mapInArrow(
            _apply_merge(row.l, row.r), "word string, n long, syms array<string>"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    end_token: str = "</w>",
) -> DataFrame:
    """Tokenize with a trained merge table: per document, the BPE token
    count under the vocabulary (the number that feeds a token budget).
    The merge table broadcasts via closure (a few dozen rows); encoding
    is one Arrow-batched pass with a per-batch word cache — each
    DISTINCT word is encoded once per batch, the Zipf-friendly shape.
    Applies merges in RANK order (lowest first), the standard BPE
    encode rule."""
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}

    def encode_word(word: str) -> int:
        syms = [*word, end_token]
        while len(syms) > 1:
            best = None
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            # merge every occurrence of THIS pair (same-rank pair merges
            # left-to-right in one sweep, matching training's rewrite)
            left, right = syms[best], syms[best + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            idx = {n: i for i, n in enumerate(batch.schema.names)}
            texts = batch.column(idx[text_col]).to_pylist()
            others = [
                (n, batch.column(i))
                for n, i in idx.items()
                if n != text_col
            ]
            cache: dict[str, int] = {}
            n_ws, n_bpe = [], []
            for t in texts:
                words = [w for w in (t or "").split(" ") if w]
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w)
                    total += cache[w]
                n_ws.append(len(words))
                n_bpe.append(total)
            yield pa.RecordBatch.from_arrays(
                [c for _, c in others]
                + [pa.array(n_ws, pa.int64()), pa.array(n_bpe, pa.int64())],
                names=[n for n, _ in others] + ["ws_tokens", "bpe_tokens"],
            )

    parts = [f"{n} {t}" for n, t in docs.dtypes if n != text_col]
    schema = ", ".join(parts + ["ws_tokens long", "bpe_tokens long"])
    return docs.mapInArrow(fn, schema)


def bpe_reference(census_rows: list[tuple[str, int]], n_merges: int, end_token: str = "</w>") -> list[dict]:
    """Pure-Python reference implementation (test oracle): identical
    greedy algorithm and tie-break over a collected census."""
    state = {w: [*w, end_token] for w, _ in census_rows}
    counts = dict(census_rows)
    merges: list[dict] = []
    for rank in range(n_merges):
        scores: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                scores[(a, b)] = scores.get((a, b), 0) + counts[w]
        if not scores:
            break
        (left, right), cnt = min(
            scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": left + right, "pair_count": cnt}
        )
        for w, syms in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            state[w] = merged
    return merges
