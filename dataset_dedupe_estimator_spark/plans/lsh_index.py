"""Persistent MinHash-LSH document index: continuous-ingestion near-dup.

The batch LSH queries (queries/dedupe_text.py) band a whole corpus in
one shot. A training-data pipeline that ingests continuously needs the
other shape: an index of every document ever admitted, so each incoming
batch is checked against ALL history without re-shingling it. This is
the document-level sibling of the CDC chunk index
(plans/chunk_index.py) — same log-structured layout, same
manifest-as-commit-point crash discipline:

* ``build_lsh_index`` — band a corpus, write generation 0 of the
  (doc_id, band_id, band_key) rows + a params manifest.
* ``admit_docs``      — band ONLY the new batch, equi-join its band
  rows against history to emit near-dup candidate pairs, append the
  new rows as a new generation. Write cost is O(batch), never
  O(index); history is NEVER re-shingled or re-hashed.
* ``index_stats``     — one-row summary.

Layout: ``<dir>/gen-<n>.parquet`` (doc_id, band_id, band_key) +
``<dir>/_lsh_meta.json``. The manifest pins the signature parameters
(shingle width, permutation count, band count, seed constants digest):
band keys are only comparable under identical parameters, so a
mismatched engine refuses instead of silently finding zero collisions.

Scale shape (100 TB): band rows are ~45 bytes x N_BANDS per document
(~4.5 GB per billion docs per band set) — a narrow table the admission
join reads with band-column pruning. The join shuffles the NEW batch's
band rows against the index on (band_id, band_key); AQE broadcasts the
batch side when it is small, which is the steady state for continuous
ingestion. Already-admitted doc_ids are skipped via a doc_id anti-join
(idempotent re-admission), and candidate pairs are normalized
(least, greatest) + distinct so new-vs-new collisions across several
bands emit once. Generation sprawl is reclaimed by
``compact_lsh_index`` (same commit protocol as the chunk index's
compaction).

Determinism contract: signatures are pure functions of (doc_id, text)
— seeded affine permutations over a cross-engine md5 base hash — so
incremental admission is *provably* equivalent to the single-shot
banding query; the ``lsh_index_incremental`` registry entry checks
exactly that against a DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.plans._index_lock import writer_lock
from dataset_dedupe_estimator_spark.plans._tombstones import (
    append_tombstone_set,
    clear_tombstones,
    minus_tombstones,
    normalize_ids,
    tombstones_df,
)
from dataset_dedupe_estimator_spark.queries.dedupe_text import (
    MH_A,
    MH_B,
    MH_P,
    N_BANDS,
    N_MINHASH,
    SHINGLE_W,
    band_rows_of,
    minhash_sig_of,
)

_META = "_lsh_meta.json"
_BAND_COLS = ("doc_id", "band_id", "band_key")


def _signature_params() -> dict:
    """The parameter fingerprint band keys depend on. The permutation
    constants are digested rather than inlined — equality is what
    matters, and the digest keeps the manifest readable."""
    consts = hashlib.md5(
        json.dumps([MH_P, MH_A, MH_B]).encode()
    ).hexdigest()
    return {
        "shingle_w": SHINGLE_W,
        "n_minhash": N_MINHASH,
        "n_bands": N_BANDS,
        "permutation_digest": consts,
    }


def _gen_no(p: Path) -> int:
    """Generation number from a dir name — parse the full digit run, not
    a fixed 5-char slice: a streaming index creates one generation per
    microbatch and crosses 99999 within weeks."""
    return int(p.name.removeprefix("gen-").removesuffix(".parquet"))


def _gen_files(index_dir: str | Path, floor: int = 0) -> list[str]:
    """Generation dirs at or above ``floor`` (gens below a committed
    compaction are superseded — their rows live in the compacted
    generation — and are ignored even if a crash left them on disk),
    in numeric generation order."""
    gens = sorted(Path(index_dir).glob("gen-*.parquet"), key=_gen_no)
    return [str(p) for p in gens if _gen_no(p) >= floor]


def _load_meta(index_dir: str | Path) -> dict:
    with open(Path(index_dir) / _META) as f:
        return json.load(f)


def _write_meta(index_dir: Path, meta: dict) -> None:
    """Atomic replace: a crash mid-write never corrupts the manifest."""
    tmp = index_dir / (_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, index_dir / _META)


def _read_index(spark: SparkSession, index_dir: str | Path) -> DataFrame:
    # no manifest => not an index; raising beats resurrecting superseded
    # pre-compaction generations with a silent floor=0 fallback
    floor = _load_meta(index_dir).get("compacted_below", 0)
    files = _gen_files(index_dir, floor)
    if not files:
        raise FileNotFoundError(f"no index generations under {index_dir}")
    return spark.read.parquet(*files)


def _check_meta(index_dir: str | Path) -> dict:
    meta = _load_meta(index_dir)
    mine = _signature_params()
    if meta["signature"] != mine:
        raise ValueError(
            f"LSH index at {index_dir} was built with signature params "
            f"{meta['signature']}; this engine computes {mine} — band "
            "keys are incomparable, rebuild the index"
        )
    return meta


def build_lsh_index(
    spark: SparkSession, docs: DataFrame, index_dir: str | Path
) -> dict:
    """Create generation 0 from a (doc_id, text) corpus. Fails if the
    dir already holds an index (use admit_docs to grow one).

    Single-writer: all index mutations (build/admit/compact) take the
    index dir's exclusive writer lock — see plans/_index_lock.py."""
    index_dir = Path(index_dir)
    if (index_dir / _META).exists():
        raise FileExistsError(f"{index_dir} already holds an LSH index")
    index_dir.mkdir(parents=True, exist_ok=True)
    with writer_lock(index_dir):
        if (index_dir / _META).exists():  # re-check under the lock
            raise FileExistsError(f"{index_dir} already holds an LSH index")
        out = index_dir / "gen-00000.parquet"
        if out.exists():
            # no manifest but gen-00000 present: a prior build crashed
            # between the parquet write and the manifest commit — the
            # orphan was never part of any index; remove and redo
            # (retry-safe, mirroring admit_docs' orphan protocol)
            shutil.rmtree(out)
        bands = band_rows_of(minhash_sig_of(docs.select("doc_id", "text")))
        bands.select(*_BAND_COLS).write.mode("errorifexists").parquet(str(out))
        n_docs = (
            spark.read.parquet(str(out)).agg(F.countDistinct("doc_id")).collect()[0][0]
        )
        meta = {
            "signature": _signature_params(),
            "generations": 1,
            "admissions": [{"gen": 0, "docs": n_docs, "candidate_pairs": None}],
        }
        _write_meta(index_dir, meta)
    return {"generation": 0, "docs": n_docs}


def admit_docs(
    spark: SparkSession, docs: DataFrame, index_dir: str | Path
) -> tuple[DataFrame, dict]:
    """Admit a (doc_id, text) batch: return (candidate_pairs, report)
    and append the batch's band rows as a new generation.

    ``candidate_pairs`` is (doc_a, doc_b) with doc_a < doc_b — every
    band collision between the batch and history, plus collisions
    within the batch itself; distinct, so the union over all admissions
    equals the single-shot banding of the full corpus. doc_ids already
    in the index are skipped (idempotent re-admission).

    Single-writer: holds the index writer lock (plans/_index_lock.py)
    for the whole read-manifest → write-generation → commit cycle; a
    concurrent writer raises ConcurrentWriterError instead of clobbering
    the in-flight generation.
    """
    index_dir = Path(index_dir)
    with writer_lock(index_dir):
        return _admit_docs_locked(spark, docs, index_dir)


def _admit_docs_locked(
    spark: SparkSession, docs: DataFrame, index_dir: Path
) -> tuple[DataFrame, dict]:
    meta = _check_meta(index_dir)
    gen = meta["generations"]
    out = index_dir / f"gen-{gen:05d}.parquet"
    if out.exists():
        # orphan from a crash after the generation write but before the
        # manifest commit — it was never part of the index; remove it
        # BEFORE reading generations so retries are idempotent
        shutil.rmtree(out)
    ts = tombstones_df(spark, index_dir, meta, "doc_id")
    # deleted docs collide with nothing (their band rows are suppressed)
    known = minus_tombstones(_read_index(spark, index_dir), ts, "doc_id")
    known_ids = known.select("doc_id").distinct()
    if ts is not None:  # ...but their ids stay denylisted for admission
        known_ids = known_ids.unionByName(ts)
    fresh = docs.select("doc_id", "text").join(known_ids, "doc_id", "left_anti")
    # persist: the band rows feed three actions (candidate join, the
    # generation write, the report count); without it each would
    # re-shingle and re-hash the batch
    new_bands = band_rows_of(minhash_sig_of(fresh)).persist()
    all_bands = known.unionByName(new_bands)
    cands = (
        new_bands.alias("a")
        .join(all_bands.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    new_bands.select(*_BAND_COLS).write.mode("errorifexists").parquet(str(out))
    # report accounting from the persisted band cache the write just
    # materialized — same rows as the generation on disk (the
    # errorifexists write either landed exactly new_bands or raised),
    # without re-reading what was just written. Not an observed metric:
    # countDistinct is a distinct aggregate, which observe() rejects
    # (plans/_observed.py docstring).
    n_docs = new_bands.agg(F.countDistinct("doc_id")).collect()[0][0]
    # materialize the (narrow) pair set before dropping the band cache:
    # callers consume cands AFTER this returns, and without the
    # checkpoint that evaluation would re-shingle and re-join the batch
    cands = cands.localCheckpoint(eager=True)
    n_pairs = cands.count()
    meta["generations"] = gen + 1
    meta["admissions"].append(
        {"gen": gen, "docs": n_docs, "candidate_pairs": n_pairs}
    )
    _write_meta(index_dir, meta)
    new_bands.unpersist()
    return cands, {"generation": gen, "docs": n_docs, "candidate_pairs": n_pairs}


def query_docs(
    spark: SparkSession, docs: DataFrame, index_dir: str | Path
) -> DataFrame:
    """Read-only near-dup lookup: (probe_doc_id, index_doc_id) for every
    band collision between the probe set and the index. Nothing is
    admitted — the pre-ingest "have we seen this?" check and the
    index-backed contamination audit. Same join shape as admission;
    probes whose doc_id already exists in the index still match their
    OTHER near-dups (self-matches are excluded by doc_id)."""
    meta = _check_meta(index_dir)
    known = minus_tombstones(
        _read_index(spark, index_dir),
        tombstones_df(spark, index_dir, meta, "doc_id"),
        "doc_id",
    )
    probe_bands = band_rows_of(minhash_sig_of(docs.select("doc_id", "text")))
    return (
        probe_bands.alias("p")
        .join(known.alias("i"), ["band_id", "band_key"])
        .filter(F.col("p.doc_id") != F.col("i.doc_id"))
        .select(
            F.col("p.doc_id").alias("probe_doc_id"),
            F.col("i.doc_id").alias("index_doc_id"),
        )
        .distinct()
    )


def delete_docs(spark: SparkSession, index_dir: str | Path, ids) -> dict:
    """Delete documents (takedown): append a tombstone set — their band
    rows stop matching queries and admissions immediately; compaction
    physically purges them. Tombstoned ids are denylisted from
    re-admission until a compaction clears the sets (shared semantics:
    plans/_tombstones.py). ``ids`` is an iterable or one-column frame.
    O(tombstones), never O(index) — no generation is rewritten here."""
    index_dir = Path(index_dir)
    with writer_lock(index_dir):
        meta = _check_meta(index_dir)
        ids_df = normalize_ids(spark, ids, "doc_id")
        fresh = append_tombstone_set(spark, index_dir, meta, ids_df, "doc_id")
        if fresh is None:
            return {"denylisted": 0}
        n_new = fresh.count()
        meta.setdefault("deletions", []).append(
            {"set": meta["tombstone_sets"] - 1, "denylisted": n_new}
        )
        _write_meta(index_dir, meta)  # commit point
    return {"denylisted": n_new}


def compact_lsh_index(
    spark: SparkSession, index_dir: str | Path, files_out: int | None = None
) -> dict:
    """Merge every live generation into one (same commit protocol as
    plans/chunk_index.compact_index): the merged generation is written
    under the NEXT gen number, the manifest commit atomically records
    both it and ``compacted_below``, and only then are superseded
    directories deleted. A crash before the commit leaves an orphan the
    next admission/compaction removes; a crash after it leaves
    already-superseded directories every reader skips.

    Single-writer: holds the index writer lock (plans/_index_lock.py)."""
    index_dir = Path(index_dir)
    with writer_lock(index_dir):
        return _compact_lsh_index_locked(spark, index_dir, files_out)


def _compact_lsh_index_locked(
    spark: SparkSession, index_dir: Path, files_out: int | None
) -> dict:
    meta = _check_meta(index_dir)
    floor = meta.get("compacted_below", 0)
    gen = meta["generations"]
    out = index_dir / f"gen-{gen:05d}.parquet"
    if out.exists():
        shutil.rmtree(out)  # orphan from a crashed attempt (pre-commit)
    # live = committed generations only: at or above the compaction
    # floor, strictly below the manifest's generation counter (anything
    # at/above the counter is an uncommitted orphan)
    live = [p for p in _gen_files(index_dir, floor) if _gen_no(Path(p)) < gen]
    if files_out is None:
        # ~45-byte band rows: size output files to ~128 MB
        bytes_live = sum(
            f.stat().st_size for d in live for f in Path(d).glob("*.parquet")
        )
        files_out = max(1, -(-bytes_live // (128 << 20)))
    merged = minus_tombstones(  # physically purge deleted docs
        spark.read.parquet(*live),
        tombstones_df(spark, index_dir, meta, "doc_id"),
        "doc_id",
    )
    merged.coalesce(int(files_out)).write.parquet(str(out))
    n_rows = spark.read.parquet(str(out)).count()
    meta["generations"] = gen + 1
    meta["compacted_below"] = gen
    meta["tombstone_sets"] = 0  # purge is durable with this commit
    meta["tombstone_floor"] = 0
    meta.setdefault("compactions", []).append(
        {"gen": gen, "merged_generations": len(live), "band_rows": n_rows}
    )
    _write_meta(index_dir, meta)  # commit point
    for p in Path(index_dir).glob("gen-*.parquet"):
        if _gen_no(p) < gen:
            shutil.rmtree(p)
    clear_tombstones(index_dir)
    return {"generation": gen, "merged_generations": len(live), "band_rows": n_rows}


def index_stats(spark: SparkSession, index_dir: str | Path) -> dict:
    meta = _check_meta(index_dir)
    idx = minus_tombstones(  # live view: tombstoned docs don't count
        _read_index(spark, index_dir),
        tombstones_df(spark, index_dir, meta, "doc_id"),
        "doc_id",
    )
    n_docs, n_rows = idx.agg(
        F.countDistinct("doc_id"), F.count(F.lit(1))
    ).collect()[0]
    return {
        "generations": meta["generations"],
        "docs": n_docs,
        "band_rows": n_rows,
        "tombstone_sets": meta.get("tombstone_sets", 0),
    }
