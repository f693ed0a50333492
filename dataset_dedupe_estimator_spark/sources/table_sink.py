"""Versioned table as a Structured Streaming SINK — the write half of
the streaming loop whose read half is ``sources/table_stream.py``.

Two surfaces, one exactly-once mechanism:

* ``df.writeStream.format("versioned_table").option("path", root)`` —
  the Spark 4 Python DataSource stream writer
  (:class:`VersionedTableStreamWriter`). Executors stage each
  partition's rows as parquet under ``<root>/_sink_stage/``; the
  driver-side ``commit(messages, batchId)`` publishes ONE versioned
  commit per microbatch through :func:`versioned.append` stamped with
  ``txn=(queryId, batchId)``.
* :func:`exactly_once_appender` — a documented ``foreachBatch`` helper
  for pipelines that want the full ``append`` option surface (zone
  maps, blooms, partitioning, CDF) per batch.

Exactly-once is the TABLE's property, not the query's: ``append``
records the (app, batch) stamp in the commit-log entry and refuses —
inside the writer-lock critical section — any batch id at or below the
app's committed watermark (``versioned._latest_txns``; the Delta
txnAppId/txnVersion ``SetTransaction`` shape, carried through
checkpoint folds). A microbatch REPLAYED after a crash — Spark's
at-least-once contract for sinks — therefore commits nothing, and a
kill-and-restart leaves the table exactly once. The app id defaults to
the streaming query's stable ``queryId`` (read from the checkpoint's
``metadata`` file, which Spark writes at query start and preserves
across restarts), overridable with ``option("appId", ...)`` when
several queries feed one table.

Reference parity note: the reference engine (de/ CLI) has no streaming
ingest; this is part of the Spark-first extension surface (SURVEY.md
§2 LLM-pipeline operators), mirroring Delta Lake's public
``txnAppId``/``txnVersion`` idempotent-write contract.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

_STAGE_DIR = "_sink_stage"


def _query_id_from_checkpoint(checkpoint: str | os.PathLike) -> str:
    """The streaming query's STABLE id (constant across restarts —
    exactly what exactly-once must key on, unlike runId) from the
    checkpoint's ``metadata`` file, written at query start."""
    meta = Path(checkpoint) / "metadata"
    return json.loads(meta.read_text())["id"]


def exactly_once_appender(
    root: str | os.PathLike,
    app_id: str | None = None,
    checkpoint: str | os.PathLike | None = None,
    auto_compact_every: int | None = None,
    **append_kwargs,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` body that appends each microbatch to the
    versioned table at ``root`` EXACTLY ONCE::

        q = (stream.writeStream
             .foreachBatch(exactly_once_appender(root, checkpoint=ck))
             .option("checkpointLocation", ck)
             .start())

    Pass ``app_id`` (any stable per-pipeline string) or ``checkpoint``
    (the query's checkpointLocation — the helper resolves the stable
    queryId from its ``metadata`` file at first use). Extra kwargs
    (``partition_by``, ``stats_columns``, ``bloom_columns``,
    ``change_feed``, …) flow to :func:`versioned.append` on every
    batch. Batches Spark replays after a crash are skipped by the
    table's (app, batch) watermark — see module docstring.

    ``auto_compact_every=N`` runs ``versioned.compact_small`` after
    every Nth COMMITTED batch (the Delta auto-optimize shape): a
    streaming ingest writes one commit per microbatch, so without
    maintenance a long-running query degrades every reader into a
    small-file scan. Compaction is dataChange=false — it never
    disturbs row content, time travel below it, or the (app, batch)
    exactly-once watermark (the checkpoint fold carries watermarks
    even when the stamped commits' files are folded away). Skipped
    replays don't count toward the cadence."""
    if app_id is None and checkpoint is None:
        raise ValueError(
            "exactly_once_appender needs app_id or checkpoint — without "
            "a stable app identity, a replayed batch cannot be detected"
        )
    if auto_compact_every is not None and auto_compact_every < 1:
        raise ValueError("auto_compact_every must be >= 1")
    resolved: list[str] = [app_id] if app_id is not None else []
    committed = [0]

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        from dataset_dedupe_estimator_spark.sources import versioned as vt

        if not resolved:
            # lazy: the metadata file exists once the query is running
            resolved.append(_query_id_from_checkpoint(checkpoint))
        entry = vt.append(root, batch_df, txn=(resolved[0], int(batch_id)),
                          **append_kwargs)
        if entry is None or auto_compact_every is None:
            return  # replayed batch: no new files, no cadence tick
        committed[0] += 1
        if committed[0] % auto_compact_every == 0:
            vt.compact_small(batch_df.sparkSession, root)

    return _ingest


def apply_changes(
    root: str | os.PathLike,
    key_cols: list[str],
    app_id: str | None = None,
    checkpoint: str | os.PathLike | None = None,
    **upsert_kwargs,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` body that APPLIES a change-feed stream to a
    destination table (the Delta Live Tables APPLY CHANGES INTO shape):
    row-level replication of deletes and updates, not just appends::

        q = (spark.readStream.format("versioned_table")
             .option("readChangeFeed", "true").load(src)
             .writeStream
             .foreachBatch(apply_changes(dst, ["id"], checkpoint=ck))
             .option("checkpointLocation", ck).start())

    Per batch the NET effect per key is computed first (the newest
    ``_commit_version`` wins; within one version an update's
    delete+insert pair nets to the insert), then applied in two
    zone-map-bounded commits: a MERGE of the net upserts
    (``versioned.upsert_pruned``) and a key-set DELETE of the
    net-deleted keys (``versioned.delete_where_keys`` — the key frame
    stays distributed end to end: file pruning is a broadcast range
    join against log metadata, the rewrite a LEFT ANTI join, so a
    delete-heavy change feed has no driver bottleneck and no key-count
    ceiling). Exactly-once across a crash between the two phases comes
    from ONE monotonic (app, batch) watermark: the merge is stamped
    ``2*batch_id``, the delete ``2*batch_id + 1`` — a replay skips
    exactly the phases that already committed (skip-at-or-below), and
    re-runs exactly the ones that didn't.

    ``key_cols`` must be one column for the delete phase (a pruned
    key-set delete is single-column). Extra kwargs flow to
    ``upsert_pruned``."""
    if len(key_cols) != 1:
        raise ValueError(
            "apply_changes needs exactly one key column (the pruned "
            "key-set delete phase is single-column)"
        )
    if app_id is None and checkpoint is None:
        raise ValueError(
            "apply_changes needs app_id or checkpoint — without a "
            "stable app identity, a replayed batch cannot be detected"
        )
    resolved: list[str] = [app_id] if app_id is not None else []
    key = key_cols[0]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from dataset_dedupe_estimator_spark.sources import versioned as vt

        if not resolved:
            resolved.append(_query_id_from_checkpoint(checkpoint))
        app = resolved[0]
        spark = batch_df.sparkSession
        # net effect per key: newest commit version wins; an update's
        # same-version delete+insert pair resolves to the insert
        w = Window.partitionBy(key).orderBy(
            F.col("_commit_version").desc(),
            (F.col("_change") == "insert").cast("int").desc(),
        )
        # duplicate-key guard (the upstream APPLY CHANGES contract):
        # netting keeps ONE row per key, so a source that legitimately
        # holds several insert rows for the same key at its newest
        # version (the table layer's appends are multisets) would
        # silently replicate as one row — refuse instead of diverging.
        # Same partitionBy as the ranking window: one shuffle serves
        # both (Catalyst reuses the exchange).
        wk = Window.partitionBy(key)
        final = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "_dup_inserts",
                F.sum(
                    (
                        (F.col("_change") == "insert")
                        & (
                            F.col("_commit_version")
                            == F.max("_commit_version").over(wk)
                        )
                    ).cast("int")
                ).over(wk),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)  # two consumers, one reduction
        )
        dup = final.filter(F.col("_dup_inserts") > 1).select(key).limit(1).collect()
        if dup:
            raise ValueError(
                f"batch {batch_id} holds multiple insert rows for key "
                f"{key}={dup[0][0]!r} at its newest _commit_version — "
                "apply_changes requires key-unique sources (the APPLY "
                "CHANGES contract); net-effect replication of a "
                "duplicate-key multiset would silently drop rows"
            )
        final = final.drop("_dup_inserts")
        upserts = final.filter(F.col("_change") == "insert").drop(
            "_change", "_commit_version"
        )
        vt.upsert_pruned(
            spark, root, upserts, key_cols,
            txn=(app, 2 * int(batch_id)), **upsert_kwargs,
        )
        del_keys = final.filter(F.col("_change") == "delete").select(key)
        vt.delete_where_keys(
            spark, root, key, del_keys,
            txn=(app, 2 * int(batch_id) + 1),
        )

    return _apply


@dataclass
class _StagedFiles(WriterCommitMessage):
    paths: list[str]


def publish_staged_files(
    root: str | os.PathLike,
    files: list[str],
    txn: tuple[str, int],
    stats_columns: list[str] | None = None,
    change_feed: bool = False,
    allow_new_columns: bool = False,
) -> dict | None:
    """Publish already-written parquet files as ONE exactly-once append
    commit — pyarrow only, NO SparkSession (the Python DataSource
    stream writer's ``commit`` hook runs in a worker process with no
    JVM gateway, so the Spark-DataFrame ``append`` path is unreachable
    there). Schema/type guards, zone-map stats, txn watermark and the
    writer-lock critical section are the same ones batch ``append``
    uses; table features whose enforcement NEEDS Spark (CHECK/NOT NULL
    constraints, bloom inheritance, column mapping, hive partitioning,
    dropped-column rebinding) REFUSE loudly and point at
    :func:`exactly_once_appender`, which runs inside the driver and
    keeps the full surface."""
    from pyspark.sql.pandas.types import from_arrow_schema

    from dataset_dedupe_estimator_spark.sources import versioned as vt

    root = Path(root)
    (root / vt._VLOG).mkdir(parents=True, exist_ok=True)
    entries = vt._snapshot_entries(root)
    app, batch = str(txn[0]), int(txn[1])
    if batch <= vt._latest_txns(entries).get(app, -1):
        return None  # replayed batch: the table already has it
    import pyarrow.parquet as pq

    # feature refusals first — they depend on the LOG only, so a refused
    # table is detected before any staged file is even opened
    _HELPER = "use the foreachBatch helper table_sink.exactly_once_appender"
    if vt._column_mapping(entries):
        raise ValueError(f"table has renamed columns — {_HELPER}")
    if vt._active_constraints(entries):
        raise ValueError(
            f"table has CHECK/NOT NULL constraints (enforcement needs a "
            f"Spark plan, unavailable in the sink commit hook) — {_HELPER}"
        )
    if entries:
        if entries[-1].get("partition_by"):
            raise ValueError(f"table is hive-partitioned — {_HELPER}")
        if entries[-1].get("bloom_columns"):
            raise ValueError(f"table inherits bloom filters — {_HELPER}")

    st = from_arrow_schema(pq.read_schema(files[0]), prefer_timestamp_ntz=True)
    cols = [f.name for f in st.fields]
    types = {f.name: f.dataType.simpleString() for f in st.fields}
    retired = vt._dropped_columns(entries) & set(cols)
    if retired:
        raise ValueError(
            f"columns {sorted(retired)} were dropped from this table "
            f"(physical names are retired forever) — {_HELPER}"
        )
    widened: set = set()
    if entries:
        last = entries[-1]
        prior_cols = set(last["columns"])
        widened = set(cols) - prior_cols
        if (set(cols) != prior_cols and not allow_new_columns) or not (
            set(cols) >= prior_cols
        ):
            raise ValueError(
                f"schema mismatch: table has {sorted(last['columns'])}, "
                f"stream writes {sorted(cols)}"
                + (
                    ""
                    if set(cols) >= prior_cols
                    else " (columns may be added with "
                    "option('allowNewColumns','true'); dropping one is "
                    "its own commit: drop_column)"
                )
            )
        prior_t = vt._prior_types(entries)
        mismatch = {
            c: (prior_t[c], types[c])
            for c in types
            if prior_t and c in prior_t and types[c] != prior_t[c]
        }
        if mismatch:
            raise ValueError(
                f"column type mismatch vs the table's recorded types "
                f"{mismatch} — cast the stream before the sink"
            )
        if stats_columns is None:
            stats_columns = last.get("stats_columns") or []
    stats_columns = list(stats_columns or [])
    for c in stats_columns:
        if types.get(c) not in vt._STATS_DTYPES:
            raise ValueError(
                f"stats column {c!r} has type {types.get(c)} — zone maps "
                f"support {sorted(vt._STATS_DTYPES)} only"
            )

    stage = vt._stage_dir(root)
    stage.mkdir(parents=True)
    for i, f in enumerate(files):
        os.rename(f, stage / f"part-{i:05d}.parquet")
    entry: dict = {
        "action": "append",
        "columns": cols,
        "partition_by": [],
        "types": types,
        "txn": {"app": app, "batch": batch},
    }
    if widened:
        entry["added_columns"] = sorted(widened)
    stats = None
    if stats_columns:
        entry["stats_columns"] = stats_columns
        entry["stats_types"] = {c: types[c] for c in stats_columns}
        stats = vt._collect_file_stats(stage, stats_columns)
    if change_feed or (entries and vt._cf_active(entries)):
        entry["change_feed"] = True
    prep = {"stage": stage, "entry": entry, "stats": stats, "blooms": None}
    try:
        with vt.writer_lock(root, wait_seconds=vt._LOCK_WAIT):
            return vt._publish_staged(root, entries, prep)
    finally:
        import shutil

        shutil.rmtree(prep["stage"], ignore_errors=True)


class VersionedTableStreamWriter(DataSourceStreamArrowWriter):
    """``DataSourceStreamArrowWriter`` publishing one versioned commit
    per microbatch. Executors receive Arrow RecordBatches and stage
    them straight to parquet — NO per-row Python objects anywhere on
    the data path (the 100 TB-relevant property: ingest cost is Arrow
    columnar end to end). The driver's ``commit`` hook (a gateway-less
    Python worker) publishes the staged files through the pyarrow-only
    log path (:func:`publish_staged_files`) — same schema/type guards,
    zone maps and txn watermark as a batch append. Replay safety lives
    in the table log, not in this class: ``abort`` merely clears
    staging."""

    def __init__(self, schema, options):
        self.schema = schema
        self.root = str(options.get("path") or options.get("root") or "")
        if not self.root:
            raise ValueError("versioned_table sink requires option 'path'")
        self.app_id = options.get("appid")
        self.checkpoint = options.get("checkpointlocation")
        if self.app_id is None and self.checkpoint is None:
            raise ValueError(
                "versioned_table sink needs option('appId', ...) or a "
                "checkpointLocation to key exactly-once commits"
            )
        self.stats_columns = _csv(options.get("statscolumns"))
        self.change_feed = str(
            options.get("changefeed", "false")
        ).lower() == "true"
        self.allow_new_columns = str(
            options.get("allownewcolumns", "false")
        ).lower() == "true"
        unsupported = {"bloomcolumns", "partitionby"} & set(options)
        if unsupported:
            raise ValueError(
                f"options {sorted(unsupported)} need the Spark append "
                "path — use the foreachBatch helper "
                "table_sink.exactly_once_appender"
            )

    # -- executor side -------------------------------------------------
    def write(self, iterator: Iterator) -> _StagedFiles:
        # Arrow RecordBatches in, parquet out — zero per-row Python
        import pyarrow.parquet as pq

        writer = None
        target = None
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if writer is None:
                    stage = Path(self.root) / _STAGE_DIR
                    stage.mkdir(parents=True, exist_ok=True)
                    target = stage / f"part-{uuid.uuid4().hex}.parquet"
                    writer = pq.ParquetWriter(str(target), batch.schema)
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        return _StagedFiles(paths=[str(target)] if target else [])

    # -- driver side ----------------------------------------------------
    def _txn(self, batch_id: int) -> tuple[str, int]:
        app = self.app_id or _query_id_from_checkpoint(self.checkpoint)
        return (app, int(batch_id))

    def commit(self, messages, batchId: int) -> None:
        # runs in a gateway-less Python worker: pyarrow publish only
        paths = [p for m in messages if m is not None for p in m.paths]
        try:
            if paths:
                publish_staged_files(
                    self.root, paths, txn=self._txn(batchId),
                    stats_columns=self.stats_columns,
                    change_feed=self.change_feed,
                    allow_new_columns=self.allow_new_columns,
                )
        finally:
            _unlink_all(paths)

    def abort(self, messages, batchId: int) -> None:
        _unlink_all(
            [p for m in messages if m is not None for p in m.paths]
        )


def _csv(v) -> list[str] | None:
    if not v:
        return None
    return [c.strip() for c in str(v).split(",") if c.strip()]


def _unlink_all(paths: list[str]) -> None:
    for p in paths:
        try:
            os.unlink(p)
        except OSError:
            pass
