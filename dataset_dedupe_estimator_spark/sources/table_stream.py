"""Versioned tables as a Structured Streaming SOURCE (Spark 4 Python
DataSource API) — the read-side twin of ``de table ingest``.

``spark.readStream.format("versioned_table").load(root)`` tails the
table's commit log: offsets are commit VERSIONS, each micro-batch is
the rows of the commits in ``(start, end]``, and every data file of
those commits becomes one input partition (reads scale with files, not
with a single driver loop). Commits are immutable and the log is
append-only, so replaying an offset range after a crash re-lists
exactly the same files — exactly-once composes from offset semantics
alone, nothing else is stateful.

Semantics follow the Delta streaming-source contract:

- ``append`` commits stream their directory's rows.
- Rewriting commits (``overwrite`` / ``delete`` / ``upsert`` /
  optimize) STOP the stream with a clear error by default — a
  rewritten history cannot be replayed as an append stream. With
  ``.option("ignoreChanges", "true")`` the stream instead emits the
  commit's OWN directory (survivors ∪ updates for upsert, the full
  rewrite for overwrite) and emits nothing for a dir-less delete;
  downstream consumers must tolerate re-delivered rows — exactly
  Delta's documented ``ignoreChanges`` behavior.
- ``.option("startingVersion", N)`` begins at commit N (default 0:
  replay the whole log); ``.option("startingTimestamp", TS)`` begins
  at the first commit AT or AFTER the timestamp (epoch seconds or
  ISO-8601; the Delta option — a future timestamp tails new commits
  only).
- ``.option("maxFilesPerTrigger", N)`` / ``.option("maxBytesPerTrigger",
  B)`` rate-limit catch-up: each micro-batch admits whole commits
  until their input-file count (bytes) would exceed the budget
  (always >= 1 commit; both options compose, either cap stops the
  slice) — the Delta options of the same names. Under
  ``trigger(availableNow=True)`` a SINGLE query run stops after the
  first bounded slice (the fallback below) — drive a bounded backfill
  with :func:`drain_available_now`, which loops passes against one
  checkpoint until the source stops advancing.
- ``.option("readChangeFeed", "true")`` streams ROW-LEVEL changes
  instead: appends emit their rows as ``_change='insert'``;
  deletes/upserts emit the change-data file their commit wrote
  (``change_feed=True`` on the table — O(changed rows), an UPDATE is
  its delete+insert pair), every row stamped ``_commit_version``;
  dataChange=false compaction emits nothing. The Delta CDF-stream
  shape.

Masks (``removed`` file lists) never apply retroactively: each commit
streams as it was written, at its own version — a later delete cannot
reach into batches already emitted.

Schema is self-describing: the latest commit entry names the columns;
types come from a live parquet footer (arrow -> Spark, timestamps kept
NTZ like the batch reader) plus hive-style partition directories
(values inferred long/double/string, the narrow inference the batch
scan would make on these tables). Files written before a schema
widening backfill NULL for the later columns, matching
``read_version``.

``Trigger.AvailableNow`` limitation (investigated r8, pinned): Spark
wraps EVERY Python DataSource stream in
``PythonMicroBatchStream`` (spark-sql 4.1.2), which implements only
``MicroBatchStream`` + ``AcceptsLatestSeenOffset`` — not
``SupportsTriggerAvailableNow`` — so ``trigger(availableNow=True)``
logs the engine's "falling back to a single batch" warning for ANY
Python source; no hook exists Python-side to change that. The fallback
drains everything committed at start time in one batch, which is
correct for bounded drains (what the gate and bench do); the engine-
side multi-batch shape needs the JVM-native source this API doesn't
expose. Re-verified r13 (spark-sql 4.1.2 ``PythonMicroBatchStream``
implements ``MicroBatchStream`` + ``AcceptsLatestSeenOffset`` only) —
do not retry until the DataSource API grows the capability. The
repo-side equivalent is :func:`drain_available_now`:
``maxFilesPerTrigger``-bounded passes looped over one checkpoint,
giving a 100 TB backfill bounded microbatches with exactly-once
resume TODAY. The engine's WARN on every availableNow drain is
expected and harmless — see PROTOCOL.md.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from dataset_dedupe_estimator_spark.sources.versioned import (
    _CDF,
    _DATA,
    _DV,
    _column_mapping,
    _committed_entries,
    _dropped_columns,
)

# actions that rewrite rather than add — streamable only with
# ignoreChanges (Delta's contract for its streaming source)
_REWRITE_ACTIONS = frozenset({"overwrite", "delete", "upsert", "update", "restore"})


def _infer_part_value(raw: str):
    """Hive partition-dir value with the narrow long/double/string
    inference; '__HIVE_DEFAULT_PARTITION__' is NULL."""
    from urllib.parse import unquote

    raw = unquote(raw)
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def _partition_values(rel_path: Path) -> dict:
    vals = {}
    for part in rel_path.parts[:-1]:
        if "=" in part:
            k, _, v = part.partition("=")
            vals[k] = _infer_part_value(v)
    return vals


class _CommitFile(InputPartition):
    """One parquet file of one commit (data or change-data directory).
    ``change`` is the constant ``_change`` value for files that don't
    carry the column (append dirs in CDF mode); ``version`` stamps
    ``_commit_version`` in CDF mode; ``skip_rids`` are file row
    positions hidden by a deletion vector at the emitted version
    (restore re-delivery only — KB-sized by design)."""

    def __init__(self, path: str, base: str, change: str | None = None,
                 version: int | None = None,
                 skip_rids: tuple[int, ...] | None = None):
        self.path = path
        self.base = base
        self.change = change
        self.version = version
        self.skip_rids = skip_rids


def _dv_exclusions(root: Path, refs) -> dict:
    """'<dir>/<rel>' (filesystem form) -> tuple of deleted row indices,
    from a restore entry's reinstated DV sidecars. Sidecar keys are the
    URI-encoded ``_metadata.file_path`` suffix the JVM writes;
    ``unquote`` maps them back to the filesystem paths the planner
    walks (percent-escapes are standard, so the decode is exact)."""
    if not refs:
        return {}
    import pyarrow.parquet as pq
    from urllib.parse import unquote

    out: dict[str, set] = {}
    for name, _ in refs:
        t = pq.read_table(
            str(root / _DV / name), columns=["_dv_key", "_dv_rid"]
        )
        for k, r in zip(t["_dv_key"].to_pylist(), t["_dv_rid"].to_pylist()):
            out.setdefault(unquote(k), set()).add(int(r))
    return {k: tuple(sorted(v)) for k, v in out.items()}


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.root = options.get("path") or options.get("root")
        if not self.root:
            raise ValueError(
                "versioned_table stream needs the table root: "
                ".load('/path/to/table') or .option('root', ...)"
            )
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.read_change_feed = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )
        self.starting_version = int(options.get("startingversion", 0))
        if options.get("startingtimestamp") is not None:
            if "startingversion" in options:
                raise ValueError(
                    "pass startingVersion or startingTimestamp, not both"
                )
            # the Delta option: deliver the commits AT or AFTER the
            # timestamp (resolved once, when the stream starts); a
            # future timestamp starts an empty tail-following stream
            from dataset_dedupe_estimator_spark.sources.versioned import (
                _effective_ts,
                _to_epoch,
            )

            t = _to_epoch(options["startingtimestamp"])
            entries = _committed_entries(Path(self.root))
            # mtime-backfilled, monotone — a legacy no-ts commit is
            # placed by when it landed instead of silently skipped
            eff = _effective_ts(Path(self.root), entries)
            at_or_after = [v for v, ts in eff.items() if ts >= t]
            self.starting_version = (
                min(at_or_after)
                if at_or_after
                else (entries[-1]["version"] + 1 if entries else 0)
            )
        # Delta's maxFilesPerTrigger shape: admit whole COMMITS into a
        # micro-batch until their file count would exceed the cap
        # (always at least one commit, so a single over-sized commit
        # still drains). 0/absent = unlimited. The reader self-tracks
        # its high-water mark because the Python DataSource API has no
        # latest-seen-offset hook: offsets never regress (monotone
        # _hwm, resynced from every partitions() call), and the one
        # blind spot — a RESTART whose first planning call is
        # latestOffset, not a replay — deliberately emits one
        # unbounded catch-up batch rather than risk re-delivery.
        self.max_files = int(options.get("maxfilespertrigger", 0) or 0)
        # Delta's maxBytesPerTrigger: same whole-commit admission, byte
        # budget instead of (or alongside) the file-count budget — the
        # soft cap always admits at least one commit
        self.max_bytes = int(options.get("maxbytespertrigger", 0) or 0)
        self._hwm: int | None = None
        self.spark_schema = schema
        # renamed columns: the schema speaks LOGICAL names, data files
        # (all of them — physical names are frozen) speak physical
        entries0 = _committed_entries(Path(self.root))
        self._phys = _column_mapping(entries0)
        # nested struct paths (any depth): renames/drops keyed by the
        # PHYSICAL parent path — the reader projects recursively
        self._nested: dict = {}
        for l, p in self._phys.items():
            if "." not in l:
                continue
            pparent, _, pleaf = p.rpartition(".")
            lleaf = l.rsplit(".", 1)[1]
            self._nested.setdefault(pparent, {})[lleaf] = pleaf
        self._ndropped: dict = {}
        for p in _dropped_columns(entries0):
            if "." not in p:
                continue
            pparent, _, pleaf = p.rpartition(".")
            self._ndropped.setdefault(pparent, set()).add(pleaf)
        # physical parent paths with ANY rename/drop beneath them: the
        # projector recurses only where needed (plain cast elsewhere)
        self._affected = set(self._nested) | set(self._ndropped)

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._hwm is None:
            self._hwm = self.starting_version - 1
        return {"version": self.starting_version - 1}

    def _commit_file_stats(self, root: Path, e: dict) -> tuple[int, int]:
        """(input files, input bytes) this commit would contribute to a
        batch, mirroring partitions(): property/dir-less/
        dataChange=false commits are (0, 0); CDF mode counts the
        change-data files of rewriting commits."""
        if e.get("data_change") is False:
            return 0, 0
        if e["action"] in (
            "set_constraints", "rename_column", "drop_column",
            "set_partitioning",
        ):
            return 0, 0
        if self.read_change_feed and e.get("change_data"):
            bases = [root / _CDF / f"c{e['version']:08d}"]
        elif e["action"] == "restore":
            bases = [root / _DATA / d for d in e["dirs"]]
        elif e.get("dir"):
            bases = [root / _DATA / e["dir"]]
        else:
            return 0, 0
        files = [f for b in bases for f in b.rglob("*.parquet")]
        return len(files), sum(f.stat().st_size for f in files)

    def latestOffset(self) -> dict:
        root = Path(self.root)
        entries = _committed_entries(root)
        latest = entries[-1]["version"] if entries else self.starting_version - 1
        if not self.max_files and not self.max_bytes:
            return {"version": latest}
        if self._hwm is None:
            # first planning call of a run. A FRESH stream bounds its
            # catch-up from startingVersion-1 (this is the whole point
            # of the option); a RESTARTED stream never reaches here
            # with stale state, because the engine re-plans the last
            # checkpointed batch — a partitions() call that resyncs
            # _hwm — before its first latestOffset (verified against
            # spark 4.1's MicroBatchExecution restart path).
            self._hwm = self.starting_version - 1
        n = nb = admitted = 0
        end = self._hwm
        for e in entries:
            if e["version"] <= self._hwm:
                continue
            c, cb = self._commit_file_stats(root, e)
            if admitted and (
                (self.max_files and n + c > self.max_files)
                or (self.max_bytes and nb + cb > self.max_bytes)
            ):
                break
            n += c
            nb += cb
            admitted += 1
            end = e["version"]
        self._hwm = max(self._hwm, end)
        return {"version": self._hwm}

    # -- planning (driver-side) ------------------------------------------
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["version"], end["version"]
        # resync the rate-limit high-water mark from the engine's own
        # range: on restart the engine re-plans the last checkpointed
        # batch from the offset log before any latestOffset call —
        # without this, the next bounded step could fall below the
        # replayed end and re-deliver committed rows
        resync = max(lo, hi)
        if self._hwm is None or resync > self._hwm:
            self._hwm = resync
        root = Path(self.root)
        parts: list[InputPartition] = []
        for e in _committed_entries(root):
            v = e["version"]
            if not (lo < v <= hi):
                continue
            if e.get("data_change") is False:
                # layout-only commit (compact_small): the live rows are
                # identical before and after — nothing to emit, never
                # an error (the Delta dataChange=false contract)
                continue
            if e["action"] in (
                "set_constraints", "rename_column", "drop_column",
                "set_partitioning",
            ):
                continue  # property commits: no rows in either mode
            if self.read_change_feed:
                # CDF mode: appends are inserts from their own dir;
                # deletes/upserts read the change-data file their
                # commit wrote (O(changed rows))
                if e["action"] == "append":
                    if not e.get("dir"):
                        continue
                    base, change = root / _DATA / e["dir"], "insert"
                elif e.get("change_data"):
                    # the cdf dir is named by VERSION — it exists even
                    # when a zero-survivor delete commits dir=None
                    base, change = root / _CDF / f"c{v:08d}", None
                else:
                    raise ValueError(
                        f"readChangeFeed: version {v} ({e['action']!r}) "
                        "has no change data — the feed was not enabled "
                        "when it committed, or the action rewrites "
                        "history. Restart from a later startingVersion."
                    )
                for f in sorted(base.rglob("*.parquet")):
                    parts.append(_CommitFile(str(f), str(base), change, v))
                continue
            if e["action"] in _REWRITE_ACTIONS and not self.ignore_changes:
                raise ValueError(
                    f"versioned_table stream hit a {e['action']!r} commit "
                    f"(v{v}): a rewrite cannot replay as an append stream. "
                    "Restart from a later startingVersion, or set "
                    ".option('ignoreChanges', 'true') to emit rewritten "
                    "rows (downstream must tolerate re-delivery), or "
                    ".option('readChangeFeed', 'true') for row-level "
                    "changes (needs change_feed enabled on the table)."
                )
            if e["action"] == "restore":
                # ignoreChanges: re-deliver the live set this rollback
                # made current again — its dirs minus its recorded file
                # masks AND minus the rows its reinstated deletion
                # vectors hide, so the emission equals the restored
                # live set the batch reader resolves
                rmasks = {
                    d: set(r) for d, r in (e.get("removed") or {}).items()
                }
                dv_skip = _dv_exclusions(root, e.get("dv") or [])
                for dname in e["dirs"]:
                    base = root / _DATA / dname
                    skip = rmasks.get(dname, set())
                    for f in sorted(base.rglob("*.parquet")):
                        rel = str(f.relative_to(base))
                        if rel in skip:
                            continue
                        rids = dv_skip.get(f"{dname}/{rel}")
                        parts.append(
                            _CommitFile(str(f), str(base), skip_rids=rids)
                        )
                continue
            if not e.get("dir"):  # zero-survivor delete: nothing to emit
                continue
            base = root / _DATA / e["dir"]
            for f in sorted(base.rglob("*.parquet")):
                parts.append(_CommitFile(str(f), str(base)))
        return parts

    def _project(self, arr, target_type, ppath: str):
        """Cast ``arr`` to ``target_type``; for a struct whose fields
        (at ANY depth) were renamed or dropped under the path-based
        column mapping, the target's LOGICAL field names differ from
        the file's physical children — rebuild the StructArray from
        the physical children in target order, RECURSING into struct
        children that still have renames/drops beneath them (fields
        renamed after a file was written read under their new name;
        dropped fields disappear; fields widened in later commits
        backfill NULL here like top-level columns). ``ppath`` is the
        PHYSICAL dotted path of this array."""
        import pyarrow as pa
        import pyarrow.compute as pc

        import pyarrow.types as pt

        if not pt.is_struct(target_type) or not any(
            a == ppath or a.startswith(ppath + ".") for a in self._affected
        ):
            return arr.cast(target_type)
        leafmap = self._nested.get(ppath, {})
        have = {arr.type.field(i).name for i in range(arr.type.num_fields)}
        children = []
        n = len(arr)
        for i in range(target_type.num_fields):
            f = target_type.field(i)
            src_leaf = leafmap.get(f.name, f.name)
            if src_leaf in have:
                children.append(
                    self._project(
                        arr.field(src_leaf), f.type, f"{ppath}.{src_leaf}"
                    )
                )
            else:
                children.append(pa.nulls(n, f.type))
        return pa.StructArray.from_arrays(
            children,
            fields=list(target_type),
            mask=pc.is_null(arr),
        )

    # -- execution (one task per file) -----------------------------------
    def read(self, partition: _CommitFile):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.spark_schema)
        part_vals = _partition_values(
            Path(partition.path).relative_to(partition.base)
        )
        pf = pq.ParquetFile(partition.path)
        file_cols = set(pf.schema_arrow.names)
        phys = getattr(self, "_phys", {})
        src_of = {f.name: phys.get(f.name, f.name) for f in target}
        read_cols = [
            src_of[f.name] for f in target if src_of[f.name] in file_cols
        ]
        skip_rids = set(getattr(partition, "skip_rids", None) or ())
        row_pos = 0
        for batch in pf.iter_batches(columns=read_cols):
            if skip_rids:
                keep = pa.array(
                    [row_pos + i not in skip_rids
                     for i in range(batch.num_rows)],
                    pa.bool_(),
                )
                row_pos += batch.num_rows
                batch = batch.filter(keep)
            n = batch.num_rows
            by_name = {
                name: batch.column(i)
                for i, name in enumerate(batch.schema.names)
            }
            cols = []
            for field in target:
                if field.name == "_commit_version" and partition.version is not None:
                    cols.append(
                        pa.array([partition.version] * n, pa.int64())
                    )
                elif field.name == "_change" and partition.change is not None:
                    cols.append(pa.array([partition.change] * n, pa.string()))
                elif src_of[field.name] in by_name:
                    cols.append(
                        self._project(
                            by_name[src_of[field.name]], field.type,
                            src_of[field.name],
                        )
                    )
                elif src_of[field.name] in part_vals:
                    cols.append(
                        pa.array(
                            [part_vals[src_of[field.name]]] * n
                        ).cast(field.type)
                    )
                else:  # written before a schema widening: NULL backfill
                    cols.append(pa.nulls(n, field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target)

    def commit(self, end: dict) -> None:
        pass  # offsets are the only state; the checkpoint holds them


class VersionedTableStreamSource(DataSource):
    """``spark.dataSource.register(VersionedTableStreamSource)`` then
    ``spark.readStream.format("versioned_table").load(root)``."""

    @classmethod
    def name(cls) -> str:
        return "versioned_table"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import (
            DoubleType, LongType, StringType, StructField, StructType,
        )

        root = Path(self.options.get("path") or self.options.get("root") or "")
        entries = _committed_entries(root)
        if not entries:
            raise ValueError(f"{root} has no committed versions")
        columns = entries[-1]["columns"]
        # types from the newest live footer that carries each column
        # (widening means older files may lack the latest columns)
        fields: dict[str, StructField] = {}
        for e in reversed(entries):
            if not e.get("dir"):
                continue
            for f in sorted((root / _DATA / e["dir"]).rglob("*.parquet")):
                sub = from_arrow_schema(
                    pq.read_schema(str(f)), prefer_timestamp_ntz=True
                )
                for sf in sub.fields:
                    # always nullable: commits before a widening
                    # backfill NULL even for REQUIRED parquet columns
                    fields.setdefault(
                        sf.name, StructField(sf.name, sf.dataType, True)
                    )
                vals = _partition_values(f.relative_to(root / _DATA / e["dir"]))
                for k, v in vals.items():
                    t = (
                        LongType() if isinstance(v, int)
                        else DoubleType() if isinstance(v, float)
                        else StringType()
                    )
                    fields.setdefault(k, StructField(k, t))
                break  # one footer per commit dir is enough
            if all(c in fields for c in columns):
                break
        missing = [c for c in columns if c not in fields]
        if missing:
            raise ValueError(
                f"could not derive types for columns {missing} from any "
                "live parquet footer or partition directory"
            )
        mapping = _column_mapping(entries)
        inv = {p: l for l, p in mapping.items() if "." not in l}
        # nested struct paths (any depth): renames/drops project into
        # the derived schema recursively — PHYSICAL full path keys
        ren = {
            p: l.rsplit(".", 1)[1]
            for l, p in mapping.items()
            if "." in l
        }
        gone = {p for p in _dropped_columns(entries) if "." in p}
        affected = set(ren) | gone

        def _leafed(dt, prefix):
            if not isinstance(dt, StructType) or not any(
                a.startswith(prefix + ".") for a in affected
            ):
                return dt
            return StructType(
                [
                    StructField(
                        ren.get(f"{prefix}.{sf.name}", sf.name),
                        _leafed(sf.dataType, f"{prefix}.{sf.name}"),
                        True,
                    )
                    for sf in dt.fields
                    if f"{prefix}.{sf.name}" not in gone
                ]
            )

        out = [
            StructField(
                inv.get(c, c), _leafed(fields[c].dataType, c),
                fields[c].nullable,
            )
            for c in columns
        ]
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            out.append(StructField("_change", StringType(), True))
            out.append(StructField("_commit_version", LongType(), True))
        return StructType(out)

    def streamReader(self, schema) -> VersionedTableStreamReader:
        return VersionedTableStreamReader(schema, self.options)

    def streamWriter(self, schema, overwrite: bool):
        # the write half: df.writeStream.format("versioned_table") —
        # one versioned commit per microbatch, exactly-once keyed by
        # (queryId, batchId) in the table's commit log (table_sink.py)
        if overwrite:
            raise ValueError(
                "versioned_table sink appends only — complete-mode "
                "overwrite would retire history on every microbatch"
            )
        from dataset_dedupe_estimator_spark.sources.table_sink import (
            VersionedTableStreamWriter,
        )

        return VersionedTableStreamWriter(schema, self.options)


def drain_available_now(start_query, max_passes: int = 100_000) -> dict:
    """Bounded multi-batch catch-up DESPITE the AvailableNow fallback
    (module docstring: ``PythonMicroBatchStream`` exposes no
    ``SupportsTriggerAvailableNow`` hook, re-verified against the
    spark-sql 4.1.2 class this round): loop single-batch availableNow
    passes against ONE checkpoint until the source stops advancing.

    Pass a zero-arg callable that starts and returns the
    ``StreamingQuery`` — same ``checkpointLocation`` every time, with
    ``.option("maxFilesPerTrigger", N)`` on the reader so each pass
    admits a bounded commit slice. Offsets live in the checkpoint, so
    every pass resumes where the last committed; the loop ends when a
    pass reports no offset advance (NOT "zero rows" — a slice of
    property/compaction commits legitimately advances with no rows).
    This is the 100 TB backfill shape the missing engine hook would
    otherwise provide: years of history drain as bounded microbatches
    instead of one giant batch, and a kill anywhere resumes exactly
    once (versioned-sink txn watermark or file-sink offset log).

    Returns ``{"passes": n, "rows": total_input_rows}``."""
    total = passes = 0
    last_end = None
    for _ in range(max_passes):
        q = start_query()
        q.awaitTermination()
        p = q.lastProgress
        passes += 1
        if p is None:
            break  # no batch ran: already caught up
        total += int(p["numInputRows"])
        end = (p.get("sources") or [{}])[0].get("endOffset")
        if end == last_end:
            break  # offset parked: drained
        last_end = end
    return {"passes": passes, "rows": total}
