"""Per-file Bloom filters in the commit log (r7, the Delta/Iceberg
bloom shape): equality predicates and merge keys prune files the value
provably isn't in — including STRING columns, which zone maps refuse
(parquet may truncate string min/max). The hash is md5 over Spark's
string cast, derived identically JVM-side (build) and pure-Python
driver-side (membership) — zone_map_prune keeps its zero-byte,
zero-Spark contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        (F.col("id") * 3).alias("v"),
    )


def _md5(path):
    from pathlib import Path

    return {
        str(f): hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(Path(path).rglob("*.parquet"))
    }


@pytest.fixture()
def bloomed(spark, tmp_path):
    """4 commits x 2 files, string-keyed, blooms on doc_id."""
    root = tmp_path / "tbl"
    for m in range(4):
        vt.append(
            root, _docs(spark, m * 500, (m + 1) * 500), num_files=2,
            bloom_columns=["doc_id"],
        )
    return root


def test_jvm_and_python_positions_agree(spark):
    bits = 65_536
    vals = ["doc-12345", "", "Ünïcødé", "a b c"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    hexcol = F.md5(F.col("s").cast("string"))
    pos = F.array(
        *[
            (
                F.conv(F.substring(hexcol, 1 + 8 * i, 8), 16, 10)
                .cast("long") % bits
            )
            for i in range(4)
        ]
    )
    got = {r.s: list(r.p) for r in df.select("s", pos.alias("p")).collect()}
    for v in vals:
        assert got[v] == vt._bloom_positions_py(v, bits)
    ints = spark.createDataFrame([(7,), (2**61,), (-3,)], "k long")
    hexcol = F.md5(F.col("k").cast("string"))
    pos = F.array(
        *[
            (
                F.conv(F.substring(hexcol, 1 + 8 * i, 8), 16, 10)
                .cast("long") % bits
            )
            for i in range(4)
        ]
    )
    goti = {r.k: list(r.p) for r in ints.select("k", pos.alias("p")).collect()}
    for k in (7, 2**61, -3):
        assert goti[k] == vt._bloom_positions_py(k, bits)


def test_equality_read_prunes_string_files(spark, bloomed):
    rep = vt.zone_map_prune(bloomed, [("doc_id", "==", "doc-00000042")])
    assert rep["total_files"] == 8
    assert rep["skipped_files"] >= 6  # the key lives in ONE file (+FPs)
    got = vt.read_where(
        spark, bloomed, [("doc_id", "==", "doc-00000042")]
    ).collect()
    assert [(r.doc_id, r.v) for r in got] == [("doc-00000042", 126)]
    # absent key: every file provably clean, result empty
    rep2 = vt.zone_map_prune(bloomed, [("doc_id", "==", "nope")])
    assert rep2["kept_files"] == 0
    assert vt.read_where(spark, bloomed, [("doc_id", "==", "nope")]).count() == 0


def test_bloom_never_prunes_a_present_key(spark, bloomed):
    """Conservativeness: every present key must survive pruning (false
    positives allowed, false negatives never)."""
    for i in range(0, 2000, 97):
        key = f"doc-{i:08d}"
        got = vt.read_where(spark, bloomed, [("doc_id", "==", key)])
        assert got.count() == 1, key


def test_string_keyed_merge_prunes(spark, bloomed, tmp_path):
    before = _md5(bloomed / "data")
    ups = spark.createDataFrame(
        [("doc-00000007", -1), ("doc-00001999", -2), ("doc-xxxx", -3)],
        "doc_id string, v long",
    )
    st = vt.upsert_pruned(spark, bloomed, ups, ["doc_id"])
    # 2 present keys live in <=2 files; the insert key hits none
    assert st["rewritten_files"] <= 2 + 1  # +1 slack for a bloom FP
    assert st["carried_files"] >= 5
    assert st["replaced_rows"] == 2
    after = _md5(bloomed / "data")
    for f, h in before.items():
        assert after[f] == h  # originals untouched
    got = vt.read_version(spark, bloomed)
    assert got.count() == 2001
    assert {
        (r.doc_id, r.v)
        for r in got.filter(
            F.col("doc_id").isin("doc-00000007", "doc-00001999", "doc-xxxx")
        ).collect()
    } == {("doc-00000007", -1), ("doc-00001999", -2), ("doc-xxxx", -3)}


def test_rewrite_commits_keep_blooms(spark, bloomed):
    """Blooms survive maintenance: the upsert/compact survivor dirs
    record fresh blooms, so later merges still prune."""
    ups = spark.createDataFrame([("doc-00000007", -1)], "doc_id string, v long")
    vt.upsert_pruned(spark, bloomed, ups, ["doc_id"])
    st = vt.compact_small(spark, bloomed)
    assert st["committed"]
    entry = vt.history(bloomed)[-1]
    assert entry["bloom_columns"] == ["doc_id"] and entry.get("blooms_file")
    assert vt._entry_blooms(bloomed, entry)  # sidecar present and readable
    rep = vt.zone_map_prune(bloomed, [("doc_id", "==", "doc-00000007")])
    assert rep["skipped_files"] >= 0  # still decidable post-compact
    got = vt.read_where(spark, bloomed, [("doc_id", "==", "doc-00000007")])
    assert [(r.doc_id, r.v) for r in got.collect()] == [("doc-00000007", -1)]


def test_bloom_respects_delete_masks(spark, bloomed):
    vt.delete_where_pruned(spark, bloomed, [("v", "<", 30)])  # no stats: full
    got = vt.read_where(spark, bloomed, [("doc_id", "==", "doc-00000003")])
    assert got.count() == 0  # deleted (v=9): masked file never resurfaces


def test_blooms_and_zone_maps_compose(spark, tmp_path):
    root = tmp_path / "tbl"
    df = spark.range(0, 1000).select(
        "id",
        F.format_string("k-%04d", F.col("id")).alias("key"),
    )
    vt.append(
        root, df.repartitionByRange(4, "id"),
        stats_columns=["id"], bloom_columns=["key"],
    )
    # range prunes on id AND bloom prunes on key
    rep = vt.zone_map_prune(
        root, [("id", "between", (0, 100)), ("key", "==", "k-0050")]
    )
    assert rep["kept_files"] == 1
    got = vt.read_where(
        spark, root, [("id", "between", (0, 100)), ("key", "==", "k-0050")]
    )
    assert [r.id for r in got.collect()] == [50]


def test_declarations_survive_dirless_delete(spark, tmp_path):
    """A zero-survivor delete must not silently drop the stats/bloom
    declarations from the inheritance chain (entries[-1])."""
    root = tmp_path / "tbl"
    vt.append(
        root, _docs(spark, 0, 100), num_files=1,
        stats_columns=["v"], bloom_columns=["doc_id"],
    )
    vt.delete_where_pruned(spark, root, [("v", "<", 1000)])  # wipes all
    assert vt.history(root)[-1]["dir"] is None
    assert vt.history(root)[-1]["stats_columns"] == ["v"]
    assert vt.history(root)[-1]["bloom_columns"] == ["doc_id"]
    vt.append(root, _docs(spark, 100, 200), num_files=1)
    entry = vt.history(root)[-1]
    assert entry.get("stats") and entry.get("blooms_file")  # inherited


def test_bloom_validation(spark, tmp_path):
    root = tmp_path / "tbl"
    df = spark.range(5).select(
        "id", (F.col("id") * 0.5).alias("f"), (F.col("id") % 2).alias("p")
    )
    with pytest.raises(ValueError, match="cast-stable"):
        vt.append(root, df, bloom_columns=["f"])  # double: refused
    with pytest.raises(ValueError, match="not in commit schema"):
        vt.append(root, df, bloom_columns=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        vt.append(root, df, partition_by=["p"], bloom_columns=["p"])


def test_null_only_files_prune_for_equality(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(
        root,
        spark.createDataFrame([(None, 1), (None, 2)], "key string, v long"),
        num_files=1, bloom_columns=["key"],
    )
    vt.append(
        root,
        spark.createDataFrame([("a", 3)], "key string, v long"),
        num_files=1,
    )
    rep = vt.zone_map_prune(root, [("key", "==", "a")])
    # the all-NULL file is provably clean for equality
    assert rep["skipped_files"] == 1 and rep["kept_files"] == 1
    got = vt.read_where(spark, root, [("key", "==", "a")])
    assert [(r.key, r.v) for r in got.collect()] == [("a", 3)]


def test_cli_append_bloom_columns(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    src = str(tmp_path / "src.parquet")
    _docs(spark, 0, 100).coalesce(1).write.parquet(src)
    root = str(tmp_path / "vt")
    assert main([
        "table", "append", root, src, "--bloom-columns", "doc_id",
    ]) == 0
    assert "blooms on ['doc_id']" in capsys.readouterr().out
    entry = vt.history(root)[-1]
    assert entry["bloom_columns"] == ["doc_id"] and entry.get("blooms_file")


def test_in_predicate_blooms_and_reads(spark, bloomed):
    """IN over a bloom column: a file survives iff ANY member may be
    present; the residual filter returns exactly the members' rows."""
    keys = ["doc-00000042", "doc-00001500", "nope"]
    rep = vt.zone_map_prune(bloomed, [("doc_id", "in", keys)])
    assert rep["kept_files"] <= 3  # two real files + FP slack
    got = sorted(
        (r.doc_id, r.v)
        for r in vt.read_where(
            spark, bloomed, [("doc_id", "in", keys)]
        ).collect()
    )
    assert got == [("doc-00000042", 126), ("doc-00001500", 4500)]


def test_in_predicate_zone_maps_numeric(spark, tmp_path):
    root = tmp_path / "tbl"
    vt.append(
        root,
        spark.range(0, 1000).select("id", (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "id"),
        stats_columns=["id"],
    )
    rep = vt.zone_map_prune(root, [("id", "in", [5, 7])])
    assert rep["kept_files"] == 1  # both ids in the first range file
    got = vt.read_where(spark, root, [("id", "in", [5, 7, 5000])])
    assert sorted(r.id for r in got.collect()) == [5, 7]
    # delete by IN rides the same language
    st = vt.delete_where_pruned(spark, root, [("id", "in", [5, 7])])
    assert st["committed"] and st["deleted_rows"] == 2
    assert st["rewritten_files"] == 1 and st["carried_files"] == 3
    assert vt.read_version(spark, root).count() == 998


def test_cli_where_in(capsys, spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    src = str(tmp_path / "src.parquet")
    spark.range(100).select("id", (F.col("id") * 2).alias("v")).coalesce(
        1
    ).write.parquet(src)
    root = str(tmp_path / "vt")
    assert main(["table", "append", root, src, "--stats-columns", "id"]) == 0
    capsys.readouterr()
    assert main(["table", "read", root, "--where", "id:in:3,5,7"]) == 0
    assert "rows=3" in capsys.readouterr().out


@pytest.mark.slow
def test_in_and_bloom_prune_property(spark, tmp_path):
    """Property: for random IN value sets over a table carrying BOTH
    zone maps (numeric) and blooms (string), read_where equals the
    model filter exactly — pruning (range OR bloom, any-member
    semantics) never drops a needed file for any random key mix of
    present, absent, and out-of-range values."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    root = tmp_path / "pt"
    df = spark.range(0, 600).select(
        "id", F.format_string("doc-%05d", F.col("id")).alias("doc_id")
    )
    vt.append(root, df.repartitionByRange(6, "id"),
              stats_columns=["id"], bloom_columns=["doc_id"])
    present = set(range(600))

    ids = st.lists(
        st.integers(min_value=-100, max_value=900), min_size=1, max_size=6
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(vals=ids)
    def check(vals):
        # numeric IN via zone maps
        got = {
            r.id
            for r in vt.read_where(
                spark, root, [("id", "in", vals)]
            ).collect()
        }
        assert got == (set(vals) & present)
        # string IN via blooms (same value set rendered as keys)
        keys = [f"doc-{v:05d}" for v in vals]
        got2 = {
            r.id
            for r in vt.read_where(
                spark, root, [("doc_id", "in", keys)]
            ).collect()
        }
        assert got2 == (set(vals) & present)

    check()


@pytest.mark.slow
def test_bloom_position_lockstep_property(spark):
    """Property: JVM md5/conv positions equal the pure-Python positions
    for arbitrary text (unicode, controls, long strings) and arbitrary
    longs — the invariant the whole bloom design rests on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    # surrogates can't round-trip through Spark; everything else may
    texts = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=64
    )
    longs = st.integers(min_value=-(2**62), max_value=2**62)

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(s=texts, k=longs)
    def check(s, k):
        bits = 65_536
        df = spark.createDataFrame([(s, k)], "s string, k long")
        row = df.select(
            *[
                (
                    F.conv(
                        F.substring(F.md5(F.col(c).cast("string")), 1 + 8 * i, 8),
                        16, 10,
                    ).cast("long") % bits
                ).alias(f"{c}{i}")
                for c in ("s", "k")
                for i in range(4)
            ]
        ).head()
        assert [row[f"s{i}"] for i in range(4)] == vt._bloom_positions_py(s, bits)
        assert [row[f"k{i}"] for i in range(4)] == vt._bloom_positions_py(k, bits)

    check()


def test_partitioned_table_blooms_with_escapable_partition_value(spark, tmp_path):
    """Blooms on a PARTITIONED table whose partition values need URI
    escaping (space, %, non-ASCII): input_file_name() returns a
    percent-encoded URI, while stats/masks/readers key files by the
    filesystem listing — the keys must agree or a live file's missing
    bloom reads as a provable miss and the file is silently pruned."""
    root = tmp_path / "pt"
    df = spark.createDataFrame(
        [("doc-a", "North America", 1), ("doc-b", "50% off", 2),
         ("doc-c", "Königsberg", 3), ("doc-d", "North America", 4)],
        "doc_id string, region string, v long",
    )
    vt.append(root, df, num_files=1, partition_by=["region"],
              bloom_columns=["doc_id"])
    # every live row must stay reachable through a bloom-probed read
    for doc, v in [("doc-a", 1), ("doc-b", 2), ("doc-c", 3), ("doc-d", 4)]:
        got = vt.read_where(spark, root, [("doc_id", "==", doc)])
        assert [(r.doc_id, r.v) for r in got.collect()] == [(doc, v)]
    # bloom keys coincide with the stats/mask key space: a pruned
    # DELETE against one partition's doc must remove exactly that row
    vt.delete_where_pruned(spark, root, [("doc_id", "==", "doc-b")])
    left = {r.doc_id for r in vt.read_version(spark, root).collect()}
    assert left == {"doc-a", "doc-c", "doc-d"}
    # absent key still prunes everything (zero files scanned)
    rep = vt.zone_map_prune(root, [("doc_id", "==", "doc-zz")])
    assert rep["kept_files"] == 0


def test_mistyped_probe_literal_never_false_negative_prunes(spark, tmp_path):
    """A probe literal whose Python type differs from the column (3.0
    or True against a bigint column) must not hash into a different
    string space and prune a live file: integral floats/bools are
    normalized to the column dtype, non-normalizable literals skip
    bloom pruning (keep the file) — results always equal the row
    filter's."""
    root = tmp_path / "ints"
    df = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    vt.append(root, df, num_files=1, bloom_columns=["k"])
    # float literal 3.0 equals bigint 3 in the row filter: the read
    # must return the row, not bloom-prune the file hashing "3.0"
    got = vt.read_where(spark, root, [("k", "==", 3.0)])
    assert [r.v for r in got.collect()] == [6]
    rep = vt.zone_map_prune(root, [("k", "==", 3.0)])
    assert rep["kept_files"] == 1  # normalized probe still prunes-capable
    # True normalizes to 1 in the zero-byte prune report (the row
    # filter itself refuses BIGINT==BOOLEAN, so no read can go wrong)
    rep = vt.zone_map_prune(root, [("k", "==", True)])
    assert rep["kept_files"] == 1
    # non-integral float can't match any bigint: empty, with or
    # without pruning (keeping the file is fine; wrong rows are not)
    got = vt.read_where(spark, root, [("k", "==", 3.5)])
    assert got.count() == 0


def test_mistyped_merge_keys_never_skip_live_files(spark, tmp_path):
    """upsert_pruned with update keys arriving as DOUBLE against a
    bigint-bloomed table: normalization (or conservative keep) must
    rewrite the files that hold the matching integer keys."""
    root = tmp_path / "m"
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    vt.append(root, df, num_files=4, bloom_columns=["k"])
    ups = spark.createDataFrame([(7.0, 1), (55.0, 1)], "k double, v long")
    ups = ups.select(F.col("k").cast("long").alias("k"), "v")  # typed MERGE
    st = vt.upsert_pruned(spark, root, ups, ["k"])
    assert st["committed"] and st["rewritten_files"] >= 1
    got = {r.k: r.v for r in vt.read_version(spark, root).collect()}
    assert got[7] == 1 and got[55] == 1 and got[8] == 0


def test_missing_sidecar_degrades_to_scan_never_wrong(spark, bloomed):
    """A lost/vacuumed bloom sidecar must turn bloom pruning OFF for
    that commit (an absent per-file bitmap normally proves a miss —
    an empty fallback dict would prune every live file)."""
    import shutil

    shutil.rmtree(bloomed / "_blooms")
    rep = vt.zone_map_prune(bloomed, [("doc_id", "==", "doc-00000042")])
    assert rep["kept_files"] == rep["total_files"]  # no pruning, no loss
    got = vt.read_where(spark, bloomed, [("doc_id", "==", "doc-00000042")])
    assert [(r.doc_id, r.v) for r in got.collect()] == [("doc-00000042", 126)]
    # merges likewise rewrite conservatively instead of skipping files
    ups = spark.createDataFrame([("doc-00000042", -5)], "doc_id string, v long")
    st = vt.upsert_pruned(spark, bloomed, ups, ["doc_id"])
    assert st["committed"]
    got = vt.read_where(spark, bloomed, [("doc_id", "==", "doc-00000042")])
    assert [(r.doc_id, r.v) for r in got.collect()] == [("doc-00000042", -5)]


def test_legacy_inline_blooms_still_read(spark, bloomed):
    """Tables committed before the sidecar change carry base64 bitmaps
    INLINE in the log entry — they must keep pruning identically."""
    import base64
    import json
    from pathlib import Path

    for f in sorted((bloomed / "_vlog").glob("v*.json")):
        e = json.loads(f.read_text())
        side = vt._entry_blooms(bloomed, e)
        if not e.get("blooms_file"):
            continue
        e["blooms"] = {
            rel: {
                c: {"bits": b["bits"], "k": b["k"],
                    "b64": base64.b64encode(b["raw"]).decode()}
                for c, b in per.items()
            }
            for rel, per in side.items()
        }
        del e["blooms_file"]
        e.pop("bloom_types", None)  # pre-r8 entries had no dtype record
        f.unlink()
        Path(f).write_text(json.dumps(e, sort_keys=True))
    import shutil

    shutil.rmtree(bloomed / "_blooms")
    rep = vt.zone_map_prune(bloomed, [("doc_id", "==", "doc-00000042")])
    assert rep["skipped_files"] >= 6
    got = vt.read_where(spark, bloomed, [("doc_id", "==", "doc-00000042")])
    assert [(r.doc_id, r.v) for r in got.collect()] == [("doc-00000042", 126)]


def test_vacuum_retires_bloom_sidecars(spark, bloomed):
    vt.optimize(spark, bloomed, num_files=1)
    removed = vt.vacuum(bloomed)
    gone = {r for r in removed if r.startswith("_blooms/")}
    assert gone  # superseded commits' sidecars reclaimed
    live = vt.history(bloomed)[-1]
    assert (bloomed / "_blooms" / live["blooms_file"]).is_file()
