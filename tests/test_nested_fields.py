"""Nested-field support in the versioned table layer: struct and list
columns are first-class payloads (the reference's synthetic generator
produces them — de/synthetic.py:118-128); dotted struct paths of ANY
depth (r10: one level; r11: recursive) participate in per-file zone
maps, read_where predicates, and path-based rename/drop (the realistic
subset of Delta's field-ID column mapping)."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources import versioned as vt

_DDL = "k: long, meta: struct<score: long, lang: string>, tags: array<string>"


def _df(spark, rows):
    return spark.createDataFrame(rows, _DDL)


def _row(k, score, lang, tags):
    return (k, {"score": score, "lang": lang}, tags)


@pytest.fixture()
def table(spark, tmp_path):
    """Two commits, nested stats on meta.score: v0 scores 0..9,
    v1 scores 100..109."""
    root = tmp_path / "tbl"
    vt.append(
        root,
        _df(spark, [_row(i, i, "en", ["a", "b"]) for i in range(10)]),
        num_files=2, stats_columns=["meta.score"],
    )
    vt.append(
        root,
        _df(spark, [_row(100 + i, 100 + i, "de", ["c"]) for i in range(10)]),
        num_files=2,
    )
    return root


def test_struct_and_list_passthrough(spark, table):
    df = vt.read_version(spark, table)
    assert df.count() == 20
    got = df.filter(F.col("k") == 3).collect()[0]
    assert got.meta.score == 3 and got.meta.lang == "en"
    assert got.tags == ["a", "b"]
    assert dict(df.dtypes)["meta"] == "struct<score:bigint,lang:string>"
    assert dict(df.dtypes)["tags"] == "array<string>"


def test_nested_zone_maps_prune_files(spark, table):
    rep = vt.zone_map_prune(table, [("meta.score", ">=", 100)])
    # all of v0's files provably miss — only v1's survive
    assert rep["skipped_files"] == 2 and rep["kept_files"] == 2
    got = vt.read_where(spark, table, [("meta.score", ">=", 100)])
    assert got.count() == 10
    assert sorted(r.k for r in got.collect()) == list(range(100, 110))


def test_rename_leaf_metadata_only(spark, table):
    st = vt.rename_column(table, "meta.lang", "meta.language")
    assert st["action"] == "rename_column"
    df = vt.read_version(spark, table)
    assert dict(df.dtypes)["meta"] == "struct<score:bigint,language:string>"
    assert df.filter(F.col("meta.language") == "de").count() == 10
    # time travel below the rename sees the old leaf name
    v1 = vt.read_version(spark, table, 1)
    assert dict(v1.dtypes)["meta"] == "struct<score:bigint,lang:string>"
    # appends speak the NEW leaf name and round-trip through physical
    vt.append(
        table,
        spark.createDataFrame(
            [(500, {"score": 500, "language": "fr"}, [])],
            "k: long, meta: struct<score: long, language: string>, "
            "tags: array<string>",
        ),
        num_files=1,
    )
    df = vt.read_version(spark, table)
    assert df.filter(F.col("meta.language") == "fr").count() == 1
    assert df.count() == 21
    # renaming back to the physical name drops the mapping
    vt.rename_column(table, "meta.language", "meta.lang")
    assert not vt._column_mapping(vt._committed_entries(table))


def test_rename_leaf_composes_with_parent_rename(spark, table):
    vt.rename_column(table, "meta", "info")
    vt.rename_column(table, "info.lang", "info.language")
    df = vt.read_version(spark, table)
    assert dict(df.dtypes)["info"] == "struct<score:bigint,language:string>"
    assert df.filter(F.col("info.language") == "en").count() == 10
    vt.append(
        table,
        spark.createDataFrame(
            [(600, {"score": 600, "language": "it"}, [])],
            "k: long, info: struct<score: long, language: string>, "
            "tags: array<string>",
        ),
        num_files=1,
    )
    assert vt.read_version(spark, table).filter(
        F.col("info.language") == "it"
    ).count() == 1
    # and the reverse order: leaf first, then the parent
    vt.rename_column(table, "info.score", "info.points")
    vt.rename_column(table, "info", "detail")
    df = vt.read_version(spark, table)
    assert dict(df.dtypes)["detail"] == (
        "struct<points:bigint,language:string>"
    )
    assert df.filter(F.col("detail.points") >= 100).count() == 11
    # nested stats keep pruning through both renames (logical path)
    rep = vt.zone_map_prune(table, [("detail.points", ">=", 100)])
    assert rep["skipped_files"] >= 2


def test_drop_leaf_hides_and_retires(spark, table):
    vt.drop_column(table, "meta.lang")
    df = vt.read_version(spark, table)
    assert dict(df.dtypes)["meta"] == "struct<score:bigint>"
    # time travel below the drop still reads it
    v1 = vt.read_version(spark, table, 1)
    assert "lang" in dict(v1.dtypes)["meta"]
    # appends without the dropped leaf pass the type guard
    vt.append(
        table,
        spark.createDataFrame(
            [(700, {"score": 700}, ["z"])],
            "k: long, meta: struct<score: long>, tags: array<string>",
        ),
        num_files=1,
    )
    assert vt.read_version(spark, table).count() == 21
    # ... and frames still carrying the retired field are refused
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(
            table,
            _df(spark, [_row(701, 701, "xx", [])]),
            num_files=1,
        )
    # predicates on the dropped path are refused (no resurrection)
    with pytest.raises(ValueError, match="not in the table schema"):
        vt.zone_map_prune(table, [("meta.lang", "==", "en")])


def test_drop_leaf_refusals(spark, table):
    with pytest.raises(ValueError, match="not in table schema"):
        vt.drop_column(table, "nosuch.leaf")
    with pytest.raises(ValueError, match="not in table schema"):
        vt.drop_column(table, "meta.nosuch")
    vt.drop_column(table, "meta.lang")
    with pytest.raises(ValueError, match="only field"):
        vt.drop_column(table, "meta.score")
    with pytest.raises(ValueError, match="not a struct"):
        vt.drop_column(table, "k.x")


def test_rename_leaf_refusals(spark, table):
    with pytest.raises(ValueError, match="inside its struct"):
        vt.rename_column(table, "meta.lang", "other.lang")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column(table, "meta.lang", "meta.score")
    with pytest.raises(ValueError, match="not in table schema"):
        vt.rename_column(table, "meta.nosuch", "meta.x")
    vt.rename_column(table, "meta.lang", "meta.language")
    # the retired physical name may not be re-taken by another leaf
    with pytest.raises(ValueError, match="PHYSICAL"):
        vt.rename_column(table, "meta.score", "meta.lang")


def test_nested_rename_then_restore_and_clone(spark, tmp_path):
    """Names are table metadata, not live-set state: a restore keeps
    the rename; a clone carries the mapping."""
    root, dst = tmp_path / "src", tmp_path / "dst"
    vt.append(
        root, _df(spark, [_row(1, 1, "en", [])]), num_files=1,
    )
    vt.append(root, _df(spark, [_row(2, 2, "de", [])]), num_files=1)
    vt.rename_column(root, "meta.lang", "meta.language")
    vt.restore(spark, root, 0)
    df = vt.read_version(spark, root)
    assert dict(df.dtypes)["meta"] == "struct<score:bigint,language:string>"
    assert df.count() == 1
    vt.clone_table(root, dst)
    dfc = vt.read_version(spark, dst)
    assert dict(dfc.dtypes)["meta"] == "struct<score:bigint,language:string>"
    assert dfc.count() == 1


def test_stream_projects_nested_rename_and_drop(spark, table, tmp_path):
    """The streaming source serves LOGICAL leaf names and hides dropped
    leaves, matching read_version (parity for the stream surface)."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    vt.rename_column(table, "meta.lang", "meta.language")
    vt.drop_column(table, "meta.score")
    out = tmp_path / "out"

    q = (
        spark.readStream.format("versioned_table")
        .load(str(table))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    assert dict(got.dtypes)["meta"] == "struct<language:string>"
    assert got.count() == 20
    assert got.filter(F.col("meta.language") == "de").count() == 10


def test_change_feed_projects_nested_rename_and_drop(spark, tmp_path):
    """read_change_feed serves logical leaf names and hides dropped
    leaves like every other read surface."""
    root = tmp_path / "t"
    vt.append(
        root, _df(spark, [_row(i, i, "en", []) for i in range(6)]),
        num_files=1, stats_columns=["k"], change_feed=True,
    )
    vt.rename_column(root, "meta.lang", "meta.language")
    vt.delete_where_pruned(spark, root, [("k", "==", 2)])
    vt.drop_column(root, "meta.score")
    vt.delete_where_pruned(spark, root, [("k", "==", 4)])
    feed = vt.read_change_feed(spark, root, 1)
    assert dict(feed.dtypes)["meta"] == "struct<language:string>"
    got = sorted((r.k, r.meta.language, r._change) for r in feed.collect())
    assert got == [(2, "en", "delete"), (4, "en", "delete")]


def test_nested_constraints(spark, table):
    """CHECK / NOT NULL constraints accept one-level struct paths: the
    predicate language and enforcement already speak F.col('a.b');
    dropping a constrained leaf refuses first."""
    vt.set_constraints(
        table, not_null=["meta.lang"], checks=[("meta.score", ">=", 0)],
    )
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(table, _df(spark, [_row(900, -1, "en", [])]), num_files=1)
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(table, _df(spark, [(901, {"score": 1, "lang": None}, [])]),
                  num_files=1)
    vt.append(table, _df(spark, [_row(902, 5, "fr", [])]), num_files=1)
    assert vt.read_version(spark, table).count() == 21
    with pytest.raises(ValueError, match="referenced by an active"):
        vt.drop_column(table, "meta.lang")
    # constraints on a RENAMED leaf path translate to physical
    vt.rename_column(table, "meta.score", "meta.points")
    vt.set_constraints(table, checks=[("meta.points", "<=", 1000)])
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(
            table,
            spark.createDataFrame(
                [(903, {"points": 2000, "lang": "de"}, [])],
                "k: long, meta: struct<points: long, lang: string>, "
                "tags: array<string>",
            ),
            num_files=1,
        )


def test_nested_bloom_pruning(spark, tmp_path):
    """Per-file Bloom bitmaps accept one-level struct paths too: a
    string leaf gets point-lookup pruning that zone maps refuse for
    strings."""
    root = tmp_path / "t"
    vt.append(
        root,
        _df(spark, [_row(i, i, f"lang{i}", []) for i in range(8)]),
        num_files=4, bloom_columns=["meta.lang"], bloom_bits=4096,
    )
    rep = vt.zone_map_prune(root, [("meta.lang", "==", "lang3")])
    assert rep["skipped_files"] >= 2  # bloom-pruned, not full-scanned
    got = vt.read_where(spark, root, [("meta.lang", "==", "lang3")])
    assert [(r.k, r.meta.lang) for r in got.collect()] == [(3, "lang3")]
    # a value provably in no file prunes everything
    rep2 = vt.zone_map_prune(root, [("meta.lang", "==", "nope")])
    assert rep2["kept_files"] == 0


_DEEP_DDL = (
    "k: long, outer: struct<inner: struct<x: long, s: string>, w: long>, "
    "items: array<struct<v: long>>"
)


def _deep_df(spark, rows):
    """rows: (k, x, s, w) -> depth-2 struct-of-struct + list-of-struct."""
    return spark.createDataFrame(
        [(k, {"inner": {"x": x, "s": s}, "w": w}, [{"v": k}, {"v": k + 1}])
         for k, x, s, w in rows],
        _DEEP_DDL,
    )


@pytest.fixture()
def deep_table(spark, tmp_path):
    """Two commits with depth-2 zone maps on outer.inner.x: v0 x 0..9,
    v1 x 100..109."""
    root = tmp_path / "deep"
    vt.append(
        root,
        _deep_df(spark, [(i, i, "en", i * 10) for i in range(10)]),
        num_files=2, stats_columns=["outer.inner.x"],
    )
    vt.append(
        root,
        _deep_df(spark, [(100 + i, 100 + i, "de", i) for i in range(10)]),
        num_files=2,
    )
    return root


def test_deep_nested_zone_maps_prune(spark, deep_table):
    """Depth-2 struct paths carry per-file zone maps and prune files
    exactly like one-level paths (r11; the reference's synthetic schema
    recursion is unbounded — de/synthetic.py:118-128)."""
    rep = vt.zone_map_prune(deep_table, [("outer.inner.x", ">=", 100)])
    assert rep["skipped_files"] == 2 and rep["kept_files"] == 2
    got = vt.read_where(spark, deep_table, [("outer.inner.x", ">=", 100)])
    assert sorted(r.k for r in got.collect()) == list(range(100, 110))
    # list-of-struct rides along as an opaque payload
    row = got.filter(F.col("k") == 105).collect()[0]
    assert [e.v for e in row.items] == [105, 106]


def test_deep_rename_and_drop(spark, deep_table):
    """Deep rename is metadata-only and composes with ancestor
    renames; deep drop hides the leaf and keeps pruning the rest."""
    vt.rename_column(deep_table, "outer.inner.x", "outer.inner.score")
    df = vt.read_version(spark, deep_table)
    assert dict(df.dtypes)["outer"] == (
        "struct<inner:struct<score:bigint,s:string>,w:bigint>"
    )
    assert df.filter(F.col("outer.inner.score") >= 100).count() == 10
    # time travel below the rename sees the old leaf name
    assert "x:" in dict(vt.read_version(spark, deep_table, 1).dtypes)["outer"]
    # renamed path keeps pruning (logical -> physical through the map)
    rep = vt.zone_map_prune(deep_table, [("outer.inner.score", ">=", 100)])
    assert rep["skipped_files"] == 2
    # appends speak the NEW deep name and round-trip through physical
    vt.append(
        deep_table,
        spark.createDataFrame(
            [(500, {"inner": {"score": 500, "s": "fr"}, "w": 1}, [])],
            "k: long, outer: struct<inner: struct<score: long, s: string>, "
            "w: long>, items: array<struct<v: long>>",
        ),
        num_files=1,
    )
    snap = vt.read_version(spark, deep_table)
    assert snap.filter(F.col("outer.inner.score") == 500).count() == 1
    # drop the OTHER deep leaf: hidden from reads, predicates refused
    vt.drop_column(deep_table, "outer.inner.s")
    df2 = vt.read_version(spark, deep_table)
    assert dict(df2.dtypes)["outer"] == (
        "struct<inner:struct<score:bigint>,w:bigint>"
    )
    with pytest.raises(ValueError, match="not in the table schema"):
        vt.zone_map_prune(deep_table, [("outer.inner.s", "==", "en")])
    # time travel below the drop still reads it
    assert "s:string" in dict(
        vt.read_version(spark, deep_table, 1).dtypes
    )["outer"]


def test_deep_rename_of_intermediate_rekeys_descendants(spark, deep_table):
    """Renaming an intermediate struct field moves the logical prefix
    of everything beneath it (mapping re-key), composing in any
    order with leaf renames above and below."""
    vt.rename_column(deep_table, "outer.inner.x", "outer.inner.score")
    vt.rename_column(deep_table, "outer.inner", "outer.detail")
    df = vt.read_version(spark, deep_table)
    assert dict(df.dtypes)["outer"] == (
        "struct<detail:struct<score:bigint,s:string>,w:bigint>"
    )
    assert df.filter(F.col("outer.detail.score") >= 100).count() == 10
    # pruning follows the twice-renamed path
    rep = vt.zone_map_prune(deep_table, [("outer.detail.score", ">=", 100)])
    assert rep["skipped_files"] == 2
    # and the top-level parent rename composes on top
    vt.rename_column(deep_table, "outer", "o2")
    df2 = vt.read_version(spark, deep_table)
    assert df2.filter(F.col("o2.detail.score") >= 100).count() == 10
    rep2 = vt.zone_map_prune(deep_table, [("o2.detail.score", ">=", 100)])
    assert rep2["skipped_files"] == 2
    # appends under the fully-renamed deep path round-trip
    vt.append(
        deep_table,
        spark.createDataFrame(
            [(600, {"detail": {"score": 600, "s": "it"}, "w": 2}, [])],
            "k: long, o2: struct<detail: struct<score: long, s: string>, "
            "w: long>, items: array<struct<v: long>>",
        ),
        num_files=1,
    )
    assert vt.read_version(spark, deep_table).filter(
        F.col("o2.detail.score") == 600
    ).count() == 1


def test_drop_intermediate_struct_drops_subtree(spark, deep_table):
    """Dropping an intermediate struct field retires its whole
    subtree: reads hide it, predicates beneath it refuse, stats shed."""
    vt.rename_column(deep_table, "outer.inner.x", "outer.inner.score")
    vt.drop_column(deep_table, "outer.inner")
    df = vt.read_version(spark, deep_table)
    assert dict(df.dtypes)["outer"] == "struct<w:bigint>"
    with pytest.raises(ValueError, match="not in the table schema"):
        vt.zone_map_prune(deep_table, [("outer.inner.score", ">=", 100)])
    # appends without the dropped subtree pass the type guard
    vt.append(
        deep_table,
        spark.createDataFrame(
            [(700, {"w": 7}, [])],
            "k: long, outer: struct<w: long>, "
            "items: array<struct<v: long>>",
        ),
        num_files=1,
    )
    assert vt.read_version(spark, deep_table).count() == 21
    # frames still carrying the retired subtree are refused
    with pytest.raises(ValueError, match="DROPPED"):
        vt.append(
            deep_table,
            _deep_df(spark, [(701, 1, "xx", 0)]),
            num_files=1,
        )


def test_deep_type_widening(spark, tmp_path):
    """allow_type_widening promotes leaves at depth 2 (int -> bigint
    inside struct-of-struct) like top-level columns."""
    root = tmp_path / "w"
    ddl_narrow = "k: long, outer: struct<inner: struct<x: int>>"
    ddl_wide = "k: long, outer: struct<inner: struct<x: long>>"
    vt.append(
        root,
        spark.createDataFrame([(1, {"inner": {"x": 1}})], ddl_narrow),
        num_files=1,
    )
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(
            root,
            spark.createDataFrame([(2, {"inner": {"x": 2}})], ddl_wide),
            num_files=1,
        )
    vt.append(
        root,
        spark.createDataFrame([(2, {"inner": {"x": 2}})], ddl_wide),
        num_files=1, allow_type_widening=True,
    )
    snap = vt.read_version(spark, root)
    assert dict(snap.dtypes)["outer"] == "struct<inner:struct<x:bigint>>"
    assert sorted(r.outer.inner.x for r in snap.collect()) == [1, 2]


def test_array_element_paths_refuse(spark, tmp_path):
    """Paths never descend through arrays: an array<struct<...>>
    element is an opaque payload — stats/rename/drop on it refuse."""
    root = tmp_path / "t"
    vt.append(
        root,
        spark.createDataFrame(
            [(1, [{"v": 1}])], "k: long, items: array<struct<v: long>>"
        ),
        num_files=1,
    )
    with pytest.raises(ValueError, match="not in commit schema"):
        vt.append(
            root,
            spark.createDataFrame(
                [(2, [{"v": 2}])], "k: long, items: array<struct<v: long>>"
            ),
            num_files=1, stats_columns=["items.v"],
        )
    with pytest.raises(ValueError, match="not a struct"):
        vt.rename_column(root, "items.v", "items.w")
    with pytest.raises(ValueError, match="not a struct"):
        vt.drop_column(root, "items.v")


def test_stream_projects_deep_nested_rename_and_drop(spark, deep_table, tmp_path):
    """The streaming source serves LOGICAL names and hides dropped
    fields at ANY depth, matching read_version (r11: the projector and
    the derived schema both recurse)."""
    from dataset_dedupe_estimator_spark.sources.table_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    vt.rename_column(deep_table, "outer.inner.x", "outer.inner.score")
    vt.rename_column(deep_table, "outer.inner", "outer.core")
    vt.drop_column(deep_table, "outer.core.s")
    out = tmp_path / "out"
    q = (
        spark.readStream.format("versioned_table")
        .load(str(deep_table))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    assert dict(got.dtypes)["outer"] == (
        "struct<core:struct<score:bigint>,w:bigint>"
    )
    assert got.count() == 20
    assert got.filter(F.col("outer.core.score") >= 100).count() == 10
    # parity with the batch surface
    snap = vt.read_version(spark, deep_table)
    assert dict(snap.dtypes)["outer"] == dict(got.dtypes)["outer"]
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in snap.collect()
    )


def test_deep_delete_constraints_and_drop_guard(spark, tmp_path):
    """Depth-2 paths work across the WRITE surfaces too (r11): pruned
    DELETE on a deep predicate, CHECK/NOT NULL constraints on deep
    leaves (enforced through a later deep rename — physical
    translation), and the constrained-leaf drop guard at depth."""
    root = tmp_path / "t"
    ddl = "k: long, o: struct<inner: struct<x: long, s: string>>"
    df = spark.createDataFrame(
        [(i, {"inner": {"x": i, "s": "en"}}) for i in range(20)], ddl
    )
    vt.append(
        root, df.repartitionByRange(4, F.col("o.inner.x")),
        stats_columns=["o.inner.x"],
    )
    st = vt.delete_where_pruned(spark, root, [("o.inner.x", ">=", 15)])
    assert st["deleted_rows"] == 5
    snap = vt.read_version(spark, root)
    assert snap.count() == 15
    assert snap.agg(F.max("o.inner.x")).collect()[0][0] == 14
    vt.set_constraints(
        root, checks=[("o.inner.x", ">=", 0)], not_null=["o.inner.s"],
    )
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(
            root,
            spark.createDataFrame([(99, {"inner": {"x": -1, "s": "d"}})], ddl),
            num_files=1,
        )
    vt.append(
        root,
        spark.createDataFrame([(99, {"inner": {"x": 5, "s": "d"}})], ddl),
        num_files=1,
    )
    assert vt.read_version(spark, root).count() == 16
    # constraints keep firing through a deep rename (logical -> frozen
    # physical translation)
    vt.rename_column(root, "o.inner.x", "o.inner.score")
    with pytest.raises(ValueError, match="constraint violation"):
        vt.append(
            root,
            spark.createDataFrame(
                [(100, {"inner": {"score": -2, "s": "d"}})],
                "k: long, o: struct<inner: struct<score: long, s: string>>",
            ),
            num_files=1,
        )
    with pytest.raises(ValueError, match="active"):
        vt.drop_column(root, "o.inner.score")


def test_deep_cdf_projects_renames(spark, tmp_path):
    """read_change_feed serves logical DEEP names and hides dropped
    deep leaves like every other read surface."""
    root = tmp_path / "t"
    ddl = "k: long, o: struct<inner: struct<x: long, s: string>>"
    vt.append(
        root,
        spark.createDataFrame(
            [(i, {"inner": {"x": i, "s": "en"}}) for i in range(6)], ddl
        ),
        num_files=1, stats_columns=["k"], change_feed=True,
    )
    vt.rename_column(root, "o.inner.x", "o.inner.score")
    vt.delete_where_pruned(spark, root, [("k", "==", 2)])
    vt.drop_column(root, "o.inner.s")
    vt.delete_where_pruned(spark, root, [("k", "==", 4)])
    feed = vt.read_change_feed(spark, root, 1)
    assert dict(feed.dtypes)["o"] == "struct<inner:struct<score:bigint>>"
    got = sorted((r.k, r.o.inner.score, r._change) for r in feed.collect())
    assert got == [(2, 2, "delete"), (4, 4, "delete")]


def test_optimize_zorders_on_deep_nested_path(spark, deep_table):
    """optimize(zorder_by=[deep path]) re-clusters on a depth-2 leaf
    and the re-collected zone maps prune on it (r11: positional
    normalizer aliases — dotted paths used to collide with struct
    access)."""
    # scatter the rows first so clustering has work to do
    vt.optimize(
        spark, deep_table, zorder_by=["outer.inner.x"], num_files=4,
        stats_columns=["outer.inner.x"],
    )
    rep = vt.zone_map_prune(deep_table, [("outer.inner.x", ">=", 100)])
    assert rep["skipped_files"] >= 2, rep
    got = vt.read_where(spark, deep_table, [("outer.inner.x", ">=", 100)])
    assert sorted(r.k for r in got.collect()) == list(range(100, 110))


def test_delete_with_survivors_keeps_nested_stats(spark, tmp_path):
    """r11 fix: a pruned DELETE whose rewritten files have SURVIVORS
    used to KeyError recording stats_types for a nested stats column
    (flat dtypes dict lookup); the rewritten directory now records the
    nested zone maps and post-delete pruning still works."""
    root = tmp_path / "t"
    ddl = "k: long, o: struct<inner: struct<x: long>>"
    df = spark.createDataFrame(
        [(i, {"inner": {"x": i}}) for i in range(20)], ddl
    )
    vt.append(
        root, df.repartitionByRange(4, F.col("o.inner.x")),
        stats_columns=["o.inner.x"],
    )
    st = vt.delete_where_pruned(
        spark, root, [("o.inner.x", "between", (14, 16))]
    )
    assert st["deleted_rows"] == 3
    last = vt._committed_entries(root)[-1]
    assert last.get("stats_types") == {"o.inner.x": "bigint"}
    assert "stats" in last  # per-file zone maps on the rewritten dir
    assert vt.read_version(spark, root).count() == 17
    rep = vt.zone_map_prune(root, [("o.inner.x", "<=", 3)])
    assert rep["skipped_files"] >= 1
