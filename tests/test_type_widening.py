"""Type widening on append (sources/versioned.py, the Delta
type-widening feature's integer/float promotions): a widening append
changes the DECLARED type to the wider one while existing files stay
in place — scans upcast old footers in the parquet reader (Spark 4.x
vectorized reader widening). Narrowing and off-lattice re-typing keep
refusing; a widening commit is a metadata change for the concurrency
matrix and stamps the ``type_widening`` reader feature."""

import json

import pytest

from dataset_dedupe_estimator_spark.sources import versioned as vt


def _ik(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_widening_append_needs_flag(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1, 10)], "k: int, v: int"), num_files=1)
    with pytest.raises(ValueError, match="allow_type_widening"):
        vt.append(root, _ik(spark, [(2, 20)], "k: bigint, v: int"),
                  num_files=1)


def test_widening_append_then_multi_file_scan(spark, tmp_path):
    """int->bigint and float->double appends land; the multi-file scan
    returns the WIDENED dtypes with exact values from both footers."""
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1, 1.5)], "k: int, v: float"), num_files=1)
    vt.append(root, _ik(spark, [(2**40, 2.5)], "k: bigint, v: double"),
              num_files=1, allow_type_widening=True)
    df = vt.read_version(spark, root)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (1, 1.5), (2**40, 2.5)
    ]
    # the next append must match the WIDENED declaration
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, _ik(spark, [(3, 3.5)], "k: int, v: float"),
                  num_files=1)
    vt.append(root, _ik(spark, [(3, 3.5)], "k: bigint, v: double"),
              num_files=1)
    assert vt.read_version(spark, root).count() == 3


def test_narrowing_and_off_lattice_still_refuse(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1,)], "k: bigint"), num_files=1)
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, _ik(spark, [(2,)], "k: int"), num_files=1,
                  allow_type_widening=True)  # narrowing
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(root, _ik(spark, [("x",)], "k: string"), num_files=1,
                  allow_type_widening=True)  # off-lattice


def test_widened_read_where_prunes_and_filters(spark, tmp_path):
    """read_where's multi-path scan takes the explicit declared schema
    too; zone-map pruning still works across mixed-width stats."""
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(i, i) for i in range(10)], "k: int, v: int"),
              num_files=2, stats_columns=["k"])
    vt.append(root, _ik(spark, [(100 + i, i) for i in range(10)],
              "k: bigint, v: int"),
              num_files=2, allow_type_widening=True)
    got = vt.read_where(spark, root, [("k", ">=", 100)])
    assert dict(got.dtypes)["k"] == "bigint"
    assert got.count() == 10
    assert sorted(r.k for r in got.collect()) == list(range(100, 110))


def test_widening_marks_entry_and_reader_feature(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1,)], "k: int"), num_files=1)
    vt.append(root, _ik(spark, [(2,)], "k: bigint"), num_files=1,
              allow_type_widening=True)
    e = vt.history(root)[-1]
    assert e["type_widened"] == {"k": ["int", "bigint"]}
    assert "type_widening" in e["reader_features"]
    assert e["types"]["k"] == "bigint"


def test_widening_conflicts_with_concurrent_append(spark, tmp_path):
    """A landed widening narrowing-protects in-flight writers: their
    staged entry re-publishes the types they validated against."""
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1,)], "k: int"), num_files=1)
    base = vt._snapshot_entries(root)
    prep = vt._stage_commit(
        root, base, _ik(spark, [(9,)], "k: int"), "append", 1,
        None, False, None,
    )
    # a widening append lands while ours is staged
    vt.append(root, _ik(spark, [(2,)], "k: bigint"), num_files=1,
              allow_type_widening=True)
    try:
        with vt.writer_lock(root, wait_seconds=5):
            with pytest.raises(vt.ConcurrentModificationError,
                               match="types were widened"):
                vt._publish_staged(root, base, prep)
    finally:
        import shutil

        shutil.rmtree(prep["stage"], ignore_errors=True)


def test_clone_preserves_widened_read_path(spark, tmp_path):
    """Cloning a widened table hard-links the mixed footers — the
    per-dir types must ride along so the clone's scans keep taking the
    explicit-schema path."""
    root, dst = tmp_path / "src", tmp_path / "dst"
    vt.append(root, _ik(spark, [(1,)], "k: int"), num_files=1)
    vt.append(root, _ik(spark, [(2**40,)], "k: bigint"), num_files=1,
              allow_type_widening=True)
    vt.clone_table(root, dst)
    df = vt.read_version(spark, dst)
    assert dict(df.dtypes) == {"k": "bigint"}
    assert sorted(r.k for r in df.collect()) == [1, 2**40]
    # and the clone keeps refusing narrow appends
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(dst, _ik(spark, [(3,)], "k: int"), num_files=1)


def test_time_travel_below_widening_reads_narrow(spark, tmp_path):
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1,)], "k: int"), num_files=1)
    vt.append(root, _ik(spark, [(2,)], "k: bigint"), num_files=1,
              allow_type_widening=True)
    v0 = vt.read_version(spark, root, 0)
    assert dict(v0.dtypes) == {"k": "int"}
    assert [r.k for r in v0.collect()] == [1]


def test_pre_widening_reader_fails_loudly(spark, tmp_path):
    """A library version without the feature must refuse the table at
    resolve time instead of crashing mid-scan (reader feature gate)."""
    root = tmp_path / "t"
    vt.append(root, _ik(spark, [(1,)], "k: int"), num_files=1)
    vt.append(root, _ik(spark, [(2,)], "k: bigint"), num_files=1,
              allow_type_widening=True)
    # simulate an old reader: future feature name it doesn't know
    p = vt._entry_path(root, 1)
    e = json.loads(p.read_text())
    assert "type_widening" in e["reader_features"]
    e["reader_features"] = ["type_widening_v9"]
    p.write_text(json.dumps(e))
    with pytest.raises(ValueError, match="reader features"):
        vt.read_version(spark, root)
    # time travel BELOW the unknown feature still works
    assert vt.read_version(spark, root, 0).count() == 1


def test_struct_leaf_and_array_element_widening(spark, tmp_path):
    """The lattice descends into struct fields and array elements:
    int->bigint inside a struct and float->double inside an array widen
    under the flag; a struct whose FIELD NAMES change stays refused."""
    root = tmp_path / "t"
    vt.append(
        root,
        spark.createDataFrame(
            [(1, {"a": 10, "b": 1.5}, [1.5])],
            "k: long, m: struct<a: int, b: float>, xs: array<float>",
        ),
        num_files=1,
    )
    vt.append(
        root,
        spark.createDataFrame(
            [(2, {"a": 2**40, "b": 2.5}, [2.5])],
            "k: long, m: struct<a: bigint, b: double>, xs: array<double>",
        ),
        num_files=1, allow_type_widening=True,
    )
    df = vt.read_version(spark, root)
    assert dict(df.dtypes)["m"] == "struct<a:bigint,b:double>"
    assert dict(df.dtypes)["xs"] == "array<double>"
    got = sorted((r.k, r.m.a, r.m.b, tuple(r.xs)) for r in df.collect())
    assert got == [(1, 10, 1.5, (1.5,)), (2, 2**40, 2.5, (2.5,))]
    # renaming a field by appending differently-shaped structs refuses
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(
            root,
            spark.createDataFrame(
                [(3, {"a": 1, "c": 1.0}, [0.0])],
                "k: long, m: struct<a: bigint, c: double>, "
                "xs: array<double>",
            ),
            num_files=1, allow_type_widening=True,
        )
    # narrowing a leaf refuses even under the flag
    with pytest.raises(ValueError, match="type mismatch"):
        vt.append(
            root,
            spark.createDataFrame(
                [(4, {"a": 1, "b": 1.0}, [0.0])],
                "k: long, m: struct<a: int, b: double>, xs: array<double>",
            ),
            num_files=1, allow_type_widening=True,
        )


def test_cli_append_allow_type_widening(spark, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    root = str(tmp_path / "t")
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    _ik(spark, [(1, 10)], "k: int, v: int").write.parquet(src1)
    _ik(spark, [(2, 2**40)], "k: int, v: bigint").write.parquet(src2)
    assert main(["table", "append", root, src1]) == 0
    # refused without the flag (exit via exception -> nonzero/raise)
    with pytest.raises(ValueError, match="allow_type_widening"):
        main(["table", "append", root, src2])
    assert main(["table", "append", root, src2,
                 "--allow-type-widening"]) == 0
    assert vt.read_version(spark, root).count() == 2
