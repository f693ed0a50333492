"""Z-order layout: Morton key correctness + measured row-group pruning.

The claim under test is the one that matters at 100 TB: writing a table
clustered on the Morton key of (partkey, suppkey) makes a conjunctive
band filter over BOTH dimensions touch a small fraction of row groups,
strictly better than the natural layout and than a single-column sort,
as computed from the real parquet footer stats a pruning reader uses.
"""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.layout import (
    pruning_fraction,
    rowgroup_ranges,
    write_zordered,
    zvalue,
    zvalue_sql,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    z = 0
    for d, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + d)
    return z


def test_zvalue_matches_bitwise_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 511, 1023) for b in (0, 2, 77, 1023)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    got = df.select("a", "b", zvalue([F.col("a"), F.col("b")], 10)).collect()
    for r in got:
        assert r.zvalue == _morton_ref([r.a, r.b], 10), (r.a, r.b)


def test_zvalue_sql_matches_spark(spark):
    import duckdb

    rows = [(a, b) for a in (0, 3, 100, 1023) for b in (1, 64, 1000)]
    df = spark.createDataFrame(rows, "a: long, b: long")
    spark_z = {
        (r.a, r.b): r.zvalue
        for r in df.select("a", "b", zvalue([F.col("a"), F.col("b")], 10)).collect()
    }
    for (a, b), z in spark_z.items():
        duck = duckdb.sql(
            f"SELECT {zvalue_sql([str(a), str(b)], 10)}"
        ).fetchone()[0]
        assert duck == z


def test_zvalue_property_random(spark):
    """Random dims/bits/values: Spark zvalue == bitwise reference ==
    DuckDB zvalue_sql. One createDataFrame per case batch (hypothesis
    over Spark is slow, so cases are drawn once with a fixed seed)."""
    import random

    import duckdb

    rng = random.Random(20260814)
    for _ in range(12):
        ndims = rng.choice([1, 2, 3, 4])
        bits = rng.randint(2, 62 // ndims)
        vals = [
            tuple(rng.randrange(1 << bits) for _ in range(ndims))
            for _ in range(8)
        ]
        schema = ", ".join(f"c{d}: long" for d in range(ndims))
        df = spark.createDataFrame(vals, schema)
        cols = [F.col(f"c{d}") for d in range(ndims)]
        got = df.select(*[f"c{d}" for d in range(ndims)], zvalue(cols, bits)).collect()
        for r in got:
            tup = [r[f"c{d}"] for d in range(ndims)]
            assert r.zvalue == _morton_ref(tup, bits), (ndims, bits, tup)
            duck = duckdb.sql(
                f"SELECT {zvalue_sql([str(v) for v in tup], bits)}"
            ).fetchone()[0]
            assert duck == r.zvalue


def test_zvalue_exact_above_double_precision(spark):
    """Values past 2^53 must interleave exactly — a double-division bit
    extraction silently rounds there (the regression this pins)."""
    import duckdb

    vals = [(1 << 62) - 1, (1 << 61) + 1, (1 << 53) + 1]
    df = spark.createDataFrame([(v,) for v in vals], "a: long")
    got = {r.a: r.zvalue for r in df.select("a", zvalue([F.col("a")], 62)).collect()}
    for v in vals:
        assert got[v] == v  # 1-D Morton with full bits is the identity
        assert duckdb.sql(f"SELECT {zvalue_sql([str(v)], 62)}").fetchone()[0] == v


def test_zvalue_rejects_overflow():
    with pytest.raises(ValueError):
        zvalue([F.col("a")] * 4, bits=16)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    """lineitem written three ways: natural, partkey-sorted, z-ordered."""
    root = tmp_path_factory.mktemp("layout")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    # 64 output files: at coarser granularity (e.g. 16) the Morton grid is
    # 4x4 and a narrow single-column band can tie or beat it; pruning wins
    # need tiles finer than the filter bands (true at 100 TB, where row
    # groups are ~thousands per file).
    n_files = 64
    natural = str(root / "natural")
    li.repartition(n_files).write.mode("overwrite").parquet(natural)
    bysort = str(root / "partkey_sorted")
    li.repartitionByRange(n_files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(bysort)
    zordered = str(root / "zordered")
    write_zordered(li, ["l_partkey", "l_suppkey"], zordered, num_files=n_files)
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    return natural, bysort, zordered, bounds


def _band(lo, hi, frac=0.1):
    width = max(1, int((hi - lo + 1) * frac))
    mid = (lo + hi) // 2
    return mid, mid + width - 1


def test_zorder_prunes_conjunctive_bands(layouts):
    natural, bysort, zordered, b = layouts
    part_band = _band(b[0], b[1])
    supp_band = _band(b[2], b[3])
    preds = {"l_partkey": part_band, "l_suppkey": supp_band}
    f_nat = pruning_fraction(natural, preds)
    f_sorted = pruning_fraction(bysort, preds)
    f_z = pruning_fraction(zordered, preds)
    # natural layout: every row group spans the whole key space -> ~no pruning
    assert f_nat > 0.9
    # z-order must beat the unsorted layout decisively on the 2-D filter
    assert f_z < 0.5 * f_nat
    # and be at least as good as the single-column sort (which cannot
    # prune on l_suppkey at all)
    assert f_z <= f_sorted


def test_zorder_prunes_second_dimension(layouts):
    """A filter on the NON-sort column: the 1-D sort prunes nothing,
    z-order still skips most row groups."""
    natural, bysort, zordered, b = layouts
    preds = {"l_suppkey": _band(b[2], b[3])}
    assert pruning_fraction(natural, preds) > 0.9
    assert pruning_fraction(bysort, preds) > 0.9
    assert pruning_fraction(zordered, preds) < 0.5


def test_zorder_tightens_both_dimensions(layouts):
    natural, _bysort, zordered, b = layouts
    for col, lo, hi in (("l_partkey", b[0], b[1]), ("l_suppkey", b[2], b[3])):
        span = hi - lo + 1
        nat_spans = [mx - mn + 1 for mn, mx in rowgroup_ranges(natural, col)]
        z_spans = [mx - mn + 1 for mn, mx in rowgroup_ranges(zordered, col)]
        # natural row groups cover ~the full domain; z-ordered ones are
        # materially tighter on EVERY participating dimension
        assert sum(nat_spans) / len(nat_spans) > 0.8 * span
        assert sum(z_spans) / len(z_spans) < 0.6 * span


def test_cli_layout(capsys, spark, sf_dir, tmp_path):
    from dataset_dedupe_estimator_spark.cli import main

    out_dir = str(tmp_path / "li_z")
    rc = main([
        "layout", f"{sf_dir}/lineitem.parquet", out_dir,
        "--by", "l_partkey", "--by", "l_suppkey", "--files", "32",
        "--band", "l_partkey:100:119", "--band", "l_suppkey:4:4",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "l_partkey" in out and "l_suppkey" in out
    assert "row groups scanned" in out
    before, after = (
        float(s.rstrip("%")) for s in
        [t for t in out.split() if t.endswith("%") and ":" not in t][-2:]
    )
    assert after < before


def test_zordered_write_preserves_rows(spark, sf_dir, layouts):
    _natural, _bysort, zordered, _b = layouts
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    written = spark.read.parquet(zordered)
    assert written.count() == li.count()
    assert set(written.columns) == {"l_partkey", "l_suppkey", "l_quantity"}
    got = written.agg(F.sum("l_partkey"), F.sum("l_suppkey")).first()
    want = li.agg(F.sum("l_partkey"), F.sum("l_suppkey")).first()
    assert tuple(got) == tuple(want)
