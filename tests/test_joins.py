"""asof_join operator semantics: inclusive/strict matching, missing
matches, column collision suffixing; range_join_bucket containment."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.operators.joins import asof_join, range_join_bucket


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("B", 15, 9.0)],
        "sym string, t long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 5), ("A", 10), ("A", 25), ("B", 14), ("C", 9)],
        "sym string, t long",
    )


def test_asof_inclusive(spark, trades, quotes):
    out = {
        (r.sym, r.t): r.px
        for r in asof_join(trades, quotes, "sym", "t", "t").collect()
    }
    assert out[("A", 5)] is None  # nothing at-or-before
    assert out[("A", 10)] == 1.0  # equal time matches (inclusive)
    assert out[("A", 25)] == 2.0  # latest earlier
    assert out[("B", 14)] is None
    assert out[("C", 9)] is None  # key absent from right


def test_asof_strict(spark, trades, quotes):
    out = {
        (r.sym, r.t): r.px
        for r in asof_join(trades, quotes, "sym", "t", "t", strict=True).collect()
    }
    assert out[("A", 10)] is None  # equal time excluded under strict
    assert out[("A", 25)] == 2.0


def test_asof_column_suffix(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "t", "t")
    assert "t_right" in out.columns  # collision suffixed
    assert out.count() == trades.count()  # left join semantics


def test_range_join_bucket(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 99.0)], "id long, v double")
    buckets = spark.createDataFrame(
        [(0.0, 10.0, "lo"), (10.0, 20.0, "hi")], "lo double, hi double, band string"
    )
    out = {r.id: r.band for r in range_join_bucket(fact, buckets, F.col("v")).collect()}
    assert out == {1: "lo", 2: "hi", 3: None}
