"""Declarative constraint compiler (operators/quality_checks.py)."""

import pytest

from dataset_dedupe_estimator_spark.operators.quality_checks import Check, run_checks


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [(1, 5.0, "en"), (2, -1.0, "en"), (2, 150.0, "xx"), (4, None, None)],
        "id bigint, v double, lang string",
    )


def test_violation_counts(spark, messy):
    checks = [
        Check("v", "min", (0,)),        # -1.0 violates; NULL does not
        Check("v", "max", (100,)),      # 150.0 violates
        Check("v", "not_null"),         # one NULL
        Check("lang", "in_set", ("en", "de")),  # 'xx'; NULL exempt
        Check("lang", "matches", ("^[a-z]{2}$",)),  # all non-null match
        Check("id", "unique"),          # id=2 twice → 1 excess
    ]
    rows = {r.check_id: r for r in run_checks(messy, "messy", checks).collect()}
    assert rows["v:min(0)"].n_violations == 1
    assert rows["v:max(100)"].n_violations == 1
    assert rows["v:not_null"].n_violations == 1
    assert rows["lang:in_set(en,de)"].n_violations == 1
    assert rows["lang:matches(^[a-z]{2}$)"].n_violations == 0
    assert rows["id:unique"].n_violations == 1
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["lang:matches(^[a-z]{2}$)"].passed
    assert not rows["id:unique"].passed


def test_all_checks_share_one_aggregate(spark, messy):
    checks = [Check("v", "min", (0,)), Check("v", "max", (100,)), Check("lang", "not_null")]
    # every check row projects from the SAME one-row aggregate: the
    # optimized plan contains exactly one Aggregate subtree per union
    # branch and they are identical (ReusedExchange/common-subplan), so
    # the cheap semantic proxy is that all rows agree on n_rows
    rows = run_checks(messy, "messy", checks).collect()
    assert len(rows) == 3
    assert {r.n_rows for r in rows} == {4}


def test_unknown_kind_raises(spark, messy):
    with pytest.raises(ValueError, match="unknown check kind"):
        run_checks(messy, "messy", [Check("v", "median")]).collect()


def test_profile_columns(spark, messy):
    from dataset_dedupe_estimator_spark.operators.quality_checks import profile_columns

    rows = {r.column_name: r for r in profile_columns(messy, "messy").collect()}
    assert set(rows) == {"id", "v", "lang"}
    assert rows["id"].n_rows == 4 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 3  # 1, 2, 4 (2 repeats)
    assert rows["v"].n_null == 1 and rows["v"].n_distinct == 3
    assert rows["lang"].min_value == "en" and rows["lang"].max_value == "xx"
    assert rows["lang"].avg_len == 2.0  # over non-null values
