"""Deep TPC-H query shapes (queries/tpch_deep.py): structural invariants
plus physical-plan assertions — the point of these queries is as much the
plan (broadcast dims, no stray shuffles, top-k without a global sort) as
the values, which tools/check_oracles.py verifies against DuckDB."""

from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.queries.tpch_deep import (
    q7_nation_volume,
    q10_returned_items,
    q13_order_distribution,
    q15_top_supplier,
    q17_small_quantity_revenue,
    q18_large_orders,
    q19_disjunctive_revenue,
    q22_idle_customers,
)


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_q7_pair_symmetry_and_broadcasts(spark, sf_dir):
    rows = q7_nation_volume(spark, sf_dir).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.volume > 0 for r in rows)
    assert all(r.l_year in (1996, 1997) for r in rows)
    # all four dims broadcast: the only shuffle is lineitem⋈orders
    assert _plan(q7_nation_volume(spark, sf_dir)).count("BroadcastHashJoin") >= 4


def test_q10_topk_no_global_sort(spark, sf_dir):
    df = q10_returned_items(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert "TakeOrderedAndProject" in _plan(df)


def test_q13_distribution_counts_all_customers(spark, sf_dir):
    rows = q13_order_distribution(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust  # left join keeps everyone


def test_q15_returns_exactly_the_max(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1  # ties share the max


def test_q17_filter_is_strict_subset(spark, sf_dir):
    row = q17_small_quantity_revenue(spark, sf_dir).collect()[0]
    # n_small counts brand-filtered lineitems below 20% of their part avg;
    # strictly fewer than the brand's total lineitems
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_brand") == "Brand#3"
    )
    n_brand = li.join(part, li.l_partkey == part.p_partkey).count()
    assert 0 <= row.n_small < n_brand


def test_q18_gate_threshold(spark, sf_dir):
    rows = q18_large_orders(spark, sf_dir).collect()
    assert all(r.total_qty > 300.0 for r in rows)
    # every qualifying order appears exactly once
    assert len({r.o_orderkey for r in rows}) == len(rows)


def test_q19_disjunction_nonneg(spark, sf_dir):
    row = q19_disjunctive_revenue(spark, sf_dir).collect()[0]
    assert row.n_items >= 0


def test_q22_idle_customers_have_no_recent_orders(spark, sf_dir):
    rows = q22_idle_customers(spark, sf_dir).collect()
    assert all(r.numcust > 0 for r in rows)
    assert all(len(r.cntry) == 1 for r in rows)
