"""Bucketed joins must not shuffle: the scan's bucketing satisfies the
join's required partitioning."""

import pytest
from pyspark.sql import functions as F

from dataset_dedupe_estimator_spark.sources.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # tables land in the default spark-warehouse dir (gitignored); dropped
    # in the finally block
    orders = spark.range(10_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 100).alias("o_val")
    )
    items = spark.range(30_000).select(
        (F.col("id") % 10_000).alias("o_key"), F.col("id").alias("item_id")
    )
    write_bucketed(orders, "b_orders", ["o_key"], n_buckets=8, sort_cols=["o_key"])
    write_bucketed(items, "b_items", ["o_key"], n_buckets=8, sort_cols=["o_key"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_items", ["o_key"])
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan, plan
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")
