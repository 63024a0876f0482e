"""Bucketed co-located joins: the write-once-shuffle-never pattern."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pack_spark.sinks.bucketing import bucketed_join, write_bucketed
from etl_pack_spark.sources.reader import read_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "b_customer", ["o_custkey"], num_buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast off (the big-big case bucketing exists for), the
    join must read co-located buckets: SMJ, no Exchange anywhere."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["o_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = bucketed_join(spark, lt, rt, ["o_custkey"]).count()
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    expect = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    assert got == expect
