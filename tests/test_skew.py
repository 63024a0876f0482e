"""Salted-join correctness: result equals the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.operators.skew import salted_join
from etl_pack_spark.sources.reader import read_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))

    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer,
        on=["c_custkey"],
        buckets=8,
        entropy_col="o_orderkey",
    ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))

    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_random_salt_path(spark, sf_dir):
    """entropy_col falling inside the join key forces the random-salt
    path; row multiset must still match."""
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    out = salted_join(orders, customer, on=["c_custkey"], buckets=4, entropy_col="c_custkey")
    assert out.count() == orders.join(customer, "c_custkey").count()


def test_salted_join_rejects_outer_how():
    import pytest

    from etl_pack_spark.operators.skew import salted_join

    for how in ("right", "full", "right_outer", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(None, None, on=["k"], how=how)
