"""Incremental rollup maintenance: two increments == one full compute."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.plans.incremental_agg import (
    AggSpec,
    partial_aggregate,
    refresh_rollup,
)
from etl_pack_spark.sources.reader import read_table

SPEC = AggSpec(group_cols=["o_orderpriority"], sum_cols=["o_totalprice"])


def test_incremental_equals_full(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    w1 = orders.where(F.col("o_orderdate") < "1996-07-01")
    w2 = orders.where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    path = str(tmp_path / "rollup")
    refresh_rollup(spark, w1, path, SPEC)
    refresh_rollup(spark, w2, path, SPEC)

    got = {r["o_orderpriority"]: (r["n_rows"], r["sum_o_totalprice"])
           for r in spark.read.parquet(path).collect()}
    full = partial_aggregate(
        orders.where(F.col("o_orderdate") < "1997-01-01"), SPEC
    )
    expect = {r["o_orderpriority"]: (r["n_rows"], r["sum_o_totalprice"])
              for r in full.collect()}
    assert got == expect  # decimal sums: exact equality, no tolerance


def test_empty_increment_noop(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "rollup2")
    refresh_rollup(spark, orders, path, SPEC)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    refresh_rollup(spark, orders.where(F.lit(False)), path, SPEC)
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after
