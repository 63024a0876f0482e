"""H2/H3 semantics (reference etl_test.go:101-238, five filter cases)
+ exact_dedup extension."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.operators.dedup import (
    exact_dedup,
    incremental_filter,
    incremental_load,
    snapshot_hashes,
)

ROWS = [("1", "2", "3", "4"), ("5", "6", "7", "8"), ("9", "10", "11", "12")]
SCHEMA = "col1 string, col2 string, col3 string, col4 string"


def _batch(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_nil_snapshot_passthrough(spark):
    # etl.go:28-30: nil dict → batch passes through untouched
    src = _batch(spark)
    assert incremental_filter(src, None).count() == 3


def test_empty_snapshot_passthrough(spark):
    src = _batch(spark)
    empty = spark.createDataFrame([], "h string")
    assert incremental_filter(src, empty).count() == 3


def test_nonmatching_hash_passthrough(spark):
    src = _batch(spark)
    snap = spark.createDataFrame([("deadbeef",)], "h string")
    assert incremental_filter(src, snap).count() == 3


def test_partial_filter(spark):
    # one matching hash → that row dropped (etl_test.go "partial" case)
    src = _batch(spark)
    snap = snapshot_hashes(src.where(F.col("col1") == "1"))
    out = incremental_filter(src, snap)
    got = {r["col1"] for r in out.collect()}
    assert got == {"5", "9"}


def test_full_filter_empty_result(spark):
    # all hashes match → empty output (reference sends nothing, etl.go:40-42)
    src = _batch(spark)
    out = incremental_filter(src, snapshot_hashes(src))
    assert out.count() == 0


def test_incremental_load_complement(spark, sf_dir):
    """FIXTURES.md H-family: target = subset of source → new rows =
    complement."""
    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tgt = src.where(F.col("c_custkey") % 2 == 0)
    new = incremental_load(src, tgt)
    assert {r["c_custkey"] % 2 for r in new.collect()} == {1}
    assert new.count() == src.count() - tgt.count()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "B")], "id int, txt string"
    )
    # hash over txt only → "a" dups and case-folded "b"/"B" dups collapse,
    # survivor = min id
    out = exact_dedup(df, cols=["txt"], keep_order_col="id")
    assert sorted(r["id"] for r in out.collect()) == [1, 3]
