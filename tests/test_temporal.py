"""As-of join and range join: brute-force equivalence + plan shape."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_pack_spark.operators.temporal import asof_join, range_join
from etl_pack_spark.sources.reader import read_table

T0 = datetime.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_asof_semantics_handcrafted(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(5)), (3, 10, _ts(2)), (4, 20, _ts(10))],
        "id int, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(5), "a"), (10, _ts(8), "b"), (30, _ts(1), "x")],
        "k int, ts timestamp, v string",
    )
    out = {r["id"]: (r["v_r"], r["ts_r"]) for r in
           asof_join(left, right, on="k").collect()}
    assert out[1] == ("b", _ts(8))     # latest at-or-before 10
    assert out[2] == ("a", _ts(5))     # equal ts matches (<=)
    assert out[3] == (None, None)      # no predecessor
    assert out[4] == (None, None)      # key never on right


def test_asof_matches_bruteforce(spark, sf_dir):
    from etl_pack_spark.sources.reader import read_table
    events = read_table(spark, sf_dir, "events")
    left = events.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = (events.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts").agg(F.max("event_id").alias("vid")))
    got = {r["event_id"]: r["vid_r"] for r in
           asof_join(left, right, on="user_id", right_payload=["vid"]).collect()}

    # brute force: non-equi join + max-by on the latest matching ts
    r2 = (right.withColumnRenamed("ts", "rts").withColumnRenamed("user_id", "r_uid"))
    j = left.join(r2, (left.user_id == r2.r_uid) & (r2.rts <= left.ts), "left")
    brute = {r["event_id"]: r["m"] for r in
             j.groupBy("event_id").agg(F.max_by("vid", "rts").alias("m")).collect()}
    assert got == brute


def test_asof_plan_has_no_join(spark, sf_dir):
    from etl_pack_spark.sources.reader import read_table
    events = read_table(spark, sf_dir, "events")
    left = events.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = events.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window: single shuffle, no join node
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_matches_bruteforce(spark, sf_dir):
    from etl_pack_spark.sources.reader import read_table
    events = read_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("ts").alias("cts"))
    signups = events.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"), F.col("ts").alias("s0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("s1"))
    got = {(r["cid"], r["sid"]) for r in
           range_join(clicks, signups, "cts", "s0", "s1", 3600).collect()}
    brute = {(r["cid"], r["sid"]) for r in
             clicks.crossJoin(signups).where(F.col("cts").between(F.col("s0"), F.col("s1"))).collect()}
    assert got == brute and len(got) > 0


def test_range_join_no_cartesian(spark, sf_dir):
    from etl_pack_spark.sources.reader import read_table
    events = read_table(spark, sf_dir, "events")
    clicks = events.select(F.col("event_id").alias("cid"), F.col("ts").alias("cts"))
    signups = events.select(F.col("event_id").alias("sid"), F.col("ts").alias("s0"),
                            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("s1"))
    plan = range_join(clicks, signups, "cts", "s0", "s1")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

def test_rolling_aggregate_semantics(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 10, 30), 2.0),
        (1, dt.datetime(2024, 1, 1, 11, 15), 4.0),   # 10:00 out of 1h frame
        (2, dt.datetime(2024, 1, 1, 10, 0), 10.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    from etl_pack_spark.operators.temporal import rolling_aggregate

    out = {(r["k"], r["ts"]): (r["n_window"], r["sum_window"]) for r in
           rolling_aggregate(df, "k", "ts", "v").collect()}
    assert out[(1, rows[0][1])] == (1, 1.0)
    assert out[(1, rows[1][1])] == (2, 3.0)
    assert out[(1, rows[2][1])] == (2, 6.0)  # 10:30 + 11:15 only
    assert out[(2, rows[3][1])] == (1, 10.0)


def test_rolling_aggregate_oracle_parity(spark, sf_dir):
    import duckdb
    import numpy as np

    from etl_pack_spark.operators.temporal import (
        rolling_aggregate,
        rolling_aggregate_sql,
    )

    ev = read_table(spark, sf_dir, "events")
    got = (
        rolling_aggregate(ev, "user_id", "ts", "value")
        .toPandas().sort_values(["user_id", "ts", "value"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = (
        con.execute(rolling_aggregate_sql("events", "user_id", "ts", "value"))
        .fetchdf().sort_values(["user_id", "ts", "value"]).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["n_window"].values == want["n_window"].values).all()
    # double sums: frame-order differences are last-ulp
    assert np.allclose(got["sum_window"], want["sum_window"], rtol=1e-9)
    assert np.allclose(got["min_window"], want["min_window"], rtol=0)
    assert np.allclose(got["max_window"], want["max_window"], rtol=0)


def test_rolling_aggregate_single_exchange(spark, sf_dir):
    from etl_pack_spark.operators.temporal import rolling_aggregate

    ev = read_table(spark, sf_dir, "events")
    plan = (
        rolling_aggregate(ev, "user_id", "ts", "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, _ts(10))], "id long, k string, ts timestamp"
    ).select("id", "k", "ts")
    right = spark.createDataFrame(
        [(None, _ts(5), "x")], "k string, ts timestamp, v string"
    )
    out = asof_join(left, right, "k").collect()
    assert len(out) == 1 and out[0]["v_r"] is None


def test_range_join_guards_sentinel_ranges(spark):
    import pytest

    probe = spark.createDataFrame([(1, _ts(0))], "id long, ts timestamp")
    ranges = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), datetime.datetime(9999, 12, 31), "open")],
        "s timestamp, e timestamp, tag string",
    )
    with pytest.raises(Exception, match="range_join|ASSERT"):
        range_join(probe, ranges, "ts", "s", "e").collect()


def test_range_join_null_ranges_dropped_not_error(spark):
    """NULL start/end ranges can never satisfy the BETWEEN refine; they
    must be silently dropped by the bucket explode, NOT routed into the
    max_buckets raise_error branch ((b_hi - b_lo) < N is NULL for NULL
    bounds — the guard's else-branch would fail the whole job if the
    optimizer ever stopped inferring IsNotNull pushdown)."""
    probe = spark.createDataFrame([(1, _ts(30))], "id long, ts timestamp")
    ranges = spark.createDataFrame(
        [
            (_ts(0), _ts(60), "full"),
            (None, _ts(60), "null-start"),
            (_ts(0), None, "null-end"),
            (None, None, "null-both"),
        ],
        "s timestamp, e timestamp, tag string",
    )
    got = {r["tag"] for r in range_join(probe, ranges, "ts", "s", "e").collect()}
    assert got == {"full"}
