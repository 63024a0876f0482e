"""CDC merge plans: upsert / change-stream apply / SCD-2 history.

DuckDB oracle twins run in-process over the events fixture (same rigor
as the driver's gate; the 50-entry query registry is capped, so these
check here). The load-mode semantics themselves are pinned on small
synthetic frames where every expected row is written out by hand.
"""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from etl_pack_spark.plans.merge import (
    apply_cdc,
    merge_upsert,
    merge_upsert_sql,
    scd2_build,
    scd2_build_sql,
    scd2_merge,
)
from etl_pack_spark.sources.reader import read_table

_SCHEMA = "k long, ts timestamp, val string"


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _df(spark, rows, schema=_SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_merge_upsert_semantics(spark):
    target = _df(spark, [(1, _ts(1), "a1"), (2, _ts(5), "b5"), (3, _ts(3), "c3")])
    changes = _df(
        spark,
        [
            (1, _ts(2), "a2"),   # newer → replaces
            (2, _ts(4), "b4"),   # older → ignored
            (3, _ts(3), "c3x"),  # tie → change wins
            (4, _ts(9), "d9"),   # new key → inserted
        ],
    )
    got = {(r["k"], r["val"]) for r in merge_upsert(target, changes, ["k"], "ts").collect()}
    assert got == {(1, "a2"), (2, "b5"), (3, "c3x"), (4, "d9")}


def test_merge_upsert_oracle_parity(spark, sf_dir):
    """Latest event per (user, type): even event_ids as target, odd as
    changes — Spark merge equals the DuckDB QUALIFY twin row-for-row."""
    ev = read_table(spark, sf_dir, "events")
    # pre-collapse each side to one row per key so the only ts ties the
    # window sees are cross-side (resolved by source priority)
    def latest(df):
        return merge_upsert(
            df.limit(0), df, ["user_id", "event_type"], "ts"
        )

    cols = ["user_id", "event_type", "ts", "value"]
    target = latest(ev.where(F.col("event_id") % 2 == 0).select(*cols))
    changes = latest(ev.where(F.col("event_id") % 2 == 1).select(*cols))
    got = (
        merge_upsert(target, changes, ["user_id", "event_type"], "ts")
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    base = "SELECT user_id, event_type, ts, value FROM events WHERE event_id % 2 = {par}"
    side = (
        "SELECT * FROM ({b}) QUALIFY row_number() OVER "
        "(PARTITION BY user_id, event_type ORDER BY ts DESC) = 1"
    )
    want = (
        con.execute(
            merge_upsert_sql(
                side.format(b=base.format(par=0)),
                side.format(b=base.format(par=1)),
                ["user_id", "event_type"],
                "ts",
            )
        )
        .df()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["ts"].values == want["ts"].values).all()
    assert (got["value"].values == want["value"].values).all()


def test_apply_cdc_folds_inserts_updates_deletes(spark):
    target = _df(spark, [(1, _ts(1), "a1"), (2, _ts(1), "b1"), (3, _ts(1), "c1")])
    changes = spark.createDataFrame(
        [
            (1, _ts(2), "a2", "U"),   # update wins
            (2, _ts(2), "b2", "d"),   # delete (case-insensitive) removes key
            (3, dt.datetime(2023, 12, 31), "c0", "U"),  # older than stored → no-op
            (4, _ts(2), "d2", "I"),   # insert new key
            (5, _ts(2), "e2", "I"),   # insert then newer delete → absent
            (5, _ts(3), None, "D"),
        ],
        "k long, ts timestamp, val string, op string",
    )
    got = {(r["k"], r["val"]) for r in apply_cdc(target, changes, ["k"], "ts").collect()}
    assert got == {(1, "a2"), (3, "c1"), (4, "d2")}


def test_apply_cdc_idempotent_under_replay(spark):
    target = _df(spark, [(1, _ts(1), "a1"), (2, _ts(1), "b1")])
    changes = spark.createDataFrame(
        [(1, _ts(2), "a2", "U"), (2, _ts(2), None, "D"), (9, _ts(2), "i", "I")],
        "k long, ts timestamp, val string, op string",
    )
    once = apply_cdc(target, changes, ["k"], "ts")
    twice = apply_cdc(once, changes, ["k"], "ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_build_oracle_parity(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    hist = scd2_build(ev, ["user_id", "event_type"], "ts")
    got = (
        hist.toPandas()
        .sort_values(["user_id", "event_type", "ts"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = (
        con.execute(
            scd2_build_sql(
                "SELECT user_id, event_type, ts, value FROM events",
                ["user_id", "event_type"],
                "ts",
                rest_cols=["value"],
            )
        )
        .df()
        .sort_values(["user_id", "event_type", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["user_id", "event_type", "value", "is_current"]:
        assert (got[c].values == want[c].values).all(), c
    # effective_to is NULL exactly on current rows
    assert got["effective_to"].isna().equals(got["is_current"].astype(bool))


def test_scd2_one_current_row_per_key(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    hist = scd2_build(ev, ["user_id"], "ts")
    per_key = (
        hist.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .where(F.col("n_current") != 1)
    )
    assert per_key.count() == 0


def test_scd2_merge_incremental_equals_full(spark, sf_dir):
    """Split the change stream at the median ts: build history from the
    first half, merge the second half — identical to one full build."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    # events.ts is TIMESTAMP_NTZ (nanos parquet); NTZ has no numeric
    # cast, so the median split goes through epoch micros (UTC session)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.select(F.percentile(epoch, F.lit(0.5)).alias("p")).collect()[0]["p"]
    first = ev.where(epoch <= cut)
    second = ev.where(epoch > cut)

    keys = ["user_id", "event_type"]
    incremental = scd2_merge(scd2_build(first, keys, "ts"), second, keys, "ts")
    full = scd2_build(ev, keys, "ts")

    cols = keys + ["ts", "value", "effective_from", "effective_to", "is_current"]
    a = sorted(map(tuple, incremental.select(*cols).collect()))
    b = sorted(map(tuple, full.select(*cols).collect()))
    assert len(a) == len(b) > 0
    assert a == b


def test_scd2_merge_drops_replayed_and_late_changes(spark):
    dim = scd2_build(
        _df(spark, [(1, _ts(1), "v1"), (1, _ts(5), "v5")]), ["k"], "ts"
    )
    replay = _df(
        spark,
        [
            (1, _ts(5), "v5"),    # exact re-delivery of current
            (1, _ts(3), "late"),  # late change already superseded
        ],
    )
    merged = scd2_merge(dim, replay, ["k"], "ts")
    got = sorted(
        (r["k"], r["ts"], r["val"], r["is_current"]) for r in merged.collect()
    )
    assert got == [(1, _ts(1), "v1", False), (1, _ts(5), "v5", True)]


def test_scd2_null_ts_rows_survive(spark):
    """NULL-ts change rows are versions with unknown start, not
    duplicates: one survivor per (key, NULL-ts), ordered NULLS FIRST —
    previously the lag-based dedup dropped ALL of them (the partition's
    first row sees lag default NULL, and NULL eqNullSafe NULL is TRUE)."""
    df = spark.createDataFrame(
        [
            (1, None, "a"),
            (1, None, "b"),      # true duplicate of the NULL-ts version → collapsed
            (1, _ts(5), "v5"),
            (2, None, "only"),   # NULL-ts is the key's only row → current
        ],
        _SCHEMA,
    )
    got = sorted(
        (
            (r["k"], r["ts"], r["val"], r["effective_to"], r["is_current"])
            for r in scd2_build(df, ["k"], "ts").collect()
        ),
        key=lambda t: (t[0], t[1] is not None, t[1] or _ts(1)),
    )
    assert got == [
        (1, None, "a", _ts(5), False),   # NULLS FIRST: earliest version
        (1, _ts(5), "v5", None, True),
        (2, None, "only", None, True),
    ]


def test_scd2_null_ts_oracle_parity(spark):
    """The same NULL-ts frame hash-matches the DuckDB twin (explicit
    NULLS FIRST framing on both engines)."""
    rows = [
        (1, None, "a"), (1, None, "b"), (1, _ts(5), "v5"),
        (2, None, "only"), (3, _ts(2), "x"), (3, _ts(4), "y"),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    def _key(t):
        return (t[0], t[1] is not None, t[1] or _ts(1), t[2])

    got = sorted(
        map(tuple, scd2_build(df, ["k"], "ts")
            .select("k", "ts", "val", "effective_from", "effective_to", "is_current")
            .collect()),
        key=_key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ch (k BIGINT, ts TIMESTAMP, val VARCHAR)"
    )
    con.executemany("INSERT INTO ch VALUES (?, ?, ?)", rows)
    want = [
        tuple(r) for r in con.execute(
            scd2_build_sql("SELECT * FROM ch", ["k"], "ts", rest_cols=["val"])
        ).fetchall()
    ]
    # duckdb returns (k, ts, val, effective_from, effective_to, is_current)
    def norm(t):
        return (t[0], t[1], t[2], t[3], t[4], bool(t[5]))
    assert got == sorted((norm(t) for t in want), key=_key)


class TestSnapshotDiff:
    """snapshot_diff: derive the I/U/D stream from two snapshots."""

    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
            "k long, name string, val double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0),        # unchanged
             (2, "B", 20.0),        # updated (name)
             (3, "c", 30.0),        # updated (NULL -> value)
             (5, "e", 50.0)],       # inserted; 4 deleted
            "k long, name string, val double",
        )
        return old, new

    def test_semantics(self, spark):
        from etl_pack_spark.plans.merge import snapshot_diff

        old, new = self._frames(spark)
        got = {r["k"]: (r["op"], r["name"], r["val"])
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {
            2: ("U", "B", 20.0),
            3: ("U", "c", 30.0),
            4: ("D", "d", 40.0),
            5: ("I", "e", 50.0),
        }

    def test_oracle_parity_full_outer_join_twin(self, spark):
        import duckdb as _duck

        from etl_pack_spark.plans.merge import snapshot_diff, snapshot_diff_sql

        old, new = self._frames(spark)
        got = sorted(map(tuple, snapshot_diff(old, new, ["k"]).collect()))
        con = _duck.connect()
        con.register("old_t", old.toPandas())
        con.register("new_t", new.toPandas())
        want = sorted(map(tuple, con.execute(snapshot_diff_sql(
            "SELECT * FROM old_t", "SELECT * FROM new_t",
            ["k"], ["name", "val"],
        )).fetchall()))
        assert got == want

    def test_oracle_parity_on_fixture(self, spark, sf_dir):
        from etl_pack_spark.oracle import duck_connect
        from etl_pack_spark.plans.merge import snapshot_diff, snapshot_diff_sql
        from etl_pack_spark.sources.reader import read_table

        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        old = orders.where(F.col("o_orderkey") % 5 != 0)
        new = orders.where(F.col("o_orderkey") % 3 != 0).withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")),
        )
        got = sorted(map(tuple, snapshot_diff(old, new, ["o_orderkey"]).collect()))
        base = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
        want = sorted(map(tuple, duck_connect(sf_dir).execute(snapshot_diff_sql(
            f"{base} WHERE o_orderkey % 5 <> 0",
            f"""SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
                FROM ({base} WHERE o_orderkey % 3 <> 0)""",
            ["o_orderkey"], ["o_custkey", "o_totalprice"],
        )).fetchall()))
        assert got == want
        assert len(got) > 0

    def test_roundtrip_apply_cdc_reproduces_new(self, spark):
        """THE law: apply_cdc(old, diff) == new, exactly."""
        from etl_pack_spark.plans.merge import apply_cdc, snapshot_diff

        old, new = self._frames(spark)
        changes = snapshot_diff(old, new, ["k"]).withColumn("ts", F.lit(2))
        target = old.withColumn("ts", F.lit(1))
        result = apply_cdc(target, changes, ["k"], "ts")
        got = sorted(map(tuple, result.drop("ts").collect()))
        want = sorted(map(tuple, new.collect()))
        assert got == want

    def test_swapped_column_values_flag_update(self, spark):
        """The H1 multiset hash would call a value swap 'unchanged';
        the struct compare must not."""
        from etl_pack_spark.plans.merge import snapshot_diff

        old = spark.createDataFrame([(1, "x", "y")], "k long, a string, b string")
        new = spark.createDataFrame([(1, "y", "x")], "k long, a string, b string")
        got = [(r["op"], r["a"], r["b"]) for r in snapshot_diff(old, new, ["k"]).collect()]
        assert got == [("U", "y", "x")]


class TestSnapshotDiffGuards:
    """Review-pass regressions: contract violations fail fast and the
    decoder-style bounds hold."""

    def test_op_col_collision_rejected(self, spark):
        from etl_pack_spark.plans.merge import snapshot_diff

        df = spark.createDataFrame([(1, "I")], "k long, op string")
        try:
            snapshot_diff(df, df, ["k"])
            assert False, "expected ValueError"
        except ValueError as e:
            assert "op_col" in str(e)

    def test_map_payload_rejected_with_clear_error(self, spark):
        from pyspark.sql import functions as F

        from etl_pack_spark.plans.merge import snapshot_diff

        df = spark.createDataFrame([(1, "a")], "k long, v string").select(
            "k", F.create_map(F.lit("x"), F.col("v")).alias("attrs")
        )
        try:
            snapshot_diff(df, df, ["k"])
            assert False, "expected ValueError"
        except ValueError as e:
            assert "map" in str(e)

    def test_keys_only_membership_diff(self, spark):
        import duckdb as _duck

        from etl_pack_spark.plans.merge import snapshot_diff, snapshot_diff_sql

        old = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        new = spark.createDataFrame([(2,), (3,), (4,)], "k long")
        got = sorted(map(tuple, snapshot_diff(old, new, ["k"]).collect()))
        con = _duck.connect()
        con.register("o_t", old.toPandas())
        con.register("n_t", new.toPandas())
        want = sorted(map(tuple, con.execute(snapshot_diff_sql(
            "SELECT * FROM o_t", "SELECT * FROM n_t", ["k"], [],
        )).fetchall()))
        assert got == want == [(1, "D"), (4, "I")]


def test_jpeg_decoder_bounds_declared_dims():
    """A 30-byte file claiming 65535x65535 must quarantine fast, not
    allocate tens of GB or grind through 67M fabricated MCUs."""
    import time

    from etl_pack_spark.operators.multimodal import jpeg_decode

    crafted = (
        b"\xff\xd8"
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (65535).to_bytes(2, "big") + (65535).to_bytes(2, "big") + b"\x03"
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    t0 = time.perf_counter()
    assert jpeg_decode(crafted) is None
    assert time.perf_counter() - t0 < 1.0
