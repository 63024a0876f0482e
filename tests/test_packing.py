"""Sequence packing invariants: complete assignment, budget respected,
oversize isolation, determinism under repartitioning, and useful fill."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pack_spark.operators.packing import pack_sequences, pack_stats
from etl_pack_spark.operators.textops import token_counts
from etl_pack_spark.sources.reader import read_table


@pytest.fixture(scope="module")
def counted(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return (
        token_counts(docs, "doc_id", "text")
        .select("doc_id", F.col("n_pieces").alias("n_tokens"))
        .persist()
    )


def test_every_doc_packed_once(spark, counted):
    packed = pack_sequences(counted, budget=512, shards=8)
    assert packed.count() == counted.count()
    assert packed.select("doc_id").distinct().count() == counted.count()


def test_budget_respected(spark, counted):
    packed = pack_sequences(counted, budget=512, shards=8)
    over = (
        packed.where(~F.col("oversize"))
        .groupBy("pack_id").agg(F.sum("n_tokens").alias("fill"))
        .where(F.col("fill") > 512)
    )
    assert over.count() == 0


def test_oversize_isolated(spark):
    rows = [(1, 10), (2, 5000), (3, 20), (4, 5000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, budget=100, shards=2)
    got = {r["doc_id"]: (r["pack_id"], r["oversize"]) for r in packed.collect()}
    assert got[2][1] and got[4][1]
    # oversize docs never share a pack with anything
    from collections import Counter
    pack_sizes = Counter(p for p, _ in got.values())
    assert pack_sizes[got[2][0]] == 1 and pack_sizes[got[4][0]] == 1
    assert not got[1][1] and not got[3][1]


def test_deterministic_under_repartition(spark, counted):
    a = pack_sequences(counted, budget=512, shards=8).orderBy("doc_id").collect()
    b = pack_sequences(counted.repartition(13), budget=512, shards=8).orderBy("doc_id").collect()
    assert a == b


def test_fill_beats_one_doc_per_pack(spark, counted):
    """Packing must actually pack: strictly fewer packs than docs, and
    mean fill well above the unpacked baseline."""
    budget = 512
    packed = pack_sequences(counted, budget=budget, shards=8)
    stats = pack_stats(packed, budget=budget).first()
    assert stats["n_docs"] == counted.count()
    assert stats["n_packs"] < stats["n_docs"]
    baseline = counted.agg(
        F.avg(F.least(F.col("n_tokens"), F.lit(budget)) / F.lit(float(budget)))
    ).first()[0]
    assert stats["mean_fill"] > baseline


def test_bad_budget_raises(spark, counted):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(counted, budget=0)


def test_duckdb_twin_bit_exact_including_oversize(spark):
    """r7 driver-gating: pack_sequences_sql replays the greedy fold as
    a recursive CTE — identical md5-h7 shards, sorted order, first-fit
    transitions, and the oversize-own-pack branch, bit-for-bit."""
    import duckdb

    from etl_pack_spark.operators.packing import pack_sequences_sql

    rows = [(i, (i * 37) % 300 + 1) for i in range(400)]  # some > budget
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(map(tuple, pack_sequences(df, budget=128, shards=8).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.execute(pack_sequences_sql("t", budget=128, shards=8)).fetchall())
    )
    assert got == want
    assert any(r[3] for r in got) and any(not r[3] for r in got)


def test_string_ids_pack_cross_engine(spark):
    """The md5-h7 shard hash and sorted fold work identically for
    string ids (UUID-keyed corpora)."""
    import duckdb

    from etl_pack_spark.operators.packing import pack_sequences_sql

    rows = [(f"doc-{i:04d}", 40 + (i % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    got = sorted(map(tuple, pack_sequences(df, budget=100, shards=4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id VARCHAR, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        map(tuple, con.execute(pack_sequences_sql("t", budget=100, shards=4)).fetchall())
    )
    assert got == want


def test_default_shards_scale_with_data(spark, monkeypatch):
    """r8 (round-7 VERDICT #4): the default shard count derives from
    the DATA (ceil(n_rows / TARGET_ROWS_PER_SHARD), floored at the
    session parallelism), not from `shuffle.partitions` — one
    applyInPandas task must never materialize an unbounded pandas
    frame. Pinned by shrinking the target so the data-derived term
    wins, and by equality with the explicit-shards call."""
    from pyspark.sql import functions as F

    from etl_pack_spark.operators import packing
    from etl_pack_spark.operators.packing import _SHARD_SPAN, pack_sequences

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    monkeypatch.setattr(packing, "TARGET_ROWS_PER_SHARD", 10)
    derived = pack_sequences(df, budget=128)  # 1000/10 = 100 shards
    n_shards = derived.select(
        (F.col("pack_id") / F.lit(_SHARD_SPAN)).cast("long")
    ).distinct().count()
    assert parallelism < n_shards <= 100
    explicit = pack_sequences(df, budget=128, shards=100)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # big target: the parallelism floor wins (never fewer shards than
    # the session can run in parallel)
    monkeypatch.setattr(packing, "TARGET_ROWS_PER_SHARD", 4_000_000)
    floor = pack_sequences(df, budget=128)
    assert sorted(map(tuple, floor.collect())) == sorted(
        map(tuple, pack_sequences(df, budget=128, shards=parallelism).collect())
    )
