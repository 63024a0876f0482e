"""LIVE JDBC execution against embedded Derby (on Spark's classpath).

The reference's actual transport is a live database (mysql/mysql.go:
36-70 reads, mysql/writer/main.go:98-132 writes). No MySQL/ClickHouse
is reachable in this container, but Derby ships with Spark — so these
tests execute the real JDBC code path end-to-end: driver loading, type
mapping, batched inserts, fetchsize cursoring, partitioned range reads.
Everything except the dialect string is identical to a MySQL run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.sinks.writers import jdbc_writer
from etl_pack_spark.sources.jdbc import jdbc_reader

URL = "jdbc:derby:memory:etlpack;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_roundtrip_executes(spark, sf_dir):
    """S4 write -> S1 read, actually executed over JDBC."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    jdbc_writer(nation, URL, "nation_rt", mode="overwrite").option(
        "driver", PROPS["driver"]
    ).save()
    back = (
        jdbc_reader(spark, URL, "nation_rt").option("driver", PROPS["driver"]).load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jdbc_partitioned_read_executes(spark, sf_dir):
    """S3: partitioned range scan (the OFFSET-pagination replacement)
    actually issues per-partition bounded queries."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    jdbc_writer(orders, URL, "orders_rt", mode="overwrite").option(
        "driver", PROPS["driver"]
    ).save()
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    part = (
        jdbc_reader(
            spark, URL, "orders_rt",
            partition_column="o_orderkey", lower_bound=lo, upper_bound=hi,
            num_partitions=4,
        )
        .option("driver", PROPS["driver"])
        .load()
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == orders.count()
    got = part.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    want = orders.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    assert abs(got - want) < 1e-6


def test_jdbc_predicate_pushdown_executes(spark, sf_dir):
    """Filters must reach the remote SQL (PushedFilters in the JDBC
    scan), not run Spark-side over a full-table fetch."""
    back = (
        jdbc_reader(spark, URL, "orders_rt").option("driver", PROPS["driver"]).load()
    )
    key = back.agg(F.min("o_custkey")).first()[0]
    q = back.where(F.col("o_custkey") == key).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_custkey" in plan.split("PushedFilters")[1][:120]
    assert q.count() > 0
