"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a repeated big-big join is the shuffle.
Writing both sides bucketed by the join key (``bucketBy`` + sorted
files) moves that shuffle to write time, once: subsequent joins scan
co-located buckets and the physical plan has NO Exchange on either side
(asserted in tests/test_bucketing.py). This is the Spark-native
equivalent of the co-partitioning a distributed database would keep in
its storage layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) managed
    table. Bucket count should match downstream parallelism — it fixes
    the join's task count."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free when bucket specs
    match (Spark reads bucket files as pre-partitioned input)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
