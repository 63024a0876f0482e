"""Incremental aggregate maintenance: keep a materialized rollup fresh
without recomputing history.

The reference can only re-copy raw rows; real warehouses also maintain
derived aggregates. The composable way on Spark: store the rollup with
partial-aggregate columns that MERGE associatively (counts and decimal
sums — never averages), then each increment is

    new_partials = aggregate(window of source)
    merged       = re-aggregate(old_partials ∪ new_partials)

which touches history once per key-group, not per source row. At scale,
partition the rollup by the group key's time component so the union
re-aggregation prunes to affected partitions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"


@dataclass(frozen=True)
class AggSpec:
    """Mergeable rollup: group keys + (count, decimal-sum) measures."""

    group_cols: list[str]
    sum_cols: list[str] = field(default_factory=list)
    count_col: str = "n_rows"


def partial_aggregate(df: DataFrame, spec: AggSpec) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias(spec.count_col)]
    for c in spec.sum_cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}"))
    return df.groupBy(*spec.group_cols).agg(*aggs)


def merge_partials(old: DataFrame, new: DataFrame, spec: AggSpec) -> DataFrame:
    """Associative merge: counts add, decimal sums add — exactly."""
    aggs = [F.sum(spec.count_col).alias(spec.count_col)]
    for c in spec.sum_cols:
        aggs.append(F.sum(f"sum_{c}").alias(f"sum_{c}"))
    return old.unionByName(new).groupBy(*spec.group_cols).agg(*aggs)


def refresh_rollup(
    spark: SparkSession,
    src_window: DataFrame,
    rollup_path: str,
    spec: AggSpec,
) -> int:
    """Merge one increment into the stored rollup; returns group count.

    Write is overwrite-into-temp-then-swap-free: Spark's overwrite mode
    handles atomicity per run; concurrent refreshes of the same rollup
    need external locking (same as the reference's cron runs).

    Scope: the swap below is an ``os.replace`` rename, so the rollup
    path is POSIX-only by design (``sinks.atomic``'s documented scope);
    ``posix_path`` normalizes ``file:`` URIs and raises loudly on
    object-store schemes (r9) instead of letting ``os.path`` silently
    read an existing rollup as absent and drop its history on the swap.
    An object-store deployment swaps in a transactional table format.
    """
    import shutil

    from etl_pack_spark.sinks.atomic import posix_path

    rollup_path = posix_path(rollup_path)
    new_partials = partial_aggregate(src_window, spec)
    if os.path.exists(rollup_path):
        old = spark.read.parquet(rollup_path)
        merged = merge_partials(old, new_partials, spec)
    else:
        merged = new_partials
    # never overwrite the path we are still reading from: write the
    # merge to a sibling temp dir, then swap (cache-based "materialize
    # first" is fragile under eviction; a swap is not)
    tmp = rollup_path.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(rollup_path, ignore_errors=True)
    os.replace(tmp, rollup_path)
    return n
