"""Partitioning helpers: spread small scans, leave big scans alone.

The test fixtures are single small parquet files that scan as 1-3
tasks, so CPU-bound per-row stages (canonical hashing, tokenize +
explode) underuse a 32-core cluster without an explicit repartition.
On a production many-split scan the same repartition is a PURE EXTRA
full shuffle whenever downstream stages don't reuse its partitioning —
at 100 TB that's the difference between a map-only pipeline and
shuffling the whole corpus once for nothing.

:func:`spread_small_scan` makes the spread conditional: repartition by
the key only when the input's planned partition count underuses the
cluster's default parallelism. (Operators whose downstream stages DO
reuse the key partitioning — shingling windows, per-doc signature
aggregates — keep their unconditional repartition: there, one compact
doc-row shuffle REPLACES a strictly larger exploded-row shuffle, which
is the right trade at any scale.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by ``key_col`` only when the scan underuses the
    cluster (planned partitions < defaultParallelism). Falls back to
    repartitioning if the partition count cannot be planned.

    The spread pins an EXPLICIT partition count (r15): a keyed
    ``repartition(col)`` without one is an AQE-coalescible exchange,
    and the fixture frames are so small by bytes (a few MB) that AQE
    collapsed them right back to 1-2 partitions — bytes-based
    coalescing cannot see that the rows feed a CPU-bound stage (row
    hashing, pair fan-out through a Python boundary) whose cost is not
    proportional to input bytes. An explicit count is exempt from
    coalescing, and this path only fires when the scan underuses the
    cluster, so a production many-split scan is never touched."""
    try:
        n_parts = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — conservative: keep fixture behavior
        return df.repartition(F.col(key_col))
    if n_parts < target:
        return df.repartition(target, F.col(key_col))
    return df
