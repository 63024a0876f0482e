"""Parquet compaction & clustering — lake maintenance for the sink side.

Incremental loads (plans/transfer.py) append small files every run; at
100 TB that means millions of files and scan planning that drowns in
footer reads. ``compact`` rewrites a table to ~``target_file_mb`` files
and optionally RANGE-CLUSTERS rows by given columns so parquet
row-group min/max statistics become selective: a filter on the cluster
column then prunes whole files/row-groups at planning time (the same
effect the reference's per-day tables give it, done Spark-native).

``repartitionByRange`` gives globally disjoint per-file key ranges (one
range-partition shuffle, sampled boundaries — AQE-friendly);
``sortWithinPartitions`` orders rows inside each file so row-group
stats are tight at any file size.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionStats:
    in_files: int
    in_bytes: int
    out_files: int
    out_path: str


def _dir_stats(path: str) -> tuple[int, int]:
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: float = 256,
    cluster_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite ``in_path`` to ``out_path`` at ~target_file_mb per file,
    range-clustered by ``cluster_by`` when given.

    Runs as ONE Spark job: a scan, at most one range shuffle, a write.
    File count derives from actual input bytes, so repeated compaction
    is stable. Output is written to a separate path (atomic swap is the
    caller's rename — object stores make in-place rewrites unsafe).
    """
    n_in, in_bytes = _dir_stats(in_path)
    n_out = max(1, math.ceil(in_bytes / (target_file_mb * (1 << 20))))
    df: DataFrame = spark.read.parquet(in_path)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(out_path)
    out_files, _ = _dir_stats(out_path)
    return CompactionStats(n_in, in_bytes, out_files, out_path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key over 2+ numeric/timestamp columns as a pure
    Column expression: each column min-max-normalized to ``bits`` bits
    (bounds from ONE tiny agg — the only driver-side data is
    2×len(cols) scalars), then bit-interleaved. Sorting by this key
    clusters rows so that parquet min/max stats are selective on EVERY
    participating dimension at once — the multi-dimensional pruning a
    single-column range cluster can't give (its second dimension's
    per-file ranges stay ~full-width). The interleave is ~bits×dims
    shift/and/or terms, all inside whole-stage codegen."""
    from functools import reduce

    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    ndims = len(cols)
    top = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None:  # all-NULL column: constant dim
            mn, mx = 0.0, 0.0
        span = (mx - mn) or 1.0
        v = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast("long"),
            ),
        )
        v = F.coalesce(v, F.lit(0))
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * ndims + d)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def compact_zorder(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    zorder_by: list[str],
    target_file_mb: float = 256,
    bits: int = 16,
) -> CompactionStats:
    """:func:`compact` with Z-ORDER clustering: one range shuffle on
    the interleaved key + in-file sort, so files carry tight min/max
    ranges on every ``zorder_by`` column simultaneously. Same
    single-job shape and stable file sizing as :func:`compact`."""
    import math as _math

    n_in, in_bytes = _dir_stats(in_path)
    n_out = max(1, _math.ceil(in_bytes / (target_file_mb * (1 << 20))))
    df = spark.read.parquet(in_path)
    z = zorder_key(df, zorder_by, bits)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(out_path)
    out_files, _ = _dir_stats(out_path)
    return CompactionStats(n_in, in_bytes, out_files, out_path)
