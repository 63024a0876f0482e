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
    n_in, in_bytes, n_out = _plan_out_files(in_path, target_file_mb)
    df: DataFrame = spark.read.parquet(in_path)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(out_path)
    out_files, _ = _dir_stats(out_path)
    return CompactionStats(n_in, in_bytes, out_files, out_path)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, bounds: dict | None = None
):
    """Z-order (Morton) key over 2+ numeric/timestamp columns as a pure
    Column expression: each column min-max-normalized to ``bits`` bits,
    then bit-interleaved. Sorting by this key clusters rows so that
    parquet min/max stats are selective on EVERY participating
    dimension at once — the multi-dimensional pruning a single-column
    range cluster can't give (its second dimension's per-file ranges
    stay ~full-width). The interleave is ~bits×dims shift/and/or
    terms, all inside whole-stage codegen.

    ``bits * len(cols)`` must fit in 63 bits (bit 63 is the long's
    sign and would invert the range ordering; shifts past 63 wrap mod
    64 on the JVM and would silently conflate dimensions) — the guard
    raises instead. Bounds come from ``bounds`` (``{col: (mn, mx)}``,
    e.g. parquet footer stats) when given, else ONE tiny agg over the
    data — the only driver-side data is 2×len(cols) scalars.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    ndims = len(cols)
    if bits * ndims > 63:
        raise ValueError(
            f"zorder_key needs bits*len(cols) <= 63 (got {bits}*{ndims}="
            f"{bits * ndims}); pass bits={63 // ndims} for {ndims} columns"
        )
    if bounds is None:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    top = (1 << bits) - 1
    terms = []
    for d, c in enumerate(cols):
        mn, mx = bounds[c]
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


def _footer_bounds(in_path: str, cols: list[str]) -> dict | None:
    """Per-column (min, max) from parquet FOOTER statistics — metadata
    reads only, no data scan. None when any column lacks stats (the
    caller then falls back to the one-agg scan)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return None
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(in_path)
        for f in fs
        if f.endswith(".parquet")
    ]
    mins: dict = {c: None for c in cols}
    maxs: dict = {c: None for c in cols}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in mins:
                    continue
                st = col.statistics
                if st is None or st.min is None or st.max is None:
                    return None
                try:
                    lo, hi = float(st.min), float(st.max)
                except (TypeError, ValueError):
                    return None
                mins[name] = lo if mins[name] is None else min(mins[name], lo)
                maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
    if any(mins[c] is None for c in cols):
        return None
    return {c: (mins[c], maxs[c]) for c in cols}


def _plan_out_files(in_path: str, target_file_mb: float) -> tuple[int, int, int]:
    if target_file_mb <= 0:
        raise ValueError(f"target_file_mb must be > 0, got {target_file_mb}")
    n_in, in_bytes = _dir_stats(in_path)
    n_out = max(1, math.ceil(in_bytes / (target_file_mb * (1 << 20))))
    return n_in, in_bytes, n_out


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
    single-DATA-job shape and stable file sizing as :func:`compact`:
    normalization bounds come from the parquet FOOTERS (metadata
    only) when every column carries stats, falling back to one tiny
    agg scan otherwise."""
    n_in, in_bytes, n_out = _plan_out_files(in_path, target_file_mb)
    df = spark.read.parquet(in_path)
    z = zorder_key(df, zorder_by, bits, bounds=_footer_bounds(in_path, zorder_by))
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(out_path)
    out_files, _ = _dir_stats(out_path)
    return CompactionStats(n_in, in_bytes, out_files, out_path)
