"""Incremental & content deduplication (ops H2/H3 + scale extensions).

Reference semantics:
  * H2 — snapshot hash-set: hash every row already in the target window
    and collect the set (consumer.go:78-98). The reference materializes
    this as a Go map in *provider process memory*
    (provider.go:161-179) — its single worst scale decision. Here the
    snapshot stays a DataFrame of hashes; Catalyst broadcasts it when
    small and shuffles when not, so the operator survives a target
    window of any size.
  * H3 — incremental anti-join: drop source rows whose canonical hash
    already exists in the snapshot (etl.go:23-48); empty snapshot =
    pass-through (etl.go:28-30).

Extensions (exact + near-duplicate detection for training-data
pipelines) follow below; the near-dup family lives in
:mod:`etl_pack_spark.operators.neardup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.hashing import row_hash

HASH_COL = "__row_h"


def snapshot_hashes(target: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """H2: distinct canonical hashes of the target (consumer.go:88-95),
    kept distributed — one column ``h``, deduplicated map-side first
    (partial aggregate) before the exchange."""
    cols = cols or target.columns
    return target.select(row_hash(cols, target).alias("h")).distinct()


def incremental_filter(
    src: DataFrame,
    snapshot: DataFrame | None,
    cols: list[str] | None = None,
) -> DataFrame:
    """H3: anti-join source rows against the snapshot hash set
    (etl.go:23-48, applied at provider.go:218).

    ``snapshot is None`` reproduces the nil-dict pass-through
    (etl.go:28-30). Catalyst chooses BroadcastHashJoin when the
    snapshot is small (the common incremental case: yesterday's
    window), ShuffledHashJoin/SMJ otherwise — with AQE the decision is
    made on runtime stats, which is exactly the 100 TB-safe behavior.
    """
    if snapshot is None:
        return src
    cols = cols or src.columns
    keyed = src.withColumn(HASH_COL, row_hash(cols, src))
    out = keyed.join(
        snapshot.withColumnRenamed("h", HASH_COL),
        on=HASH_COL,
        how="left_anti",
    )
    return out.drop(HASH_COL)


def incremental_load(
    src: DataFrame,
    target: DataFrame | None,
    cols: list[str] | None = None,
) -> DataFrame:
    """The reference's whole raison d'être as one plan (SURVEY §3.4):
    new rows = src ANTI JOIN hashes(target)."""
    snap = snapshot_hashes(target, cols) if target is not None else None
    return incremental_filter(src, snap, cols)


def exact_dedup(
    df: DataFrame,
    cols: list[str] | None = None,
    keep_order_col: str | None = None,
) -> DataFrame:
    """Exact content dedup at scale: one row per canonical hash.

    Generalizes H1+H3 to self-dedup (the reference only dedups source
    vs target, never within a batch). Implemented as min-by over the
    hash group — a single shuffle with map-side partial aggregation,
    no window sort. ``keep_order_col`` picks the survivor (default:
    first column, e.g. the id) — deterministic, unlike dropDuplicates.
    """
    cols = cols or df.columns
    keep = keep_order_col or df.columns[0]
    keyed = df.withColumn(HASH_COL, row_hash(cols, df))
    ranked = keyed.groupBy(HASH_COL).agg(
        F.min_by(F.struct(*df.columns), F.col(keep)).alias("__row")
    )
    return ranked.select("__row.*")
