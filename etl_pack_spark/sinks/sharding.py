"""Deterministic global shuffle into training shards — the last stage
of a pretraining pipeline (corpus → N shard files in pseudo-random
document order).

Training jobs can't shuffle 100 TB in the data loader, so the shuffle
happens here, once, at write time: every row gets a hash-derived shard
and an order key, and each shard file is written in that order. All
randomness is md5-derived from the row id (the same convention as
``operators/sampling.py``), which buys three properties rand() can't:

- reproducible: the same corpus always writes byte-identical shards;
- append-stable: a document keeps its shard when the corpus grows, so
  incremental corpus builds don't reshuffle history;
- cross-engine checkable: the DuckDB twin evaluates identical
  arithmetic, so the assignment is oracle-verifiable bit-for-bit.

Scale shape: ONE hash-partition exchange on the shard id plus an
in-partition sort (Spark's shuffle machinery does exactly this for
free); no global sort, no driver involvement. Shard sizes concentrate
tightly around n/n_shards (md5 is uniform), so downstream data-loader
workers get balanced files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.sampling import _h28_spark, _h28_sql


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``pos`` (the pseudo-random
    order key: md5 of the seeded id — 128 bits, so practical ties are
    impossible; readers order by (pos, id) for a total order anyway).
    Map-only; both columns are pure functions of the row id."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(F.expr(_h28_spark(id_col, f"{seed}:shard")), F.lit(n_shards))
    pos = F.md5(F.concat_ws(":", F.lit(f"{seed}:pos"), F.col(id_col).cast("string")))
    return df.withColumn("shard", shard.cast("int")).withColumn("pos", pos)


def shard_assign_sql(
    table: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> str:
    """Oracle twin of :func:`shard_assign` — identical md5 arithmetic."""
    return f"""
    SELECT *,
           CAST({_h28_sql(id_col, f"{seed}:shard")} % {n_shards} AS INTEGER) AS shard,
           md5(concat('{seed}:pos', ':', CAST({id_col} AS VARCHAR))) AS pos
    FROM {table}
    """


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> None:
    """Write ``path/shard=K/`` parquet directories, each holding its
    shard's rows in the deterministic pseudo-random order.

    The repartition keys ONLY on the shard id, so the exchange routes
    each shard to one task (byte-identical files run-to-run); the
    in-partition sort orders by (shard, pos, id) — shard first because
    hash collisions may co-locate two shards in one task, and the
    trailing id makes the order total even under (impossible-in-
    practice) 128-bit pos ties. partitionBy writes the directory
    layout a data loader shards workers over."""
    out = shard_assign(df, n_shards, id_col, seed)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
