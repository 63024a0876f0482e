"""Sequence packing: assign documents to fixed token-budget packs for
training-batch construction.

LLM pre-training consumes fixed-length sequences; feeding one short doc
per sequence wastes the budget on padding. Packing bins docs so each
pack's token total stays ≤ the budget, maximizing fill. (Not in the
reference — SURVEY §7.3 extension family.)

Scale design — shard-local greedy packing:
  * Greedy first-fit is inherently sequential (each decision depends on
    the running fill), so a global pack order would serialize the whole
    corpus through one task. Instead docs hash into ``shards``
    independent groups and packing is greedy WITHIN each shard — the
    universal trade in distributed packing (training shards are
    independent anyway). Per-task memory is one shard's (id, tokens)
    pairs, and shards can be sized arbitrarily fine.
  * Deterministic: shard assignment is a hash of the id, packing order
    is sorted by id within the shard, pack ids are (shard, seq) pairs —
    independent of partitioning, task order, and cluster size.
  * The only shuffle is the hash-partition by shard; the packer is an
    Arrow-batched applyInPandas (a per-row running fill cannot be a
    Catalyst expression; window prefix-sums cannot express "reset the
    accumulator when it would overflow").

An oversized doc (tokens > budget) gets a pack of its own and
``oversize = true`` — callers decide whether to truncate or drop;
silently splitting would corrupt document boundaries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pack_id = shard * _SHARD_SPAN + seq: numeric ids stay unique as long
# as one shard packs fewer than a trillion packs
_SHARD_SPAN = 1 << 40


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int | None = None,
) -> DataFrame:
    """Greedy first-fit packing: ``(id_col, token_col, pack_id,
    oversize)`` with sum(token_col) ≤ budget per pack (oversize docs
    alone in their pack).

    ``shards``: number of independent packing groups (default: the
    session's shuffle parallelism). More shards = more parallelism,
    marginally more tail waste (one partially-filled final pack per
    shard).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    keyed = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int").alias("__shard"),
    )

    # NESTED so cloudpickle ships it by value (executors need not
    # import this package)
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        shard = int(pdf["__shard"].iat[0]) if len(pdf) else 0
        pack_ids, oversize = [], []
        seq, acc = 0, 0
        for t in pdf[token_col].to_numpy():
            t = int(t)
            if t > budget:
                # oversized doc: own pack, never merged
                if acc > 0:
                    seq += 1
                pack_ids.append(shard * _SHARD_SPAN + seq)
                oversize.append(True)
                seq += 1
                acc = 0
                continue
            if acc + t > budget:
                seq += 1
                acc = 0
            acc += t
            pack_ids.append(shard * _SHARD_SPAN + seq)
            oversize.append(False)
        out = pdf[[id_col, token_col]].copy()
        out["pack_id"] = pd.Series(pack_ids, dtype="int64")
        out["oversize"] = pd.Series(oversize, dtype="bool")
        return out

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {token_col} long, pack_id long, oversize boolean"
    return keyed.groupBy("__shard").applyInPandas(pack, schema=schema)


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", budget: int = 2048) -> DataFrame:
    """Fill-quality summary of a packing: one row with pack count, mean
    fill fraction, and waste — the number a pipeline owner watches when
    tuning shard count and budget."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(token_col).alias("fill"), F.count("*").alias("docs")
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("docs").alias("n_docs"),
        F.avg(F.col("fill") / F.lit(float(budget))).alias("mean_fill"),
        (F.lit(budget) * F.count("*") - F.sum("fill")).alias("wasted_tokens"),
    )
