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
  * Deterministic AND cross-engine: shard assignment is an md5-derived
    hash of the id (the module family's seedless hash — NOT
    xxhash64, which no other engine reproduces), packing order is
    sorted by id within the shard, pack ids are (shard, seq) pairs —
    independent of partitioning, task order, cluster size, and engine.
    :func:`pack_sequences_sql` replays the identical greedy fold in
    DuckDB (recursive CTE), so the packing is oracle-checkable
    bit-for-bit.
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

# Per-task memory bound for the default shard count (r8): the packer
# is applyInPandas, which materializes ONE ENTIRE SHARD as a pandas
# frame in one task — so the default must size shards by DATA, not by
# `spark.sql.shuffle.partitions` (a fixed-200 default config at 100 TB
# would put corpus/200 rows in one task: a memory cliff). 4M (id,
# tokens) rows ≈ tens-of-MB pandas frames — comfortably inside any
# executor sized for this engine, and fine-grained enough that the
# tail-waste cost (one partially-filled final pack per shard) stays
# negligible against corpus-scale pack counts.
TARGET_ROWS_PER_SHARD = 4_000_000


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

    ``shards``: number of independent packing groups. More shards =
    more parallelism, marginally more tail waste (one partially-filled
    final pack per shard). Default (r8): derived from the DATA —
    ``max(parallelism, ceil(n_rows / TARGET_ROWS_PER_SHARD))`` via one
    map-side-combinable count — so one applyInPandas task never
    materializes an unbounded pandas frame regardless of the session's
    ``shuffle.partitions`` config (the pre-r8 default, which tied
    per-task memory to a config knob instead of the corpus). Pass an
    explicit ``shards`` for reproducible pack ids across differently
    sized inputs (the registry query and the oracle twin pin it).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    if shards is None:
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        n_rows = df.count()
        shards = max(parallelism, -(-n_rows // TARGET_ROWS_PER_SHARD))

    # md5-h7 shard hash (seedless, engine-agnostic — same family as
    # minhash/sharding): pmod of the first 7 md5 hex chars of the id
    shard_h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    keyed = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias(token_col),
        F.pmod(shard_h, F.lit(shards)).cast("int").alias("__shard"),
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


def pack_sequences_sql(
    table: str,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 32,
) -> str:
    """DuckDB oracle twin of :func:`pack_sequences` — same md5-h7 shard
    hash, same sorted-by-id order, same greedy first-fit transition,
    same ``shard * 2^40 + seq`` pack ids.

    Greedy packing is a sequential fold, which SQL expresses as a
    recursive CTE stepping one row per shard per iteration (all shards
    advance in parallel; recursion depth = the largest shard's row
    count — an oracle-scale formulation, not a 100 TB plan; the ENGINE
    side is the distributed applyInPandas). Carried state per shard is
    ``(seq_state, acc_state)`` exactly as the Python fold carries
    ``(seq, acc)``; the emitted ``pack_seq``/``oversize`` per row are
    pure functions of the previous state, so the two engines agree
    bit-for-bit — including the oversize-doc-gets-its-own-pack branch.
    """
    span = _SHARD_SPAN
    return f"""
    WITH RECURSIVE base AS (
        SELECT {id_col} AS id, CAST({token_col} AS BIGINT) AS t,
               CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 7)
                    AS BIGINT) % {shards} AS shard
        FROM {table}
    ),
    ordered AS (
        SELECT id, t, shard,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY id) AS rn
        FROM base
    ),
    greedy AS (
        SELECT shard, rn, id, t,
               (t > {budget}) AS oversize,
               CAST(0 AS BIGINT) AS pack_seq,
               CAST(CASE WHEN t > {budget} THEN 1 ELSE 0 END AS BIGINT)
                   AS seq_state,
               CAST(CASE WHEN t > {budget} THEN 0 ELSE t END AS BIGINT)
                   AS acc_state
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.id, o.t,
               (o.t > {budget}) AS oversize,
               CASE WHEN o.t > {budget}
                        THEN g.seq_state
                             + (CASE WHEN g.acc_state > 0 THEN 1 ELSE 0 END)
                    WHEN g.acc_state + o.t > {budget} THEN g.seq_state + 1
                    ELSE g.seq_state END AS pack_seq,
               CASE WHEN o.t > {budget}
                        THEN g.seq_state
                             + (CASE WHEN g.acc_state > 0 THEN 1 ELSE 0 END)
                             + 1
                    WHEN g.acc_state + o.t > {budget} THEN g.seq_state + 1
                    ELSE g.seq_state END AS seq_state,
               CASE WHEN o.t > {budget} THEN 0
                    WHEN g.acc_state + o.t > {budget} THEN o.t
                    ELSE g.acc_state + o.t END AS acc_state
        FROM greedy g JOIN ordered o
          ON o.shard = g.shard AND o.rn = g.rn + 1
    )
    SELECT id AS {id_col}, t AS {token_col},
           shard * CAST({span} AS BIGINT) + pack_seq AS pack_id, oversize
    FROM greedy
    """


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
