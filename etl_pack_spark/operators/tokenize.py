"""Shared text tokenization / shingling for the near-dup and text-ops
families — defined ONCE for both engines.

Every function here comes in two flavors with pinned-identical
semantics: a Spark Column expression (the engine) and a DuckDB SQL
fragment (the correctness oracle). Tokenization is lowercase +
split on ``[^a-z0-9]+`` with empties dropped; k-shingles are
space-joined consecutive token k-grams. Keeping the two dialects side
by side in one module is what keeps them from drifting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def tokens(col: str) -> Column:
    """Lowercased word tokens of a text column (empties removed)."""
    return F.filter(
        F.split(F.lower(F.col(col)), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def shingles_expr(toks_col: str, k: int) -> Column:
    """k-gram shingles over a token-array column. Guarded: Spark's
    sequence(1, n) *descends* when n < 1, so short docs explicitly
    yield an empty array."""
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {k} THEN "
        f"  transform(sequence(1, size({toks_col}) - {k} + 1), "
        f"            i -> concat_ws(' ', slice({toks_col}, i, {k}))) "
        f"ELSE array() END"
    )


def shingle_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    distinct: bool = True,
    positions: bool = False,
) -> DataFrame:
    """k-shingles as ROWS (id, s) — the scale path.

    ``distinct=False`` skips the dedup shuffle — correct for consumers
    whose aggregate is multiset-invariant (minhash: min over duplicates
    equals min over the set); Jaccard set arithmetic needs the default.

    ``positions=True`` keeps each window's starting token offset as a
    ``pos`` column (rows ``(id, pos, s)``) for consumers that excise or
    locate spans; it requires ``distinct=False`` because a distinct
    ``(id, s)`` row has no single canonical position.

    posexplode + window ``lead`` keeps shingle construction inside
    whole-stage codegen (~10x faster than the interpreted
    transform/slice array lambdas) and the explode output feeds
    aggregations without materializing per-doc arrays. The repartition
    parallelizes CPU-bound work off small single-file scans and
    pre-satisfies the window's partitioning, so the window adds a sort
    but no extra shuffle.
    """
    if positions and distinct:
        raise ValueError(
            "positions=True requires distinct=False (a distinct (id, s) "
            "row has no single canonical pos)"
        )
    toks = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    keep = [id_col, "pos", "s"] if positions else [id_col, "s"]
    if k == 1:
        out = toks.select(F.col(id_col), "pos", F.col("tok").alias("s")).select(
            *keep
        )
        return out.dropDuplicates([id_col, "s"]) if distinct else out
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", j).over(w) for j in range(1, k)]
    out = (
        toks.select(
            F.col(id_col),
            F.col("pos"),
            F.concat_ws(" ", F.col("tok"), *leads).alias("s"),
            leads[-1].alias("__last"),
        )
        .where(F.col("__last").isNotNull())
        .select(*keep)
    )
    return out.dropDuplicates([id_col, "s"]) if distinct else out


# ---------------------------------------------------------------------------
# DuckDB oracle side (SQL text builders)
# ---------------------------------------------------------------------------

def tokens_sql(col: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({col}), '{TOKEN_SPLIT_RE}'), "
        f"x -> x != '')"
    )


def shingles_sql(toks_col: str, k: int) -> str:
    # generate_series(1, 0) is already empty in DuckDB; the CASE keeps
    # the two dialects textually parallel.
    return (
        f"CASE WHEN len({toks_col}) >= {k} THEN "
        f"  list_transform(generate_series(1, len({toks_col}) - {k} + 1), "
        f"                 i -> array_to_string({toks_col}[i:i+{k - 1}], ' ')) "
        f"ELSE [] END"
    )
