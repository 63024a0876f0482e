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

from pyspark.sql import Column
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
