"""C4-style corpus cleaning: line-level boilerplate removal plus
document-level gates, as pure Catalyst expressions.

The heuristics are the public C4 recipe (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning", Appendix — the cleaning rules behind
the C4 corpus):

  * keep only lines that end in a terminal punctuation mark,
  * keep only lines with at least ``min_words`` words,
  * drop lines mentioning javascript / cookie / privacy-policy
    boilerplate,
  * drop whole documents containing "lorem ipsum", a curly brace
    (code), or any bad-word token,
  * drop documents with fewer than ``min_lines`` surviving lines.

Scale design: everything is a map-only projection over the text column
— higher-order array functions (``filter`` / ``transform`` /
``exists``) on the split lines, no explode, no shuffle, no Python. A
100 TB cleaning pass is therefore a single scan whose cost is the
regex work itself, and it composes with the curation pipeline
(`plans/curate.py`) without adding a stage. All predicates are exact
string/integer logic with DuckDB SQL twins, so the oracle comparison
is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Terminal punctuation per C4: sentence-enders plus closing quote.
TERMINAL_RE = '[.!?"’”]$'
# Lowercased substrings that mark a boilerplate line.
LINE_BLOCKLIST = ["javascript", "cookie policy", "privacy policy", "terms of use"]
# Lowercased substrings that disqualify the whole document.
DOC_BLOCKLIST = ["lorem ipsum", "{"]

_WORDS = "size(filter(split(trim({l}), '\\\\s+'), w -> w != ''))"


def _line_keep_pred(var: str, min_words: int) -> str:
    """SQL predicate (Spark dialect) deciding whether line ``var`` survives."""
    blocked = " OR ".join(
        f"contains(lower({var}), '{s}')" for s in LINE_BLOCKLIST
    )
    return (
        f"{_WORDS.format(l=var)} >= {min_words} "
        f"AND trim({var}) rlike '{TERMINAL_RE}' "
        f"AND NOT ({blocked})"
    )


def _line_keep_pred_duck(var: str, min_words: int) -> str:
    blocked = " OR ".join(
        f"contains(lower({var}), '{s}')" for s in LINE_BLOCKLIST
    )
    return (
        f"len(list_filter(string_split_regex(trim({var}), '\\s+'), w -> w != '')) >= {min_words} "
        f"AND regexp_matches(trim({var}), '{TERMINAL_RE}') "
        f"AND NOT ({blocked})"
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """Clean ``text_col`` with the C4 recipe.

    Returns ``(id, text_clean, n_lines, n_kept)`` for the documents
    that survive the document-level gates; ``text_clean`` is the
    surviving lines re-joined with newlines. Map-only — no shuffle.
    """
    badwords = badwords if badwords is not None else []
    lines = f"split({text_col}, '\\n')"
    kept = f"filter({lines}, l -> {_line_keep_pred('l', min_words)})"
    doc_blocked = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in DOC_BLOCKLIST
    )
    if badwords:
        toks = ", ".join(f"'{w}'" for w in badwords)
        doc_blocked += (
            f" OR exists(split(lower({text_col}), '[^a-z0-9]+'), "
            f"t -> array_contains(array({toks}), t))"
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(f"size({lines})").alias("n_lines"),
            F.expr(kept).alias("__kept"),
            F.expr(f"({doc_blocked})").alias("__blocked"),
        )
        .where(~F.col("__blocked") & (F.size("__kept") >= min_lines))
        .select(
            "id",
            F.array_join("__kept", "\n").alias("text_clean"),
            "n_lines",
            F.size("__kept").alias("n_kept"),
        )
    )


def c4_clean_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
) -> str:
    """DuckDB oracle twin of :func:`c4_clean` (exact semantics)."""
    badwords = badwords if badwords is not None else []
    lines = f"string_split({text_col}, chr(10))"
    kept = f"list_filter({lines}, l -> {_line_keep_pred_duck('l', min_words)})"
    doc_blocked = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in DOC_BLOCKLIST
    )
    if badwords:
        toks = ", ".join(f"'{w}'" for w in badwords)
        doc_blocked += (
            f" OR len(list_filter(list_filter(string_split_regex(lower({text_col}), "
            f"'[^a-z0-9]+'), t -> t != ''), t -> list_contains([{toks}], t))) > 0"
        )
    return f"""
    WITH c AS (
        SELECT {id_col} AS id,
               len({lines}) AS n_lines,
               {kept} AS kept,
               ({doc_blocked}) AS blocked
        FROM {table}
    )
    SELECT id, array_to_string(kept, chr(10)) AS text_clean,
           n_lines, len(kept) AS n_kept
    FROM c WHERE NOT blocked AND len(kept) >= {min_lines}
    """
