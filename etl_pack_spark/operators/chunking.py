"""Document chunking: fixed-size token windows with overlap — the
context-window preparation step RAG indexing and long-document
pretraining both need (each chunk becomes an embedding / training unit;
overlap preserves cross-boundary context). Complements
``operators/packing.py``: packing concatenates SHORT docs up to a
budget, chunking splits LONG docs down to one.

Scale shape: map-only — tokenize, explode one row per window start
(``sequence`` with stride = chunk - overlap), slice + rejoin. No
shuffle, no UDF; a 100 TB corpus chunks at scan speed and the output
inherits the scan's partitioning. The DuckDB twin
(:func:`chunk_documents_sql`) re-derives the identical windows with
list slicing for cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.tokenize import tokens, tokens_sql


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive windows.

    Returns ``(id, chunk_idx, n_chunk_tokens, chunk_text)``, one row
    per window; a document emits ceil(max(n - overlap, 1) / stride)
    windows (empty docs emit nothing — they carry no trainable text;
    the final window is the only one allowed shorter than
    ``chunk_tokens``). Windows past the end are suppressed rather than
    emitted empty: start positions run while ``start <= n - 1`` and a
    trailing window fully contained in the previous one (start > 0 but
    start + chunk beyond n AND previous window already covered to n) is
    kept — matching the standard sliding-window chunkers (every token
    appears in ≥1 chunk; no chunk is a strict suffix duplicate unless
    needed to cover the tail).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # window starts: 0, stride, 2*stride, ... while start < n and the
    # window adds NEW tokens (start + chunk_tokens covers past the
    # previous end ⇔ start < n - overlap for non-final windows; the
    # guard `start <= greatest(n - overlap - 1, 0)` emits exactly the
    # windows whose last token index extends coverage)
    starts = F.expr(
        f"CASE WHEN __n > 0 THEN "
        f"sequence(0, greatest(__n - {overlap} - 1, 0), {stride}) "
        f"ELSE array() END"
    )
    out = (
        toks.select(F.col(id_col), F.col("__toks"), F.col("__n"),
                    F.posexplode(starts).alias("chunk_idx", "__start"))
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.expr(f"slice(__toks, __start + 1, {chunk_tokens})").alias("__w"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.size("__w").alias("n_chunk_tokens"),
            F.array_join("__w", " ").alias("chunk_text"),
        )
    )
    return out


def chunk_documents_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB oracle twin of :func:`chunk_documents` (identical window
    arithmetic via generate_series + list slicing)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH t AS (
        SELECT {id_col}, {tokens_sql(text_col)} AS toks
        FROM {table}
    ),
    n AS (SELECT {id_col}, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    w AS (
        SELECT {id_col}, toks, n,
               unnest(generate_series(0, greatest(n - {overlap} - 1, 0), {stride})) AS start,
               generate_subscripts(generate_series(0, greatest(n - {overlap} - 1, 0), {stride}), 1) - 1 AS chunk_idx
        FROM n
    )
    SELECT {id_col}, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(len(toks[start + 1 : start + {chunk_tokens}]) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text
    FROM w
    """
