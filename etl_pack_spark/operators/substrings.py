"""Corpus-level repeated-substring detection (exact-substring dedup,
approximated at fixed window length).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499) remove any ≥50-token substring that appears
verbatim more than once in the corpus, found with a suffix array — a
global sorted structure that does not distribute. The standard
distributed approximation (used here) slides a fixed ``k``-token window
over every document and flags windows whose text occurs in more than
one document: any verbatim overlap of length ≥ k contains at least one
shared window, so window-level detection is exact for overlaps ≥ k
(shorter overlaps are invisible — the approximation).

This complements the doc-level near-dup family (`neardup.py`: whole-doc
MinHash/SimHash) and the line-level `cleaning.dedup_lines`: it catches
long shared PASSAGES buried inside otherwise-distinct documents
(boilerplate licenses, quoted articles, templated sections).

Scale shape: windows are the posexplode+lead shingle stream (codegen,
no per-doc arrays), hashed to 16-byte md5 before any shuffle so the
exchange carries hashes, not text. Corpus-wide duplication is a COUNT
OVER (PARTITION BY hash) window — ONE shuffle by hash, no self-join —
and the per-doc rollup is a map-side-combinable aggregate. Nothing
collects; the duplicated-window set is never materialized driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pack_spark.operators.tokenize import shingle_rows, shingles_sql, tokens_sql


def repeated_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_dup_fraction: float = 0.5,
) -> DataFrame:
    """Per-document repeated-substring report over the whole corpus.

    A *window* is a distinct ``k``-token shingle of a document; a window
    is *duplicated* when its exact text also occurs in at least one
    OTHER document. Output per input row:

    - ``n_windows``      distinct k-token windows in the doc
    - ``n_dup_windows``  of those, how many occur in ≥ 2 docs
    - ``dup_fraction``   n_dup_windows / n_windows (0.0 when the doc
      has fewer than k tokens)
    - ``keep``           dup_fraction ≤ ``max_dup_fraction`` — the
      filter gate (Lee et al. REMOVE the spans; at corpus-curation
      level the practical gate is dropping documents that are mostly
      duplicated material, the posture RefinedWeb/FineWeb take)
    """
    wins = shingle_rows(df, id_col, text_col, k=k, distinct=True).select(
        F.col(id_col), F.md5(F.col("s")).alias("h")
    )
    # distinct (doc, window) rows → per-hash partition count == number
    # of distinct docs containing the window
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = wins.select(F.col(id_col), (n_docs >= 2).alias("is_dup"))
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_windows"),
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        )
    )
    frac = F.when(
        F.col("n_windows") > 0,
        F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_windows", "n_dup_windows", frac.alias("dup_fraction")
    ).withColumn("keep", F.col("dup_fraction") <= F.lit(max_dup_fraction))


def repeated_ngram_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_dup_fraction: float = 0.5,
) -> str:
    """Oracle twin of :func:`repeated_ngram_spans` — same tokenization,
    same distinct-window set, same ≥2-docs rule, same arithmetic."""
    return f"""
    WITH toks AS (
        SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}
    ),
    wins AS (
        SELECT DISTINCT {id_col}, md5(s) AS h
        FROM (SELECT {id_col}, unnest({shingles_sql('t', k)}) AS s FROM toks)
    ),
    flagged AS (
        SELECT {id_col}, (COUNT(*) OVER (PARTITION BY h)) >= 2 AS is_dup
        FROM wins
    ),
    per_doc AS (
        SELECT {id_col}, COUNT(*) AS n_windows,
               SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_windows
        FROM flagged GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
           -- SUM(BIGINT) is HUGEINT in DuckDB → pandas float64; the
           -- driver's frame compare needs the engine's BIGINT
           CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CASE WHEN COALESCE(p.n_windows, 0) > 0
                THEN CAST(p.n_dup_windows AS DOUBLE) / CAST(p.n_windows AS DOUBLE)
                ELSE 0.0 END AS dup_fraction,
           (CASE WHEN COALESCE(p.n_windows, 0) > 0
                 THEN CAST(p.n_dup_windows AS DOUBLE) / CAST(p.n_windows AS DOUBLE)
                 ELSE 0.0 END) <= {max_dup_fraction} AS keep
    FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.{id_col}
    """
