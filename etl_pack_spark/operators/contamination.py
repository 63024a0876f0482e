"""Train/eval contamination detection: flag training documents that
share long word n-grams with an evaluation set.

The standard decontamination step in LLM training-data pipelines
(benchmark answers leaking into pre-training text). A train doc is
contaminated when any of its ``n``-gram shingles appears in ANY eval
doc; the operator reports per-train-doc hit counts so callers can
threshold, inspect, or drop. (Not in the reference — whose dedup is
whole-row-only, etl.go:59-68 — part of the SURVEY §7.3 extension
family; same shingle machinery as :mod:`~.neardup`.)

Scale design:
  * The eval side is shingled to a DISTINCT hash set — eval sets
    (benchmarks) are orders of magnitude smaller than the corpus, so
    this set is tiny and Catalyst broadcasts the semi-join build side:
    the corpus-side scan streams map-only, nothing corpus-sized is
    ever shuffled.
  * Train shingles are hashed to 64-bit (xxhash64) BEFORE the join, so
    the join carries 8-byte keys, not n-word strings.
  * Per-doc hit counts aggregate map-side (partial count) — one
    shuffle of (doc, count) pairs bounded by contaminated docs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.tokenize import shingle_rows, shingles_sql, tokens_sql


def eval_ngram_set(eval_df: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct 64-bit hashes of the eval set's word n-grams — the
    (small) build side of the contamination semi-join."""
    tagged = eval_df.select(F.monotonically_increasing_id().alias("__eid"), text_col)
    return (
        shingle_rows(tagged, "__eid", text_col, n)
        .select(F.xxhash64("s").alias("gh"))
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-train-doc contamination: ``(id_col, hits)`` for every train
    doc sharing ≥ 1 distinct word ``n``-gram with the eval set.

    ``hits`` counts DISTINCT shared n-grams (a doc repeating one leaked
    n-gram scores 1), so thresholds mean "how much eval text appears",
    not "how often"."""
    evset = eval_ngram_set(eval_df, text_col, n)
    train_grams = shingle_rows(train, id_col, text_col, n).select(
        id_col, F.xxhash64("s").alias("gh")
    )
    return (
        # bounded by construction: evset is the distinct n-gram hashes
        # of the EVAL set — benchmarks are fixed-size by contract
        # (thousands of questions), independent of corpus scale
        train_grams.join(F.broadcast(evset), "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").alias("hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_hits: int = 0,
) -> DataFrame:
    """Drop train docs with more than ``max_hits`` distinct shared
    n-grams (default: any overlap).

    The flagged-id set is USUALLY small (clean corpus, fixed eval set)
    — but it grows with corpus size for a fixed eval set, and a
    heavily contaminated mirror-crawl can flag a large corpus fraction,
    so the anti-join build side is NOT bounded by construction. The
    flagged frame is persisted (its lineage is a full train-shingle
    scan — the probe and the join must not run it twice) and routed
    through :func:`~etl_pack_spark.operators.guards.maybe_broadcast`:
    broadcast when a bounded probe proves it small, AQE's shuffled
    join otherwise. The corpus side is never shuffled in the broadcast
    case."""
    from etl_pack_spark.operators.cache import pooled_persist
    from etl_pack_spark.operators.guards import maybe_broadcast

    flagged = pooled_persist(
        contamination_report(train, eval_df, id_col, text_col, n)
        .where(F.col("hits") > max_hits)
        .select(id_col)
    )
    return train.join(maybe_broadcast(flagged), id_col, "left_anti")


def eval_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-EVAL-ITEM contamination: ``(id_col, n_grams, n_hit,
    contaminated_frac)`` — for each eval doc with ≥ 1 word ``n``-gram,
    the fraction of its DISTINCT n-grams that appear anywhere in the
    training corpus. The reverse direction of
    :func:`contamination_report`: that one decides which TRAIN docs to
    drop; this one measures how compromised each EVAL item (benchmark
    question) is — the number a benchmark contamination appendix
    reports ("X% of test items are ≥ 50% contaminated") and the basis
    for flagging/removing eval items rather than training text.
    Zero-hit eval items appear with frac 0 (a report that silently
    omits clean items can't state a contamination RATE).

    Scale: the corpus-sized side does map-only shingling + ONE
    semi-join against the (broadcast, benchmark-sized) eval gram set;
    what comes back — the distinct TRAIN-∩-EVAL gram hashes — is
    bounded by the eval set again, so the final per-item join
    broadcasts too. Nothing corpus-sized ever shuffles.
    """
    ev_grams = (
        shingle_rows(eval_df, id_col, text_col, n)
        .select(id_col, F.xxhash64("s").alias("gh"))
        .distinct()
    )
    # bounded by construction: benchmarks are fixed-size by contract
    ev_gram_set = ev_grams.select("gh").distinct()
    train_grams = shingle_rows(train, id_col, text_col, n).select(
        F.xxhash64("s").alias("gh")
    )
    # bounded by construction: a subset of the eval gram set
    hit_set = (
        train_grams.join(F.broadcast(ev_gram_set), "gh", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per = ev_grams.join(F.broadcast(hit_set), "gh", "left")
    return per.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("n_hit"),
    ).select(
        id_col,
        "n_grams",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.col("n_grams").cast("double"), 9
        ).alias("contaminated_frac"),
    )


def eval_contamination_sql(
    train_table: str,
    eval_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    """DuckDB oracle twin of :func:`eval_contamination` (string
    shingles — same hashing caveat as :func:`contamination_report_sql`)."""
    return f"""
    WITH __ev AS (
        SELECT DISTINCT {id_col}, unnest({shingles_sql('toks', n)}) AS s
        FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {eval_table})
    ),
    __hits AS (
        SELECT DISTINCT s
        FROM (
            SELECT unnest({shingles_sql('toks', n)}) AS s
            FROM (SELECT {tokens_sql(text_col)} AS toks FROM {train_table})
        )
        WHERE s IN (SELECT s FROM __ev)
    )
    SELECT {id_col},
           count(*) AS n_grams,
           count(h.s) AS n_hit,
           round(CAST(count(h.s) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
               AS contaminated_frac
    FROM __ev LEFT JOIN __hits h USING (s)
    GROUP BY {id_col}
    """


def contamination_report_sql(
    train_table: str,
    eval_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    """DuckDB oracle twin of :func:`contamination_report` (string
    shingles compared directly — hashing is an engine-side join-width
    optimization that cannot change the distinct-match count)."""
    return f"""
    WITH __ev_grams AS (
        SELECT DISTINCT unnest({shingles_sql('toks', n)}) AS s
        FROM (SELECT {tokens_sql(text_col)} AS toks FROM {eval_table})
    ),
    __train_grams AS (
        SELECT {id_col}, unnest({shingles_sql('toks', n)}) AS s
        FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {train_table})
    )
    SELECT {id_col}, count(DISTINCT s) AS hits
    FROM __train_grams JOIN __ev_grams USING (s)
    GROUP BY {id_col}
    """
