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


# ---------------------------------------------------------------------------
# Eval-fingerprint registry (r12): cross-run decontamination store
# ---------------------------------------------------------------------------
#
# decontaminate() takes an eval frame per call; a real training-data
# platform accumulates eval sets over time (new benchmarks, new held-out
# splits) and every ingest/refresh must decontaminate against ALL of
# them. The registry persists each eval set's distinct n-gram hashes
# ONCE — (gh, eval_set, registered_at_ms) rows, benchmark-sized, so the
# store stays broadcast-sized by contract — and later runs join against
# the store without ever re-reading eval text. Same operational posture
# as the other incremental stores: exclusive ingest lease around the
# append, append-only parquet, a manifest (underscore name, invisible
# to parquet readers) pinning the shingle width so every consumer
# fingerprints identically.

_REGISTRY_META = "_eval_registry.json"


def _registry_meta_path(store_path: str) -> str:
    return store_path.rstrip("/") + "/" + _REGISTRY_META


def _registry_n(spark, store_path: str, n: int | None) -> int:
    """The registry's pinned shingle width. A mismatched ``n`` silently
    produces zero matches (different fingerprint space), so consumers
    must take the stored value — an explicit contradicting ``n`` is a
    loud error, not a preference."""
    import json as _json

    from etl_pack_spark.sinks.fsio import read_text

    raw = read_text(spark, _registry_meta_path(store_path))
    if raw is None:
        raise ValueError(
            f"{store_path!r} has no eval-registry manifest "
            f"({_REGISTRY_META}) — register an eval set first, or point "
            "at the right store"
        )
    stored = int(_json.loads(raw)["n"])
    if n is not None and n != stored:
        raise ValueError(
            f"registry {store_path!r} fingerprints {stored}-gram "
            f"shingles; n={n} would silently match nothing — omit n or "
            "re-register into a new store"
        )
    return stored


def register_eval_set(
    spark,
    eval_df: DataFrame,
    store_path: str,
    eval_set: str,
    text_col: str = "text",
    n: int | None = None,
) -> int:
    """Fingerprint one eval set into the registry at ``store_path``:
    distinct 64-bit word-``n``-gram hashes, appended as
    ``(gh, eval_set, registered_at_ms)``. Returns the number of NEW
    hashes appended — re-registering the same set (same name) is
    idempotent by anti-join, so a retried cron firing appends 0.

    The append runs under the store's exclusive ingest lease (one
    registration at a time per store, like every other incremental
    store); the manifest pins ``n`` at first registration (default 8
    when omitted) and later calls must omit it or agree. The store stays benchmark-sized: eval sets are
    thousands of items by contract, so registration is a small job and
    every consumer can broadcast the whole registry."""
    import json as _json
    import time as _time

    from etl_pack_spark.sinks.fsio import exists, read_text, write_text
    from etl_pack_spark.streaming.incremental import _stamp_lease

    if not eval_set or "/" in eval_set:
        raise ValueError(
            f"eval_set must be a non-empty name without '/' "
            f"(got {eval_set!r})"
        )
    with _stamp_lease(spark, store_path):
        meta_path = _registry_meta_path(store_path)
        raw = read_text(spark, meta_path)
        if raw is None:
            n_stored = 8 if n is None else int(n)
        else:
            n_stored = int(_json.loads(raw)["n"])
            if n is not None and int(n) != n_stored:
                raise ValueError(
                    f"registry {store_path!r} fingerprints {n_stored}-"
                    f"gram shingles; cannot register {eval_set!r} with "
                    f"n={n}"
                )
        grams = eval_ngram_set(eval_df, text_col, n_stored)
        if exists(spark, store_path):
            seen = (
                spark.read.parquet(store_path)
                .where(F.col("eval_set") == eval_set)
                .select("gh")
            )
            grams = grams.join(seen, "gh", "left_anti")
        stamped = grams.select(
            "gh",
            F.lit(eval_set).alias("eval_set"),
            F.lit(int(_time.time() * 1000)).alias("registered_at_ms"),
        )
        # manifest BEFORE data: a crash in between leaves an empty-but-
        # described store (harmless); data-without-manifest would make
        # every later consumer raise
        if raw is None:
            write_text(spark, meta_path, _json.dumps({"n": n_stored}))
        appended = stamped.count()
        if appended:
            stamped.coalesce(1).write.mode("append").parquet(store_path)
        return appended


def registered_eval_sets(spark, store_path: str) -> DataFrame:
    """Registry inventory: ``(eval_set, n_grams, registered_at_ms)``
    (first registration time per set) — the audit view."""
    _registry_n(spark, store_path, None)
    return (
        spark.read.parquet(store_path)
        .groupBy("eval_set")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.min("registered_at_ms").alias("registered_at_ms"),
        )
    )


def registry_contamination_report(
    spark,
    train: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-train-doc, per-eval-set contamination against the WHOLE
    registry in one pass: ``(id_col, eval_set, hits)`` with ``hits`` =
    distinct shared n-grams, one row per (doc, set) with any overlap.
    The shingle width comes from the registry manifest, so the train
    side fingerprints exactly like every registered set.

    Scale: ONE corpus shingle scan regardless of how many eval sets
    are registered (the per-call decontaminate would rescan per set);
    the registry side rides the bounded-broadcast guard — benchmark-
    sized by contract, so it broadcasts, but a registry grown past the
    model bound (hundreds of accumulated benchmarks) falls back to
    AQE's shuffled join instead of a forced-broadcast OOM; the groupBy
    carries only matching (doc, set, gh) rows."""
    from etl_pack_spark.operators.guards import maybe_broadcast

    n = _registry_n(spark, store_path, None)
    reg = spark.read.parquet(store_path).select("gh", "eval_set")
    train_grams = shingle_rows(train, id_col, text_col, n).select(
        id_col, F.xxhash64("s").alias("gh")
    )
    return (
        train_grams.join(maybe_broadcast(reg), "gh")
        .groupBy(id_col, "eval_set")
        .agg(F.count_distinct("gh").alias("hits"))
    )


def decontaminate_registered(
    spark,
    train: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Drop train docs sharing more than ``max_hits`` distinct n-grams
    with ANY registered eval set — :func:`decontaminate` lifted to the
    registry: one corpus scan against every benchmark ever registered.
    Same bounded-or-AQE anti-join posture as the per-call variant."""
    from etl_pack_spark.operators.cache import pooled_persist
    from etl_pack_spark.operators.guards import maybe_broadcast

    flagged = pooled_persist(
        registry_contamination_report(spark, train, store_path, id_col, text_col)
        .groupBy(id_col)
        .agg(F.max("hits").alias("__worst"))
        .where(F.col("__worst") > max_hits)
        .select(id_col)
    )
    return train.join(maybe_broadcast(flagged), id_col, "left_anti")


def registry_contamination_report_sql(
    train_table: str,
    eval_tables: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    """DuckDB oracle twin of :func:`registry_contamination_report`
    over named eval tables (string shingles — hashing is an engine-
    side join-width optimization that cannot change distinct-match
    counts)."""
    regs = "\nUNION ALL\n".join(
        f"SELECT DISTINCT '{name}' AS eval_set, "
        f"unnest({shingles_sql('toks', n)}) AS s "
        f"FROM (SELECT {tokens_sql(text_col)} AS toks FROM {table})"
        for name, table in sorted(eval_tables.items())
    )
    return f"""
    WITH __reg AS ({regs}),
    __train_grams AS (
        SELECT {id_col}, unnest({shingles_sql('toks', n)}) AS s
        FROM (SELECT {id_col}, {tokens_sql(text_col)} AS toks FROM {train_table})
    )
    SELECT {id_col}, eval_set, count(DISTINCT s) AS hits
    FROM __train_grams JOIN __reg USING (s)
    GROUP BY {id_col}, eval_set
    """
