"""Naive-Bayes document classifier, engine-native — the "quality
filter" shape LLM data pipelines use (GPT-3 / The Pile filter quality
with a linear text classifier over reference vs. crawl documents; a
multinomial NB over token counts is the deterministic, shuffle-friendly
member of that family; cf. PAPERS.md "ML Inference Pipeline Execution
Using Pure SQL Based on Operator Fusion" — scoring here fuses into
ordinary relational operators).

Scale shape:
  * TRAIN: one exploded-token aggregate per (token, label) — map-side
    combinable, vocabulary-sized result (zipf ⇒ ≪ corpus). The model
    IS a DataFrame of per-token log-likelihood ratios; no driver-side
    state, no iterations.
  * SCORE: broadcast the model onto exploded tokens, one
    map-side-combinable sum per doc. Same plan family as
    textops.unigram_logprob / lexicon_sentiment.

Determinism: counts are exact; ln() is libm-dependent (±1 ulp), so the
DuckDB twin is compared at tight relative tolerance, not hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.tokenize import tokens, tokens_sql


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Train multinomial NB over token counts for a BOOLEAN label.
    Returns the model as a DataFrame: one ``(tok, llr)`` row per token
    seen in training (log P(tok|pos) - log P(tok|neg), add-``alpha``
    smoothed over the joint vocabulary) plus one ``(__prior__, llr)``
    row carrying log P(pos) - log P(neg).

    NULL labels are NOT training examples: an unlabeled document is
    neither a positive nor a negative (``F.when(y, 0).otherwise(1)``
    would silently count it as negative), so they are filtered here.
    Scoring is a separate concern — :func:`nb_score` scores whatever
    rows it is given, labeled or not."""
    df = df.where(F.col(label_col).isNotNull())
    toks = df.select(
        F.col(label_col).cast("boolean").alias("y"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    from etl_pack_spark.operators.cache import pooled_persist

    counts = pooled_persist(
        toks.groupBy("tok").agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c_neg"),
        )
    )
    stats = counts.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
        F.count("*").alias("vocab"),
    )
    # bounded by construction: stats is a ONE-ROW global aggregate
    tok_llr = counts.crossJoin(F.broadcast(stats)).select(
        "tok",
        (
            F.log((F.col("c_pos") + alpha) / (F.col("t_pos") + alpha * F.col("vocab")))
            - F.log((F.col("c_neg") + alpha) / (F.col("t_neg") + alpha * F.col("vocab")))
        ).alias("llr"),
    )
    docs = df.select(F.col(label_col).cast("boolean").alias("y"))
    prior = docs.agg(
        F.log(
            (F.sum(F.when(F.col("y"), 1).otherwise(0)) + F.lit(alpha))
            / (F.sum(F.when(F.col("y"), 0).otherwise(1)) + F.lit(alpha))
        ).alias("llr")
    ).select(F.lit("__prior__").alias("tok"), "llr")
    return tok_llr.unionByName(prior)


def nb_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
) -> DataFrame:
    """Score documents: ``(id, score, pred)`` where score = prior llr +
    Σ llr(token) over known tokens (unknown tokens contribute 0 — both
    classes smoothed equally) and pred = score > 0. Broadcast model
    (guarded — a vocabulary past guards.MAX_BROADCAST_MODEL_ROWS falls
    back to an AQE-planned join), two map-side-combinable aggregates,
    corpus never shuffles raw."""
    from etl_pack_spark.operators.cache import pooled_persist
    from etl_pack_spark.operators.guards import maybe_broadcast

    prior = model.where(F.col("tok") == "__prior__").select(
        F.col("llr").alias("__prior")
    )
    # pooled: the guard probe and the join would otherwise run the
    # model's lineage twice
    tok_model = pooled_persist(model.where(F.col("tok") != "__prior__"))
    toks = df.select(F.col(id_col).alias("id"), F.explode_outer(tokens(text_col)).alias("tok"))
    scored = (
        toks.join(maybe_broadcast(tok_model), "tok", "left")
        .groupBy("id")
        .agg(F.coalesce(F.sum("llr"), F.lit(0.0)).alias("__tok_llr"))
        # bounded by construction: prior is a ONE-ROW aggregate
        .crossJoin(F.broadcast(prior))
    )
    return scored.select(
        "id",
        (F.col("__tok_llr") + F.col("__prior")).alias("score"),
        ((F.col("__tok_llr") + F.col("__prior")) > 0).alias("pred"),
    )


def nb_train_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    label_expr: str,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of train-on-self + score (the supervised analogue of
    ``unigram_logprob_sql``); ``label_expr`` is a boolean SQL expression
    over the table's columns.

    Score-set semantics (matches the Spark pair): the model trains only
    on rows where ``label_expr`` is non-NULL (:func:`nb_train` filters
    them), but EVERY row is scored — scoring needs no label."""
    return f"""
    WITH base AS (
        SELECT {id_col} AS id, ({label_expr}) AS y,
               {tokens_sql(text_col)} AS toks
        FROM {table}
    ),
    train AS (SELECT * FROM base WHERE y IS NOT NULL),
    tk_train AS (SELECT id, y, unnest(toks) AS tok FROM train),
    tk_all AS (SELECT id, unnest(toks) AS tok FROM base),
    counts AS (
        SELECT tok,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
               sum(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
        FROM tk_train GROUP BY tok
    ),
    stats AS (SELECT sum(c_pos) AS t_pos, sum(c_neg) AS t_neg, count(*) AS vocab FROM counts),
    model AS (
        SELECT tok,
               ln((c_pos + {alpha}) / (t_pos + {alpha} * vocab))
             - ln((c_neg + {alpha}) / (t_neg + {alpha} * vocab)) AS llr
        FROM counts, stats
    ),
    prior AS (
        SELECT ln((sum(CASE WHEN y THEN 1 ELSE 0 END) + {alpha})
                / (sum(CASE WHEN y THEN 0 ELSE 1 END) + {alpha})) AS p
        FROM train
    )
    SELECT b.id,
           coalesce(s.tok_llr, 0.0) + prior.p AS score,
           (coalesce(s.tok_llr, 0.0) + prior.p) > 0 AS pred
    FROM (SELECT id FROM base) b
    LEFT JOIN (
        SELECT id, sum(llr) AS tok_llr
        FROM tk_all JOIN model USING (tok)
        GROUP BY id
    ) s ON s.id = b.id, prior
    """


# ---------------------------------------------------------------------------
# Trained language ID (r14, round-13 VERDICT #7): multiclass NB over
# char n-grams — the fastText-shaped public-knowledge langid (Joulin et
# al. 2016 use char n-gram features; NB is this module's deterministic,
# shuffle-friendly stand-in for the linear classifier), replacing the
# marker-lexicon heuristic as the primary predictor while the heuristic
# stays as the model-less fallback.
# ---------------------------------------------------------------------------

LANGID_MANIFEST = "_langid_manifest.json"


def char_ngrams(text_col: str, n: int = 3):
    """Overlapping char n-grams of ``lower(text)`` as an array column —
    the language-id feature (accents, articles-with-surrounding-spaces,
    and morphology all live at the trigram level). Texts shorter than
    ``n`` yield an empty array (Spark's ``sequence`` steps DOWNWARD
    when start > stop, so the guard is load-bearing)."""
    t = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (n - 1)),
        lambda i: t.substr(i, F.lit(n)),
    )
    return F.when(F.length(t) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def char_ngrams_sql(text_col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`char_ngrams` (range() upper bound is
    exclusive, and an empty range gives the empty list for free)."""
    t = f"lower({text_col})"
    return (
        f"list_transform(range(1, greatest(length({t}) - {n - 1}, 0) + 1), "
        f"i -> substr({t}, CAST(i AS INT), {n}))"
    )


def nb_langid_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n: int = 3,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train the multiclass NB langid. Returns ``(grams, meta)``:

    * ``grams`` — ``(g, lang, llk)``: add-``alpha``-smoothed
      ``ln P(gram | lang)`` for every OBSERVED (gram, lang) pair.
    * ``meta`` — ``(lang, prior_ll, unseen_ll)``: ``ln P(lang)`` and
      the smoothed log-likelihood of a vocabulary gram UNSEEN for that
      language, ``ln(alpha / (tot_lang + alpha·V))``.

    Storing only observed pairs plus the per-language unseen mass is
    exactly full joint-vocabulary smoothing (a vocab gram absent for a
    language scores ``unseen_ll``), without materializing the
    vocab × languages cross product — the model stays
    observed-pairs-sized, and scoring reconstructs the rest from
    counts (:func:`nb_langid_score`).

    Scale shape: one exploded-gram aggregate (map-side combinable,
    vocabulary-sized result), one global vocab count, one label-sized
    doc count — no iterations, no driver-side state beyond the
    language list. NULL labels and NULL texts are not training
    examples."""
    from etl_pack_spark.operators.cache import pooled_persist

    labeled = df.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    )
    g = labeled.select(
        F.col(label_col).alias("lang"),
        F.explode(char_ngrams(text_col, n)).alias("g"),
    )
    counts = pooled_persist(
        g.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = counts.select("g").distinct().count()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    grams = counts.join(F.broadcast(totals), "lang").select(
        "g",
        "lang",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("tot") + F.lit(alpha * vocab))
        ).alias("llk"),
    )
    n_docs = labeled.count()
    meta = (
        labeled.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(totals), "lang", "left")
        .select(
            "lang",
            F.log(F.col("n") / F.lit(float(n_docs))).alias("prior_ll"),
            F.log(
                F.lit(alpha)
                / (F.coalesce(F.col("tot"), F.lit(0)) + F.lit(alpha * vocab))
            ).alias("unseen_ll"),
        )
    )
    return grams, meta


def nb_langid_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    grams: DataFrame,
    meta: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Score documents against a trained langid model:
    ``(id_col, lang_pred, lang_score)`` with

    ``score(lang) = prior_ll + Σ_hits llk + (n_g − n_hit)·unseen_ll``

    — exactly full-smoothing NB given the train-side decomposition.
    Ties and cross-engine float noise resolve by rounding to 9 dp and
    taking the alphabetically first language (``min_by`` over
    ``(-score, lang)``). NULL/short texts (no grams) score on priors
    alone — still a deterministic prediction, mirroring the
    heuristic's all-zero-marker fallback posture.

    Scale shape: explode → ONE broadcast-guarded join against the
    vocabulary-sized model → one combinable (id, lang) aggregate → the
    languages-wide per-doc argmax. The corpus never shuffles raw text;
    the per-doc language fan-out is |languages| (a handful)."""
    from etl_pack_spark.operators.guards import maybe_broadcast
    from etl_pack_spark.operators.partitioning import spread_small_scan

    # conditional spread (r15): the gram explode + model join + partial
    # aggregate all run in the SCAN stage (the model join is broadcast),
    # so a single-file fixture corpus executed the whole scoring pass in
    # ONE task (the two 5-6 s single-task jobs in the r15 profile);
    # production many-split scans are untouched
    docs = spread_small_scan(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")),
        "__id",
    )
    # NOT persisted: the exploded gram stream is corpus-sized and has
    # exactly ONE consumer (the model join) — n_g comes from its own
    # map-only size() projection, so both passes stay scan -> map
    gr = docs.select("__id", F.explode(char_ngrams("__t", n)).alias("g"))
    n_g = docs.select(
        "__id", F.size(char_ngrams("__t", n)).alias("n_g")
    )
    hits = (
        gr.join(maybe_broadcast(grams), "g")
        .groupBy("__id", "lang")
        .agg(F.sum("llk").alias("s"), F.count(F.lit(1)).alias("n_hit"))
    )
    # bounded by construction: meta has one row per LANGUAGE
    per_lang = (
        n_g.crossJoin(F.broadcast(meta))
        .join(hits, ["__id", "lang"], "left")
        .select(
            "__id",
            "lang",
            (
                F.col("prior_ll")
                + F.coalesce(F.col("s"), F.lit(0.0))
                + (F.col("n_g") - F.coalesce(F.col("n_hit"), F.lit(0)))
                * F.col("unseen_ll")
            ).alias("score"),
        )
    )
    return per_lang.groupBy("__id").agg(
        F.expr(
            "min_by(lang, struct(-round(score, 9), lang))"
        ).alias("lang_pred"),
        F.max(F.round("score", 9)).alias("lang_score"),
    ).select(F.col("__id").alias(id_col), "lang_pred", "lang_score")


def nb_langid_score_sql(
    table: str,
    grams_table: str,
    meta_table: str,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> str:
    """DuckDB twin of :func:`nb_langid_score` — same decomposition,
    same rounding, same alphabetical tie-break. ``grams_table`` /
    ``meta_table`` are the trained model frames registered as views."""
    return f"""
    WITH d AS (SELECT {id_col} AS id, {char_ngrams_sql(text_col, n)} AS gs
               FROM {table}),
    counts AS (SELECT id, len(gs) AS n_g FROM d),
    e AS (SELECT id, unnest(gs) AS g FROM d),
    hits AS (
        SELECT e.id, m.lang, sum(m.llk) AS s, count(*) AS n_hit
        FROM e JOIN {grams_table} m USING (g)
        GROUP BY e.id, m.lang
    ),
    per_lang AS (
        SELECT c.id, mt.lang,
               mt.prior_ll + coalesce(h.s, 0.0)
               + (c.n_g - coalesce(h.n_hit, 0)) * mt.unseen_ll AS score
        FROM counts c CROSS JOIN {meta_table} mt
        LEFT JOIN hits h ON h.id = c.id AND h.lang = mt.lang
    )
    SELECT id AS {id_col}, lang AS lang_pred, round(score, 9) AS lang_score
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY id ORDER BY round(score, 9) DESC, lang
        ) AS rk
        FROM per_lang
    ) WHERE rk = 1
    """


def langid_model_save(
    spark,
    grams: DataFrame,
    meta: DataFrame,
    path: str,
    n: int = 3,
    alpha: float = 1.0,
) -> None:
    """Persist a trained langid model (the model-store lifecycle every
    other trained artifact here has): ``grams/`` + ``meta/`` parquet
    plus the manifest, all staged and published by the atomic swap —
    a torn write must never yield a grams/meta generation mix."""
    import json

    from etl_pack_spark.sinks.atomic import (
        clean_orphan_stages,
        publish_swap,
        recover_swap,
        stage_dir,
    )
    from etl_pack_spark.sinks.fsio import write_text

    recover_swap(path)
    clean_orphan_stages(path, "langid_stage_")
    staged = stage_dir(path, prefix="langid_stage_")
    grams.write.mode("overwrite").parquet(f"{staged}/grams")
    meta.coalesce(1).write.mode("overwrite").parquet(f"{staged}/meta")
    write_text(
        spark, f"{staged}/{LANGID_MANIFEST}",
        json.dumps({"n": int(n), "alpha": float(alpha), "version": 1}),
    )
    publish_swap(staged, path)


def langid_model_load(spark, path: str):
    """``(grams, meta, n)`` from a saved model, or ``None`` when no
    model exists at ``path`` — the fallback signal
    :func:`language_id_trained` keys on. A dir WITHOUT the manifest is
    tampered/partial and raises instead of silently predicting."""
    import json

    from etl_pack_spark.sinks.fsio import exists, read_text

    p = path.rstrip("/")
    if not exists(spark, p):
        return None
    raw = read_text(spark, f"{p}/{LANGID_MANIFEST}")
    if raw is None:
        raise ValueError(
            f"{path!r} has no {LANGID_MANIFEST} — not a langid model "
            "store (train one with nb_langid_train + langid_model_save)"
        )
    mf = json.loads(raw)
    return (
        spark.read.parquet(f"{p}/grams"),
        spark.read.parquet(f"{p}/meta"),
        int(mf["n"]),
    )


def language_id_trained(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model_path: str | None = None,
) -> DataFrame:
    """Language ID with the trained-model-first / heuristic-fallback
    contract (round-13 VERDICT #7): when ``model_path`` holds a saved
    NB model, predictions come from :func:`nb_langid_score`; when it
    is None or empty (no model trained yet), the marker-lexicon
    heuristic (:func:`textops.language_id`) answers instead. Returns
    ``(id_col, lang_pred, lang_source)`` with ``lang_source`` ∈
    {'model', 'heuristic'} so downstream consumers (the datacard's
    declared-vs-predicted column) can see which predictor ran."""
    from etl_pack_spark.operators.textops import language_id

    spark = df.sparkSession
    model = langid_model_load(spark, model_path) if model_path else None
    if model is None:
        return language_id(df, id_col, text_col).select(
            id_col, "lang_pred", F.lit("heuristic").alias("lang_source")
        )
    grams, meta, n = model
    return nb_langid_score(df, id_col, text_col, grams, meta, n).select(
        id_col, "lang_pred", F.lit("model").alias("lang_source")
    )
