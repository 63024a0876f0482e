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
