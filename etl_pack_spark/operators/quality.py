"""Data-quality profiling (expectations-style), engine-native.

One aggregation pass computes per-column null/distinct/min/max stats —
the validation step an ETL pipeline runs before trusting a load. All
map-side-combinable aggregates: one shuffle of constant-size partial
states regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: list[str],
    numeric_cols: list[str],
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One-row profile: row count, per-column non-null + distinct
    counts, min/max for numeric columns.

    ``approx_distinct=True`` swaps exact ``COUNT(DISTINCT)`` for
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``).
    Exact distinct deduplicates per-column values through a shuffle —
    on a 100 TB high-cardinality column that IS the column; the HLL
    sketch is a constant ~KBs of map-side-combinable state per column,
    which is the right default posture at scale (exact stays the
    DuckDB-twin/oracle variant)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    nd = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx_distinct
        else F.countDistinct
    )
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.agg(*aggs)


def profile_sql(table: str, cols: list[str], numeric_cols: list[str]) -> str:
    parts = ["COUNT(*) AS n_rows"]
    for c in cols:
        parts.append(f"COUNT({c}) AS nn_{c}")
        parts.append(f"COUNT(DISTINCT {c}) AS nd_{c}")
    for c in numeric_cols:
        parts.append(f"MIN({c}) AS min_{c}")
        parts.append(f"MAX({c}) AS max_{c}")
    return f"SELECT {', '.join(parts)} FROM {table}"


def expect(df: DataFrame, checks: dict[str, F.Column]) -> dict[str, bool]:
    """Evaluate named boolean expectations in ONE pass (not one job per
    check): each check is an aggregate boolean expression."""
    row = df.agg(*[v.alias(k) for k, v in checks.items()]).first()
    return {k: bool(row[k]) for k in checks}


def expect_no_nulls(col: str) -> F.Column:
    return F.count(F.when(F.col(col).isNull(), 1)) == 0


def expect_unique(col: str) -> F.Column:
    return F.count(F.col(col)) == F.countDistinct(F.col(col))


def expect_between(col: str, lo, hi) -> F.Column:
    return F.count(F.when(~F.col(col).between(lo, hi), 1)) == 0


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    accuracy: int | None = 10_000,
) -> DataFrame:
    """Robust outlier flagging via median/MAD (the DQ rule that
    survives the very outliers a mean/stddev z-score is skewed by):
    per group, ``robust_z = 0.6745 * |x - median| / MAD`` and
    ``is_outlier = robust_z > k`` (Iglewicz & Hoaglin's modified
    z-score with the standard 3.5 cutoff). A zero/NULL MAD (constant
    or too-small group) flags nothing. NULL values pass through
    unflagged (missingness is the profile's dimension, not
    dispersion's).

    Scale shape: medians come from ONE percentile aggregate per group
    (two sequential aggregates — the MAD needs |x - median| first),
    joined back by group key; the flagging itself is map-only. No
    window over the full table, no sort. With no ``group_cols`` the
    two aggregates are single-row and broadcast back as a cross join.
    Returns the input + ``robust_z`` + ``is_outlier``.

    ``accuracy`` (default 10 000) uses ``percentile_approx`` — a
    bounded-state quantile sketch (KLL/GK-style, error ≤ 1/accuracy of
    rank) whose aggregate buffer is O(accuracy) regardless of group
    size. That is the scale default on purpose: Spark's EXACT
    ``percentile`` buffers a value→count map per group, O(distinct
    values per group) — on a 100 TB continuous-valued column with few
    groups, one group's buffer IS the column (executor OOM).
    ``accuracy=None`` selects the exact aggregate — the DuckDB-twin /
    oracle variant for fixture-scale parity tests (and exact medians on
    provably small groups). Note the two differ in interpolation: the
    sketch returns an actual data value at the rank, exact
    ``percentile`` interpolates between the two middle values — at a
    3.5-MAD cutoff the flag sets typically coincide (pinned on the
    fixture by tests/test_quality.py).
    """
    group_cols = group_cols or []
    med_expr = (
        f"percentile({{c}}, 0.5)"
        if accuracy is None
        else f"percentile_approx({{c}}, 0.5, {int(accuracy)})"
    )
    gb = (lambda d: d.groupBy(*group_cols)) if group_cols else (lambda d: d.groupBy())
    def join_back(left, agg_df, payload):
        # NULL-SAFE group join: a plain equi-join on the names would
        # silently DROP rows whose group key is NULL (Spark equi-joins
        # never match NULLs) while the DuckDB twin's PARTITION BY
        # keeps them as their own group
        if not group_cols:
            # bounded by construction: ungrouped agg_df is ONE row
            return left.crossJoin(F.broadcast(agg_df))
        renamed = agg_df.select(
            *[F.col(c).alias(f"__g_{c}") for c in group_cols], payload
        )
        cond = None
        for c in group_cols:
            e = F.col(c).eqNullSafe(F.col(f"__g_{c}"))
            cond = e if cond is None else (cond & e)
        return left.join(renamed, cond).drop(*[f"__g_{c}" for c in group_cols])

    med = gb(df).agg(
        F.expr(med_expr.format(c=value_col)).alias("__med")
    )
    joined = join_back(df, med, "__med")
    dev = joined.withColumn("__adev", F.abs(F.col(value_col) - F.col("__med")))
    mad = gb(dev).agg(F.expr(med_expr.format(c="__adev")).alias("__mad"))
    full = join_back(dev, mad, "__mad")
    z = F.when(
        F.col("__mad") > 0, 0.6745 * F.col("__adev") / F.col("__mad")
    )
    return (
        full.withColumn("robust_z", z)
        .withColumn("is_outlier", F.coalesce(F.col("robust_z") > k, F.lit(False)))
        .drop("__med", "__adev", "__mad")
    )


def mad_outliers_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    select: str = "*",
) -> str:
    """DuckDB oracle twin of :func:`mad_outliers` — same exact
    interpolated medians (quantile_cont == Spark percentile), same
    modified z-score."""
    group_cols = group_cols or []
    part = f"PARTITION BY {', '.join(group_cols)}" if group_cols else ""
    sel = select if select != "*" else "* EXCLUDE (med, adev, mad)"
    return f"""
    SELECT {sel},
           CASE WHEN mad > 0 THEN 0.6745 * adev / mad END AS robust_z,
           COALESCE(CASE WHEN mad > 0 THEN 0.6745 * adev / mad END > {k},
                    FALSE) AS is_outlier
    FROM (
        SELECT *, quantile_cont(adev, 0.5) OVER ({part}) AS mad
        FROM (
            SELECT *, abs({value_col} - med) AS adev
            FROM (
                SELECT *, quantile_cont({value_col}, 0.5) OVER ({part}) AS med
                FROM {table}
            )
        )
    )
    """


def pii_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """COLUMN-level PII exposure profile: for every string column, the
    count and fraction of rows containing each PII pattern family
    (``textops.PII_PATTERNS`` — emails / card-like numbers / phones).
    The DQ question before the per-row scrub (``textops.redact_pii``)
    is WHICH columns leak: free-text fields that should have been
    structured, or structured fields holding raw contact data.

    ONE aggregation pass, all map-side-combinable count-if aggregates
    (constant state per column×pattern), same shape as
    :func:`profile`. Returns one row:
    ``n_rows`` + ``pii_{pattern}_{col}`` counts +
    ``pii_{pattern}_frac_{col}`` fractions (NULL cells count clean).
    """
    from etl_pack_spark.operators.textops import PII_PATTERNS

    n = F.count(F.lit(1))
    aggs = [n.alias("n_rows")]
    for c in cols:
        for name, pat in PII_PATTERNS:
            hit = F.count(F.when(F.col(c).rlike(pat), 1))
            aggs.append(hit.alias(f"pii_{name}_{c}"))
            aggs.append(
                F.round(hit / n, 6).alias(f"pii_{name}_frac_{c}")
            )
    return df.agg(*aggs)


def pii_profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle twin of :func:`pii_profile` — same regexes, same
    count-if shape."""
    from etl_pack_spark.operators.textops import PII_PATTERNS

    parts = ["COUNT(*) AS n_rows"]
    for c in cols:
        for name, pat in PII_PATTERNS:
            hit = f"COUNT(CASE WHEN regexp_matches({c}, '{pat}') THEN 1 END)"
            parts.append(f"{hit} AS pii_{name}_{c}")
            parts.append(
                f"round(CAST({hit} AS DOUBLE) / COUNT(*), 6) AS pii_{name}_frac_{c}"
            )
    return f"SELECT {', '.join(parts)} FROM {table}"


# ---------------------------------------------------------------------------
# Ingest quality-drift monitoring (r11): PSI over text-signal histograms
# ---------------------------------------------------------------------------

# Fixed bucket edges per drift signal (value -> bucket = count of edges
# <= value; NULL -> bucket -1). FIXED edges, not baseline quantiles, on
# purpose: the bucketing is then a pure function of the row — append-
# stable, engine-reproducible (an approx-quantile baseline would make
# the report depend on sampling internals and differ between engines),
# and comparable ACROSS baselines (the same bucket always means the
# same value range). Edges chosen to resolve the operating range of
# web-corpus documents; pass custom edges for other domains.
DRIFT_EDGES: dict[str, tuple[float, ...]] = {
    "n_tokens": (10, 20, 50, 100, 200, 400, 800),
    "avg_token_len": (3.0, 4.0, 4.5, 5.0, 5.5, 6.5),
    "stopword_ratio": (0.05, 0.10, 0.15, 0.20, 0.30),
    "repetition": (0.01, 0.05, 0.15, 0.30, 0.60),
}

# Categorical drift signals: value -> bucket = position in the
# declared category list (unknown value -> -2, NULL -> -1; both are
# buckets, not drops — an unknown-category flood IS drift). lang_pred
# covers the language-MIX shift, the defining drift case for a
# multilingual corpus.
DRIFT_CATEGORIES: dict[str, tuple[str, ...]] = {
    "lang_pred": ("de", "en", "es", "fr"),
}

# industry-standard PSI reading: <0.1 stable, <0.25 moderate shift,
# else major shift (population stability index, the scorecard-
# monitoring statistic; see e.g. Siddiqi, "Credit Risk Scorecards")
PSI_MODERATE = 0.1
PSI_MAJOR = 0.25


def _check_drift_signal_names(*name_maps) -> None:
    """Signal names are interpolated into generated expressions and
    oracle SQL (identifiers AND string literals) — reject anything
    that is not a plain identifier LOUDLY at call time instead of
    producing a broken expression (the r10 ``badwords`` posture).
    Categorical category values are interpolated as SQL string
    literals; a quote would break the twin, so they are checked too."""
    import re

    for names in name_maps:
        for name in names:
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name or ""):
                raise ValueError(
                    f"drift signal name {name!r} is not a plain "
                    "identifier — it is interpolated into bucket "
                    "expressions and oracle SQL"
                )


def _check_drift_categories(categories: dict) -> None:
    import re

    for name, cats in categories.items():
        for v in cats:
            if not re.fullmatch(r"[A-Za-z0-9_.\-]+", v or ""):
                raise ValueError(
                    f"drift category value {v!r} (signal {name!r}) "
                    "must be a plain token — it is interpolated as a "
                    "SQL string literal in the oracle twin"
                )


def _bucket_expr(col: str, edges: tuple[float, ...]):
    """bucket(value) = number of edges <= value, NULL -> -1. One
    codegen aggregate over a literal array — no join, no UDF."""
    lits = ", ".join(repr(float(e)) for e in edges)
    return F.when(
        F.col(col).isNull(), F.lit(-1)
    ).otherwise(
        F.expr(
            f"aggregate(array({lits}), 0, "
            f"(acc, e) -> acc + IF({col} >= e, 1, 0))"
        )
    )


def _cat_bucket_expr(col: str, categories: tuple[str, ...]):
    """bucket(value) = position of value in the declared category list
    (0-based), unknown -> -2, NULL -> -1."""
    expr = F.when(F.col(col).isNull(), F.lit(-1))
    for i, v in enumerate(categories):
        expr = expr.when(F.col(col) == v, F.lit(i))
    return expr.otherwise(F.lit(-2))


def signal_histogram(
    sig: DataFrame,
    edges: dict[str, tuple[float, ...]] | None = None,
    categories: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Per-signal bucket histogram over a ``textops.text_signals``
    frame: ``(signal, bucket, n, p)`` with ``p = n / corpus_size``.
    One map-only bucket projection + explode + ONE combinable groupBy;
    the per-signal totals are a broadcast-sized second aggregate over
    the histogram itself (bucket-count rows, not corpus rows). NULL
    signals land in bucket -1 — classified, never dropped (a drifting
    NULL rate IS drift); unknown categorical values land in -2 for the
    same reason. Numeric signals bucket by the fixed ``edges``,
    categorical ones (r11: ``lang_pred`` by default) by list
    position."""
    edges = DRIFT_EDGES if edges is None else edges
    categories = DRIFT_CATEGORIES if categories is None else categories
    _check_drift_signal_names(edges, categories)
    _check_drift_categories(categories)
    arms = [
        F.struct(
            F.lit(name).alias("signal"),
            _bucket_expr(name, e).alias("bucket"),
        )
        for name, e in sorted(edges.items())
    ] + [
        F.struct(
            F.lit(name).alias("signal"),
            _cat_bucket_expr(name, cats).alias("bucket"),
        )
        for name, cats in sorted(categories.items())
    ]
    pairs = sig.select(
        F.explode(F.array(*arms)).alias("sb")
    ).select("sb.signal", "sb.bucket")
    hist = pairs.groupBy("signal", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = hist.groupBy("signal").agg(F.sum("n").alias("__tot"))
    return hist.join(F.broadcast(totals), "signal").select(
        "signal", "bucket", "n",
        (F.col("n").cast("double") / F.col("__tot")).alias("p"),
    )


def signal_histogram_sql(
    signals_sql: str,
    edges: dict[str, tuple[float, ...]] | None = None,
    categories: dict[str, tuple[str, ...]] | None = None,
) -> str:
    """DuckDB twin of :func:`signal_histogram` over a
    ``textops.text_signals_sql`` subquery."""
    edges = DRIFT_EDGES if edges is None else edges
    categories = DRIFT_CATEGORIES if categories is None else categories
    _check_drift_signal_names(edges, categories)
    _check_drift_categories(categories)
    num_arms = [
        f"SELECT '{name}' AS signal, "
        f"CASE WHEN {name} IS NULL THEN -1 ELSE "
        f"len(list_filter([{', '.join(repr(float(x)) for x in e)}], "
        f"e -> {name} >= e)) END AS bucket FROM s"
        for name, e in sorted(edges.items())
    ]
    cat_arms = [
        f"SELECT '{name}' AS signal, "
        f"CASE WHEN {name} IS NULL THEN -1 "
        + " ".join(
            f"WHEN {name} = '{v}' THEN {i}" for i, v in enumerate(cats)
        )
        + " ELSE -2 END AS bucket FROM s"
        for name, cats in sorted(categories.items())
    ]
    arms = "\nUNION ALL\n".join(num_arms + cat_arms)
    return f"""
    WITH s AS ({signals_sql}),
    pairs AS ({arms}),
    hist AS (SELECT signal, bucket, count(*) AS n
             FROM pairs GROUP BY signal, bucket)
    SELECT signal, bucket, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY signal) AS p
    FROM hist
    """


def psi_report(
    baseline_hist: DataFrame,
    current_hist: DataFrame,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per signal between two
    :func:`signal_histogram` frames: ``(signal, psi, verdict)`` with
    ``psi = Σ_buckets (p_cur − p_base) · ln(p_cur / p_base)`` under
    ``eps``-clamping (a bucket empty on one side contributes a large
    but FINITE term instead of ±inf), rounded to 9 dp so both engines
    agree bit-for-bit. Verdict: ``stable`` (< 0.1), ``moderate``
    (< 0.25), ``major`` — the standard scorecard-monitoring reading.

    Scale shape: both inputs are bucket-count-sized (a few dozen rows
    per signal regardless of corpus size), so the outer join and the
    final aggregate are report-sized — the corpus-scale work happened
    in the two histogram passes."""
    b = baseline_hist.select(
        "signal", "bucket", F.col("p").alias("__pb")
    )
    c = current_hist.select(
        "signal", "bucket", F.col("p").alias("__pc")
    )
    joined = b.join(c, ["signal", "bucket"], "full_outer").select(
        "signal",
        F.greatest(F.coalesce(F.col("__pb"), F.lit(0.0)), F.lit(eps)).alias("pb"),
        F.greatest(F.coalesce(F.col("__pc"), F.lit(0.0)), F.lit(eps)).alias("pc"),
    )
    psi = joined.groupBy("signal").agg(
        F.round(
            F.sum((F.col("pc") - F.col("pb")) * F.log(F.col("pc") / F.col("pb"))),
            9,
        ).alias("psi")
    )
    return psi.select(
        "signal", "psi",
        F.when(F.col("psi") < PSI_MODERATE, F.lit("stable"))
        .when(F.col("psi") < PSI_MAJOR, F.lit("moderate"))
        .otherwise(F.lit("major"))
        .alias("verdict"),
    )


def psi_report_sql(
    baseline_hist_sql: str, current_hist_sql: str, eps: float = 1e-6
) -> str:
    """DuckDB twin of :func:`psi_report`."""
    return f"""
    WITH b AS ({baseline_hist_sql}), c AS ({current_hist_sql}),
    j AS (
        SELECT coalesce(b.signal, c.signal) AS signal,
               greatest(coalesce(b.p, 0.0), {eps!r}) AS pb,
               greatest(coalesce(c.p, 0.0), {eps!r}) AS pc
        FROM b FULL OUTER JOIN c
          ON b.signal = c.signal AND b.bucket = c.bucket
    )
    SELECT signal,
           round(sum((pc - pb) * ln(pc / pb)), 9) AS psi,
           CASE WHEN round(sum((pc - pb) * ln(pc / pb)), 9) < {PSI_MODERATE}
                  THEN 'stable'
                WHEN round(sum((pc - pb) * ln(pc / pb)), 9) < {PSI_MAJOR}
                  THEN 'moderate'
                ELSE 'major' END AS verdict
    FROM j GROUP BY signal
    """


def quality_drift(
    baseline: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    edges: dict[str, tuple[float, ...]] | None = None,
    categories: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Ingest drift monitor: PSI per text-quality signal between a
    BASELINE corpus and an ingest BATCH — ``(signal, psi, verdict)``.
    The "did today's crawl slice look like the corpus I calibrated my
    gates on" check a 100 TB pipeline runs every firing: a major shift
    on ``n_tokens`` means truncation upstream, on ``stopword_ratio``
    language/boilerplate mix change, on ``repetition`` a template
    flood, on ``lang_pred`` (categorical, r11) a language-mix shift —
    each caught BEFORE the gates silently change their drop
    rates. Each side is one ``text_signals`` scan (the same single
    projection the signal slot uses) + one bucket groupBy; the PSI
    join is report-sized. Deterministic end-to-end (fixed edges, no
    sampling), so the DuckDB twin hash-checks it."""
    from etl_pack_spark.operators.textops import text_signals

    return psi_report(
        signal_histogram(
            text_signals(baseline, id_col, text_col), edges, categories
        ),
        signal_histogram(
            text_signals(batch, id_col, text_col), edges, categories
        ),
    )


def quality_drift_sql(
    baseline_table: str,
    batch_table: str,
    id_col: str,
    text_col: str,
    edges: dict[str, tuple[float, ...]] | None = None,
    categories: dict[str, tuple[str, ...]] | None = None,
) -> str:
    """DuckDB twin of :func:`quality_drift`."""
    from etl_pack_spark.operators.textops import text_signals_sql

    return psi_report_sql(
        signal_histogram_sql(
            text_signals_sql(baseline_table, id_col, text_col),
            edges, categories,
        ),
        signal_histogram_sql(
            text_signals_sql(batch_table, id_col, text_col),
            edges, categories,
        ),
    )


# ---------------------------------------------------------------------------
# Corpus datacard (r12): the one-pass dataset summary report
# ---------------------------------------------------------------------------

def corpus_datacard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang",),
    lang_col: str | None = "lang",
    accuracy: int | None = 10_000,
    langid_model_path: str | None = None,
) -> DataFrame:
    """The dataset-card table every training run publishes, in ONE
    corpus scan: per ``group_cols`` slice AND a grand-total row
    (GROUPING SETS — per-group plus total only, no intermediate
    rollups), the volume, token-length distribution, and quality mix:

    ``(*group_cols, is_total, n_docs, n_null_text, n_tokens_total,
    n_chars_total, tokens_p50, tokens_p90, tokens_p99,
    avg_stopword_ratio, avg_repetition[, lang_match_frac])``

    ``lang_match_frac`` (when ``lang_col`` names a column) is the
    fraction of docs whose n-gram language prediction agrees with the
    declared language — the corpus-level labeling-quality number.
    Docs where agreement is undecidable (NULL text → no prediction,
    or NULL label) are excluded from its denominator, not counted as
    mismatches (their volume is visible in ``n_null_text``).
    ``is_total`` (0/1) disambiguates the grand-total row from a
    genuine NULL group value.

    Scale shape: the signals projection carries the group keys through
    (``text_signals(carry_cols=...)``, map-only), so the whole card is
    scan → map → ONE combinable grouped aggregate; nothing joins back
    to the corpus. ``accuracy`` picks the token-length quantile
    implementation exactly like :func:`mad_outliers`:
    ``percentile_approx`` (bounded sketch state — the 100 TB default)
    or exact ``percentile`` with ``None`` (the DuckDB-twin variant;
    n_tokens is a small-integer domain, so the exact buffer is bounded
    by the token-count range, not the corpus)."""
    from etl_pack_spark.operators.textops import text_signals

    carry = tuple(group_cols) + (
        (lang_col,) if lang_col is not None and lang_col not in group_cols
        else ()
    )
    sig = text_signals(docs, id_col, text_col, carry_cols=carry)
    # trained-model labeling QA (r14, round-13 VERDICT #7): when a
    # saved NB langid model exists at langid_model_path, the
    # declared-vs-predicted column scores against IT instead of the
    # marker heuristic — trading the card's pure one-scan shape for
    # one model-scoring pass + an id-keyed join (the model side is
    # vocabulary-sized and broadcast-guarded). No model at the path →
    # heuristic, unchanged (the fallback contract of
    # classify.language_id_trained). NULL texts stay NULL predictions
    # (excluded from the denominator) under both predictors — the
    # model's priors-only score for an empty gram stream must not
    # count a missing document as a labeling mismatch.
    if lang_col is not None and langid_model_path is not None:
        from etl_pack_spark.operators.classify import (
            langid_model_load,
            nb_langid_score,
        )

        model = langid_model_load(docs.sparkSession, langid_model_path)
        if model is not None:
            grams, meta, n = model
            preds = nb_langid_score(
                docs.where(F.col(text_col).isNotNull()),
                id_col, text_col, grams, meta, n,
            ).select(id_col, F.col("lang_pred").alias("__model_pred"))
            sig = (
                sig.drop("lang_pred")
                .join(preds, id_col, "left")
                .withColumnRenamed("__model_pred", "lang_pred")
            )
    pct = (
        "percentile(n_tokens, {q})"
        if accuracy is None
        else f"percentile_approx(n_tokens, {{q}}, {int(accuracy)})"
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("n_chars").isNull(), 1)).alias("n_null_text"),
        F.sum(F.coalesce("n_tokens", F.lit(0))).alias("n_tokens_total"),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("n_chars_total"),
        F.expr(pct.format(q=0.5)).alias("tokens_p50"),
        F.expr(pct.format(q=0.9)).alias("tokens_p90"),
        F.expr(pct.format(q=0.99)).alias("tokens_p99"),
        F.round(F.avg("stopword_ratio"), 9).alias("avg_stopword_ratio"),
        F.round(F.avg("repetition"), 9).alias("avg_repetition"),
    ]
    if lang_col is not None:
        aggs.append(
            F.round(
                F.avg((F.col("lang_pred") == F.col(lang_col)).cast("double")),
                9,
            ).alias("lang_match_frac")
        )
    gcols = [F.col(c) for c in group_cols]
    return (
        sig.groupingSets([gcols, []], *gcols)
        .agg(F.grouping_id().alias("__gid"), *aggs)
        .select(
            *group_cols,
            (F.col("__gid") != 0).cast("int").alias("is_total"),
            *[a_name for a_name in (
                "n_docs", "n_null_text", "n_tokens_total", "n_chars_total",
                "tokens_p50", "tokens_p90", "tokens_p99",
                "avg_stopword_ratio", "avg_repetition",
            )],
            *(["lang_match_frac"] if lang_col is not None else []),
        )
    )


def corpus_datacard_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang",),
    lang_col: str | None = "lang",
) -> str:
    """DuckDB twin of :func:`corpus_datacard` (exact-percentile
    variant — pair with ``accuracy=None``)."""
    from etl_pack_spark.operators.textops import text_signals_sql

    gl = ", ".join(group_cols)
    lang_sel = (
        f",\n           round(avg(CASE WHEN lang_pred IS NULL "
        f"OR {lang_col} IS NULL THEN NULL "
        f"WHEN lang_pred = {lang_col} "
        "THEN 1.0 ELSE 0.0 END), 9) AS lang_match_frac"
        if lang_col is not None else ""
    )
    carry = ", ".join(
        f"d.{c}" for c in dict.fromkeys(
            tuple(group_cols)
            + ((lang_col,) if lang_col is not None else ())
        )
    )
    return f"""
    WITH s AS (
        SELECT sig.*, {carry}
        FROM ({text_signals_sql(table, id_col, text_col)}) sig
        JOIN {table} d USING ({id_col})
    )
    SELECT {gl},
           CAST(CASE WHEN GROUPING({group_cols[0]}) = 1 THEN 1 ELSE 0 END
                AS INTEGER) AS is_total,
           count(*) AS n_docs,
           count(CASE WHEN n_chars IS NULL THEN 1 END) AS n_null_text,
           CAST(sum(coalesce(n_tokens, 0)) AS BIGINT) AS n_tokens_total,
           CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS n_chars_total,
           quantile_cont(n_tokens, 0.5) AS tokens_p50,
           quantile_cont(n_tokens, 0.9) AS tokens_p90,
           quantile_cont(n_tokens, 0.99) AS tokens_p99,
           round(avg(stopword_ratio), 9) AS avg_stopword_ratio,
           round(avg(repetition), 9) AS avg_repetition{lang_sel}
    FROM s
    GROUP BY GROUPING SETS (({gl}), ())
    """


def drift_config_from_json(text: str) -> tuple[dict, dict]:
    """Parse and validate a drift bucket-config payload into the
    ``(edges, categories)`` pair :func:`~.quality.signal_histogram`
    takes. The config REPLACES the built-in spec (an omitted section
    means that signal family is disabled), so the result is exactly
    what the user wrote — validated LOUDLY here (the drift-name
    posture) because every name and value is interpolated into
    generated expressions."""
    import json

    cfg = json.loads(text)
    if not isinstance(cfg, dict) or not cfg or not set(cfg) <= {
        "edges", "categories"
    }:
        raise ValueError(
            "drift config must be a JSON object with 'edges' and/or "
            "'categories' keys"
        )
    edges: dict[str, tuple[float, ...]] = {}
    for name, cuts in (cfg.get("edges") or {}).items():
        if not isinstance(cuts, list) or not cuts:
            raise ValueError(
                f"drift config edges[{name!r}] must be a non-empty list"
            )
        vals = tuple(float(x) for x in cuts)
        if any(b <= a for a, b in zip(vals, vals[1:])):
            raise ValueError(
                f"drift config edges[{name!r}] must be strictly "
                f"increasing (got {list(vals)})"
            )
        edges[str(name)] = vals
    categories: dict[str, tuple[str, ...]] = {}
    for name, cats in (cfg.get("categories") or {}).items():
        if not isinstance(cats, list) or not cats:
            raise ValueError(
                f"drift config categories[{name!r}] must be a non-empty "
                "list"
            )
        categories[str(name)] = tuple(str(v) for v in cats)
    if not edges and not categories:
        raise ValueError("drift config declares no signals")
    _check_drift_signal_names(edges, categories)
    _check_drift_categories(categories)
    return edges, categories


def canonical_drift_config(edges: dict, categories: dict) -> str:
    """The stored/compared rendering of a drift bucket config: sorted
    keys, lists — byte-identical iff the configs bucket identically."""
    import json

    return json.dumps(
        {
            "edges": {k: [float(x) for x in v] for k, v in edges.items()},
            "categories": {k: list(v) for k, v in categories.items()},
        },
        sort_keys=True,
    )


def append_report_rows(spark, path: str, rows: list[dict], mode: str,
                   subject: str, detail: str | None) -> None:
    """Append one firing's report rows to the history store at
    ``path`` — the cron-trend surface ("is my drop rate creeping up",
    "when did lang drift start"): one parquet append of report-sized
    rows per firing, stamped with the firing's epoch millis. Shared
    schema across report modes so one store can hold a pipeline's
    whole audit trail: ``(fired_at_ms, mode, subject, detail, metric,
    value, verdict)``. At-least-once (a retried firing appends its
    rows again); trend readers group by fired_at_ms."""
    import time as _time

    fired = int(_time.time() * 1000)
    df = spark.createDataFrame(
        [
            (fired, mode, subject, detail,
             r["metric"], float(r["value"]),
             r["verdict"])
            for r in rows
        ],
        "fired_at_ms long, mode string, subject string, detail string, "
        "metric string, value double, verdict string",
    )
    df.coalesce(1).write.mode("append").parquet(path)
