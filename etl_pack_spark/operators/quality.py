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
