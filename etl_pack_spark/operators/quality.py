"""Data-quality profiling (expectations-style), engine-native.

One aggregation pass computes per-column null/distinct/min/max stats —
the validation step an ETL pipeline runs before trusting a load. All
map-side-combinable aggregates: one shuffle of constant-size partial
states regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], numeric_cols: list[str]) -> DataFrame:
    """One-row profile: row count, per-column non-null + distinct
    counts, min/max for numeric columns."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
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
