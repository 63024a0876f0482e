"""Registry-consolidation safety net: every query merged OUT of the
50-entry driver registry keeps full DuckDB hash-parity here, with the
same compare the driver applies (sort columns by name, sort rows,
compare values)."""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_pack_spark import suite

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df):
    """Driver-style canonicalization: columns sorted by name, rows
    sorted, floats rounded to 9 dp (tighter than the driver's repr
    compare — parity failures surface here first)."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 9)
        return v

    rows = sorted(
        tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return rows


@pytest.mark.parametrize("name", sorted(suite.RETIRED_QUERIES))
def test_retired_query_keeps_oracle_parity(spark, sf_dir, name):
    got = suite.RETIRED_QUERIES[name](spark, sf_dir).toPandas()
    want = _duck(sf_dir).execute(suite.RETIRED_ORACLES[name]).fetchdf()
    assert sorted(got.columns.str.lower()) == sorted(want.columns.str.lower())
    a, b = _canon(got), _canon(want)
    assert len(a) == len(b) > 0
    assert a == b


def test_retired_sets_are_consistent():
    # a retired query must not also be registered, and each has an oracle
    assert not set(suite.RETIRED_QUERIES) & set(suite.QUERIES)
    assert set(suite.RETIRED_QUERIES) == set(suite.RETIRED_ORACLES)
