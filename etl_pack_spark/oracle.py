"""Driver-compare helpers, defined ONCE for every local consumer of the
correctness gate's semantics: ``tools/check_oracle.py`` (ad-hoc full-gate
simulation) and ``tests/test_registry_merges.py`` (retired-oracle
parity pins). Mirrors the driver: DuckDB views over the fixture
parquet, columns sorted by name, rows sorted NULL-safely, floats
rounded before compare.
"""

from __future__ import annotations

import math

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views
    (same names the driver pre-registers)."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_frame(df, float_dp: int = 9) -> list[tuple]:
    """Driver-style canonicalization of a pandas frame: columns sorted
    by name, floats rounded to ``float_dp`` (tighter than the driver's
    repr compare, so parity failures surface locally first), rows in a
    NULL-safe total order (NULLs first per column)."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, float_dp)
        return v

    rows = [
        tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((v is not None, str(v)) for v in r))
